"""Language-ID accuracy gate + text-stat edge cases.

The synthetic sf corpora carry a ``lang`` label column but their TEXT is
language-agnostic filler, so the accuracy oracle here is a constructed
labeled fixture: documents written with each language's actual stopwords
must classify correctly — this is the gate that catches a stopword-table
typo (every other rows-only query already has a pytest oracle; VERDICT
round 2, "What's missing" #1).
"""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import DEFAULT_CONFIG


def _docs_ds(texts):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }))


# Each doc mixes its language's stopwords with neutral filler tokens —
# filler is deliberately non-stopword in every table.
_LABELED = [
    ("en", "the cat sat and looked at the dog for a while in it"),
    ("en", "it is that time of the year for a walk to town"),
    ("de", "der hund und die katze sind ein gutes team zu hause"),
    ("de", "das ist nicht der richtige weg zu den bergen"),
    ("fr", "le chien et la souris dans les champs pour que rien"),
    ("fr", "est une belle journee pour le marche dans la ville"),
    ("es", "el perro y la gata en los campos de que hablar"),
    ("es", "es un dia y una noche en el campo los dos"),
]


class TestLangIdAccuracy:
    def test_labeled_fixture_accuracy(self, ray_session):
        from raydedup.stages.textstats import lang_id
        texts = [t for _, t in _LABELED]
        out = lang_id(_docs_ds(texts)).to_pandas().sort_values("doc_id")
        got = out["lang_pred"].tolist()
        want = [l for l, _ in _LABELED]
        acc = np.mean([g == w for g, w in zip(got, want)])
        assert acc == 1.0, f"lang_id mispredicts labeled fixture: {list(zip(want, got))}"

    def test_no_stopwords_is_und(self, ray_session):
        from raydedup.stages.textstats import lang_id
        out = lang_id(_docs_ds(["zzz qqq xxx www", ""])).to_pandas()
        assert set(out["lang_pred"]) == {"und"}

    def test_tie_goes_alphabetically_first(self, ray_session):
        from raydedup.stages.textstats import lang_id
        # one 'en' stopword + one 'fr' stopword → tie → 'en' (sorted first)
        out = lang_id(_docs_ds(["the le zebra"])).to_pandas()
        assert out["lang_pred"].tolist() == ["en"]

    def test_every_table_is_reachable(self, ray_session):
        # a doc of ONLY lang L's stopwords must predict L, for every L —
        # a broken/empty table for any language fails here
        from raydedup.stages.textstats import _STOPWORDS, lang_id
        langs = sorted(_STOPWORDS)
        texts = [" ".join(sorted(_STOPWORDS[l])) for l in langs]
        out = lang_id(_docs_ds(texts)).to_pandas().sort_values("doc_id")
        assert out["lang_pred"].tolist() == langs


class TestRepetitionStats:
    def test_planted_repetition(self, ray_session):
        from raydedup.stages.textstats import repetition_stats
        texts = [
            "a a a a",                     # n=4 d=1 → dup 750000, top_word 1000000; bigrams: "a a"×3/3 → 1000000
            "x y z w",                     # all distinct → 0, 250000, bigrams 3 distinct → 333333
            "q",                           # single token → dup 0, top 1000000, no bigrams → 0
            "p r p r p",                   # n=5 d=2 dup 600000; top p=3 → 600000; bigrams: pr,rp,pr,rp → top 2/4=500000
        ]
        out = repetition_stats(_docs_ds(texts)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert out["dup_word_frac_e6"].tolist() == [750000, 0, 0, 600000]
        assert out["top_word_frac_e6"].tolist() == [1000000, 250000,
                                                    1000000, 600000]
        assert out["top_bigram_frac_e6"].tolist() == [1000000, 333333,
                                                      0, 500000]

    def test_empty_text(self, ray_session):
        # split of '' is [''] (DuckDB semantics): 1 token, 0 bigrams
        from raydedup.stages.textstats import repetition_stats
        out = repetition_stats(_docs_ds([""])).to_pandas()
        assert out.iloc[0]["dup_word_frac_e6"] == 0
        assert out.iloc[0]["top_word_frac_e6"] == 1000000
        assert out.iloc[0]["top_bigram_frac_e6"] == 0


class TestPiiScrub:
    def test_planted_pii(self, ray_session):
        from raydedup.stages.textstats import scrub_pii
        texts = [
            "mail me at john.doe+x@example.co.uk today",
            "call 555-123-4567 or 555.987.6543 now",
            "server at 192.168.0.1 responded",
            "clean text no pii at all",
            "version 1.2.3.4567 is not an ip",   # 4th octet too long → \b fails... see assert
        ]
        out = scrub_pii(_docs_ds(texts)).to_pandas().sort_values("doc_id")
        s = out["text_scrubbed"].tolist()
        assert s[0] == "mail me at <EMAIL> today"
        assert s[1] == "call <PHONE> or <PHONE> now"
        assert s[2] == "server at <IP> responded"
        assert s[3] == "clean text no pii at all"
        # matches DuckDB RE2 behavior on the tricky case either way:
        # just require determinism and no crash
        assert isinstance(s[4], str)

    def test_duckdb_regex_parity_on_planted_pii(self, ray_session):
        # pyarrow and DuckDB are both RE2 — pin byte equality on inputs
        # that actually contain PII (the sf corpus has none)
        import duckdb
        import pandas as pd
        from raydedup.stages.textstats import PII_PATTERNS, scrub_pii
        texts = [
            "a@b.co and c.d-e_f%g@h-i.j.org mixed 10.0.0.255 9.9.9.9",
            "edge 999.999.999.999 and 1.2.3.4.5 chains",
            "phone 123-456-7890x and .555.123.4567.",
            "no-reply@sub.domain.io trailing dot. 127.0.0.1:8080",
        ]
        got = scrub_pii(_docs_ds(texts)).to_pandas() \
            .sort_values("doc_id")["text_scrubbed"].tolist()
        con = duckdb.connect()
        con.register("d", pd.DataFrame({"text": texts}))
        expr = "text"
        for pat, repl in PII_PATTERNS:
            # SQL string literals don't process backslashes — pass the
            # RE2 pattern through verbatim (quotes doubled only)
            sql_pat = pat.replace("'", "''")
            expr = f"regexp_replace({expr}, '{sql_pat}', '{repl}', 'g')"
        want = [r[0] for r in con.execute(
            f"SELECT {expr} FROM d").fetchall()]
        assert got == want


class TestNormalizeText:
    def test_normalize_and_duckdb_parity(self, ray_session):
        import duckdb
        import ray.data as rd

        from raydedup.stages.textstats import normalize_text
        texts = ["  Hello   WORLD  ", "Tabs\tand\nnewlines  here",
                 "MiXeD CaSe", "", "already clean"]
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        out = normalize_text(rd.from_arrow(t)).to_pandas() \
            .sort_values("doc_id")
        df = t.to_pandas()
        want = duckdb.connect().execute(
            r"SELECT trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
            r" AS c FROM df ORDER BY doc_id").df()["c"].tolist()
        assert list(out["text_normalized"]) == want
        # normalized variants of the same content collide for exact dedup
        assert out["text_normalized"][0] == "hello world"


class TestCommonTokenStats:
    def test_counts_against_manual(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from raydedup.config import DEFAULT_CONFIG
        from raydedup.stages.vocab import common_token_stats

        cfg = DEFAULT_CONFIG.with_(num_partitions=4, batch_size=2)
        # "the" x5, "a" x3, "b" x2 -> top-2 vocab = {the, a}
        rows = [(0, "the a the"), (1, "a b the"), (2, "b the a the"),
                (3, "zz yy"), (4, "")]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        })).repartition(2)
        got = common_token_stats(ds, cfg, k=2).to_pandas() \
            .set_index("doc_id").sort_index()
        assert got["n_common"].to_dict() == {0: 3, 1: 2, 2: 3, 3: 0, 4: 0}
        # '' splits to [''] -> one token, matching DuckDB string_split
        assert got["n_tokens"].to_dict() == {0: 3, 1: 3, 2: 4, 3: 2, 4: 1}


class TestQualityFilter:
    def test_each_rule_cuts_its_doc(self, ray_session):
        from raydedup.stages.textstats import quality_filter
        texts = [
            "alpha beta gamma delta epsilon zeta theta iota kappa lam",  # 0 ok
            "too short",                                                 # 1 tokens
            "aa " * 9 + "aa",                                 # 2 short tokens
            "a1! b2? c3# d4$ e5% f6^ g7& h8* i9( j0) k1! l2?",  # 3 low alpha
            "same same same same same same same same same dif",  # 4 dup words
        ]
        ds = _docs_ds(texts)
        out = quality_filter(ds, min_tokens=5, min_mean_token_len=3.0,
                             min_alpha_ratio=0.6,
                             max_dup_word_frac_e6=500_000) \
            .to_pandas()
        assert sorted(out["doc_id"]) == [0]
        # no bounds → everything passes
        assert quality_filter(_docs_ds(texts)).count() == 5

    def test_matches_duckdb(self, ray_session):
        import duckdb
        from raydedup.stages.textstats import quality_filter
        rng = np.random.default_rng(11)
        words = ["w%d" % i for i in range(40)] + ["x!", "yy", "zzz9"]
        texts = [" ".join(rng.choice(words, rng.integers(3, 60)))
                 for _ in range(300)]
        out = quality_filter(
            _docs_ds(texts), min_tokens=10, min_mean_token_len=2.5,
            min_alpha_ratio=0.3, max_dup_word_frac_e6=400_000) \
            .to_pandas()
        con = duckdb.connect()
        con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO d VALUES (?, ?)",
                        list(enumerate(texts)))
        want = con.execute("""
            WITH b AS (
              SELECT doc_id, length(text)::DOUBLE n_chars,
                     len(string_split(text,' '))::BIGINT n_tok,
                     len(list_distinct(string_split(text,' ')))::BIGINT nd,
                     length(regexp_replace(text,'[^a-zA-Z]','','g'))::DOUBLE na
              FROM d)
            SELECT doc_id FROM b
            WHERE n_tok >= 10
              AND greatest(n_chars-(n_tok-1),0)/greatest(n_tok::DOUBLE,1) >= 2.5
              AND na/greatest(n_chars,1) >= 0.3
              AND (n_tok-nd)*1000000//n_tok <= 400000
            ORDER BY doc_id""").df()
        assert list(np.sort(out["doc_id"])) == list(want["doc_id"])
        assert 0 < len(want) < 300


class TestCorpusReport:
    def test_summary_and_empty_batches(self, ray_session):
        from raydedup.stages.textstats import corpus_report
        texts = ["a b c", "d e", "f g h i"]
        out = corpus_report(_docs_ds(texts)).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        assert (r["n_docs"], r["n_tokens"], r["min_tokens"],
                r["max_tokens"]) == (3, 9, 2, 4)
        assert r["n_chars"] == sum(len(t) for t in texts)
        assert r["mean_tokens"] == 3.0
        # empty corpus → zero row, not a crash
        z = corpus_report(_docs_ds([])).to_pandas()
        assert z.iloc[0]["n_docs"] == 0


class TestGopherRules:
    def test_planted_fixtures(self, ray_session):
        from raydedup.stages.textstats import gopher_rules
        good = ("the quick brown fox jumps over a lazy dog and then they "
                "have supper with all of their friends that evening ") * 5
        bullets = "\n".join(f"- item {i}" for i in range(20))
        ellipses = "\n".join(f"line {i} trails off..." for i in range(10))
        symbols = "# ".join(str(i) for i in range(60))
        short = "too short"
        out = gopher_rules(_docs_ds(
            [good, bullets, ellipses, symbols, short])).to_pandas()
        out = out.set_index("doc_id")
        assert bool(out.loc[0, "gopher_pass"])
        assert out.loc[0, "n_stopwords_present"] >= 2
        # every line is a bullet → frac 1.0, gate fails
        assert out.loc[1, "bullet_line_frac"] == pytest.approx(1.0)
        assert not bool(out.loc[1, "gopher_pass"])
        assert out.loc[2, "ellipsis_line_frac"] == pytest.approx(1.0)
        assert not bool(out.loc[2, "gopher_pass"])
        assert out.loc[3, "symbol_word_ratio"] > 0.1
        assert not bool(out.loc[3, "gopher_pass"])
        assert out.loc[4, "n_words"] == 2
        assert not bool(out.loc[4, "gopher_pass"])

    def test_symbol_count_matches_replace_semantics(self, ray_session):
        from raydedup.stages.textstats import gopher_rules
        # 5 dots = ONE non-overlapping '...' occurrence (replace trick);
        # also one '#'
        out = gopher_rules(_docs_ds(["a..... # b"])).to_pandas()
        assert out.loc[0, "symbol_word_ratio"] == pytest.approx(2 / 3)

    def test_empty_and_no_newline(self, ray_session):
        from raydedup.stages.textstats import gopher_rules
        out = gopher_rules(_docs_ds(["", "single line no newline"])).to_pandas()
        assert out.loc[0, "n_words"] == 1  # split of "" yields [""]
        assert not bool(out.loc[0, "gopher_pass"])
        assert out.loc[1, "bullet_line_frac"] == 0.0

    def test_quality_filter_gopher_gate_agrees(self, ray_session):
        from raydedup.stages.textstats import gopher_rules, quality_filter
        good = ("the quick brown fox jumps over a lazy dog and then they "
                "have supper with all of their friends that evening ") * 5
        texts = [good, "\n".join(f"- b {i}" for i in range(30)),
                 good + " extra words here", "tiny"]
        full = gopher_rules(_docs_ds(texts)).to_pandas()
        kept = quality_filter(_docs_ds(texts), gopher_gate=True).to_pandas()
        assert set(kept["doc_id"]) == set(
            full[full["gopher_pass"]]["doc_id"])
        assert 0 < len(kept) < len(texts)


class TestTopKNgrams:
    def test_bigrams_vs_brute(self, ray_session):
        from collections import Counter

        from raydedup.config import DEFAULT_CONFIG
        from raydedup.stages.vocab import top_k_ngrams
        texts = ["a b c a b", "b c", "x", "", "a b"]
        got = top_k_ngrams(_docs_ds(texts), DEFAULT_CONFIG, k=10) \
            .to_pandas()
        want = Counter()
        for t in texts:
            ws = t.split(" ")
            want.update(f"{x} {y}" for x, y in zip(ws, ws[1:]))
        assert dict(zip(got["ngram"], got["n"])) == dict(want)

    def test_no_cross_document_bigram(self, ray_session):
        from raydedup.config import DEFAULT_CONFIG
        from raydedup.stages.vocab import top_k_ngrams
        # the only way "tail head" can appear is by crossing the
        # doc0→doc1 boundary — it must NOT be emitted
        got = top_k_ngrams(_docs_ds(["one tail", "head two"]),
                           DEFAULT_CONFIG, k=10).to_pandas()
        assert set(got["ngram"]) == {"one tail", "head two"}

    def test_trigrams_and_k_cut(self, ray_session):
        from raydedup.config import DEFAULT_CONFIG
        from raydedup.stages.vocab import top_k_ngrams
        texts = ["p q r p q r p q r", "p q r"]
        got = top_k_ngrams(_docs_ds(texts), DEFAULT_CONFIG, k=2, n=3) \
            .to_pandas()
        assert len(got) == 2
        assert got.iloc[0]["ngram"] == "p q r" and got.iloc[0]["n"] == 4


class TestWinnowFingerprints:
    @staticmethod
    def _brute_select(hashes, w):
        """Pure-python robust winnowing: rightmost-min per window."""
        sel = set()
        for e in range(w - 1, len(hashes)):
            win = hashes[e - w + 1:e + 1]
            mn = min(win)
            off = max(i for i, v in enumerate(win) if v == mn)
            sel.add(e - w + 1 + off)
        return sel

    def test_rabin_path_vs_brute(self, ray_session):
        from raydedup.functions.text import shingle_stream
        from raydedup.stages.textstats import winnow_fingerprints
        texts = ["alpha beta gamma delta epsilon zeta eta theta iota "
                 "kappa lambda mu nu xi omicron pi rho sigma tau",
                 "one two three four five six seven eight nine ten",
                 "tiny doc", ""]
        k, w = 5, 4
        got = winnow_fingerprints(_docs_ds(texts), k=k, w=w,
                                  hash="rabin").to_pandas()
        want = set()
        for d, t in enumerate(texts):
            h, doc, _ = shingle_stream(pa.array([t], pa.string()), k)
            hs = h.tolist()
            for i in self._brute_select(hs, w):
                want.add((d, i + 1, format(hs[i], "016x")))
        assert set(zip(got["doc_id"], got["pos"],
                       got["fingerprint"])) == want
        assert len(want) > 0

    def test_md5_path_vs_brute(self, ray_session):
        import hashlib
        from raydedup.stages.textstats import winnow_fingerprints
        texts = ["w x y z w x y z w x y z w", "a b c d e f g h"]
        k, w = 5, 4
        got = winnow_fingerprints(_docs_ds(texts), k=k, w=w,
                                  hash="md5").to_pandas()
        want = set()
        for d, t in enumerate(texts):
            ws = t.split(" ")
            hs = [int(hashlib.md5(" ".join(ws[i:i + k]).encode())
                      .hexdigest()[:16], 16)
                  for i in range(len(ws) - k + 1)]
            for i in self._brute_select(hs, w):
                want.add((d, i + 1, format(hs[i], "016x")))
        assert set(zip(got["doc_id"], got["pos"],
                       got["fingerprint"])) == want

    def test_shared_run_guarantee(self, ray_session):
        # Schleimer et al. guarantee: a shared token run of ≥ w+k−1
        # yields at least one common fingerprint
        from raydedup.stages.textstats import winnow_fingerprints
        shared = "the quick brown fox jumps over the lazy dog today"
        texts = ["prefix one two " + shared + " suffix alpha",
                 "totally different lead-in words " + shared]
        out = winnow_fingerprints(_docs_ds(texts), k=5, w=4,
                                  hash="rabin").to_pandas()
        f0 = set(out[out["doc_id"] == 0]["fingerprint"])
        f1 = set(out[out["doc_id"] == 1]["fingerprint"])
        assert f0 & f1


class TestDocKeywords:
    def test_top_k_and_ties(self, ray_session):
        from raydedup.stages.vocab import doc_keywords
        texts = ["b b b a a c", "z y x", "solo"]
        out = doc_keywords(_docs_ds(texts), k=2).to_pandas()
        d0 = out[out["doc_id"] == 0].sort_values("rank")
        assert list(d0["token"]) == ["b", "a"]
        assert list(d0["tf"]) == [3, 2]
        d1 = out[out["doc_id"] == 1].sort_values("rank")
        # all tf=1 → alphabetical tie-break
        assert list(d1["token"]) == ["x", "y"]
        d2 = out[out["doc_id"] == 2]
        assert list(d2["token"]) == ["solo"] and list(d2["rank"]) == [1]


class TestWinnowOverlapPairs:
    @staticmethod
    def _brute_pairs(texts, k=5, w=4, min_shared=2, max_df=1000):
        from raydedup.functions.text import shingle_stream
        sel = TestWinnowFingerprints._brute_select
        fps = []
        for t in texts:
            h, _, _ = shingle_stream(pa.array([t], pa.string()), k)
            hs = h.tolist()
            fps.append({hs[i] for i in sel(hs, w)} if len(hs) >= w
                       else set())
        df = {}
        for s in fps:
            for f in s:
                df[f] = df.get(f, 0) + 1
        out = {}
        for a in range(len(texts)):
            for b in range(a + 1, len(texts)):
                shared = sum(1 for f in fps[a] & fps[b]
                             if df[f] <= max_df)
                if shared >= min_shared:
                    out[(a, b)] = shared
        return out

    def test_matches_brute(self, ray_session):
        from raydedup.stages.textstats import winnow_overlap_pairs
        rng = np.random.RandomState(7)
        vocab = [f"t{i}" for i in range(300)]
        texts = [" ".join(rng.choice(vocab, size=rng.randint(10, 60)))
                 for _ in range(80)]
        shared = " ".join(rng.choice(vocab, size=20))
        for i in range(0, 30, 3):         # planted partial overlaps
            texts[i] = texts[i] + " " + shared
        got = winnow_overlap_pairs(
            _docs_ds(texts), DEFAULT_CONFIG.with_(num_partitions=5),
            min_shared=2).to_pandas()
        want = self._brute_pairs(texts)
        assert {(a, b): s for a, b, s in zip(got["a"], got["b"],
                                             got["shared"])} == want
        assert len(want) >= 10

    def test_partial_overlap_beats_jaccard_tier(self, ray_session):
        """Two long docs sharing one 20-token run: whole-doc Jaccard
        is far below 0.8, but the winnow overlap flags the pair —
        the operator's whole point."""
        from raydedup.stages.textstats import winnow_overlap_pairs
        rng = np.random.RandomState(9)
        shared = " ".join(f"s{i}" for i in range(20))
        a = " ".join(f"a{i}" for i in range(200)) + " " + shared
        b = shared + " " + " ".join(f"b{i}" for i in range(200))
        got = winnow_overlap_pairs(
            _docs_ds([a, b]), DEFAULT_CONFIG, min_shared=1).to_pandas()
        assert set(zip(got["a"], got["b"])) == {(0, 1)}
        # and the exact-Jaccard tier would NOT pair them at τ=0.8
        inter, union = 20, 200 + 200 + 20
        assert inter / union < 0.8

    def test_max_df_cut(self, ray_session):
        """A fingerprint in every doc carries no evidence; pairs must
        come only from rarer shared runs."""
        from raydedup.stages.textstats import winnow_overlap_pairs
        boiler = " ".join(f"c{i}" for i in range(10))
        texts = [boiler + f" unique{i} filler{i} pad{i} more{i} x{i}"
                 for i in range(8)]
        got = winnow_overlap_pairs(_docs_ds(texts), DEFAULT_CONFIG,
                                   min_shared=1, max_df=3).to_pandas()
        want = self._brute_pairs(texts, min_shared=1, max_df=3)
        got_d = {} if len(got) == 0 else \
            {(a, b): s for a, b, s in zip(got["a"], got["b"],
                                          got["shared"])}
        assert got_d == want
        # the boilerplate really is cut: without the df gate the same
        # corpus pairs everything
        full = winnow_overlap_pairs(_docs_ds(texts), DEFAULT_CONFIG,
                                    min_shared=1).to_pandas()
        assert len(full) == 8 * 7 // 2

    def test_partition_invariance(self, ray_session):
        from raydedup.stages.textstats import winnow_overlap_pairs
        rng = np.random.RandomState(21)
        vocab = [f"v{i}" for i in range(100)]
        texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(60)]
        shared = " ".join(rng.choice(vocab, size=15))
        for i in range(0, 40, 4):
            texts[i] = texts[i] + " " + shared
        a = winnow_overlap_pairs(
            _docs_ds(texts), DEFAULT_CONFIG.with_(num_partitions=3),
            min_shared=1).to_pandas()
        b = winnow_overlap_pairs(
            _docs_ds(texts),
            DEFAULT_CONFIG.with_(num_partitions=11, batch_size=7),
            min_shared=1).to_pandas()
        assert sorted(zip(a["a"], a["b"], a["shared"])) == \
            sorted(zip(b["a"], b["b"], b["shared"]))

    def test_validation(self, ray_session):
        import pytest
        from raydedup.stages.textstats import winnow_overlap_pairs
        with pytest.raises(ValueError):
            winnow_overlap_pairs(_docs_ds(["a b"]), min_shared=0)


class TestWinnowCrosspairs:
    def test_matches_brute_cross(self, ray_session):
        import ray.data as rd

        from raydedup.stages.textstats import winnow_crosspairs
        rng = np.random.RandomState(31)
        vocab = [f"t{i}" for i in range(200)]
        left = [" ".join(rng.choice(vocab, size=rng.randint(12, 40)))
                for _ in range(40)]
        right = [" ".join(rng.choice(vocab, size=rng.randint(12, 40)))
                 for _ in range(40)]
        shared = " ".join(rng.choice(vocab, size=15))
        for j in range(0, 24, 3):          # planted cross overlaps
            right[j] = right[j] + " " + shared
            left[j] = shared + " " + left[j]

        def _ds(docs, ids):
            return rd.from_arrow(pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(docs, pa.string())})).repartition(3)

        got = winnow_crosspairs(_ds(left, range(40)),
                                _ds(right, range(40)), DEFAULT_CONFIG,
                                min_shared=1).to_pandas()
        # brute truth over the union (df over union, cross pairs only)
        union = list(left) + list(right)
        want_all = TestWinnowOverlapPairs._brute_pairs(
            union, min_shared=1)
        want = {}
        for (a, b), s in want_all.items():
            # union index < 40 = left id a; >= 40 = right id b-40
            if a < 40 <= b:
                want[(a, b - 40)] = s
        got_d = {} if len(got) == 0 else \
            {(a, b): s for a, b, s in zip(got["a"], got["b"],
                                          got["shared"])}
        assert got_d == want and len(want) >= 8

    def test_overlapping_id_spaces(self, ray_session):
        import ray.data as rd

        from raydedup.stages.textstats import winnow_crosspairs
        run = " ".join(f"s{i}" for i in range(12))
        lt = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                       "text": [run + " " + " ".join(f"l{i}" for i in range(10)),
                                " ".join(f"m{i}" for i in range(15))]})
        rt = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                       "text": [" ".join(f"q{i}" for i in range(15)),
                                " ".join(f"r{i}" for i in range(10)) + " " + run]})
        got = winnow_crosspairs(rd.from_arrow(lt), rd.from_arrow(rt),
                                DEFAULT_CONFIG, min_shared=1).to_pandas()
        assert set(zip(got["a"], got["b"])) == {(0, 1)}
