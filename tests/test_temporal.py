"""Temporal operators (stages/temporal.py), top-k vocabulary
(stages/vocab.py), and quality-aware canonical selection
(pipelines/neardup.near_dup_canonical) — crafted fixtures with
hand-computed expectations plus DuckDB cross-checks, and the over-gate
(partitioned) canonical path forced via the broadcast constant."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raydedup.config import PipelineConfig

CFG = PipelineConfig(num_partitions=4)


def _ds(table: pa.Table):
    import ray.data as rd
    return rd.from_arrow(table)


def _ts(*minutes):
    return pa.array(np.array(minutes, dtype="int64") * 60_000_000,
                    pa.timestamp("us"))


class TestAsofJoin:
    def test_hand_checked(self, ray_session):
        from raydedup.stages.temporal import asof_join
        # user 1: rights at t=10 (v=100) and t=30 (v=300)
        # user 2: right at t=50 (v=500); user 3: no rights
        left = _ds(pa.table({
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "ts": _ts(5, 10, 31, 49, 50, 7),
        }))
        right = _ds(pa.table({
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "ts": _ts(10, 30, 50),
            "v": pa.array([100, 300, 500], pa.int64()),
        }))
        out = asof_join(left, right, CFG, value_col="v", out_col="v") \
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        # t=5: before any right -> null; t=10: inclusive match -> 100
        # t=31 -> 300; t=49 -> null; t=50 inclusive -> 500; user 3 -> null
        assert out["v"].astype("Int64").tolist() == \
            [pd.NA, 100, 300, pd.NA, 500, pd.NA]
        assert out["user_id"].tolist() == [1, 1, 1, 2, 2, 3]

    def test_tie_rule_max_value_wins(self, ray_session):
        """Several right rows at the SAME (key, ts): the operator's
        documented tie rule picks the max value, deterministically,
        regardless of arrival order."""
        from raydedup.stages.temporal import asof_join
        left = _ds(pa.table({
            "event_id": pa.array([1, 2], pa.int64()),
            "user_id": pa.array([1, 1], pa.int64()),
            "ts": _ts(10, 20),
        }))
        # ties arrive max-first AND max-last to rule out order luck
        right = _ds(pa.table({
            "user_id": pa.array([1, 1, 1, 1, 1, 1], pa.int64()),
            "ts": _ts(10, 10, 10, 20, 20, 20),
            "v": pa.array([900, 100, 500, 300, 700, 200], pa.int64()),
        }))
        out = asof_join(left, right, CFG, value_col="v", out_col="v") \
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        assert out["v"].tolist() == [900, 700]

    def test_matches_duckdb_asof(self, ray_session):
        from raydedup.stages.temporal import asof_join
        rng = np.random.default_rng(7)
        n_l, n_r = 500, 300
        lt = pa.table({
            "event_id": pa.array(np.arange(n_l, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 20, n_l), pa.int64()),
            "ts": pa.array(rng.integers(0, 10**9, n_l), pa.timestamp("us")),
        })
        # unique (user, ts) right side (the documented ambiguity contract)
        ru = rng.integers(0, 20, n_r)
        rts = rng.choice(10**9, size=n_r, replace=False)
        rt = pa.table({
            "user_id": pa.array(ru, pa.int64()),
            "ts": pa.array(rts.astype(np.int64), pa.timestamp("us")),
            "v": pa.array(rng.integers(0, 10**6, n_r), pa.int64()),
        })
        out = asof_join(_ds(lt), _ds(rt), CFG, value_col="v",
                        out_col="v").to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("l", lt.to_pandas())
        con.register("r", rt.to_pandas())
        gold = con.sql("""
            SELECT l.event_id, r.v
            FROM l ASOF LEFT JOIN r
            ON l.user_id = r.user_id AND l.ts >= r.ts
            ORDER BY event_id""").df()
        assert (out["v"].astype("Int64").fillna(-1).to_numpy()
                == gold["v"].astype("Int64").fillna(-1).to_numpy()).all()


class TestWindowedAgg:
    def test_hand_checked(self, ray_session):
        from raydedup.stages.temporal import windowed_agg
        # user 1 events at minutes 0, 30, 60, 121; window = 60 min closed
        ev = _ds(pa.table({
            "event_id": pa.array([0, 1, 2, 3], pa.int64()),
            "user_id": pa.array([1, 1, 1, 1], pa.int64()),
            "ts": _ts(0, 30, 60, 121),
            "cents": pa.array([10, 20, 40, 80], pa.int64()),
        }))
        out = windowed_agg(ev, CFG, cents_col="cents", window_minutes=60) \
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        # t=60 includes t=0 (closed interval); t=121 includes only itself
        assert out["n_window"].tolist() == [1, 2, 3, 1]
        assert out["sum_cents_window"].tolist() == [10, 30, 70, 80]

    def test_matches_duckdb_range_window(self, ray_session):
        from raydedup.stages.temporal import windowed_agg
        rng = np.random.default_rng(11)
        n = 2000
        ev = pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 25, n), pa.int64()),
            "ts": pa.array(rng.integers(0, 10**10, n), pa.timestamp("us")),
            "cents": pa.array(rng.integers(-500, 500, n), pa.int64()),
        })
        out = windowed_agg(_ds(ev), CFG, cents_col="cents",
                           window_minutes=17).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("ev", ev.to_pandas())
        gold = con.sql("""
            SELECT event_id, count(*) OVER w AS n_window,
                   sum(cents) OVER w AS sum_cents_window
            FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 17 MINUTE PRECEDING AND CURRENT ROW)
            ORDER BY event_id""").df()
        assert (out["n_window"].to_numpy()
                == gold["n_window"].to_numpy()).all()
        assert (out["sum_cents_window"].to_numpy()
                == gold["sum_cents_window"].astype(np.int64).to_numpy()).all()

    def test_segment_fallback_agrees(self, ray_session):
        # force the per-segment loop by monkeypatch-free construction is
        # impossible (int64 span), so call the kernel paths directly
        from raydedup.stages import temporal as tp
        rng = np.random.default_rng(3)
        keys = np.sort(rng.integers(0, 8, 200))
        ts = rng.integers(0, 10**7, 200)
        order = np.lexsort((ts, keys))
        keys, ts = keys[order], ts[order]
        w = np.int64(1000)
        rank = tp._key_ranks(keys)
        ts_rel = ts - ts.min()
        span = np.int64(ts_rel.max()) + 1
        band = rank.astype(np.int64) * span
        c = band + ts_rel
        lo_f = np.searchsorted(c, band + np.maximum(ts_rel - w, 0), "left")
        hi_f = np.searchsorted(c, c, "right")
        seg_starts = np.flatnonzero(np.concatenate(
            ([True], keys[1:] != keys[:-1])))
        seg_ends = np.append(seg_starts[1:], len(keys))
        lo_s = np.empty(len(keys), np.int64)
        hi_s = np.empty(len(keys), np.int64)
        for a, b in zip(seg_starts, seg_ends):
            seg = ts[a:b]
            lo_s[a:b] = a + np.searchsorted(seg, seg - w, side="left")
            hi_s[a:b] = a + np.searchsorted(seg, seg, side="right")
        assert (lo_f == lo_s).all() and (hi_f == hi_s).all()


class TestTopKVocab:
    def test_counts_and_tiebreak(self, ray_session):
        from raydedup.stages.vocab import top_k_vocab
        docs = _ds(pa.table({"text": pa.array(
            ["a b b  c", "b c a", "c"], pa.string())}))
        out = top_k_vocab(docs, CFG, k=2).to_pandas()
        # counts: a=2 b=3 c=3; double space makes an empty token (dropped)
        assert list(out["token"]) == ["b", "c"]
        assert list(out["n"]) == [3, 3]

    def test_matches_duckdb(self, ray_session):
        from raydedup.stages.vocab import top_k_vocab
        rng = np.random.default_rng(5)
        words = [f"w{i}" for i in range(50)]
        texts = [" ".join(rng.choice(words, size=rng.integers(3, 30)))
                 for _ in range(300)]
        tab = pa.table({"text": pa.array(texts, pa.string())})
        out = top_k_vocab(_ds(tab), CFG, k=10).to_pandas()
        con = duckdb.connect()
        con.register("d", tab.to_pandas())
        gold = con.sql("""
            SELECT token, count(*)::BIGINT AS n FROM (
              SELECT unnest(string_split(text, ' ')) AS token FROM d)
            WHERE token <> '' GROUP BY token
            ORDER BY n DESC, token ASC LIMIT 10""").df()
        assert list(out["token"]) == list(gold["token"])
        assert list(out["n"]) == list(gold["n"])


class TestTokenDocFreq:
    def test_distinct_doc_counting(self, ray_session):
        from raydedup.stages.vocab import token_doc_freq
        docs = _ds(pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            # "a" appears twice in doc0 but df counts docs, not tokens
            "text": pa.array(["a a b", "a c", "c"], pa.string()),
        }))
        out = token_doc_freq(docs, CFG).to_pandas() \
            .sort_values("token").reset_index(drop=True)
        assert dict(zip(out["token"], out["df"])) == {"a": 2, "b": 1, "c": 2}

    def test_matches_duckdb(self, ray_session):
        from raydedup.stages.vocab import token_doc_freq
        rng = np.random.default_rng(17)
        words = [f"w{i}" for i in range(40)]
        tab = pa.table({
            "doc_id": pa.array(np.arange(200, dtype=np.int64)),
            "text": pa.array([" ".join(rng.choice(words,
                                                  size=rng.integers(2, 25)))
                              for _ in range(200)], pa.string()),
        })
        out = token_doc_freq(_ds(tab), CFG, min_df=2).to_pandas() \
            .sort_values("token").reset_index(drop=True)
        con = duckdb.connect()
        con.register("d", tab.to_pandas())
        gold = con.sql("""
            SELECT token, count(DISTINCT doc_id)::BIGINT AS df FROM (
              SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM d)
            WHERE token <> '' GROUP BY token HAVING count(DISTINCT doc_id) >= 2
            ORDER BY token""").df()
        assert list(out["token"]) == list(gold["token"])
        assert list(out["df"]) == list(gold["df"])


class TestNearDupCanonical:
    def _corpus(self):
        base = " ".join(f"tok{i}" for i in range(60))
        longer = base + " extra1 extra2"
        # docs 0,1,2 are a near-dup cluster; 2 is the longest
        texts = [base, base + " extra1", longer, "unrelated " * 30,
                 "also unrelated entirely " * 20]
        return pa.table({
            "doc_id": pa.array(np.arange(5, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        })

    def test_keeps_longest_member(self, ray_session):
        from raydedup.pipelines.neardup import near_dup_canonical
        out = near_dup_canonical(_ds(self._corpus()), CFG,
                                 quality_col="n_chars").to_pandas()
        assert sorted(out["doc_id"]) == [2, 3, 4]

    def test_partitioned_path_agrees(self, ray_session, monkeypatch):
        from raydedup.pipelines import neardup as nd
        monkeypatch.setattr(nd, "NEAR_DEDUP_BROADCAST_MAX_DROPS", 0)
        out = nd.near_dup_canonical(_ds(self._corpus()), CFG,
                                    quality_col="n_chars").to_pandas()
        assert sorted(out["doc_id"]) == [2, 3, 4]


class TestFunnel:
    def _ev(self, rows):
        import pyarrow as pa
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        })).repartition(2)

    def test_ordered_and_unordered_users(self, ray_session):
        from raydedup.config import DEFAULT_CONFIG
        from raydedup.stages.sessions import funnel
        CFG = DEFAULT_CONFIG.with_(num_partitions=4)
        rows = [
            # user 1: complete in-order funnel
            (1, 100, "view"), (1, 200, "click"), (1, 300, "purchase"),
            # user 2: purchase BEFORE click → not a funnel completion
            (2, 100, "view"), (2, 300, "click"), (2, 200, "purchase"),
            # user 3: missing click
            (3, 100, "view"), (3, 300, "purchase"),
            # user 4: extra noise events + earliest-valid selection
            (4, 50, "view"), (4, 60, "view"), (4, 70, "click"),
            (4, 80, "click"), (4, 90, "purchase"),
            # user 5: click at SAME ts as view → strict > rejects it
            (5, 100, "view"), (5, 100, "click"), (5, 200, "purchase"),
        ]
        out = funnel(self._ev(rows), ("view", "click", "purchase"),
                     CFG).to_pandas().set_index("user_id")
        assert sorted(out.index) == [1, 4]
        u4 = out.loc[4]
        assert (u4["view_ts"].value, u4["click_ts"].value,
                u4["purchase_ts"].value) == (50_000, 70_000, 90_000)
        # pandas .value is ns; ours are us inputs → x*1000 ns


class TestTfidfKeywords:
    def test_hand_checked(self, ray_session):
        from raydedup.stages.vocab import tfidf_keywords
        # df: the=3, cat=2, dog=1, sat=2, ran=1
        docs = _ds(pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["the cat sat", "the cat ran",
                              "the dog sat"], pa.string()),
        }))
        out = tfidf_keywords(docs, CFG, k=1, min_df=1).to_pandas() \
            .set_index("doc_id")
        # doc0 scores: the 1/3, cat 1/2, sat 1/2 -> cat (token asc tie)
        assert out.loc[0, "token"] == "cat"
        # doc2: dog 1/1 beats sat 1/2 and the 1/3
        assert out.loc[2, "token"] == "dog"
        assert out.loc[2, "df"] == 1 and out.loc[2, "tf"] == 1

    def test_min_df_excludes_rare(self, ray_session):
        from raydedup.stages.vocab import tfidf_keywords
        docs = _ds(pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["unique common", "common"], pa.string()),
        }))
        out = tfidf_keywords(docs, CFG, k=5, min_df=2).to_pandas()
        assert set(out["token"]) == {"common"}

    def test_matches_duckdb(self, ray_session):
        from raydedup.stages.vocab import tfidf_keywords
        rng = np.random.default_rng(23)
        words = [f"w{i}" for i in range(30)]
        tab = pa.table({
            "doc_id": pa.array(np.arange(150, dtype=np.int64)),
            "text": pa.array([" ".join(rng.choice(words,
                                                  size=rng.integers(2, 20)))
                              for _ in range(150)], pa.string()),
        })
        out = tfidf_keywords(_ds(tab), CFG, k=3, min_df=2).to_pandas() \
            .sort_values(["doc_id", "rank"]).reset_index(drop=True)
        con = duckdb.connect()
        con.register("d", tab.to_pandas())
        gold = con.sql("""
            WITH tk AS (SELECT doc_id,
                               unnest(string_split(text, ' ')) AS token
                        FROM d),
            tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf
                   FROM tk GROUP BY 1, 2),
            df AS (SELECT token, count(DISTINCT doc_id)::BIGINT AS df
                   FROM tk GROUP BY 1),
            r AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
                         row_number() OVER (
                             PARTITION BY tf.doc_id
                             ORDER BY tf.tf * 1.0 / df.df DESC,
                                      tf.token) AS rank
                  FROM tf JOIN df USING (token) WHERE df.df >= 2)
            SELECT doc_id, token, tf, df, rank FROM r WHERE rank <= 3
            ORDER BY doc_id, rank""").df()
        assert len(out) == len(gold)
        assert (out["token"].values == gold["token"].values).all()
        assert (out["df"].values == gold["df"].values).all()


class TestUserGapStats:
    def test_hand_checked(self, ray_session):
        from raydedup.stages.sessions import user_gap_stats
        ev = _ds(pa.table({
            "user_id": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
            # user1 gaps: 10min, 45min; user2: none; user3: 0min (tie)
            "ts": _ts(0, 10, 55, 7, 3, 3),
        }))
        out = user_gap_stats(ev, CFG, long_gap_minutes=30).to_pandas() \
            .set_index("user_id")
        assert out.loc[1, "n_events"] == 3
        assert out.loc[1, "max_gap_us"] == 45 * 60_000_000
        assert out.loc[1, "n_long_gaps"] == 1
        assert out.loc[2, "n_events"] == 1
        assert out.loc[2, "max_gap_us"] == 0
        assert out.loc[3, "max_gap_us"] == 0
        assert out.loc[3, "n_long_gaps"] == 0

    def test_matches_duckdb(self, ray_session):
        from raydedup.stages.sessions import user_gap_stats
        rng = np.random.default_rng(31)
        n = 400
        tab = pa.table({
            "user_id": pa.array(rng.integers(0, 25, n), pa.int64()),
            "ts": pa.array(rng.integers(0, 10**7, n) * 1_000_000,
                           pa.timestamp("us")),
        })
        out = user_gap_stats(_ds(tab), CFG, long_gap_minutes=30) \
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("e", tab.to_pandas())
        gold = con.sql("""
            WITH g AS (SELECT user_id,
                              epoch_us(ts) - lag(epoch_us(ts)) OVER (
                                  PARTITION BY user_id
                                  ORDER BY epoch_us(ts)) AS gap
                       FROM e)
            SELECT user_id, count(*)::BIGINT AS n_events,
                   coalesce(max(gap), 0)::BIGINT AS max_gap_us,
                   coalesce(sum(CASE WHEN gap > 1800000000 THEN 1 END),
                            0)::BIGINT AS n_long_gaps
            FROM g GROUP BY user_id ORDER BY user_id""").df()
        assert (out["n_events"].values == gold["n_events"].values).all()
        assert (out["max_gap_us"].values == gold["max_gap_us"].values).all()
        assert (out["n_long_gaps"].values
                == gold["n_long_gaps"].values).all()
