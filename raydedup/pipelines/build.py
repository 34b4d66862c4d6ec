"""End-to-end training-corpus build: the composed user journey.

    quality gate → decontamination (near-dup / exact / n-gram vs a
    reference set) → tiered dedup (exact → near-dup → substring-aware
    disposition) → deterministic named splits

Every stage is one of the engine's existing streaming operators wired
in production order — quality and decontamination are zero-shuffle
streaming filters, so running them FIRST shrinks what the (shuffling)
dedup tiers must move; the split tag is a pure per-row function applied
last so membership never depends on pipeline internals.  This mirrors
how the reference composes its stages (CSR build → ec_scan → pair
verify, jaccard.cpp:790-900): each consumes only the previous stage's
survivors.

Per-stage drop counts flow through the shared RunCounters actor;
``BuildResult.report()`` reads them once at the end (the reference's
always-printed sanity-metric pattern, jaccard.cpp:811-819).
"""

from __future__ import annotations

from typing import NamedTuple

from ..config import DEFAULT_CONFIG, PipelineConfig


class BuildResult(NamedTuple):
    """corpus: surviving docs (original columns, + ``split`` column when
    splits were requested); disposition: (doc_id, tier) from the dedup
    tiers; counters: the run's RunCounters (``.get()`` → stage drop
    counts)."""
    corpus: "ray.data.Dataset"
    disposition: "ray.data.Dataset"
    counters: "RunCounters"

    def report(self) -> dict:
        # via RunCounters.get() so in-flight fire-and-forget adds settle
        return self.counters.get()


def build_corpus(docs, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                 id_col: str = "doc_id", text_col: str = "text",
                 quality: dict | None = None,
                 reference=None, ngram_n: int | None = None,
                 threshold: float | None = ...,
                 line_min_docs: int | None = None,
                 splits: dict[str, float] | None = None,
                 split_seed: int = 0,
                 decontam_pack=None, ngram_pack=None) -> BuildResult:
    """Run the full corpus build.

    ``quality``: kwargs for stages/textstats.quality_filter (e.g.
    ``{"min_tokens": 20, "min_alpha_ratio": 0.8}``); None skips the
    gate.  ``reference``: eval/test documents — when given, corpus docs
    near-duplicating any reference doc are dropped (broadcast-pack
    decontamination), plus a GPT-3-style ``ngram_n``-gram guard when
    ``ngram_n`` is set.  ``threshold``/``line_min_docs`` pass through
    to tiered_dedup.  ``splits``: named weights for a deterministic
    per-id split column (stages/sampling.corpus_split).
    ``decontam_pack``/``ngram_pack``: prebuilt ``build_reference_pack``
    / ``build_ngram_pack`` results — a recurring build against a fixed
    eval suite signs the reference once and reuses the packs every run
    (``reference`` may then be None).
    """
    from ..functions.text import TOKEN_CACHE_COL
    from ..state import RunCounters
    from .tiered import tiered_dedup

    rc = RunCounters()
    cur = docs

    if ngram_n is not None and reference is None and ngram_pack is None:
        raise ValueError("ngram_n was set but there is no reference to "
                         "build the gram pack from and no prebuilt "
                         "ngram_pack — pass one of them")
    run_decontam = reference is not None or decontam_pack is not None
    run_ngram = (reference is not None or ngram_pack is not None) and (
        ngram_n is not None or ngram_pack is not None)
    # tokenize-once prefix: the FIRST tokenizing stage attaches the
    # token-hash cache column whenever another tokenizing stage follows
    # in the zero-shuffle chain; the column is dropped before the
    # materialize boundary so it never reaches the object store
    n_tok_stages = int(bool(quality)) + int(run_decontam) + int(run_ngram)
    carry = n_tok_stages >= 2

    if quality:
        from ..stages.textstats import quality_filter
        cur = quality_filter(cur, text_col=text_col, counters=rc.actor,
                             carry_tokens=carry, **quality)

    if run_decontam:
        from ..stages.decontam import decontaminate
        cur = decontaminate(cur, reference, cfg, id_col=id_col,
                            text_col=text_col, counters=rc.actor,
                            pack=decontam_pack,
                            carry_tokens=carry and run_ngram)
    if run_ngram:
        # n-mismatch between ngram_n and a prebuilt pack raises
        # inside decontaminate_ngram (the pack carries its n)
        from ..stages.decontam import decontaminate_ngram
        cur = decontaminate_ngram(cur, reference, cfg, n=ngram_n,
                                  id_col=id_col, text_col=text_col,
                                  counters=rc.actor, pack=ngram_pack)

    if carry:
        cur = cur.map_batches(
            lambda t: (t.drop_columns([TOKEN_CACHE_COL])
                       if TOKEN_CACHE_COL in t.column_names else t),
            batch_format="pyarrow", zero_copy_batch=True)

    if cur is not docs:
        # pin the zero-shuffle prefix ONCE: besides tier 0's double
        # consumption, even schema() probes downstream (tiered's
        # base_schema read) partially re-execute a lazy prefix and
        # re-fire the drop counters (measured: quality_dropped tripled
        # on a 1-block corpus when this materialize was dropped) — the
        # copy is the price of exact counters.  This is the same
        # stage-checkpoint materialization tiered applies to its own
        # tagged stream (spillable; at 10^12 docs it becomes the
        # parquet checkpoint pipelines/checkpoint.py writes).
        cur = cur.materialize()

    tiered = tiered_dedup(cur, cfg, id_col=id_col, text_col=text_col,
                          threshold=threshold, counters=rc.actor,
                          line_min_docs=line_min_docs)
    corpus = tiered.corpus

    if splits:
        from ..stages.sampling import corpus_split
        corpus = corpus_split(corpus, splits, id_col=id_col,
                              seed=split_seed)

    return BuildResult(corpus=corpus, disposition=tiered.disposition,
                       counters=rc)
