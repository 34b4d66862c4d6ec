"""CLI: the reference's tool surface (jaccardSYCL / fileConvert /
readCSRHeader, SURVEY.md §3) as subcommands.

    python -m raydedup inspect  <file.parquet>
    python -m raydedup convert  <in.{mtx,parquet}> <out.{mtx,parquet}>
                                 [--keep-reverse-edges] [--drop-weights]
    python -m raydedup jaccard  <edges.{mtx,parquet}> <out.parquet>
                                 [--weighted]
    python -m raydedup neardup  <docs.parquet> <out_dir>
                                 [--ckpt DIR] [--threshold T] [--k K]
    python -m raydedup tiered   <docs.parquet> <out_dir> [--threshold T]
    python -m raydedup decontam <docs.parquet> <reference.parquet> <out_dir>
                                 [--threshold T] [--exact]

CLI entry points own the Ray session (guarded init); library code never
calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def cmd_inspect(args):
    from .sources.mtx import inspect_parquet, read_csr_header
    if args.path.endswith(".csr"):
        # readCSRHeader parity (readCSRHeader.cpp:28-53)
        print(json.dumps(read_csr_header(args.path), indent=1,
                         sort_keys=True))
        return
    print(json.dumps(inspect_parquet(args.path), indent=1, sort_keys=True))


def cmd_convert(args):
    _ray_session()
    from .sources.mtx import convert
    convert(args.input, args.output,
            keep_reverse_edges=args.keep_reverse_edges,
            drop_weights=args.drop_weights)
    print(f"wrote {args.output}")


def cmd_jaccard(args):
    _ray_session()
    import ray.data as rd
    from .config import DEFAULT_CONFIG
    from .sources.mtx import read_mtx
    from .stages.graph import edge_jaccard

    cfg = DEFAULT_CONFIG
    if args.input.endswith(".mtx"):
        edges, _ = read_mtx(args.input)
    else:
        edges = rd.read_parquet(args.input)
    if getattr(args, "stat", "jaccard") == "triangles":
        from .stages.graph import triangle_counts
        out = triangle_counts(edges, cfg)
    elif getattr(args, "stat", "jaccard") == "similarity":
        from .stages.graph import edge_similarity
        out = edge_similarity(edges, cfg)
    else:
        out = edge_jaccard(edges, cfg)
    out.write_parquet(args.output)
    print(f"wrote {args.output}")


def cmd_neardup(args):
    _ray_session()
    import ray.data as rd
    from .config import DEFAULT_CONFIG
    from .pipelines.checkpoint import near_dup_pipeline_checkpointed
    from .pipelines.neardup import near_dup_clusters

    overrides = {}
    if args.k is not None:
        overrides["k_shingle"] = args.k
    if args.threshold is not None:
        overrides["verify_threshold"] = args.threshold
    if getattr(args, "auto_bands", False):
        # retune the LSH S-curve to the verify threshold (the explicit
        # --threshold, else the config default — previously the retune
        # was silently skipped without --threshold, ADVICE r4) so the
        # candidate stage's recall/precision follows the verify bar
        from .functions.lsh_tuning import choose_bands
        tau = args.threshold if args.threshold is not None \
            else DEFAULT_CONFIG.verify_threshold
        if args.threshold is None:
            print(f"auto bands: no --threshold given; tuning to the "
                  f"config default tau={tau}")
        b, r = choose_bands(tau, DEFAULT_CONFIG.num_perms)
        overrides["bands"], overrides["rows_per_band"] = b, r
        print(f"auto bands: {b}x{r} for tau={tau}")
    cfg = DEFAULT_CONFIG.with_(**overrides)
    docs = rd.read_parquet(args.input)
    if args.ckpt:
        labels, mgr = near_dup_pipeline_checkpointed(docs, cfg, args.ckpt)
        for stage, what in mgr.events:
            print(f"  stage {stage}: {what}")
    else:
        labels = near_dup_clusters(docs, cfg)
    labels.write_parquet(args.output)
    print(f"wrote {args.output}")


def cmd_allpairs(args):
    _ray_session()
    import ray.data as rd
    from .config import DEFAULT_CONFIG
    from .stages.allpairs import allpairs_jaccard, crosspairs_jaccard

    cfg = DEFAULT_CONFIG.with_(**({"verify_threshold": args.threshold}
                                  if args.threshold is not None else {}))
    docs = rd.read_parquet(args.input)
    if args.right:
        right = rd.read_parquet(args.right)
        pairs = crosspairs_jaccard(docs, right, cfg,
                                   threshold=cfg.verify_threshold,
                                   order=args.order,
                                   max_bucket=args.max_bucket)
    else:
        pairs = allpairs_jaccard(docs, cfg,
                                 threshold=cfg.verify_threshold,
                                 order=args.order,
                                 max_bucket=args.max_bucket)
    pairs.write_parquet(args.output)
    print(f"wrote {args.output}")


def cmd_search(args):
    _ray_session()
    import ray.data as rd
    from .config import DEFAULT_CONFIG
    from .stages.search import bm25_topk

    docs = rd.read_parquet(args.input, columns=["doc_id", "text"])
    top = bm25_topk(docs, args.terms.split(","), DEFAULT_CONFIG,
                    k=args.k).to_pandas()
    print(top.to_string(index=False))


def cmd_tiered(args):
    _ray_session()
    import ray.data as rd
    from .config import DEFAULT_CONFIG
    from .pipelines.tiered import tiered_dedup

    cfg = DEFAULT_CONFIG.with_(
        **({"verify_threshold": args.threshold}
           if args.threshold is not None else {}),
    )
    docs = rd.read_parquet(args.input)
    res = tiered_dedup(docs, cfg, line_min_docs=args.line_min_docs)
    res.corpus.write_parquet(f"{args.output}/corpus")
    res.disposition.write_parquet(f"{args.output}/disposition")
    counts = res.disposition.to_pandas()["tier"].value_counts().to_dict()
    print(json.dumps({"tiers": counts, "out": args.output}, sort_keys=True))


def cmd_decontam(args):
    _ray_session()
    import ray.data as rd
    from .config import DEFAULT_CONFIG
    from .stages.decontam import (build_reference_pack, decontaminate,
                                  decontaminate_exact,
                                  decontamination_matches)

    cfg = DEFAULT_CONFIG.with_(
        **({"verify_threshold": args.threshold}
           if args.threshold is not None else {}),
    )
    corpus = rd.read_parquet(args.input)
    reference = rd.read_parquet(args.reference)
    # sign + collect the reference exactly once; both the corpus filter
    # and the audit-trail matches reuse the same broadcast pack
    pack = build_reference_pack(reference, cfg)
    matches = decontamination_matches(corpus, None, cfg, pack=pack)
    matches.write_parquet(f"{args.output}/matches")
    clean = decontaminate(corpus, None, cfg, pack=pack)
    if args.exact:
        clean = decontaminate_exact(clean, reference, cfg)
    ngram = getattr(args, "ngram", None)
    if ngram:
        from .stages.decontam import decontaminate_ngram
        clean = decontaminate_ngram(clean, reference, cfg, n=ngram)
    clean.write_parquet(f"{args.output}/corpus")
    # count from the written files — never re-execute the match pipeline
    n_match = rd.read_parquet(f"{args.output}/matches").count()
    print(json.dumps({"matches": n_match, "out": args.output},
                     sort_keys=True))


def cmd_build(args):
    _ray_session()
    import ray.data as rd
    from .config import DEFAULT_CONFIG
    from .pipelines.build import build_corpus

    cfg = DEFAULT_CONFIG.with_(
        **({"verify_threshold": args.threshold}
           if args.threshold is not None else {}),
    )
    quality = {}
    if args.min_tokens is not None:
        quality["min_tokens"] = args.min_tokens
    if args.min_alpha is not None:
        quality["min_alpha_ratio"] = args.min_alpha
    if args.max_dup_frac_e6 is not None:
        quality["max_dup_word_frac_e6"] = args.max_dup_frac_e6
    if getattr(args, "gopher", False):
        quality["gopher_gate"] = True
    splits = None
    if args.splits:
        splits = {}
        for part in args.splits.split(","):
            name, w = part.split("=")
            splits[name.strip()] = float(w)
    docs = rd.read_parquet(args.input)
    reference = rd.read_parquet(args.reference) if args.reference else None
    res = build_corpus(docs, cfg, quality=quality or None,
                       reference=reference, ngram_n=args.ngram,
                       line_min_docs=args.line_min_docs, splits=splits)
    if splits:
        # ONE streaming pass: hive-partitioned by the split column
        # (corpus/split=train/...), never one re-execution per split
        res.corpus.write_parquet(f"{args.output}/corpus",
                                 partition_cols=["split"])
    else:
        res.corpus.write_parquet(f"{args.output}/corpus")
    res.disposition.write_parquet(f"{args.output}/disposition")
    report = res.report()
    with open(f"{args.output}/report.json", "w") as f:
        json.dump(report, f, sort_keys=True)
    print(json.dumps({"report": report, "out": args.output}, sort_keys=True))


def cmd_split(args):
    _ray_session()
    import ray.data as rd
    from .stages.sampling import corpus_split

    weights = {}
    for part in args.weights.split(","):
        name, w = part.split("=")
        weights[name.strip()] = float(w)
    corpus = rd.read_parquet(args.input)
    # ONE streaming pass: annotate every row with its split and write
    # hive-partitioned (out/split=train/...), the same plan cmd_build
    # uses — never one full input re-read + re-hash per split name
    tagged = corpus_split(corpus, weights, seed=args.seed)
    tagged.write_parquet(args.output, partition_cols=["split"])
    import os as _os
    # a split that received zero rows writes no hive directory — count 0
    counts = {name: (rd.read_parquet(f"{args.output}/split={name}").count()
                     if _os.path.isdir(f"{args.output}/split={name}") else 0)
              for name in weights}
    print(json.dumps({"splits": counts, "out": args.output}, sort_keys=True))


def cmd_chunk(args):
    _ray_session()
    import ray.data as rd
    from .stages.chunking import chunk_documents

    docs = rd.read_parquet(args.input)
    chunks = chunk_documents(docs, chunk_tokens=args.chunk_tokens,
                             stride=args.stride, id_col=args.id_col,
                             text_col=args.text_col)
    chunks.write_parquet(args.output)
    n = rd.read_parquet(args.output).count()
    print(json.dumps({"chunks": n, "chunk_tokens": args.chunk_tokens,
                      "stride": args.stride, "out": args.output},
                     sort_keys=True))


def cmd_bandstore(args):
    _ray_session()
    import ray.data as rd
    from .config import DEFAULT_CONFIG
    from .stages.incremental import corpus_band_table, corpus_hash_table

    docs = rd.read_parquet(args.input)
    bands = corpus_band_table(docs, DEFAULT_CONFIG).materialize()
    bands.write_parquet(f"{args.output}/bands")
    hashes = corpus_hash_table(docs, DEFAULT_CONFIG).materialize()
    hashes.write_parquet(f"{args.output}/hashes")
    from .stages.incremental import build_band_bloom, build_hash_bloom
    build_hash_bloom(None, DEFAULT_CONFIG,
                     corpus_hashes=hashes).write_parquet(
        f"{args.output}/bloom")
    # band-key Bloom: lets each increment prune the corpus band store
    # BEFORE the exchange (lsh.incremental_candidate_pairs)
    build_band_bloom(bands, DEFAULT_CONFIG).write_parquet(
        f"{args.output}/band_bloom")
    n_bands = rd.read_parquet(f"{args.output}/bands").count()
    n_hashes = rd.read_parquet(f"{args.output}/hashes").count()
    n_bloom = rd.read_parquet(f"{args.output}/bloom").count()
    n_bbloom = rd.read_parquet(f"{args.output}/band_bloom").count()
    print(json.dumps({"bands": n_bands, "hashes": n_hashes,
                      "bloom_filters": n_bloom,
                      "band_bloom_filters": n_bbloom,
                      "out": args.output}, sort_keys=True))


def cmd_incremental(args):
    _ray_session()
    import ray.data as rd
    from .config import DEFAULT_CONFIG
    from .stages.incremental import (incremental_exact_dedup,
                                     incremental_near_dup)

    cfg = DEFAULT_CONFIG.with_(
        **({"verify_threshold": args.threshold}
           if args.threshold is not None else {}),
    )
    inc = rd.read_parquet(args.increment)
    corpus = rd.read_parquet(args.corpus)
    bands = hashes = bloom = band_bloom = None
    if args.store:
        import os as _os
        bands = rd.read_parquet(f"{args.store}/bands")
        hashes = rd.read_parquet(f"{args.store}/hashes")
        if _os.path.isdir(f"{args.store}/bloom"):
            bloom = rd.read_parquet(f"{args.store}/bloom")
        if _os.path.isdir(f"{args.store}/band_bloom"):
            band_bloom = rd.read_parquet(f"{args.store}/band_bloom")
    # tier 1: exact vs corpus (prebuilt hash store skips corpus re-hash;
    # a persisted bloom store collapses the corpus-side exchange to a
    # membership probe + zero-shuffle confirm scan)
    if bloom is not None:
        from .stages.incremental import incremental_exact_dedup_bloom
        kept = incremental_exact_dedup_bloom(
            inc, corpus, cfg, corpus_bloom=bloom,
            corpus_hashes=hashes).materialize()
    else:
        kept = incremental_exact_dedup(inc, corpus, cfg,
                                       corpus_hashes=hashes).materialize()
    if not args.exact_only:
        # one band exchange serves both outputs
        kept, matches = incremental_near_dup(kept, corpus, cfg,
                                             corpus_bands=bands,
                                             corpus_band_bloom=band_bloom,
                                             with_matches=True)
        matches.write_parquet(f"{args.output}/matches")
    kept.write_parquet(f"{args.output}/kept")
    import os as _os
    # an all-duplicate increment writes zero files — count 0, not a crash
    n_kept = (rd.read_parquet(f"{args.output}/kept").count()
              if _os.path.isdir(f"{args.output}/kept") else 0)
    print(json.dumps({"kept": n_kept, "out": args.output}, sort_keys=True))


def cmd_report(args):
    _ray_session()
    import ray.data as rd
    from .stages.textstats import corpus_report

    row = corpus_report(rd.read_parquet(args.input)).to_pandas() \
        .iloc[0].to_dict()
    row = {k: (float(v) if k == "mean_tokens" else int(v))
           for k, v in row.items()}
    print(json.dumps(row, sort_keys=True))


def cmd_graph(args):
    """PageRank / personalized PageRank / BFS / k-core / HITS over an
    edge-list parquet (src:int64, dst:int64[, w:int64])."""
    _ray_session()
    import ray.data as rd
    from .config import DEFAULT_CONFIG

    cfg = DEFAULT_CONFIG
    edges = rd.read_parquet(args.input)
    seeds = ([int(x) for x in args.seeds.split(",")]
             if args.seeds else None)
    if args.algo == "pagerank":
        from .stages.pagerank import pagerank
        out = pagerank(edges, cfg, n_iter=args.iters,
                       weight_col=("w" if args.weighted else None),
                       personalization=seeds)
    elif args.algo == "bfs":
        if not seeds:
            raise SystemExit("bfs needs --seeds id,id,...")
        from .stages.bfs import bfs_distances
        out = bfs_distances(edges, seeds, cfg, max_hops=args.iters)
    elif args.algo == "kcore":
        from .stages.kcore import k_core
        out = k_core(edges, cfg, args.k)
    else:  # hits
        from .stages.hits import hits
        out = hits(edges, cfg, n_iter=args.iters)
    out.write_parquet(args.output)
    print(f"wrote {args.output}")


def cmd_compare(args):
    _ray_session()
    import ray.data as rd
    from .pipelines.compare import compare_scores
    gold = rd.read_parquet(args.gold)
    test = rd.read_parquet(args.test)
    rep = compare_scores(gold, test, tol=args.tol, value_col=args.value_col)
    print(json.dumps(rep, indent=1, sort_keys=True))
    # exit code = warning count, as compareCoords.cpp:319 (capped for shells)
    sys.exit(min(rep["warnings"], 125))


def main(argv=None):
    p = argparse.ArgumentParser(prog="raydedup")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("inspect", help="print parquet schema + header metadata")
    s.add_argument("path")
    s.set_defaults(fn=cmd_inspect)

    s = sub.add_parser("convert", help="convert between mtx and parquet")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--keep-reverse-edges", action="store_true")
    s.add_argument("--drop-weights", action="store_true")
    s.set_defaults(fn=cmd_convert)

    s = sub.add_parser("jaccard", help="edge-connected Jaccard over a graph")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--stat", choices=["jaccard", "similarity", "triangles"],
                   default="jaccard",
                   help="similarity = overlap/Sørensen/cosine per edge; "
                        "triangles = per-vertex counts + clustering coeff")
    s.set_defaults(fn=cmd_jaccard)

    s = sub.add_parser("graph", help="link-graph analytics: pagerank / "
                                     "bfs / kcore / hits over an edge list")
    s.add_argument("algo", choices=["pagerank", "bfs", "kcore", "hits"])
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--iters", type=int, default=5,
                   help="iterations (pagerank/hits) or max hops (bfs)")
    s.add_argument("--k", type=int, default=3, help="k for kcore")
    s.add_argument("--seeds", default=None,
                   help="comma-separated node ids (bfs seeds / "
                        "personalized-pagerank teleport set)")
    s.add_argument("--weighted", action="store_true",
                   help="pagerank: use the 'w' column as edge weights")
    s.set_defaults(fn=cmd_graph)

    s = sub.add_parser("compare", help="golden-output tolerance compare "
                                       "(exit code = warning count)")
    s.add_argument("gold")
    s.add_argument("test")
    s.add_argument("--tol", type=float, default=1e-6)
    s.add_argument("--value-col", default="jaccard")
    s.set_defaults(fn=cmd_compare)

    s = sub.add_parser("tiered", help="tiered dedup (exact -> near-dup): "
                                      "writes corpus/ + disposition/")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--threshold", type=float, default=None)
    s.add_argument("--line-min-docs", type=int, default=None,
                   help="tier-0 boilerplate strip: drop lines in >= N "
                        "distinct docs before the dedup tiers")
    s.set_defaults(fn=cmd_tiered)

    s = sub.add_parser("decontam", help="remove docs near-duplicating a "
                                        "reference set: writes corpus/ + "
                                        "matches/ (one pack build)")
    s.add_argument("input")
    s.add_argument("reference")
    s.add_argument("output")
    s.add_argument("--threshold", type=float, default=None)
    s.add_argument("--exact", action="store_true",
                   help="also drop byte-identical matches")
    s.add_argument("--ngram", type=int, default=None, metavar="N",
                   help="also drop docs sharing any N-token-gram with "
                        "the reference (GPT-3-style guard)")
    s.set_defaults(fn=cmd_decontam)

    s = sub.add_parser("build", help="full corpus build: quality gate -> "
                                     "decontam -> tiered dedup -> splits; "
                                     "writes split dirs + disposition/ + "
                                     "report.json")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--reference", default=None,
                   help="eval/test parquet to decontaminate against")
    s.add_argument("--ngram", type=int, default=None, metavar="N",
                   help="also apply the N-token-gram leakage guard")
    s.add_argument("--min-tokens", type=int, default=None)
    s.add_argument("--min-alpha", type=float, default=None)
    s.add_argument("--max-dup-frac-e6", type=int, default=None)
    s.add_argument("--gopher", action="store_true",
                   help="require the full conjunctive Gopher rule set "
                        "in the quality gate")
    s.add_argument("--threshold", type=float, default=None)
    s.add_argument("--line-min-docs", type=int, default=None)
    s.add_argument("--splits", default=None,
                   help="name=weight[,name=weight...]; omit to write a "
                        "single corpus/")
    s.set_defaults(fn=cmd_build)

    s = sub.add_parser("split", help="deterministic named corpus split "
                                     "(train/val/test); one parquet dir "
                                     "per split")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--weights", default="train=0.9,val=0.05,test=0.05",
                   help="name=weight[,name=weight...]")
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=cmd_split)

    s = sub.add_parser("report", help="one-row corpus summary "
                                      "(docs/tokens/chars, token min/max/"
                                      "mean) as JSON")
    s.add_argument("input")
    s.set_defaults(fn=cmd_report)

    s = sub.add_parser("chunk", help="split documents into overlapping "
                       "fixed-size token windows (RAG passages)")
    s.add_argument("input", help="documents parquet")
    s.add_argument("output", help="output parquet dir")
    s.add_argument("--chunk-tokens", type=int, default=128)
    s.add_argument("--stride", type=int, default=96)
    s.add_argument("--id-col", default="doc_id")
    s.add_argument("--text-col", default="text")
    s.set_defaults(fn=cmd_chunk)

    s = sub.add_parser("bandstore", help="persist a corpus's LSH band + "
                                         "content-hash stores for "
                                         "incremental runs")
    s.add_argument("input")
    s.add_argument("output")
    s.set_defaults(fn=cmd_bandstore)

    s = sub.add_parser("incremental", help="dedup a new increment against "
                                           "an existing corpus (exact then "
                                           "near-dup); writes kept/ + "
                                           "matches/")
    s.add_argument("increment")
    s.add_argument("corpus")
    s.add_argument("output")
    s.add_argument("--store", default=None,
                   help="prebuilt bandstore dir (skips re-hashing corpus)")
    s.add_argument("--threshold", type=float, default=None)
    s.add_argument("--exact-only", action="store_true")
    s.set_defaults(fn=cmd_incremental)

    s = sub.add_parser("allpairs", help="EXACT all-pairs Jaccard join "
                       "(prefix filtering; recall 1.0 by construction)")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--threshold", type=float, default=None)
    s.add_argument("--order", choices=["df", "hash"], default="df")
    s.add_argument("--max-bucket", type=int, default=20_000,
                   help="duplicate-flood guard: raise if a prefix-token "
                        "bucket exceeds this (quadratic output)")
    s.add_argument("--right", default=None,
                   help="second corpus: R-S cross join (pairs span the "
                        "two inputs; output a = left id, b = right id)")
    s.set_defaults(fn=cmd_allpairs)

    s = sub.add_parser("search", help="BM25 top-k documents for a "
                       "comma-separated term list")
    s.add_argument("input")
    s.add_argument("terms", help="comma-separated query terms")
    s.add_argument("--k", type=int, default=20)
    s.set_defaults(fn=cmd_search)

    s = sub.add_parser("neardup", help="near-dup clustering over documents")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--ckpt", default=None)
    s.add_argument("--threshold", type=float, default=None)
    s.add_argument("--auto-bands", action="store_true",
                   help="retune LSH band geometry to --threshold "
                        "(functions/lsh_tuning.choose_bands)")
    s.add_argument("--k", type=int, default=None)
    s.set_defaults(fn=cmd_neardup)

    args = p.parse_args(argv)
    args.fn(args)
    import ray
    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
