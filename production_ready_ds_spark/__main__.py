"""Command-line entry point: run any catalog query, ad-hoc SQL, the
benchmark set, or a pipeline DAG against an SF directory —
``python -m production_ready_ds_spark <command> ...``.

This is the switch-over surface for a reference user: every operator
the engine implements is one command away, with the same tuned session
the tests and the driver contract use. Output goes to stdout as a
table (``--limit`` rows) or to ``--out`` as parquet/JSONL — the
distributed sink, not a driver collect, when material results matter.

Commands:
  list                         — catalog names (+ category, oracle?)
  run    <query>               — execute one catalog query
  sql    "<select ...>"        — ad-hoc SQL over the registered tables
  search <term> [term ...]     — BM25 (--index postings / --phrase /
                                 --hybrid / --rrf / --prefix / --fuzzy /
                                 --must-not T... / --near SLOP /
                                 --like DOC_ID / --snippets /
                                 --filter ATTR=V1,V2)
  index  --root DIR            — build the BM25 inverted index
         [--attrs COLs] — persist facet columns for search --filter
         [--delete IDs | --compact | --compact-tiered] — maintenance
  vindex --root DIR            — build the IVF vector index; plus
         [--probe IDs --k N --nprobe N [--filter ATTR=V1,V2] |
          --recall | --delete IDs |
          --compact | --compact-tiered]
  corpus                       — run the full corpus-build DAG
  tokenize TEXT...             — WordPiece-segment text driver-side
  Any data command takes --explain to print the formatted plan.
  Common flags: --sf DIR (default /root/testdata/sf0.01),
  --cpus N, --limit N, --out PATH [--format parquet|jsonl|orc]
"""

from __future__ import annotations

import argparse
import sys


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="production_ready_ds_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--sf", default="/root/testdata/sf0.01")
        sp.add_argument("--cpus", type=int, default=8)
        sp.add_argument("--limit", type=int, default=20)
        sp.add_argument("--out", default=None)
        sp.add_argument(
            "--format", choices=["parquet", "jsonl", "orc", "xml"], default="parquet"
        )
        sp.add_argument(
            "--explain",
            action="store_true",
            help="print the formatted physical plan instead of executing",
        )

    sub.add_parser("list")
    run = sub.add_parser("run")
    run.add_argument("query")
    common(run)
    sql = sub.add_parser("sql")
    sql.add_argument("statement")
    common(sql)
    search = sub.add_parser(
        "search", help="BM25 full-text search over the documents table"
    )
    search.add_argument(
        "terms",
        nargs="*",
        help="query terms (lowercased); omitted only with --like",
    )
    search.add_argument("--k", type=int, default=20, help="results to return")
    search.add_argument(
        "--index",
        default=None,
        help="TermStore root built by `index` — serve from postings "
        "instead of scanning the corpus (identical integers)",
    )
    search.add_argument(
        "--phrase",
        action="store_true",
        help="exact consecutive-phrase match instead of BM25 ranking",
    )
    search.add_argument(
        "--hybrid",
        action="store_true",
        help="rerank the BM25 candidates by embedding cosine to the "
        "top lexical hit's vector (two-stage RAG ranking)",
    )
    search.add_argument(
        "--rrf",
        action="store_true",
        help="fuse the BM25 top-k with the seed-vector cosine top-k by "
        "reciprocal-rank fusion (surfaces semantic hits sharing no "
        "query term)",
    )
    search.add_argument(
        "--prefix",
        action="store_true",
        help="treat the single term as a prefix (wildcard search: "
        "rank docs by occurrences of any term starting with it)",
    )
    search.add_argument(
        "--fuzzy",
        action="store_true",
        help="typo-tolerant: rank docs by occurrences of any term "
        "within edit distance 1 of the query terms",
    )
    search.add_argument(
        "--must-not",
        dest="must_not",
        nargs="+",
        default=None,
        metavar="TERM",
        help="boolean retrieval: docs containing EVERY positional term "
        "and NONE of these, ranked by summed must-term occurrences",
    )
    search.add_argument(
        "--near",
        type=int,
        default=None,
        metavar="SLOP",
        help="proximity: the two terms within SLOP token positions, "
        "ranked by closest pair then within-window pair count",
    )
    search.add_argument(
        "--like",
        type=int,
        default=None,
        metavar="DOC_ID",
        help="more-like-this: use this document's top content terms as "
        "the query (takes no positional terms; the doc itself is "
        "excluded from results)",
    )
    search.add_argument(
        "--snippets",
        action="store_true",
        help="decorate results with KWIC snippets (a ±3-token window "
        "around the first hit); BM25 and --phrase modes, composes "
        "with --index",
    )
    search.add_argument(
        "--filter",
        dest="facet",
        default=None,
        metavar="ATTR=V1[,V2...]",
        help="faceted search: restrict results to docs whose metadata "
        "attribute is one of the values — candidates pruned BEFORE "
        "ranking, corpus statistics stay full-corpus. Plain BM25 mode "
        "only (composes with --index when the store was built with "
        "`index --attrs ATTR`, and with --snippets)",
    )
    common(search)
    index = sub.add_parser(
        "index", help="build/refresh/maintain the BM25 inverted index (TermStore)"
    )
    index.add_argument("--root", required=True, help="TermStore directory")
    index.add_argument("--sf", default="/root/testdata/sf0.01")
    index.add_argument("--cpus", type=int, default=8)
    index.add_argument(
        "--attrs",
        default=None,
        metavar="COL[,COL...]",
        help="persist these document metadata columns into the doc "
        "sidecar at build time (enables `search --filter COL=...`); "
        "every append to a store must declare the same attrs",
    )
    index.add_argument(
        "--delete",
        default=None,
        metavar="ID[,ID...]",
        help="remove these doc_ids from the index (RTBF; post-delete "
        "scores equal a fresh build) instead of appending",
    )
    index.add_argument(
        "--compact",
        action="store_true",
        help="fold ALL segments into one (full O(store) rewrite)",
    )
    index.add_argument(
        "--compact-tiered",
        action="store_true",
        help="LSM leveled fold (amortized O(batch log) — the "
        "continuous-ingest shape)",
    )
    vindex = sub.add_parser(
        "vindex",
        help="build/query/maintain the IVF vector index (IVFStore)",
    )
    vindex.add_argument("--root", required=True, help="IVFStore directory")
    vindex.add_argument("--sf", default="/root/testdata/sf0.01")
    vindex.add_argument("--cpus", type=int, default=8)
    vindex.add_argument(
        "--probe",
        default=None,
        metavar="ID[,ID...]",
        help="search: cosine top-k neighbors for these vec_ids",
    )
    vindex.add_argument("--k", type=int, default=5, help="neighbors per probe")
    vindex.add_argument("--nprobe", type=int, default=4, help="lists probed")
    vindex.add_argument(
        "--filter",
        dest="facet",
        default=None,
        metavar="ATTR=V1[,V2...]",
        help="filtered ANN (with --probe): restrict neighbors to "
        "vec_ids whose documents row matches the facet — candidates "
        "pruned BEFORE similarity, like search --filter",
    )
    vindex.add_argument(
        "--recall",
        action="store_true",
        help="recall@k vs exact brute force per nprobe in {1,2,4,8} "
        "for vec_id < 10 probes (the q_ann_recall_ivf report on THIS store)",
    )
    vindex.add_argument(
        "--delete",
        default=None,
        metavar="ID[,ID...]",
        help="remove these vec_ids from the index (RTBF)",
    )
    vindex.add_argument("--compact", action="store_true")
    vindex.add_argument(
        "--compact-tiered", action="store_true", help="LSM leveled fold"
    )
    vindex.add_argument(
        "--pq",
        choices=["raw", "residual"],
        default=None,
        help="build: also train PQ codebooks before the first append "
        "(residual = the IVFADC form — codes quantize "
        "x - centroid(list)); enables --adc search on this store",
    )
    vindex.add_argument(
        "--adc",
        action="store_true",
        help="search (with --probe): serve from the PQ codes via the "
        "composed IVFPQ path (pruned code read + ADC rank + exact "
        "re-rank of the top refine*k)",
    )
    vindex.add_argument(
        "--refine",
        type=int,
        default=4,
        help="--adc: exact-rerank multiplier (top refine*k ADC "
        "candidates re-ranked by true cosine; 0 = raw ADC ranks)",
    )
    vindex.add_argument(
        "--max-train-rows",
        type=int,
        default=None,
        help="build: train KMeans (and PQ codebooks) on a deterministic "
        "content-hash sample of ~N rows; k is still sized by the full "
        "corpus count (the 100 TB build-cost lever)",
    )
    vindex.add_argument("--limit", type=int, default=20)
    corpus = sub.add_parser("corpus")
    corpus.add_argument("--sf", default="/root/testdata/sf0.01")
    corpus.add_argument("--cpus", type=int, default=8)
    corpus.add_argument("--root", required=True, help="output root for DAG stages")
    tok = sub.add_parser(
        "tokenize",
        help="WordPiece-segment the given text driver-side (no Spark "
        "session — the fixed demo vocabulary; corpus-scale reports "
        "are `run q_wordpiece_apply` / the BPE and unigram queries)",
    )
    tok.add_argument("text", nargs="+", help="text to segment")
    return p


def _parse_facet(spec: str) -> tuple[str, tuple[str, ...]] | None:
    """Parse a ``--filter ATTR=V1[,V2...]`` spec; None when malformed —
    the ONE parser both the search and vindex commands share, run
    BEFORE any Spark work so a malformed spec never costs a job."""
    attr, eq, vals = spec.partition("=")
    attr = attr.strip()
    values = tuple(v.strip() for v in vals.split(",") if v.strip())
    if not eq or not attr or not values:
        return None
    return attr, values


def _emit(df, args) -> None:
    if getattr(args, "explain", False):
        # the plan a reader audits for pushdown/broadcast/shuffle shape
        # (the same surface tests/test_plans.py pins in CI)
        from .plans.audit import explain_str

        print(explain_str(df))
        return
    if args.out:
        if args.format == "jsonl":
            from .sources.jsonl import write_jsonl

            write_jsonl(df, args.out)
        elif args.format == "orc":
            from .sources.orc import write_orc

            write_orc(df, args.out)
        elif args.format == "xml":
            from .sources.xml import write_xml

            write_xml(df, args.out)
        else:
            df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.limit, truncate=False)


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv)
    if args.cmd == "list":
        from .queries import catalog

        for name, q in catalog().items():
            kind = "oracle" if q.sql else "rows-only"
            print(f"{name:32s} {q.category:18s} {kind}")
        return 0
    if args.cmd == "tokenize":
        # pure driver-side: the greedy matcher is a plain function and
        # the demo vocab is a module constant — no Spark session needed
        import re

        from .queries.wordpiece import (
            WORDPIECE_MAX_LEN,
            WORDPIECE_VOCAB_SET,
            wordpiece_segment,
        )

        vocab, max_len = WORDPIECE_VOCAB_SET, WORDPIECE_MAX_LEN
        text = " ".join(args.text)
        # ASCII \W to match the engine's tokens_expr / _DUCK_TOKENS
        # semantics exactly (Java and RE2 \W are ASCII-only)
        words = [w for w in re.split(r"\W+", text.lower(), flags=re.ASCII) if w]
        for w in words:
            pieces = wordpiece_segment(w, vocab, max_len)
            print(f"{w}\t{' '.join(pieces)}")
        return 0

    from .session import get_spark

    spark = get_spark("cli", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    if args.cmd == "run":
        from .queries import catalog

        cat = catalog()
        if args.query not in cat:
            print(f"unknown query {args.query!r} — try `list`", file=sys.stderr)
            return 2
        _emit(cat[args.query].fn(spark, args.sf), args)
    elif args.cmd == "sql":
        from .sql import run_sql

        _emit(run_sql(spark, args.statement, args.sf), args)
    elif args.cmd == "search":
        modes = [
            args.phrase,
            args.hybrid,
            args.rrf,
            args.prefix,
            args.fuzzy,
            args.must_not is not None,
            args.near is not None,
            args.like is not None,
        ]
        if sum(modes) > 1:
            print(
                "--phrase, --hybrid, --rrf, --prefix, --fuzzy, "
                "--must-not, --near and --like are mutually exclusive",
                file=sys.stderr,
            )
            return 2
        facet_attr, facet_values = None, ()
        if args.facet:
            if sum(modes) > 0:
                # the other modes' serving paths carry no facet hook —
                # reject rather than silently ignore the restriction
                print(
                    "--filter composes with plain BM25 (optionally "
                    "--index / --snippets) only",
                    file=sys.stderr,
                )
                return 2
            parsed = _parse_facet(args.facet)
            if parsed is None:
                print(
                    "--filter takes ATTR=V1[,V2...] (e.g. lang=de,fr)",
                    file=sys.stderr,
                )
                return 2
            facet_attr, facet_values = parsed
        if args.snippets and sum(modes) > 0 and not args.phrase:
            # BM25 locates the window from the query terms, phrase from
            # its own first_pos column; the other modes' result shapes
            # carry no hit position — reject rather than silently
            # ignore
            print(
                "--snippets composes with plain BM25 or --phrase "
                "(optionally --index) only",
                file=sys.stderr,
            )
            return 2
        if args.like is not None and args.terms:
            print(
                "--like builds its query from the document itself — "
                "drop the positional terms",
                file=sys.stderr,
            )
            return 2
        if args.like is None and not args.terms:
            print("search needs query terms (or --like DOC_ID)", file=sys.stderr)
            return 2
        if args.near is not None:
            near_terms = tuple(dict.fromkeys(t.lower() for t in args.terms))
            if len(near_terms) != 2:
                print(
                    "--near takes exactly 2 distinct terms", file=sys.stderr
                )
                return 2
            if args.near < 1:
                print("--near SLOP must be >= 1", file=sys.stderr)
                return 2
        if args.prefix and (len(args.terms) != 1 or not args.terms[0].strip()):
            # empty prefix would match EVERY token on the scan path
            # (startswith('') is vacuously true) and raise on the
            # index path — reject once here for both
            print("--prefix takes exactly one non-empty term", file=sys.stderr)
            return 2
        if args.phrase and len(args.terms) < 2:
            # validated HERE so both serving paths behave the same:
            # TermStore.search_phrase raises on <2 terms while the scan
            # path would silently degrade to a single-term match
            print(
                "--phrase needs at least 2 terms; drop --phrase for a "
                "single-term search",
                file=sys.stderr,
            )
            return 2
        if args.prefix:
            prefix = args.terms[0].lower()
            if args.index:
                from .operators.termstore import TermStore

                _emit(
                    TermStore(args.index).search_prefix(spark, prefix, k=args.k),
                    args,
                )
            else:
                from .queries.llm import prefix_topk
                from .tables import load

                _emit(
                    prefix_topk(load(spark, args.sf, "documents"), prefix, k=args.k),
                    args,
                )
        elif args.fuzzy:
            terms = tuple(dict.fromkeys(t.lower() for t in args.terms))
            if args.index:
                from .operators.termstore import TermStore

                _emit(
                    TermStore(args.index).search_fuzzy(spark, terms, k=args.k),
                    args,
                )
            else:
                from .queries.llm import fuzzy_topk
                from .tables import load

                _emit(
                    fuzzy_topk(load(spark, args.sf, "documents"), terms, k=args.k),
                    args,
                )
        elif args.phrase:
            # phrases keep duplicates and order — "buffalo buffalo" is
            # a real phrase query
            from .tables import load

            phrase = tuple(t.lower() for t in args.terms)
            # index-only serving must never touch the corpus lake —
            # load docs only for the scan path or for decoration
            docs = None
            if args.index:
                from .operators.termstore import TermStore

                ranked = TermStore(args.index).search_phrase(
                    spark, phrase, k=args.k
                )
            else:
                from .queries.llm import phrase_topk

                docs = load(spark, args.sf, "documents")
                ranked = phrase_topk(docs, phrase, k=args.k)
            if args.snippets:
                # window the whole |phrase|-token match at first_pos
                from .queries.llm import kwic_snippets_at

                if docs is None:
                    docs = load(spark, args.sf, "documents")
                ranked = kwic_snippets_at(docs, ranked, span=len(phrase))
            _emit(ranked, args)
        elif args.must_not is not None:
            must = tuple(dict.fromkeys(t.lower() for t in args.terms))
            must_not = tuple(dict.fromkeys(t.lower() for t in args.must_not))
            if args.index:
                from .operators.termstore import TermStore

                _emit(
                    TermStore(args.index).search_boolean(
                        spark, must, must_not, k=args.k
                    ),
                    args,
                )
            else:
                from .queries.llm import boolean_topk
                from .tables import load

                _emit(
                    boolean_topk(
                        load(spark, args.sf, "documents"), must, must_not, k=args.k
                    ),
                    args,
                )
        elif args.near is not None:
            if args.index:
                from .operators.termstore import TermStore

                _emit(
                    TermStore(args.index).search_proximity(
                        spark, near_terms, slop=args.near, k=args.k
                    ),
                    args,
                )
            else:
                from .queries.llm import proximity_topk
                from .tables import load

                _emit(
                    proximity_topk(
                        load(spark, args.sf, "documents"),
                        near_terms,
                        slop=args.near,
                        k=args.k,
                    ),
                    args,
                )
        elif args.like is not None:
            from .tables import load

            docs = load(spark, args.sf, "documents")
            if args.index:
                # profile = one pushed doc_id point read; scoring =
                # postings-served BM25 with the source doc excluded
                # before ranks are assigned (scan-equal integers)
                from .operators.termstore import TermStore
                from .queries.llm import mlt_profile_terms

                terms = mlt_profile_terms(docs, args.like)
                if not terms:
                    print(
                        f"doc {args.like} has no content terms (or does "
                        "not exist)",
                        file=sys.stderr,
                    )
                    return 2
                _emit(
                    TermStore(args.index).search(
                        spark, terms, k=args.k, exclude_ids=(args.like,)
                    ),
                    args,
                )
            else:
                from .queries.llm import mlt_topk

                try:
                    ranked = mlt_topk(docs, args.like, k=args.k)
                except ValueError as exc:
                    # same diagnosis as the indexed branch — a missing
                    # or content-free doc must not silently print an
                    # empty result set on one path and error on the
                    # other
                    print(exc, file=sys.stderr)
                    return 2
                _emit(ranked, args)
        elif args.hybrid or args.rrf:
            from pyspark.sql import functions as F

            from .queries.llm import hybrid_topk, rrf_topk
            from .tables import load

            terms = tuple(dict.fromkeys(t.lower() for t in args.terms))
            emb = load(spark, args.sf, "embeddings").select(
                F.col("vec_id").alias("doc_id"), "embedding"
            )
            cand = None
            if args.index:
                # stage 1 from the persistent inverted index — same
                # integers as the scan (TermStore.search equivalence)
                from .operators.termstore import TermStore

                cand = TermStore(args.index).search(spark, terms, k=args.k)
            ranker = rrf_topk if args.rrf else hybrid_topk
            _emit(
                ranker(
                    load(spark, args.sf, "documents"),
                    emb,
                    terms,
                    k=args.k,
                    candidates=cand,
                ),
                args,
            )
        else:
            # dedupe while keeping order — a repeated term would
            # double-score on the scan path but not the indexed one
            from .tables import load

            terms = tuple(dict.fromkeys(t.lower() for t in args.terms))
            # index-only serving must never touch the corpus lake —
            # load docs only for the scan path or for decoration
            docs = None
            if args.index:
                from .operators.termstore import TermStore

                store = TermStore(args.index)
                try:
                    ranked = (
                        store.search_filtered(
                            spark, terms, attr=facet_attr,
                            values=facet_values, k=args.k,
                        )
                        if facet_attr
                        else store.search(spark, terms, k=args.k)
                    )
                except ValueError as exc:
                    # e.g. the store was built without this attribute —
                    # same loud diagnosis as the --like branch
                    print(exc, file=sys.stderr)
                    return 2
            else:
                from pyspark.sql import functions as F

                from .queries.llm import bm25_topk

                docs = load(spark, args.sf, "documents")
                eligible = None
                if facet_attr:
                    if facet_attr not in docs.columns:
                        print(
                            f"documents has no {facet_attr!r} column — "
                            f"available: {docs.columns}",
                            file=sys.stderr,
                        )
                        return 2
                    eligible = docs.filter(
                        F.col(facet_attr).isin(list(facet_values))
                    ).select("doc_id")
                ranked = bm25_topk(docs, terms, k=args.k, eligible=eligible)
            if args.snippets:
                # decoration is a k-row broadcast join against the doc
                # table regardless of which path retrieved the ids
                from .queries.llm import kwic_snippets

                if docs is None:
                    docs = load(spark, args.sf, "documents")
                ranked = kwic_snippets(docs, ranked, terms)
            _emit(ranked, args)
    elif args.cmd == "index":
        from .operators.termstore import TermStore
        from .tables import load

        store = TermStore(args.root)
        if args.delete:
            ids = [int(x) for x in args.delete.split(",") if x.strip()]
            n_rw = store.delete_ids(spark, ids)
            n, sumdl = store.stats()
            print(
                f"deleted {len(ids)} ids ({n_rw} segments rewritten): "
                f"{n} docs, {sumdl} tokens at {args.root}"
            )
        elif args.compact or args.compact_tiered:
            n_segs = (
                store.compact_tiered(spark)
                if args.compact_tiered
                else store.compact(spark)
            )
            print(f"compacted to {n_segs} segment(s) at {args.root}")
        else:
            docs = load(spark, args.sf, "documents")
            # dedupe (dict.fromkeys, the search-terms rule): a repeated
            # column would pass the membership check and then crash the
            # sidecar write with a duplicate-column AnalysisException
            attrs = tuple(
                dict.fromkeys(
                    c.strip() for c in (args.attrs or "").split(",") if c.strip()
                )
            )
            missing = [c for c in attrs if c not in docs.columns]
            if missing:
                print(
                    f"--attrs columns not in documents: {missing} — "
                    f"available: {docs.columns}",
                    file=sys.stderr,
                )
                return 2
            try:
                wrote = store.append(
                    docs, id_min=0, id_max=2**62,
                    skip_if_range_indexed=True, attrs=attrs,
                )
            except ValueError as exc:  # mixed-attr append on an existing store
                print(exc, file=sys.stderr)
                return 2
            n, sumdl = store.stats()
            print(
                f"{'indexed' if wrote else 'already indexed'}: "
                f"{n} docs, {sumdl} tokens at {args.root}"
            )
    elif args.cmd == "vindex":
        from pyspark.sql import functions as F

        from .operators.ivfstore import IVFStore
        from .tables import load

        store = IVFStore(args.root)
        vfacet = None
        if args.facet:
            if not args.probe:
                print("--filter requires --probe", file=sys.stderr)
                return 2
            vfacet = _parse_facet(args.facet)
            if vfacet is None:
                print(
                    "--filter takes ATTR=V1[,V2...] (e.g. lang=de,fr)",
                    file=sys.stderr,
                )
                return 2
        if args.delete:
            ids = [int(x) for x in args.delete.split(",") if x.strip()]
            n_rw = store.delete_ids(spark, ids)
            print(
                f"deleted {len(ids)} ids ({n_rw} segments rewritten) at {args.root}"
            )
        elif args.compact or args.compact_tiered:
            n_segs = (
                store.compact_tiered(spark)
                if args.compact_tiered
                else store.compact(spark)
            )
            print(f"compacted to {n_segs} segment(s) at {args.root}")
        elif args.probe:
            ids = [int(x) for x in args.probe.split(",") if x.strip()]
            emb = load(spark, args.sf, "embeddings").select("vec_id", "embedding")
            probes_df = emb.filter(F.col("vec_id").isin(ids))
            found = {r.vec_id for r in probes_df.select("vec_id").collect()}
            missing = sorted(set(ids) - found)
            if missing:
                # without this, an unknown probe id surfaces as the
                # store's misleading "IVFStore ... is empty" error
                print(
                    f"probe ids not in the embeddings table: {missing}",
                    file=sys.stderr,
                )
                return 2
            if args.adc and vfacet is not None:
                attr = vfacet[0]
                if attr not in store.attr_names():
                    print(
                        f"--adc --filter needs {attr!r} in the store's "
                        f"attrs sidecar (has: {store.attr_names()}) — "
                        "append with attrs=, or drop --adc for the "
                        "documents-join eligibility path",
                        file=sys.stderr,
                    )
                    return 2
            if args.adc and store.pq_codec() is None:
                print(
                    f"store at {args.root} has no PQ codebooks — rebuild "
                    "with --pq raw|residual to enable --adc",
                    file=sys.stderr,
                )
                return 2
            eligible = None
            if vfacet is not None and not args.adc:
                # the ADC path filters via the attrs sidecar inside
                # search_adc — the documents-join eligibility frame is
                # the FLOAT path's mechanism (and the facet attr need
                # not exist in the documents table at all)
                attr, values = vfacet
                docs = load(spark, args.sf, "documents")
                if attr not in docs.columns:
                    print(
                        f"documents has no {attr!r} column — "
                        f"available: {docs.columns}",
                        file=sys.stderr,
                    )
                    return 2
                eligible = docs.filter(F.col(attr).isin(list(values))).select(
                    F.col("doc_id").alias("vec_id")
                )
            if args.adc:
                out = store.search_adc(
                    probes_df,
                    top_k=args.k,
                    nprobe=args.nprobe,
                    refine=args.refine or None,
                    attr_filter=vfacet,
                )
                order = (
                    ["probe_id", F.desc("cos_sim"), "neighbor_id"]
                    if args.refine
                    else ["probe_id", "adc_rank"]
                )
                out.orderBy(*order).show(args.limit, truncate=False)
            else:
                store.search(
                    probes_df, top_k=args.k, nprobe=args.nprobe, eligible=eligible
                ).orderBy("probe_id", F.desc("cos_sim"), "neighbor_id").show(
                    args.limit, truncate=False
                )
        elif args.recall:
            from .queries.llm import ivf_recall_report

            emb = load(spark, args.sf, "embeddings").select("vec_id", "embedding")
            ivf_recall_report(store, emb).orderBy("nprobe").show(
                args.limit, truncate=False
            )
        else:
            emb = load(spark, args.sf, "embeddings").select("vec_id", "embedding")
            if store.centroids() is None:
                try:
                    k = store.train(emb, max_train_rows=args.max_train_rows)
                except ValueError as exc:
                    print(str(exc), file=sys.stderr)
                    return 2
                print(f"trained {k} lists (corpus-scaled)")
            if args.pq and store.pq_codec() is None:
                try:
                    store.train_pq(
                        emb,
                        residual=(args.pq == "residual"),
                        max_train_rows=args.max_train_rows,
                    )
                except ValueError as exc:
                    print(str(exc), file=sys.stderr)
                    return 2
                print(f"trained PQ codebooks ({args.pq})")
            wrote = store.append(
                emb, id_min=0, id_max=2**62, skip_if_range_indexed=True
            )
            print(
                f"{'indexed' if wrote else 'already indexed'} "
                f"{len(store.segments())} segment(s) at {args.root}"
            )
    elif args.cmd == "corpus":
        from .pipelines.corpus_build import corpus_build_dag
        from .workflow import build

        report = build([corpus_build_dag(args.root, args.sf)])
        for t in report["ran"]:
            print("ran:", t)
        print("shards at:", f"{args.root}/corpus/shards")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
