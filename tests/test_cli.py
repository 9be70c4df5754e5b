"""CLI entry point (python -m production_ready_ds_spark): list/run/sql
surface a reference user switches to, driven in-process (a subprocess
per command would pay full JVM startup; main() is the same code path
argparse dispatches)."""

from __future__ import annotations

import pytest

from production_ready_ds_spark.__main__ import main


def test_list_names_every_catalog_entry(capsys):
    from production_ready_ds_spark.queries import catalog

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    for name in catalog():
        assert name in out


def test_run_query_and_write_jsonl(spark, sf_small, tmp_path, capsys):
    out = str(tmp_path / "agg")
    assert (
        main(["run", "q_agg_pricing", "--sf", sf_small, "--out", out,
              "--format", "jsonl"]) == 0
    )
    from production_ready_ds_spark.sources.jsonl import read_jsonl

    back = read_jsonl(
        spark, out,
        "l_returnflag string, l_linestatus string, sum_qty double, count_order long",
    )
    assert back.count() == 6  # the flagship's 6 groups (4 cols read back)


def test_run_unknown_query_fails_cleanly(capsys):
    assert main(["run", "q_does_not_exist", "--sf", "/tmp"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_sql_command(spark, sf_small, capsys):
    assert (
        main(["sql", "SELECT COUNT(*) AS n FROM documents", "--sf", sf_small]) == 0
    )
    assert "500" in capsys.readouterr().out


def test_search_command(spark, sf_small, capsys):
    """`search` must run BM25 over the documents table for ad-hoc terms
    and agree with the parameterized helper's own ranking."""
    from production_ready_ds_spark.__main__ import main
    from production_ready_ds_spark.queries.llm import bm25_topk
    from production_ready_ds_spark.tables import load

    rc = main(["search", "Spark", "vector", "--k", "3", "--sf", sf_small])
    assert rc == 0
    out = capsys.readouterr().out
    want = bm25_topk(
        load(spark, sf_small, "documents"), ("spark", "vector"), k=3
    ).collect()
    assert len(want) == 3
    for r in want:
        assert f"|{r.doc_id} " in out or f"|{r.doc_id}|" in out.replace(" ", "|"), (
            r.doc_id,
            out,
        )


def test_search_phrase_command(spark, sf_small, capsys):
    """`search --phrase` must run exact-phrase matching and agree with
    the parameterized scan helper."""
    from production_ready_ds_spark.__main__ import main
    from production_ready_ds_spark.queries.llm import phrase_topk
    from production_ready_ds_spark.tables import load

    rc = main(["search", "table", "hash", "--phrase", "--k", "3", "--sf", sf_small])
    assert rc == 0
    out = capsys.readouterr().out
    want = phrase_topk(
        load(spark, sf_small, "documents"), ("table", "hash"), k=3
    ).collect()
    assert want, "fixture phrase must match"
    for r in want:
        assert f"|{r.doc_id} " in out, (r.doc_id, out)


def test_search_phrase_single_term_fails_cleanly(capsys, sf_small):
    """TermStore.search_phrase needs >= 2 terms and the scan path would
    silently degrade — the CLI validates once for both paths."""
    assert main(["search", "table", "--phrase", "--sf", sf_small]) == 2
    assert "at least 2 terms" in capsys.readouterr().err


def test_search_phrase_hybrid_conflict_fails_cleanly(capsys, sf_small):
    assert (
        main(["search", "table", "hash", "--phrase", "--hybrid", "--sf", sf_small])
        == 2
    )
    assert "mutually exclusive" in capsys.readouterr().err


def test_search_hybrid_with_index_serves_stage1_from_store(
    spark, sf_small, tmp_path, capsys
):
    """`search --hybrid --index` must serve the lexical stage from the
    TermStore and return the same ranking as the scan-path hybrid
    (TermStore.search is integer-equal to bm25_topk)."""
    from pyspark.sql import functions as F

    from production_ready_ds_spark.queries.llm import hybrid_topk
    from production_ready_ds_spark.tables import load

    root = str(tmp_path / "ts")
    assert main(["index", "--root", root, "--sf", sf_small]) == 0
    capsys.readouterr()
    rc = main(
        ["search", "spark", "vector", "--hybrid", "--index", root,
         "--k", "3", "--sf", sf_small]
    )
    assert rc == 0
    out = capsys.readouterr().out
    emb = load(spark, sf_small, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    want = hybrid_topk(
        load(spark, sf_small, "documents"), emb, ("spark", "vector"), k=3
    ).collect()
    assert want
    for r in want:
        assert str(r.doc_id) in out, (r.doc_id, out)


def test_search_rrf_command(spark, sf_small, capsys):
    """`search --rrf` must fuse the lexical and semantic candidate
    lists and agree with the parameterized helper."""
    from pyspark.sql import functions as F

    from production_ready_ds_spark.queries.llm import rrf_topk
    from production_ready_ds_spark.tables import load

    rc = main(["search", "spark", "vector", "--rrf", "--k", "3", "--sf", sf_small])
    assert rc == 0
    out = capsys.readouterr().out
    emb = load(spark, sf_small, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    want = rrf_topk(
        load(spark, sf_small, "documents"), emb, ("spark", "vector"), k=3
    ).collect()
    assert want
    for r in want:
        assert str(r.doc_id) in out, (r.doc_id, out)


def test_index_delete_and_compact_commands(spark, sf_small, tmp_path, capsys):
    """`index --delete` must remove the ids (searches re-score as a
    fresh build) and `index --compact` must fold segments — the CLI
    face of the store's RTBF/maintenance operations."""
    from production_ready_ds_spark.operators.termstore import TermStore

    root = str(tmp_path / "ts")
    assert main(["index", "--root", root, "--sf", sf_small]) == 0
    out1 = capsys.readouterr().out
    assert "indexed: 500 docs" in out1
    assert main(["index", "--root", root, "--delete", "0,1,2", "--sf", sf_small]) == 0
    out2 = capsys.readouterr().out
    assert "deleted 3 ids" in out2 and "497 docs" in out2
    store = TermStore(root)
    hits = {r.doc_id for r in store.search(spark, ("spark",), k=100).collect()}
    assert not (hits & {0, 1, 2})
    assert main(["index", "--root", root, "--compact", "--sf", sf_small]) == 0
    assert "compacted to 1 segment" in capsys.readouterr().out
    assert store.stats()[0] == 497


def test_vindex_build_search_recall_delete(spark, sf_small, tmp_path, capsys):
    """The vector-index CLI face: build trains + appends, --probe
    serves neighbors from the store, --recall prints the nprobe sweep,
    --delete forgets ids, --compact folds segments."""
    from production_ready_ds_spark.operators.ivfstore import IVFStore

    root = str(tmp_path / "ivf")
    assert main(["vindex", "--root", root, "--sf", sf_small]) == 0
    out = capsys.readouterr().out
    assert "trained" in out and "indexed 1 segment" in out
    # probe: neighbors come from the store and match a direct search
    assert main(
        ["vindex", "--root", root, "--probe", "0,1", "--k", "2", "--sf", sf_small]
    ) == 0
    out = capsys.readouterr().out
    from pyspark.sql import functions as F

    from production_ready_ds_spark.tables import load

    emb = load(spark, sf_small, "embeddings").select("vec_id", "embedding")
    want = IVFStore(root).search(
        emb.filter(F.col("vec_id").isin([0, 1])), top_k=2, nprobe=4
    ).collect()
    assert want
    for r in want:
        assert str(r.neighbor_id) in out
    # recall report: 4 budget rows, monotone hits
    assert main(["vindex", "--root", root, "--recall", "--sf", sf_small]) == 0
    out = capsys.readouterr().out
    for b in (1, 2, 4, 8):
        assert f"|{b} " in out.replace("| ", "|") or f"|{b}|" in out.replace(" ", "|")
    # delete + compact keep the store serving
    assert main(["vindex", "--root", root, "--delete", "0", "--sf", sf_small]) == 0
    assert "deleted 1 ids" in capsys.readouterr().out
    assert main(["vindex", "--root", root, "--compact", "--sf", sf_small]) == 0
    assert "compacted to 1 segment" in capsys.readouterr().out
    hits = IVFStore(root).search(
        emb.filter(F.col("vec_id") == 1), top_k=3, nprobe=4
    ).collect()
    assert hits and all(r.neighbor_id != 0 for r in hits)


def test_run_query_writes_orc(spark, sf_small, tmp_path):
    out = str(tmp_path / "agg_orc")
    assert (
        main(["run", "q_agg_pricing", "--sf", sf_small, "--out", out,
              "--format", "orc"]) == 0
    )
    back = spark.read.orc(out)
    assert back.count() == 6


def test_search_prefix_command(spark, sf_small, capsys):
    """`search <term> --prefix` ranks docs by occurrences of any term
    starting with it, agreeing with the parameterized helper."""
    from production_ready_ds_spark.queries.llm import prefix_topk
    from production_ready_ds_spark.tables import load

    rc = main(["search", "sp", "--prefix", "--k", "3", "--sf", sf_small])
    assert rc == 0
    out = capsys.readouterr().out
    want = prefix_topk(load(spark, sf_small, "documents"), "sp", k=3).collect()
    assert want
    for r in want:
        # delimited-cell match, not a bare substring (a doc_id's digits
        # could appear vacuously in ranks or other ids)
        assert f"|{r.doc_id} " in out, (r.doc_id, out)
    assert main(["search", "a", "b", "--prefix", "--sf", sf_small]) == 2
    assert "non-empty term" in capsys.readouterr().err
    assert main(["search", "", "--prefix", "--sf", sf_small]) == 2
    assert "non-empty term" in capsys.readouterr().err


def test_search_like_command_matches_helper(spark, sf_small, capsys):
    """`search --like` must run document-as-query retrieval and agree
    with the parameterized scan helper's ranking."""
    from production_ready_ds_spark.queries.llm import mlt_topk
    from production_ready_ds_spark.tables import load

    rc = main(["search", "--like", "7", "--k", "3", "--sf", sf_small])
    assert rc == 0
    out = capsys.readouterr().out
    want = mlt_topk(load(spark, sf_small, "documents"), 7, k=3).collect()
    assert len(want) == 3
    for r in want:
        assert f"|{r.doc_id} " in out, (r.doc_id, out)


def test_search_like_with_index_serves_from_store(
    spark, sf_small, tmp_path, capsys
):
    """`search --like --index` must serve the postings path and print
    the scan path's exact integers (the MLT scan≡index contract)."""
    from production_ready_ds_spark.operators.termstore import TermStore
    from production_ready_ds_spark.queries.llm import mlt_topk
    from production_ready_ds_spark.tables import load

    docs = load(spark, sf_small, "documents")
    root = str(tmp_path / "ts")
    assert TermStore(root).append(docs, id_min=0, id_max=10**9)
    rc = main(
        ["search", "--like", "7", "--index", root, "--k", "3", "--sf", sf_small]
    )
    assert rc == 0
    out = capsys.readouterr().out
    for r in mlt_topk(docs, 7, k=3).collect():
        assert f"|{r.doc_id} " in out, (r.doc_id, out)


def test_search_like_validation(capsys, sf_small):
    """--like rejects positional terms and mode combos; a missing doc
    errors identically on the scan path (not an empty table); bare
    `search` without terms or --like fails with guidance (nargs='*'
    no longer lets argparse catch it)."""
    assert main(["search", "foo", "--like", "7", "--sf", sf_small]) == 2
    assert "drop the positional terms" in capsys.readouterr().err
    assert main(["search", "--like", "7", "--phrase", "--sf", sf_small]) == 2
    assert "mutually exclusive" in capsys.readouterr().err
    assert main(["search", "--sf", sf_small]) == 2
    assert "query terms" in capsys.readouterr().err
    assert main(["search", "--like", "999999", "--sf", sf_small]) == 2
    assert "no content terms" in capsys.readouterr().err


def test_search_snippets_command(spark, sf_small, capsys):
    """`search --snippets` must decorate the BM25 ranking with KWIC
    windows (same doc ids, plus a snippet column); --snippets with any
    other mode is rejected."""
    rc = main(
        ["search", "spark", "vector", "--snippets", "--k", "3", "--sf", sf_small]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "snippet" in out and "hit_pos" in out
    from production_ready_ds_spark.queries.llm import bm25_topk
    from production_ready_ds_spark.tables import load

    for r in bm25_topk(
        load(spark, sf_small, "documents"), ("spark", "vector"), k=3
    ).collect():
        assert f"|{r.doc_id} " in out, (r.doc_id, out)
    assert (
        main(["search", "a", "b", "--snippets", "--fuzzy", "--sf", sf_small]) == 2
    )
    assert "composes with plain BM25" in capsys.readouterr().err


def test_search_phrase_snippets_command(spark, sf_small, capsys):
    """`search --phrase --snippets` must window the whole phrase span;
    non-positional modes still reject --snippets."""
    rc = main(
        ["search", "table", "hash", "--phrase", "--snippets", "--k", "3",
         "--sf", sf_small]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "snippet" in out and "table hash" in out
    assert main(["search", "a", "b", "--rrf", "--snippets", "--sf", sf_small]) == 2
    assert "composes with plain BM25 or --phrase" in capsys.readouterr().err


def test_index_only_search_never_touches_the_lake(
    spark, sf_small, tmp_path, capsys
):
    """`search --index` (BM25 and --phrase) must serve entirely from
    the store: with --sf pointing at a nonexistent lake the commands
    still succeed — the regression guard for decoration-era lazy doc
    loading. --snippets legitimately needs the lake and must fail
    loudly on the missing path instead."""
    from production_ready_ds_spark.operators.termstore import TermStore
    from production_ready_ds_spark.tables import load

    root = str(tmp_path / "ts")
    assert TermStore(root).append(
        load(spark, sf_small, "documents"), id_min=0, id_max=10**9
    )
    gone = str(tmp_path / "no-such-lake")
    rc = main(["search", "spark", "--index", root, "--k", "2", "--sf", gone])
    assert rc == 0
    assert "doc_id" in capsys.readouterr().out
    rc = main(
        ["search", "table", "hash", "--phrase", "--index", root, "--k", "2",
         "--sf", gone]
    )
    assert rc == 0
    assert "first_pos" in capsys.readouterr().out


def test_search_filter_command_scan_and_index(spark, sf_small, tmp_path, capsys):
    """`search --filter lang=de,fr` must restrict results to the facet
    on BOTH serving paths, with identical integers (scan twin vs the
    sidecar-pruned store built via `index --attrs lang`)."""
    from pyspark.sql import functions as F

    from production_ready_ds_spark.__main__ import main
    from production_ready_ds_spark.tables import load

    docs = load(spark, sf_small, "documents")
    eligible = {
        r.doc_id for r in docs.filter(F.col("lang").isin("de", "fr")).collect()
    }
    rc = main(["search", "spark", "vector", "--filter", "lang=de,fr",
               "--k", "3", "--sf", sf_small])
    assert rc == 0
    scan_out = capsys.readouterr().out
    root = str(tmp_path / "facet_idx")
    assert main(["index", "--root", root, "--sf", sf_small,
                 "--attrs", "lang"]) == 0
    capsys.readouterr()
    rc = main(["search", "spark", "vector", "--filter", "lang=de,fr",
               "--index", root, "--k", "3", "--sf", sf_small])
    assert rc == 0
    idx_out = capsys.readouterr().out
    # identical result tables (same ranks/ids/scores, both restricted)
    assert [l for l in idx_out.splitlines() if "|" in l] == [
        l for l in scan_out.splitlines() if "|" in l
    ]
    from production_ready_ds_spark.queries.llm import bm25_topk

    want = bm25_topk(
        docs, ("spark", "vector"), k=3,
        eligible=docs.filter(F.col("lang").isin("de", "fr")).select("doc_id"),
    ).collect()
    assert want
    for r in want:
        assert r.doc_id in eligible
        assert f"|{r.doc_id} " in idx_out or f"|{r.doc_id}|" in idx_out.replace(" ", "|")


def test_search_filter_validation(capsys, sf_small, tmp_path):
    from production_ready_ds_spark.__main__ import main

    # malformed spec
    assert main(["search", "spark", "--filter", "langdefr",
                 "--sf", sf_small]) == 2
    assert "ATTR=V1" in capsys.readouterr().err
    # mode conflict
    assert main(["search", "table", "hash", "--phrase",
                 "--filter", "lang=de", "--sf", sf_small]) == 2
    assert "plain BM25" in capsys.readouterr().err
    # unknown column on the scan path
    assert main(["search", "spark", "--filter", "nope=x",
                 "--sf", sf_small]) == 2
    assert "no 'nope' column" in capsys.readouterr().err
    # store built WITHOUT attrs must fail loudly on the index path
    root = str(tmp_path / "plain_idx")
    assert main(["index", "--root", root, "--sf", sf_small]) == 0
    capsys.readouterr()
    assert main(["search", "spark", "--filter", "lang=de",
                 "--index", root, "--sf", sf_small]) == 2
    assert "no 'lang' doc attribute" in capsys.readouterr().err
    # mixed-attr re-append must fail loudly too
    assert main(["index", "--root", root, "--sf", sf_small,
                 "--attrs", "lang"]) == 2
    assert "mixed sidecar schemas" in capsys.readouterr().err


def test_vindex_probe_filter(spark, sf_small, tmp_path, capsys):
    """`vindex --probe ... --filter lang=de,fr` must return only
    eligible neighbors; --filter without --probe fails loudly."""
    from pyspark.sql import functions as F

    from production_ready_ds_spark.__main__ import main
    from production_ready_ds_spark.tables import load

    root = str(tmp_path / "vidx")
    assert main(["vindex", "--root", root, "--sf", sf_small]) == 0
    capsys.readouterr()
    rc = main(["vindex", "--root", root, "--sf", sf_small,
               "--probe", "1,2", "--k", "3", "--filter", "lang=de,fr"])
    assert rc == 0
    out = capsys.readouterr().out
    eligible = {
        r.doc_id
        for r in load(spark, sf_small, "documents")
        .filter(F.col("lang").isin("de", "fr"))
        .collect()
    }
    import re

    # neighbor_id is the 2nd pipe-delimited column of each data row
    rows = [l for l in out.splitlines() if re.match(r"\|\d+\s*\|", l.replace(" ", ""))]
    assert rows
    for l in rows:
        neighbor = int(l.split("|")[2].strip())
        assert neighbor in eligible, (neighbor, l)
    assert main(["vindex", "--root", root, "--sf", sf_small,
                 "--filter", "lang=de"]) == 2
    assert "--filter requires --probe" in capsys.readouterr().err


def test_tokenize_command_is_sparkless(capsys):
    """`tokenize` segments driver-side with the fixed vocab — ASCII
    tokenization matching the engine's tokens_expr, greedy pieces per
    word, UNK for out-of-alphabet words."""
    assert main(["tokenize", "Unaffable workers!", "snake_case"]) == 0
    out = capsys.readouterr().out
    lines = dict(line.split("\t") for line in out.strip().splitlines())
    assert lines["workers"] == "work ##er ##s"
    assert lines["snake_case"] == "[UNK]"
    assert lines["unaffable"].startswith("un ")


def test_vindex_pq_build_and_adc_search(spark, sf_small, tmp_path, capsys):
    """`vindex --pq residual` builds the IVFADC store; `--probe --adc`
    serves the composed search and matches store.search_adc directly;
    a codeless store and the unsupported --adc+--filter combination
    both fail loudly."""
    from pyspark.sql import functions as F

    from production_ready_ds_spark.operators.ivfstore import IVFStore
    from production_ready_ds_spark.tables import load

    root = str(tmp_path / "ivfpq")
    assert main(["vindex", "--root", root, "--sf", sf_small, "--pq", "residual"]) == 0
    out = capsys.readouterr().out
    assert "trained PQ codebooks (residual)" in out
    store = IVFStore(root)
    assert store.pq_residual() is True
    assert (
        main(
            ["vindex", "--root", root, "--probe", "0,1", "--k", "2",
             "--adc", "--sf", sf_small]
        )
        == 0
    )
    out = capsys.readouterr().out
    emb = load(spark, sf_small, "embeddings").select("vec_id", "embedding")
    want = store.search_adc(
        emb.filter(F.col("vec_id").isin([0, 1])), top_k=2, nprobe=4, refine=4
    ).collect()
    assert want
    for r in want:
        assert str(r.neighbor_id) in out
    # --adc on a codeless store: loud error, not a confusing traceback
    plain = str(tmp_path / "plain")
    assert main(["vindex", "--root", plain, "--sf", sf_small]) == 0
    capsys.readouterr()
    assert (
        main(["vindex", "--root", plain, "--probe", "0", "--adc", "--sf", sf_small])
        == 2
    )
    assert "no PQ codebooks" in capsys.readouterr().err
    # --pq on an already-segmented store: loud error, exit 2
    assert (
        main(["vindex", "--root", plain, "--sf", sf_small, "--pq", "raw"]) == 2
    )
    assert "already has segments" in capsys.readouterr().err
    # --adc + --filter on a store WITHOUT an attrs sidecar: loud error
    assert (
        main(
            ["vindex", "--root", root, "--probe", "0", "--adc",
             "--filter", "lang=de", "--sf", sf_small]
        )
        == 2
    )
    assert "attrs sidecar" in capsys.readouterr().err


def test_vindex_sampled_train_and_undersized_sample_error(
    spark, sf_small, tmp_path, capsys
):
    """--max-train-rows builds a working store (k still corpus-scaled);
    an undersized sample (< k) is the clean exit-2 stderr path, not a
    traceback (review r10 #4)."""
    from production_ready_ds_spark.__main__ import main

    bad = str(tmp_path / "vbad")
    assert main(
        ["vindex", "--root", bad, "--sf", sf_small, "--max-train-rows", "8"]
    ) == 2
    err = capsys.readouterr().err
    assert "max_train_rows" in err and "Traceback" not in err

    root = str(tmp_path / "vsamp")
    assert main(
        ["vindex", "--root", root, "--sf", sf_small, "--max-train-rows", "200"]
    ) == 0
    out = capsys.readouterr().out
    assert "trained 16 lists" in out and "indexed 1 segment" in out
    assert main(
        ["vindex", "--root", root, "--probe", "0,1", "--k", "2", "--sf", sf_small]
    ) == 0
    assert len(capsys.readouterr().out.strip().splitlines()) > 4
