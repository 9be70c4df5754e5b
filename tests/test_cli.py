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
