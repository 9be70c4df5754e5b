"""Custom DataSource tests: executor-side partitioned fetch,
deterministic output, time-range option pushdown."""

from __future__ import annotations


def _read(spark, **options):
    from production_ready_ds_spark.sources import register_posts_api

    register_posts_api(spark)
    r = spark.read.format("posts_api")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def test_posts_api_basic(spark):
    df = _read(spark, subreddits="datascience,gameofthrones", limit=100, slices=4)
    assert df.count() == 200  # limit per subreddit
    assert set(df.columns) == {"id", "title", "selftext", "subreddit", "created_ts"}
    subs = {r.subreddit for r in df.select("subreddit").distinct().collect()}
    assert subs == {"datascience", "gameofthrones"}


def test_posts_api_parallel_partitions(spark):
    df = _read(spark, limit=100, slices=8)
    # 2 subreddits × 8 slices fetched as independent partitions
    assert df.rdd.getNumPartitions() == 16


def test_posts_api_deterministic(spark):
    a = sorted(map(str, _read(spark, limit=50).collect()))
    b = sorted(map(str, _read(spark, limit=50).collect()))
    assert a == b


def test_posts_api_cross_process_deterministic():
    """Rows must be identical from a FRESH interpreter: builtin hash()
    is PYTHONHASHSEED-salted per process, so _fetch_slice must not use
    it (a restarted driver / foreign executor would see new data)."""
    import subprocess
    import sys

    script = (
        "from production_ready_ds_spark.sources.api_source import _fetch_slice;"
        "print(_fetch_slice('datascience', 1, 5, 0, 1000))"
    )
    from pathlib import Path

    repo_root = str(Path(__file__).resolve().parents[1])
    outs = {
        subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True, text=True, check=True, cwd=repo_root,
        ).stdout
        for _ in range(2)
    }
    assert len(outs) == 1
    from production_ready_ds_spark.sources.api_source import _fetch_slice

    assert outs.pop().strip() == str(_fetch_slice("datascience", 1, 5, 0, 1000))


def test_posts_api_time_range_pushdown(spark):
    lo, hi = 1_500_000_000, 1_500_086_400  # one day
    df = _read(spark, limit=200, start_ts=lo, end_ts=hi)
    ts = [r.created_ts for r in df.select("created_ts").collect()]
    assert ts and all(lo <= t < hi for t in ts)


# ---------------------------------------------------------------- jsonl --


def test_jsonl_roundtrip_documents(spark, sf_small, tmp_path):
    """documents → JSONL → read back must be value-identical (plain and
    gzip), under the explicit-schema contract."""
    from production_ready_ds_spark.sources.jsonl import (
        DOCUMENTS_SCHEMA,
        read_jsonl,
        write_jsonl,
    )
    from production_ready_ds_spark.tables import load

    d = load(spark, sf_small, "documents")
    for compress, name in [(False, "plain"), (True, "gz")]:
        path = str(tmp_path / f"docs_{name}")
        write_jsonl(d, path, compress=compress)
        back = read_jsonl(spark, path, DOCUMENTS_SCHEMA)
        assert sorted(back.collect()) == sorted(d.collect())


def test_jsonl_corrupt_lines_are_quarantined_not_fatal(spark, tmp_path):
    """Malformed lines must flow to the quarantine side with their raw
    text; the clean side parses everything else."""
    import os

    from production_ready_ds_spark.sources.jsonl import (
        read_jsonl,
        split_corrupt,
    )

    path = str(tmp_path / "mixed")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-0.jsonl"), "w") as fh:
        fh.write('{"doc_id": 1, "text": "good row"}\n')
        fh.write("this is not json at all\n")
        fh.write('{"doc_id": 2, "text": "also good"}\n')
        fh.write('{"doc_id": 3, "text": "truncated...\n')
    df = read_jsonl(spark, path, "doc_id long, text string", keep_corrupt=True)
    clean, bad = split_corrupt(df)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    raw = {r.raw_line for r in bad.collect()}
    assert len(raw) == 2 and any("not json" in x for x in raw)
    # default read drops the corrupt rows silently
    assert read_jsonl(spark, path, "doc_id long, text string").count() == 2


def test_orc_roundtrip_and_pushdown(spark, sf_small, tmp_path):
    """ORC source/sink: write -> read returns identical rows + schema,
    and predicate pushdown + column pruning survive the format swap
    (the contract that lets a parquet-shaped pipeline consume
    Hive-heritage ORC inputs unchanged)."""
    from production_ready_ds_spark.plans.audit import explain_str, pushed_filters
    from production_ready_ds_spark.sources.orc import read_orc, write_orc
    from production_ready_ds_spark.tables import load

    docs = load(spark, sf_small, "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    back = read_orc(spark, path)
    assert back.schema == docs.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))
    q = back.filter("doc_id < 10").select("doc_id", "lang")
    pushed = " ".join(pushed_filters(q))
    assert "doc_id" in pushed, explain_str(q)[:600]
    assert q.count() == 10
    # array-typed embeddings round-trip too
    emb = load(spark, sf_small, "embeddings")
    write_orc(emb, str(tmp_path / "emb_orc"))
    back2 = read_orc(spark, str(tmp_path / "emb_orc"))
    assert back2.schema == emb.schema and back2.count() == emb.count()
    # the timestamp-bearing events table round-trips value-exactly
    ev = load(spark, sf_small, "events")
    write_orc(ev, str(tmp_path / "ev_orc"))
    back3 = read_orc(spark, str(tmp_path / "ev_orc"))
    assert back3.schema == ev.schema
    a = ev.agg({"ts": "min"}).first()[0], ev.agg({"ts": "max"}).first()[0], ev.count()
    b = back3.agg({"ts": "min"}).first()[0], back3.agg({"ts": "max"}).first()[0], back3.count()
    assert a == b


def test_xml_roundtrip_documents(spark, sf_small, tmp_path):
    """XML (Spark 4 native source) round-trips the documents table
    byte-for-byte with an explicit schema, plain and gzipped."""
    from production_ready_ds_spark.sources.jsonl import DOCUMENTS_SCHEMA
    from production_ready_ds_spark.sources.xml import read_xml, write_xml
    from production_ready_ds_spark.tables import load

    docs = load(spark, sf_small, "documents")
    before = sorted(map(tuple, docs.collect()))
    for compress, sub in ((False, "plain"), (True, "gz")):
        out = str(tmp_path / sub)
        write_xml(docs, out, compress=compress)
        back = read_xml(spark, out, DOCUMENTS_SCHEMA)
        assert sorted(map(tuple, back.select(*docs.columns).collect())) == before


def test_xml_corrupt_elements_are_quarantined_not_fatal(spark, tmp_path):
    """A type-malformed element must not kill the read: keep_corrupt
    yields the clean rows plus a quarantine frame; the DROPMALFORMED
    default silently drops it from materialized reads (count() over a
    fully-pruned scan tallies unparsed tags — the documented caveat)."""
    import os

    from production_ready_ds_spark.sources.xml import (
        read_xml,
        split_corrupt_xml,
        write_xml,
    )

    raw = str(tmp_path / "raw")
    os.makedirs(raw)
    with open(raw + "/part.xml", "w") as f:
        f.write(
            "<docs>\n"
            "<doc><doc_id>1</doc_id><text>hello</text></doc>\n"
            "<doc><doc_id>oops</doc_id><text>bad type</text></doc>\n"
            "<doc><doc_id>3</doc_id><text>world</text></doc>\n"
            "</docs>"
        )
    kept = read_xml(spark, raw, "doc_id long, text string", keep_corrupt=True)
    clean, bad = split_corrupt_xml(kept)
    assert sorted(map(tuple, clean.collect())) == [(1, "hello"), (3, "world")]
    assert bad.count() == 1
    dropped = read_xml(spark, raw, "doc_id long, text string")
    assert sorted(map(tuple, dropped.collect())) == [(1, "hello"), (3, "world")]
    # row_tag is honored on write: a custom tag reads back under it
    out = str(tmp_path / "tagged")
    write_xml(clean, out, row_tag="record", root_tag="records")
    again = read_xml(spark, out, "doc_id long, text string", row_tag="record")
    assert again.count() == 2
