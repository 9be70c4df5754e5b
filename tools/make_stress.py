#!/usr/bin/env python
"""Build the derived dedup-stress measurement set (SCALE.md "4x
extrapolation point").

Replicates a source SF directory's ``documents`` and ``embeddings``
tables ``copies`` times with offset keys and per-copy perturbation:

- documents: copy c > 0 appends a copy-specific trailing token, so
  every original gains (copies-1) NEAR-IDENTICAL siblings — duplicate
  families multiply and within-family pair work grows ~copies²: a
  deliberate stress on every dedup path (jaccard, minhash, CDC runs,
  clustering, cluster-weighted sampling).
- embeddings: copy c > 0 nudges the first component by c * 1e-3, so
  cosine stays ≈ 1 and the sign bucket is almost always preserved —
  the same family stress for the semantic/embedding dedup path.
- customer / lineitem (round 8): plain key-offset replication (no
  perturbation) for the layout/warehouse family — l_partkey/l_suppkey
  keep their ORIGINAL domains, so the z-order/Hilbert scaling grids
  stay fixed while row count grows (bucket mass scales, boxes don't),
  and the customer key space grows for SCD2/upsert merges.

KEY LAYOUT (read this before batching over a stress set): copy ``c``
offsets every key by ``c * 10_000_000`` — doc_ids/vec_ids are SPARSE
strides, NOT a contiguous [0, copies·n) range. An id-range ingest
must therefore batch with ``batch_size=10**7`` (one batch per replica
copy); smaller ranges silently ingest only copy 0 and leave every
other batch empty (cost a round-11 session a false incremental-vs-
one-shot divergence before diagnosis).

This is a MEASUREMENT input only (never a correctness input — oracles
run on the shipped testdata). Usage:

    python tools/make_stress.py /root/testdata/sf0.1 /tmp/sf0.1x4 4
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.1x4"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + c.c * 10000000 AS doc_id,
                 CASE WHEN c.c = 0 THEN d.text
                      ELSE d.text || ' sib' || c.c END AS text,
                 d.lang, d.source,
                 -- recomputed: perturbed siblings must stay internally
                 -- consistent (text, n_chars) or char-based reports skew
                 LENGTH(CASE WHEN c.c = 0 THEN d.text
                             ELSE d.text || ' sib' || c.c END) AS n_chars
          FROM read_parquet('{src}/documents.parquet') d,
               (SELECT range AS c FROM range({copies})) c
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + c.c * 10000000 AS vec_id,
                 CASE WHEN c.c = 0 THEN e.embedding
                      ELSE list_prepend(CAST(e.embedding[1] + c.c * 0.001
                                             AS FLOAT),
                                        e.embedding[2:]) END AS embedding
          FROM read_parquet('{src}/embeddings.parquet') e,
               (SELECT range AS c FROM range({copies})) c
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT t.c_custkey + c.c * 10000000 AS c_custkey,
                 t.c_name, t.c_nationkey, t.c_acctbal, t.c_mktsegment
          FROM read_parquet('{src}/customer.parquet') t,
               (SELECT range AS c FROM range({copies})) c
        ) TO '{dst}/customer.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT t.* REPLACE (t.l_orderkey + c.c * 10000000 AS l_orderkey)
          FROM read_parquet('{src}/lineitem.parquet') t,
               (SELECT range AS c FROM range({copies})) c
        ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    for row in con.execute(
        f"""SELECT 'documents', COUNT(*) FROM read_parquet('{dst}/documents.parquet')
            UNION ALL
            SELECT 'embeddings', COUNT(*) FROM read_parquet('{dst}/embeddings.parquet')
            UNION ALL
            SELECT 'customer', COUNT(*) FROM read_parquet('{dst}/customer.parquet')
            UNION ALL
            SELECT 'lineitem', COUNT(*) FROM read_parquet('{dst}/lineitem.parquet')"""
    ).fetchall():
        print(*row)


if __name__ == "__main__":
    main()
