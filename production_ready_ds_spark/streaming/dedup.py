"""Streaming near-dup detection: the ingest-dedup keep-rule as a
stateful Structured Streaming operator.

Round-2 verdict item 8 asked for a stateful-streaming twin of the
incremental dedup path "if protobuf lands" (transformWithStateInPandas
needs it). It doesn't have to wait: ``applyInPandasWithState`` — already
proven by streaming/events.py running_user_totals — carries the
per-bucket signature state without protobuf.

Operator shape (mirrors operators/dedup.py minhash_bands +
minhash_candidates, incremental form):

1. **Map-only signatures.** Per-doc MinHash signatures are computed as
   ARRAY EXPRESSIONS (array_min over per-slot rehashes of the doc's own
   shingle array) — bit-identical to the batch explode+groupBy chain
   (same (a_i·md5prefix(shingle)+b_i) mod P composition, and min is
   insensitive to the batch path's distinct), but with ZERO shuffle
   before the stateful stage, which Structured Streaming's
   one-stateful-op-per-query rule effectively requires.
2. **Band explode** (still map-only): one row per (doc, band) with the
   bucket key.
3. **Stateful bucket join.** ``applyInPandasWithState`` keyed on
   (band, key): state holds the bucket's ``cap`` lowest-id member
   signatures (the OVERSIZED_BUCKET_CAP rank semantics); each arriving
   doc emits candidate pairs against the current members, then joins
   the state if it ranks. Pair work per bucket is |bucket|·cap — the
   same linear bound as the batch guard — and state is O(cap) rows per
   bucket, sharded by the group key across the cluster.

A pair is emitted once per SHARED BAND (the stream cannot run a second
stateful distinct); collapse to distinct pairs downstream — in a
foreachBatch sink merge or the consumer's aggregation — exactly as the
batch path's ``.distinct()`` does. With in-id-order arrival (the ingest
DAG's batch order), the emitted pair set equals the batch
minhash_candidates result (tests/test_streaming_dedup.py).
"""

from __future__ import annotations

import pickle

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    BAND_SIZE,
    MINHASH_A,
    MINHASH_B,
    MINHASH_EST_THRESHOLD,
    MINHASH_P,
    N_MINHASH,
    OVERSIZED_BUCKET_CAP,
    shingles,
)
from ..functions.text import md5_prefix_int, tokens_expr

OUTPUT_SCHEMA = "doc_a long, doc_b long, est_jaccard double"
STATE_SCHEMA = "blob binary"


def signature_columns(sgh_col, *, n_hashes: int = N_MINHASH) -> list:
    """Per-doc MinHash signature over a RESIDENT shingle-hash array
    column: mh_i = array_min((a_i·sgh + b_i) mod P). Same md5+affine
    chain as operators/dedup.py minhash_bands (the shingle array is
    already distinct, so the min matches the batch path's
    distinct-explode exactly); NULL when the doc has no shingles
    (callers drop those rows, matching the batch path where such docs
    never survive the explode).

    The argument must be an ATTRIBUTE (a materialized column), not an
    inline expression: each of the N columns references it, and an
    inline tokenize→shingle→md5 chain would be re-inlined into every
    one of them — see :func:`banded_signatures` for the Generate
    barrier that guarantees single evaluation."""
    return [
        F.array_min(
            F.transform(
                sgh_col,
                # safe late-binding: pyspark calls the lambda eagerly
                # while this comprehension iteration is still current
                lambda h: (h * F.lit(MINHASH_A[i]) + F.lit(MINHASH_B[i]))
                % F.lit(MINHASH_P),
            )
        ).alias(f"mh{i}")
        for i in range(n_hashes)
    ]


def banded_signatures(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = N_MINHASH,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """(doc, band, key, mh0..mhN) rows via stateless per-row
    expressions — the streaming-safe twin of minhash_bands (no
    aggregation, so it can precede the query's single stateful
    operator).

    GENERATE BARRIER (round-7 16× stress finding): the token array and
    the shingle-hash array are each materialized through an
    ``explode(array(...))`` of a ONE-element array. A plain aliased
    Project is NOT enough — CollapseProject re-inlines the alias into
    all N signature columns (and SimplifyExtractValueOps undoes the
    struct-bind trick), re-running tokenize→shingle→md5 per column and
    per element: measured 164 s for the fused form vs 7.6 s with the
    barrier on the 16× corpus, bit-identical output. Catalyst does not
    collapse a Project through Generate (the shingled_docs rule), and
    a 1:1 explode stays legal before a streaming stateful operator."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array(tokens_expr(F.col(text_col)))).alias("ts"),
    )
    shg = tok.select(
        "doc_id",
        F.explode(
            F.array(F.transform(shingles(F.col("ts")), md5_prefix_int))
        ).alias("sgh"),
    )
    sig = shg.select(
        "doc_id", *signature_columns(F.col("sgh"), n_hashes=n_hashes)
    )
    sig = sig.filter(F.col("mh0").isNotNull())
    n_bands = n_hashes // band_size
    return sig.select(
        "doc_id",
        *[f"mh{i}" for i in range(n_hashes)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col(f"mh{b * band_size + j}") for j in range(band_size)]
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", *[f"mh{i}" for i in range(n_hashes)], "bk.band", "bk.key")


def streaming_minhash_candidates(
    docs_stream: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = MINHASH_EST_THRESHOLD,
    bucket_cap: int = OVERSIZED_BUCKET_CAP,
    n_hashes: int = N_MINHASH,
) -> DataFrame:
    """Continuous near-dup candidates over a document stream: each
    micro-batch's docs are checked against everything indexed before
    them (and, in arrival order, each other) — the ingest-dedup
    keep-rule as one stateful operator. See module docstring."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    bands = banded_signatures(
        docs_stream, id_col=id_col, text_col=text_col, n_hashes=n_hashes
    )
    mh_cols = [f"mh{i}" for i in range(n_hashes)]

    def update_bucket(key, pdfs, state):
        # state = (members, hwm): members are the bucket's cap lowest-id
        # signatures; hwm is the highest id ever processed, so a
        # re-delivered doc that was rank-cap-EVICTED (no longer a
        # member) is still recognized and skipped — exact under the
        # in-id-order delivery the ingest DAG provides.
        members: list[tuple[int, tuple]]
        if state.exists:
            members, hwm = pickle.loads(state.get[0])
        else:
            members, hwm = [], -1
        out_a, out_b, out_e = [], [], []
        chunks = list(pdfs)
        if not chunks:  # timeout-only invocation (not used: NoTimeout)
            yield pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []})
            return
        rows = pd.concat(chunks, ignore_index=True)
        # in-batch determinism: process in id order, so earlier docs of
        # the same micro-batch are already members when later ones probe
        rows = rows.sort_values("doc_id")
        for row in rows.itertuples(index=False):
            doc_id = int(row.doc_id)
            if doc_id <= hwm or any(mid == doc_id for mid, _ in members):
                continue  # re-delivery no-op (O2 semantics): the doc
                # already probed and indexed — re-emitting its pairs
                # would double-count downstream
            hwm = max(hwm, doc_id)
            sig = tuple(int(getattr(row, c)) for c in mh_cols)
            for mid, msig in members:
                est = sum(a == b for a, b in zip(sig, msig)) / float(n_hashes)
                if est >= threshold:
                    out_a.append(min(mid, doc_id))
                    out_b.append(max(mid, doc_id))
                    out_e.append(round(est, 4))
            members.append((doc_id, sig))
            if len(members) > bucket_cap:
                # rank cap: keep the bucket's cap lowest ids
                members.sort(key=lambda m: m[0])
                members = members[:bucket_cap]
        state.update((pickle.dumps((members, hwm)),))
        yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "est_jaccard": out_e})

    return bands.groupBy("band", "key").applyInPandasWithState(
        update_bucket,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HAMMING_OUTPUT_SCHEMA = "doc_a long, doc_b long, hamming long"


def streaming_hamming_candidates(
    fp_stream: DataFrame,
    *,
    id_col: str = "doc_id",
    n_bands: int = 8,
    radius: int = 7,
    bucket_cap: int = OVERSIZED_BUCKET_CAP,
) -> DataFrame:
    """Continuous PERCEPTUAL near-dup pairs over a fingerprint stream —
    the incremental_hamming_dedup keep-rule as ONE stateful operator
    (the streaming_minhash_candidates shape applied to banded
    bit-fingerprints): the input is a STREAM of (id, b0..b{n-1})
    fingerprint rows (produced map-only, e.g. the fused synth → dHash
    kernel via mapInPandas — fingerprinting needs no cross-row state),
    band-exploded on the RAW 16-bit band values (the incremental
    path's blocking — full pigeonhole radius guarantee, and the stored
    key layout), then applyInPandasWithState keyed on (band, key):
    state holds the bucket's ``cap`` lowest-id member fingerprints
    plus a processed-id high-water mark (re-delivery no-op, exact
    under in-id-order arrival), and each arriving doc emits EXACT
    Hamming ≤ radius pairs against the current members before joining
    the state if it ranks.

    Pairs emit once per shared band (the one-stateful-op rule forbids
    a second stateful distinct) — collapse downstream with
    ``.distinct()``; ``hamming`` is pair-deterministic, so the
    3-column distinct IS the pair set. With in-id-order arrival the
    distinct set equals batch hamming_candidates at raw-band tier
    (tests/test_streaming_dedup.py)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    b_cols = [f"b{k}" for k in range(n_bands)]
    bands = fp_stream.select(
        F.col(id_col).alias("doc_id"),
        *b_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.col(f"b{k}").cast("long").alias("key"),
                    )
                    for k in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", *b_cols, "bk.band", "bk.key")

    def update_bucket(key, pdfs, state):
        members: list[tuple[int, tuple]]
        if state.exists:
            members, hwm = pickle.loads(state.get[0])
        else:
            members, hwm = [], -1
        out_a, out_b, out_h = [], [], []
        chunks = list(pdfs)
        if not chunks:  # timeout-only invocation (not used: NoTimeout)
            yield pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
            return
        rows = pd.concat(chunks, ignore_index=True)
        # in-batch determinism: id order, so earlier docs of the same
        # micro-batch are members when later ones probe (the minhash
        # twin's rule)
        rows = rows.sort_values("doc_id")
        for row in rows.itertuples(index=False):
            doc_id = int(row.doc_id)
            if doc_id <= hwm or any(mid == doc_id for mid, _ in members):
                continue  # re-delivery no-op (O2 semantics)
            hwm = max(hwm, doc_id)
            fp = tuple(int(getattr(row, c)) for c in b_cols)
            for mid, mfp in members:
                h = sum((a ^ b).bit_count() for a, b in zip(fp, mfp))
                if h <= radius:
                    out_a.append(min(mid, doc_id))
                    out_b.append(max(mid, doc_id))
                    out_h.append(h)
            members.append((doc_id, fp))
            if len(members) > bucket_cap:
                # rank cap: keep the bucket's cap lowest ids
                members.sort(key=lambda m: m[0])
                members = members[:bucket_cap]
        state.update((pickle.dumps((members, hwm)),))
        yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "hamming": out_h})

    return bands.groupBy("band", "key").applyInPandasWithState(
        update_bucket,
        outputStructType=HAMMING_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
