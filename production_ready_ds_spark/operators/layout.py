"""Data-layout maintenance: small-file compaction and range-clustered
writes.

The reference writes one CSV per day (reference
`01_classification_pipeline.py:203-207`) — at 100 TB the analogous
failure mode is a lake of kilobyte parquet files (one per micro-batch
per partition) whose open/footer overhead dominates scans, and row
groups whose min/max stats span the whole key domain so predicate
pushdown prunes nothing. These two operators are the standard
counter-moves; transactional table formats (Delta OPTIMIZE / Iceberg
rewrite_data_files + Z-ORDER) productize exactly these rewrites, and the
plan shapes below are what they execute.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_ROWS = 1_000_000

#: Largest In(...) literal list that may be PUSHED to the parquet
#: reader. Spark converts a pushed In to a parquet FilterPredicate
#: whose evaluation recurses per element (an OR-chain, not a set
#: probe), and the scan STACK-OVERFLOWS when the chain outgrows the
#: task stack — first hit by a 5 000-doc curation-ingest batch
#: (round 11). The cliff is NOT a stable constant: it moves with
#: whatever else is on the task stack (codegen depth, plan shape) —
#: measured 1 000 OK / 1 500 crash on one scan, then 750 OK / 1 000
#: CRASH on the 64×-grown store read in the same round — so the cap
#: rides well below every observed cliff rather than at the edge.
#: Larger lists are served by :func:`pruned_isin` as a UNION of ≤ cap
#: pushed chunks (row-group pruning preserved, bounded recursion);
#: the bare ratchet leaves them a post-scan InSet (hash probe, no
#: recursion, pruning lost).
MAX_IN_PUSHDOWN = 250


def ratchet_in_pushdown(spark: SparkSession, n_values: int) -> bool:
    """Raise ``spark.sql.parquet.pushdown.inFilterThreshold`` so an
    In(``n_values``) predicate pushes to parquet row-group stats —
    RATCHET semantics (max with current, never a lowering: the lazy
    scan reads the conf at execution time, and a raise is strictly
    more precise pruning for every other scan) — unless ``n_values``
    exceeds :data:`MAX_IN_PUSHDOWN`, in which case the threshold is
    left alone and False is returned (the caller's isin stays a safe
    post-scan InSet). The cap also bounds the ratchet itself, so no
    earlier raise can ever let a later oversized In slip through."""
    if n_values > MAX_IN_PUSHDOWN:
        return False
    conf_key = "spark.sql.parquet.pushdown.inFilterThreshold"
    current = int(spark.conf.get(conf_key, "10"))
    # Spark pushes an In when values.length <= threshold, so n_values
    # itself suffices — and the stored value is CLAMPED to the cap
    # (the one permitted lowering: it can only un-push Ins larger than
    # the cap, which is the point), so a pre-cap session value can
    # never let a cap+1 list through.
    spark.conf.set(conf_key, str(min(max(current, n_values), MAX_IN_PUSHDOWN)))
    return True


#: Store rows PER PROBED VALUE before an over-cap key list is served
#: as a UNION of chunked pushed Ins rather than one post-scan InSet.
#: The crossover scales with the key count, not the store alone:
#: row-group pruning wins only when row groups far outnumber the
#: probed keys (each uniform key lands in ~1 row group of ~10⁵ rows,
#: so |keys| keys blanket any store under ~|keys|·10⁵ rows and the
#: chunk union pays per-branch scan scheduling for zero pruning —
#: measured on the 64×-grown curation exact store, 320 k rows /
#: 5 000 keys: chunked 4.8 s vs single InSet scan 2.9 s). Chunked
#: pushes win far above the crossover (the 100 TB store: row groups
#: ≫ keys, InSet reads the world). 2× a ~10⁵-row row-group estimate;
#: order of magnitude, not a tuned constant.
CHUNKED_PRUNE_ROWS_PER_VALUE = 200_000


def pruned_isin(
    spark: SparkSession,
    df: DataFrame,
    col: str,
    values,
    *,
    store_rows: int | None = None,
) -> DataFrame:
    """``df.filter(col IN values)`` with parquet row-group pruning
    preserved where it can actually win.

    - ≤ :data:`MAX_IN_PUSHDOWN` values: one pushed In (bounded
      OR-chain, prunes row groups by stats).
    - more values, ``store_rows`` unknown or below the value-scaled
      crossover (|values| × :data:`CHUNKED_PRUNE_ROWS_PER_VALUE`):
      post-scan InSet — one scan, hash probe, no recursion. When the
      probed keys blanket the row groups nothing would prune anyway,
      and a chunk union only adds per-branch scan scheduling
      (measured 0.61× on the 64× curation store — SCALE.md round 11).
    - more values AND a known-large store past the crossover: the
      sorted list splits into ≤ cap chunks, each pushed as its own In
      over the same scan, unioned — disjoint chunks, exact result,
      bounded recursion per branch, and total row groups touched is
      O(|values|) instead of O(store): the O(batch)-vs-O(corpus) read
      for a corpus-refresh ingest probing a planet-sized store.

    The value list stays bounded by the caller's contract (e.g.
    ``collect_prune_keys``'s MAX_PRUNE_KEYS = 8 192 → ≤ 33 branches);
    an unbounded list belongs in a broadcast semi-join, not here."""
    # set() before sorting: a duplicate value straddling a chunk
    # boundary would land in TWO chunks and its rows would surface
    # twice in the union (round-11 review finding — 'disjoint chunks'
    # must be made true, not assumed of the caller's list)
    vals = sorted(set(values))
    if len(vals) <= MAX_IN_PUSHDOWN:
        ratchet_in_pushdown(spark, len(vals))
        return df.filter(F.col(col).isin(vals))
    if (
        store_rows is None
        or store_rows < len(vals) * CHUNKED_PRUNE_ROWS_PER_VALUE
    ):
        # the ratchet's cap keeps this a post-scan InSet even if an
        # earlier caller raised the session threshold
        return df.filter(F.col(col).isin(vals))
    ratchet_in_pushdown(spark, MAX_IN_PUSHDOWN)
    out = None
    for i in range(0, len(vals), MAX_IN_PUSHDOWN):
        part = df.filter(F.col(col).isin(vals[i : i + MAX_IN_PUSHDOWN]))
        out = part if out is None else out.unionByName(part)
    return out


def _swap_into(tmp: str, target: str) -> None:
    """Replace ``target`` with ``tmp`` via two renames.

    LOCAL POSIX FILESYSTEM ONLY (os.rename/shutil.rmtree — object
    stores have neither atomic rename nor cheap directory moves), and
    single-writer by contract:

    - readers racing the swap can hit the window between the two
      renames where ``target`` does not exist (ENOENT) — the same
      non-atomicity the unpartitioned upsert documents;
    - a WRITER appending to ``target`` between the caller's scan and
      this swap LOSES that append silently: the swap replaces the
      directory wholesale, discarding files the scan never saw.

    Run compaction from the same scheduler slot that owns writes (the
    workflow engine's single-writer tasks, SignatureStore's append
    contract), or use a transactional table format — Delta/Iceberg
    OPTIMIZE is this exact rewrite with a real commit protocol."""
    old = target + f".old-{uuid.uuid4().hex[:8]}"
    os.rename(target, old)
    os.rename(tmp, target)
    shutil.rmtree(old)


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_rows_per_file: int = DEFAULT_TARGET_ROWS,
) -> int:
    """Rewrite a parquet directory into ⌈rows / target⌉ right-sized
    files and return the new file count.

    The rewrite is one job: scan → AQE-coalesced repartition → write to
    a temp directory → directory swap (same non-atomic-for-readers
    caveat as the unpartitioned upsert — a table format makes the commit
    transactional at scale; the rewrite itself is identical). Row count,
    schema, and values are preserved exactly; only the file layout
    changes. Compaction cost is one linear read+write of the data, which
    is why production lakes run it continuously on recent partitions
    rather than ever compacting the whole table at once.
    """
    # Normalize once: a trailing slash would make the _swap_into rename
    # target a path "inside" itself (EINVAL) after the rewrite ran.
    path = path.rstrip("/") or "/"
    df = spark.read.parquet(path)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))
    tmp = path + f".compact-{uuid.uuid4().hex[:8]}"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    _swap_into(tmp, path)
    return sum(
        1 for f in os.listdir(path) if f.endswith(".parquet") and not f.startswith(".")
    )


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    *,
    n_files: int = 8,
) -> int:
    """Write ``df`` range-partitioned AND sorted on ``cluster_cols`` so
    each output file owns a disjoint slice of the key domain. Returns
    the EXACT written row count (one count job over the just-written
    files — the vectorized reader answers count(*) from row-group
    metadata, no column IO) so the manifest-backed stores can record
    true segment sizes and their pruned reads can make the
    InSet-vs-chunked-push density decision (:func:`pruned_isin`).

    Deliberately NOT a ``pyspark.sql.Observation`` on the write job:
    a registered observation leaves the session's ObservationManager
    reachable from later jobs' closures, and the next ML-fit-shaped
    job in the same JVM dies with ``Task not serializable:
    NotSerializableException: ObservationManager`` (Spark 4.1;
    surfaced as four classifier-test failures in the round-11 full
    suite, invisible to isolated runs). The small metadata count is
    the safe price; regression pinned in tests/test_sigstore.py.

    Why this matters at 100 TB: parquet pushdown prunes by row-group
    min/max. After an unordered write every file spans the whole key
    range — stats prune nothing and a point query reads the table.
    After this write, file k holds keys in [lo_k, hi_k) only, so a
    range/point predicate touches the one or two files whose slice
    intersects it (verified structurally in tests/test_layout.py by
    reading the footers back). ``repartitionByRange`` samples the key
    distribution, so skewed domains still yield balanced files;
    ``sortWithinPartitions`` orders rows inside each file so row-group
    (not just file) stats are tight too. This is single-dimension
    clustering — the linearized multi-column analogue is a Z-order key;
    for the common time-series + id case, (date, id) range clustering
    is what query patterns actually hit.
    """
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
    return df.sparkSession.read.parquet(path).count()


def _minmax_scaled(df: DataFrame, cluster_cols: list[str], bits: int) -> list:
    """Per-dimension linear min-max scaling into [0, 2^bits) as column
    expressions — the ONE scaling both clustered writers share (a
    guard or clamp fix applied here reaches z-order and Hilbert alike).
    One tiny driver aggregate (2 numbers per column). An empty or
    all-NULL frame has no usable bounds — raise a clear error rather
    than let ``None - None`` surface as a TypeError downstream."""
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cluster_cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cluster_cols],
    ).first()
    top = (1 << bits) - 1
    scaled = []
    for c in cluster_cols:
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        if mn is None or mx is None:
            raise ValueError(
                f"cannot min-max scale '{c}': no non-NULL values to bound"
            )
        span = (mx - mn) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top),
            ).cast("long")
        )
    return scaled


def zorder_key(scaled_cols: list, bits: int = 8):
    """Interleave the low ``bits`` of already-scaled int columns into a
    Morton (Z-order) key — pure JVM bit arithmetic, whole-stage
    codegen-friendly. Callers scale each dimension into [0, 2^bits)
    first (see write_zorder_clustered)."""
    key = F.lit(0).cast("long")
    n = len(scaled_cols)
    for i in range(bits):
        for j, c in enumerate(scaled_cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    *,
    bits: int = 8,
    n_files: int = 8,
    rank_scale: bool = False,
) -> None:
    """Write ``df`` clustered on the Z-order (Morton) interleaving of
    ``cluster_cols`` — the MULTI-dimension analogue of
    :func:`write_range_clustered`.

    Why: single-dimension range clustering makes file/row-group min-max
    stats tight on the LEAD column only — a predicate on the second
    column still reads every file. Interleaving the dimensions' bits
    makes each file own a small hyper-rectangle of the key space, so
    point/range predicates on ANY clustered column prune a large
    fraction of files (Delta OPTIMIZE ZORDER / Iceberg z-ordered
    rewrites productize exactly this write).

    By default each dimension is scaled into [0, 2^bits) by linear
    min/max from ONE tiny aggregate (collected: 2 numbers per column) —
    a single pass, but heavily SKEWED dimensions concentrate buckets
    (most rows share a handful of z-cells, so a predicate inside the
    dense region cannot prune). ``rank_scale=True`` is the production
    refinement: per-dimension approxQuantile boundaries (GK sketch,
    one pass, ≤ 2^bits−1 doubles collected per column — bounded by a
    constant) bucket each value by its RANK via the JVM-side ML
    Bucketizer, so every bucket holds ~equal row mass regardless of
    the value distribution and dense-region predicates prune as well
    as uniform ones (measured in tests/test_layout.py). Works for
    numeric/date columns; same single-writer/local-fs caveats as
    _swap_into when rewriting in place."""
    top = (1 << bits) - 1
    if rank_scale:
        from pyspark.ml.feature import Bucketizer

        probs = [i / (1 << bits) for i in range(1, 1 << bits)]
        dcols = [f"_rsd_{c}" for c in cluster_cols]
        work = df.select(
            "*", *[F.col(c).cast("double").alias(d) for c, d in zip(cluster_cols, dcols)]
        )
        # ONE multi-column approxQuantile action collects every
        # dimension's boundaries in a single pass over df; the
        # Bucketizer transforms below are lazy, so the whole write is
        # two jobs (quantiles + write) regardless of dimension count
        all_qs = work.approxQuantile(dcols, probs, 1.0 / (4 << bits))
        tmp_cols = list(dcols)
        for c, dcol, qs in zip(cluster_cols, dcols, all_qs):
            # strictly-increasing splits: heavy repeated values collapse
            # duplicate quantiles into one (wider) bucket
            splits = [float("-inf")]
            for q in qs:
                if q > splits[-1]:
                    splits.append(q)
            splits.append(float("inf"))
            out = f"_rs_{c}"
            work = Bucketizer(
                splits=splits, inputCol=dcol, outputCol=out,
                handleInvalid="keep",
            ).transform(work)
            tmp_cols.append(out)
        scaled = [
            F.least(F.lit(top), F.col(f"_rs_{c}").cast("long"))
            for c in cluster_cols
        ]
        keyed = work.withColumn("_zkey", zorder_key(scaled, bits)).drop(*tmp_cols)
    else:
        keyed = df.withColumn(
            "_zkey", zorder_key(_minmax_scaled(df, cluster_cols, bits), bits)
        )
    (
        keyed.repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def with_hilbert_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    bits: int = 8,
    out_col: str = "hkey",
    keep: tuple = (),
) -> DataFrame:
    """Append the HILBERT curve distance of two already-scaled
    [0, 2^bits) int columns — the locality-preserving refinement of
    the Z-order key (Iceberg's rewrite_data_files supports exactly
    this sort strategy). Morton order takes long diagonal jumps at
    every power-of-two boundary, so a file of consecutive z-keys can
    own two far-apart rectangles; consecutive Hilbert distances are
    always grid-adjacent, so a file of consecutive d-values owns ONE
    compact region and min/max stats stay tight on both dimensions.

    The classic per-level fold (the Wikipedia xy2d formulation) is
    STAGED: one projection per level separated by 1-element
    ``explode(array(struct(...)))`` Generate barriers, so each level's
    (x, y, d) are materialized ATTRIBUTES of the previous stage —
    codegen integer shifts throughout. Both single-expression forms
    were built and rejected on measurement: fully unrolled nested
    columns re-reference the prior level's x/y ~5× each and the
    client-side tree grows ~5^bits nodes (driver heap OOM at plan
    construction — the fused-expression re-inlining class the
    q_sketch_theta fix documents; a plain aliased Project is no
    barrier because CollapseProject re-inlines it), and the
    F.aggregate HOF fold stays constant-size but evaluates
    INTERPRETED per row — measured 5.5 s vs 0.6 s for this staged
    form on sf0.1 lineitem (600 k rows, local[32]). The DuckDB oracle
    twin replays the SAME walk as a recursive CTE
    (queries/analytics.py), so the two engines cannot disagree."""
    n = 1 << bits
    work = df.select(
        *keep,
        F.col(x_col).cast("long").alias("_hx"),
        F.col(y_col).cast("long").alias("_hy"),
        F.lit(0).cast("long").alias("_hd"),
    )
    for level in range(bits - 1, -1, -1):
        rx = F.shiftright(F.col("_hx"), level).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("_hy"), level).bitwiseAND(F.lit(1))
        d2 = F.col("_hd") + F.lit(1 << (2 * level)) * (rx * 3).bitwiseXOR(ry)
        # rotate/flip the quadrant: ry=1 keeps (x,y); ry=0 swaps, and
        # rx=1 additionally reflects through the full grid (n-1-·)
        nx = (
            F.when(ry == 1, F.col("_hx"))
            .when(rx == 1, F.lit(n - 1) - F.col("_hy"))
            .otherwise(F.col("_hy"))
        )
        ny = (
            F.when(ry == 1, F.col("_hy"))
            .when(rx == 1, F.lit(n - 1) - F.col("_hx"))
            .otherwise(F.col("_hx"))
        )
        work = work.select(
            *keep,
            F.explode(
                F.array(F.struct(nx.alias("x"), ny.alias("y"), d2.alias("d")))
            ).alias("_h"),
        ).select(
            *keep,
            F.col("_h.x").alias("_hx"),
            F.col("_h.y").alias("_hy"),
            F.col("_h.d").alias("_hd"),
        )
    return work.withColumnRenamed("_hd", out_col).drop("_hx", "_hy")


def write_hilbert_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    *,
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """Write ``df`` clustered on the HILBERT distance of two
    ``cluster_cols`` — :func:`write_zorder_clustered`'s
    locality-preserving refinement (Iceberg rewrite_data_files' hilbert
    sort strategy), and the write path behind q_hilbert_layout's key
    math: consecutive Hilbert distances are always grid-adjacent, so a
    file of consecutive keys owns ONE compact hyper-rectangle where
    consecutive Morton keys can straddle two far-apart ones — tighter
    file min/max on both dimensions, better pruning.

    Same one-pass min-max scaling as the z-order writer's default (two
    numbers collected per column), then the staged
    :func:`with_hilbert_key` walk, one repartitionByRange +
    sortWithinPartitions shuffle to the layout. Two dimensions only —
    the classic xy2d walk; for >2 dims use the z-order writer."""
    if len(cluster_cols) != 2:
        raise ValueError(
            "write_hilbert_clustered takes exactly two cluster columns "
            "(the xy2d walk); use write_zorder_clustered for other arities"
        )
    scaled = _minmax_scaled(df, cluster_cols, bits)
    keyed = with_hilbert_key(
        df.withColumn("_p0", scaled[0]).withColumn("_p1", scaled[1]),
        "_p0",
        "_p1",
        bits=bits,
        out_col="_hkey",
        keep=tuple(df.columns),
    )
    (
        keyed.repartitionByRange(n_files, F.col("_hkey"))
        .sortWithinPartitions("_hkey")
        .drop("_hkey")
        .write.mode("overwrite")
        .parquet(path)
    )
