"""Scalable near-duplicate primitives: shingling, capped Jaccard pair
generation, and connected-components duplicate clustering.

These are the building blocks behind the ``q_dedup_*`` catalog queries
and the curation pipeline's near-dup stage. Everything is blocked — the
pair join keys on shingle hash, never all-pairs — and the dominant
intermediate (the exploded shingle table) is materialized exactly once
via an eager local checkpoint, because AQE's adaptive stage creation
misses the ReuseExchange that static planning finds on identical
self-join sides (measured 2× the dominant stage without it).

100 TB notes per primitive are in the docstrings; the shared theme is
that every step is a linear scan, a hash shuffle on a uniform key, or a
bucket-local pair join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from ..functions.text import md5_prefix_int, tokens_expr

#: Per-shingle occurrence cap (rank cap): each shingle is kept only in
#: its df_cap lowest-id documents. Motivation is join cost — pair-join
#: work per shingle is df², and one stop-phrase shingle present in most
#: of a 100 TB corpus would detonate the self-join on its own; the cap
#: bounds it at df_cap² per shingle (Σ min(df, cap)² ≤ rows·cap total).
#: A rank cap rather than a drop-hot-shingles-everywhere rule so that
#: duplicate FAMILIES larger than the cap stay visible: their lowest
#: df_cap members keep every shared shingle and still pair at ~1.0
#: (a pure df>cap drop would strip such a family of all its shingles
#: and hide it from near-dup detection entirely).
DEFAULT_DF_CAP = 20

DEFAULT_JACCARD_THRESHOLD = 0.5


def shingles(toks: Column, k: int = 3) -> Column:
    """Distinct k-token shingles as a column expression (empty when the
    doc has <k tokens — guarded because ``F.sequence(1, 0)`` would count
    DOWN, not produce an empty array)."""
    idx = F.when(
        F.size(toks) >= k, F.sequence(F.lit(1), F.size(toks) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )
    return F.array_distinct(sh)


def gram_hash_at(ts, k: int):
    """Positional gram hasher: returns ``at(i) -> Column`` giving the
    md5-prefix integer hash of the ``k``-token gram starting at 1-based
    position ``i`` of token-array column ``ts`` — THE cross-engine
    gram-hash convention (md5 of the space-joined tokens, first 8 hex
    chars as an integer; DuckDB computes the identical value from
    ``('0x' || substr(md5(array_to_string(list_slice(...), ' ')), 1, 8))``).
    ONE definition shared by winnowing, CDC chunking, q_quality_dupgrams
    and q_text_novelty, so a one-character drift in any copy can no
    longer silently break exactly that query's oracle parity."""

    def at(i):
        return md5_prefix_int(F.array_join(F.slice(ts, i, F.lit(k)), " "))

    return at


def shingled_docs(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """documents → (id, sg) exploded distinct 3-token shingle strings.

    Two-step projection on purpose: the token array is materialized in
    its own Project before the explode — Catalyst does not collapse a
    Project through Generate, so the tokenizer runs once per row. A
    single fused expression would re-inline filter(split(lower(text)))
    into every element_at lambda → O(tokens²) per document (measured 4×
    slower at sf0.1).

    Deliberately does NOT spread here: callers that checkpoint the
    exploded frame (_capped_pair_counts) spread the INPUT themselves
    and re-compact the checkpoint, so the producer parallelism and the
    consumer partition count are chosen independently; callers that
    consume the lineage lazily keep the plain single-scan shape."""
    tok = docs.select(id_col, tokens_expr(F.col(text_col)).alias("ts"))
    return tok.select(id_col, F.explode(shingles(F.col("ts"))).alias("sg"))


def rank_cap(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    cap: int,
    *,
    salt_buckets: int = 32,
    mega_threshold: int = 100_000,
    peek: bool = False,
) -> DataFrame:
    """Keep the ``cap`` lowest-``order_col`` rows of every ``part_cols``
    group — WITHOUT sorting the uncontended majority.

    A plain row_number window shuffles and sorts the whole frame even
    though almost every group is under the cap (round-2 bench: +42 % on
    q_dedup_ngram_jaccard). Instead: (1) group sizes come from a hash
    aggregate (map-side partial combine, narrow rows, no sort); (2) the
    >cap "hot" groups — tiny by construction at any scale, since hot
    means heavier than a constant — are broadcast WITH their sizes;
    (3) the cold rows pass through a broadcast anti join untouched
    (map-side, no shuffle); (4) hot rows are routed BY GROUP SIZE:
    merely-hot groups (≤ mega_threshold rows — in practice almost all
    of them) take one direct per-group row_number window, while mega
    groups take the salted two-stage rank — first within (group, salt)
    then within group over the ≤ salt_buckets × cap survivors — so even
    a single group holding a billion rows never lands in one sort
    partition (the k smallest overall are each the k smallest within
    their salt bucket, so the two-stage result is exact). The routing
    is a map-side filter on the broadcast size — measured 28 % off the
    whole jaccard query at sf0.1 vs salting every hot group (the two
    extra window stages cost more than the 1.3k hot rows they sorted).

    With ``peek=True`` (OPT-IN — pass it only for a materialized/
    checkpointed ``df``: the probe is a driver action at
    plan-construction time, so an unmaterialized caller would silently
    re-run its whole upstream lineage, and no-driver-action contexts
    such as streaming plans would break), a driver-side ``limit(1)``
    probe decides
    whether any mega group EXISTS; when none does (every healthy
    corpus) the salted branch isn't planned at all. The two idle mega
    window stages measured ~0.25 s of pure scheduling overhead at
    sf0.1 — the same planned-but-idle cost the minhash oversized-bucket
    guard peeks away. The probe runs the size aggregate once more as
    its own tiny job (map-side-combined narrow rows; the probe result
    is bounded at one row) — deliberately WITHOUT checkpointing the
    hot frame, because a checkpointed hot side becomes a LogicalRDD
    with unknown stats that poisons every downstream size estimate
    (measured: the per-doc-count joins in jaccard_pairs silently lost
    their static broadcast). The default ``peek=False`` is the lazy
    safe shape: the mega branch is always planned and sits empty.

    ``df`` is consumed three times (size agg, cold anti, hot join) —
    pass a materialized/checkpointed frame or a cheap scan, not an
    expensive unmaterialized lineage. Deterministic iff (part_cols,
    order_col) has no duplicate rows."""
    sizes = df.groupBy(*part_cols).agg(F.count(F.lit(1)).alias("_df"))
    hot = sizes.filter(F.col("_df") > cap)
    if peek:
        has_mega = bool(
            hot.filter(F.col("_df") > mega_threshold).limit(1).collect()
        )
    else:
        has_mega = True  # static plan: keep the guard branch
    cold = df.join(F.broadcast(hot.select(*part_cols)), part_cols, "left_anti")
    hot_rows = df.join(F.broadcast(hot), part_cols, "inner")
    w2 = Window.partitionBy(*part_cols).orderBy(order_col)
    warm = (
        hot_rows.filter(F.col("_df") <= mega_threshold) if has_mega else hot_rows
    )
    warm_capped = (
        warm.drop("_df")
        .withColumn("_rk", F.row_number().over(w2))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )
    out = cold.unionByName(warm_capped)
    if has_mega:
        salt = F.pmod(F.xxhash64(F.col(order_col)), F.lit(salt_buckets))
        w1 = Window.partitionBy(*part_cols, "_salt").orderBy(order_col)
        mega_capped = (
            hot_rows.filter(F.col("_df") > mega_threshold)
            .drop("_df")
            .withColumn("_salt", salt)
            .withColumn("_rk", F.row_number().over(w1))
            .filter(F.col("_rk") <= cap)
            .withColumn("_rk", F.row_number().over(w2))
            .filter(F.col("_rk") <= cap)
            .drop("_salt", "_rk")
        )
        out = out.unionByName(mega_capped)
    return out


def jaccard_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = DEFAULT_JACCARD_THRESHOLD,
    df_cap: int | None = DEFAULT_DF_CAP,
    materialize: bool = True,
) -> DataFrame:
    """Near-dup pairs (doc_a, doc_b, jaccard) by 3-gram-shingle Jaccard.

    Semantics with ``df_cap`` (rank cap): Jaccard over the capped
    occurrence sets — each shingle survives only in its df_cap
    lowest-id documents, so per-shingle join work is bounded at
    df_cap² while duplicate families LARGER than the cap stay
    visible: their df_cap lowest members retain every shared shingle
    and pair at ~1.0 (clustering then keeps one canonical; each pass
    removes cap-1 family members, and families orders of magnitude
    beyond the cap are the minhash path's job — no frequency cap
    there). Boilerplate shared by ≤cap unrelated documents contributes
    to their scores but the similarity threshold rejects those pairs
    (tested); beyond cap it neither connects nor pads anything.

    Plan shape of the capped path (the scale story):
      1. tokenize → shingle → explode → xxhash64 (8-byte keys; collision
         odds ~1e-11 at these cardinalities).
      2. rank per shingle via a row_number window on ``sg`` ordered by
         the id (deterministic — (sg, id) is unique), keep rank ≤ cap;
         post-cap per-doc counts become their own tiny aggregate. All
         in one lineage — no branch ever recomputes the tokenizer.
      3. ONE eager localCheckpoint of the capped+counted rows: both
         self-join sides read the materialized blocks (AQE misses the
         ReuseExchange on identical self-join subplans, which would
         otherwise recompute the whole pipeline per side — measured 2×
         the dominant stage).
      4. SHUFFLE_HASH self-join on ``sg`` (not broadcast — corpus-sized
         at 100 TB; not SMJ — hash probing skips two O(n log n) sorts,
         and Spark's shuffled-hash join spills since 3.1), group by the
         pair, threshold filter.

    Cost after the cap is Σ_shingle min(df, df_cap)² ≤ rows·df_cap —
    linear in corpus size with a df_cap constant, which is what makes
    the operator safe at 100 TB. (A grouped collect_list(≤cap) variant
    that emits in-bucket pairs from an array — one fewer shuffle — was
    measured 1.6× slower end-to-end at sf0.1: the generator breaks
    whole-stage codegen and the pair rows lose map-side pre-aggregation;
    the self-join keeps both.)
    """
    if df_cap is None:
        # Uncapped legacy shape: per-doc counts are free (array size
        # before the explode), single lineage into the checkpoint, and
        # the counts ride the exploded rows through the pair join.
        tok = docs.select(id_col, tokens_expr(F.col(text_col)).alias("ts"))
        sgarr = tok.select(id_col, shingles(F.col("ts")).alias("sgs"))
        sh = sgarr.select(
            id_col, F.size("sgs").alias("n"), F.explode("sgs").alias("sg")
        ).select(id_col, "n", F.xxhash64("sg").alias("sg"))
        if materialize:
            sh = sh.localCheckpoint(eager=True)
        a = sh.alias("a")
        b = sh.hint("SHUFFLE_HASH").alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.sg") == F.col("b.sg"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
            .agg(
                F.count(F.lit(1)).alias("n_common"),
                F.min("a.n").alias("na"),  # constant within the group
                F.min("b.n").alias("nb"),
            )
        )
        jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
        return pairs.filter(jac >= threshold).select(
            "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
        )
    # Capped path. Post-cap per-doc counts CANNOT ride the exploded rows
    # for free (the cap drops rows after the doc-frequency window), and a
    # second count-window would shuffle the full exploded table on the
    # id. Instead the counts become their own tiny aggregate — partial
    # (map-side) aggregation collapses it to one narrow row per doc
    # before its shuffle — joined onto the grouped pair table, already
    # orders of magnitude smaller than the exploded rows. At sf0.1 on
    # local[32] this measures even with the count-window formulation
    # (in-memory shuffles hide the difference); the point is at scale,
    # where it removes a full exploded-width shuffle and replaces it
    # with a map-side-combined one-row-per-doc aggregate.
    pairs = _capped_pair_counts(
        docs, id_col=id_col, text_col=text_col, df_cap=df_cap,
        materialize=materialize,
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return pairs.filter(jac >= threshold).select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    )


def _capped_pair_counts(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_cap: int = DEFAULT_DF_CAP,
    materialize: bool = True,
) -> DataFrame:
    """The rank-capped shingle pair-count stage shared by
    :func:`jaccard_pairs` (symmetric score) and
    :func:`containment_pairs` (asymmetric): (doc_a, doc_b, n_common,
    na, nb) with all of jaccard_pairs' documented plan discipline —
    the two scores are just different expressions over the SAME
    bounded pair table, so they can never drift on blocking, capping,
    or counting semantics."""
    from ..tables import compact_checkpoint, spread

    # spread BEFORE the shingle map: the single-row-group documents
    # scan otherwise serializes tokenize+shingle+hash onto ONE core
    # (round-11 profile: a 0.46-0.51 s single-task checkpoint job in
    # every jaccard-chain query). The round-4 A/B that measured spread
    # a loss here predates compact_checkpoint — the loss was the
    # spread-width checkpoint taxing every downstream stage, which the
    # size-adaptive compaction now removes (re-measured round 11:
    # interleaved win, see OPTIMIZATION_r11.md batch 2).
    sh = shingled_docs(
        spread(docs) if materialize else docs, id_col=id_col, text_col=text_col
    ).select(id_col, F.xxhash64("sg").alias("sg"))
    if materialize:
        # Checkpoint BEFORE the cap: rank_cap consumes the frame three
        # times, the self-join twice more — all read these blocks
        # instead of re-running the tokenizer pipeline.
        sh = compact_checkpoint(sh)
    # RANK cap, not a doc-frequency drop: each shingle is kept in its
    # df_cap lowest-id documents and dropped elsewhere. A pure df>cap
    # drop has a blind spot — in a duplicate FAMILY larger than the cap
    # (25 near-identical template pages) every shared shingle is "hot",
    # so the family loses all its shingles and becomes invisible to
    # near-dup detection. Under the rank cap the family's df_cap
    # lowest members still share everything, pair at ~1.0, and cluster;
    # each pass removes (cap-1) of them, and families at 100 TB scale
    # beyond that are the minhash path's job. Join cost keeps the same
    # bound: Σ min(df, df_cap)² per shingle. Boilerplate still cannot
    # connect unrelated documents — shared chrome in ≤cap docs
    # contributes to scores but the threshold rejects pairs whose real
    # content differs (tested). rank_cap only sorts the >cap hot
    # shingles' rows (tiny, broadcast-identified) — the uncontended
    # majority skips the round-2 full-table window sort entirely.
    sh = rank_cap(sh, ["sg"], id_col, df_cap, peek=materialize)
    if materialize:
        # Second checkpoint: the capped frame feeds the per-doc count
        # aggregate AND both self-join sides — materializing it keeps
        # rank_cap's hot aggregate from running three more times. (An
        # explicit repartition("sg") here hoping both join sides reuse
        # one exchange was measured a wash: AQE does NOT reuse
        # identical REPARTITION_BY_COL stages over a checkpoint scan,
        # so it only added a shuffle.)
        sh = compact_checkpoint(sh)
    cnt = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.hint("SHUFFLE_HASH").alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.sg") == F.col("b.sg")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .join(cnt.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(cnt.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb")), "doc_b")
    )
    return pairs


#: containment keep-threshold as an exact integer fraction (4/5 = 0.8):
#: ratio comparisons stay in BIGINT arithmetic on both engines, so the
#: cut can never move on a float tie.
CONTAINMENT_NUM = 4
CONTAINMENT_DEN = 5


def containment_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_cap: int = DEFAULT_DF_CAP,
    materialize: bool = True,
) -> DataFrame:
    """Near-dup pairs by shingle CONTAINMENT — the asymmetric score
    max(|A∩B|/|A|, |A∩B|/|B|) (Broder's containment, the other half of
    the resemblance/containment pair): a short document quoted whole
    inside a long one has containment ≈ 1 while its Jaccard drowns in
    the long side's extra shingles — exactly the subset-duplication
    (quote expansion, page-with-boilerplate-wrapper, excerpt reposts)
    the symmetric detector is blind to.

    Same bounded pair table as :func:`jaccard_pairs`
    (:func:`_capped_pair_counts` — rank-capped blocking, Σ min(df,cap)²
    work bound), different keep rule: DEN·n_common ≥ NUM·min-side
    count, evaluated as exact BIGINT products (no float tie). Returns
    (doc_a, doc_b, cont_a_x1e4, cont_b_x1e4) with each direction's
    containment on the exact integer grid (10000·n_common div n)."""
    pairs = _capped_pair_counts(
        docs, id_col=id_col, text_col=text_col, df_cap=df_cap,
        materialize=materialize,
    )
    keep = (
        F.col("n_common") * CONTAINMENT_DEN >= F.col("na") * CONTAINMENT_NUM
    ) | (F.col("n_common") * CONTAINMENT_DEN >= F.col("nb") * CONTAINMENT_NUM)
    return pairs.filter(keep).select(
        "doc_a",
        "doc_b",
        F.expr("(10000 * n_common) div na").cast("long").alias("cont_a_x1e4"),
        F.expr("(10000 * n_common) div nb").cast("long").alias("cont_b_x1e4"),
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    *,
    max_iter: int = 25,
    driver_threshold: int = 100_000,
    on_nonconverge: str = "star",
) -> DataFrame:
    """Duplicate clusters from near-dup pairs: (node, cluster_id) for
    every node appearing in ``pairs``, where cluster_id is the MINIMUM
    node id in the node's connected component.

    This is the step between pair generation and the keep-decision that
    a production dedup pipeline needs: pairs A~B and B~C must resolve to
    ONE cluster {A,B,C} with one canonical document, not two independent
    keep-lowest choices that can retain both B and C.

    Algorithm: hash-min label propagation — every node starts labeled
    with its own id; each round takes the min of its label and its
    neighbors' labels; fixpoint = component minima. Rounds needed =
    graph diameter, and near-dup graphs are overwhelmingly tiny cliques
    and chains (diameter ≤ a few), so the loop converges in 2–4 rounds.
    Each round is one shuffle join (edges ⋈ labels) plus one hash agg;
    the edge list and each round's labels are eagerly checkpointed so
    lineage stays flat and nothing recomputes. Convergence is detected
    by the sum of labels (monotonically non-increasing; equal sums ⟺
    fixpoint) — one scalar agg per round, no extra join. Node ids must
    be numeric. If propagation fails to converge within ``max_iter``
    (a pathological high-diameter graph), the default
    ``on_nonconverge="star"`` recovers by re-running with
    :func:`connected_components_star` (large-star/small-star, Kiveris
    et al.) — O(log²) rounds on any topology, exact same fixpoint;
    pass ``on_nonconverge="raise"`` to fail loudly instead.

    Hybrid execution (the GraphX/GraphFrames pattern): a near-dup edge
    list is usually many orders of magnitude smaller than the corpus —
    256 pairs from 5 000 sf0.1 documents — and an iterative Spark loop
    pays multi-second per-round scheduling overhead on a graph that fits
    in kilobytes. When the RAW forward pair count is ≤
    ``driver_threshold // 2`` (probed with a bounded limit-collect that
    doubles as the edge fetch — never assumed), the component minima
    are computed with driver-side union-find on the already-collected
    rows — identical output, zero rounds. Duplicate pairs inflate the
    probe conservatively (toward the distributed path, never past the
    driver bound). Above the threshold the distributed
    label-propagation loop runs; at 100 TB
    the pair table blows past any driver threshold and the loop is the
    only path taken. Set ``driver_threshold=0`` to force the
    distributed path (tests do).
    """
    # Materialize the pair list before mirroring it: the edge union
    # references ``pairs`` twice (forward + reversed), and without this
    # the whole upstream pair-generation pipeline would execute once
    # per reference.
    from ..tables import compact_checkpoint

    fwd = compact_checkpoint(
        pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    )
    # Union-find is undirected and idempotent, so the driver path can
    # consume the forward list directly — the mirror+distinct shuffle
    # (and its checkpoint job) exists only for the distributed
    # propagation loop. The threshold compares like with like (each
    # deduplicated undirected edge appears twice in the mirrored list),
    # and the size probe IS the edge fetch: one limit-bounded collect
    # decides the path and, under the threshold, already holds the
    # edges — no separate count job, and never more than
    # threshold//2 + 1 rows on the driver.
    cap = driver_threshold // 2
    rows = fwd.limit(cap + 1).collect()
    if len(rows) <= cap:
        return _driver_union_find_rows(
            fwd.sparkSession, rows, fwd.schema["s"].dataType
        )
    edges = fwd.union(fwd.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    edges = compact_checkpoint(edges)
    labels = (
        edges.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        # lazy checkpoint: materialized by the _label_sum action below,
        # so each round costs exactly ONE job (propagate+materialize+sum)
        .localCheckpoint(eager=False)
    )

    def _label_sum(frame: DataFrame):
        return frame.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]

    prev = _label_sum(labels)
    converged = False
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["d"] == labels["node"])
            .groupBy("s")
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr, labels["node"] == nbr["s"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=False)
        )
        cur = _label_sum(labels)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # Returning partial labels would silently split one real
        # component into several clusters (and keep extra duplicates
        # downstream) — never do that. Default recovery: re-run with
        # star contraction (connected_components_star), which reaches
        # the EXACT same fixpoint in O(log² n) rounds regardless of the
        # diameter that defeated propagation — the result is correct,
        # only the algorithm changed. ``on_nonconverge="raise"`` keeps
        # the loud-failure behavior for callers that want to know.
        if on_nonconverge == "star":
            return connected_components_star(pairs, src, dst)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "component diameter exceeds max_iter"
        )
    return labels.select("node", F.col("label").alias("cluster_id"))


def _driver_union_find(edges: DataFrame) -> DataFrame:
    """Union-find over a small (≤ driver_threshold) collected edge list;
    returns the same (node, cluster_id=component minimum) frame as the
    distributed loop, with matching column types."""
    return _driver_union_find_rows(
        edges.sparkSession, edges.collect(), edges.schema["s"].dataType
    )


def _driver_union_find_rows(spark: SparkSession, rows, node_type) -> DataFrame:
    """Union-find over already-collected (s, d) rows — the zero-extra-
    job form used when the size probe's limit-collect already fetched
    the edges."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for row in rows:
        s, d = row.s, row.d
        parent.setdefault(s, s)
        parent.setdefault(d, d)
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)  # union by min id

    comp_min: dict = {}
    for node in parent:
        root = find(node)
        comp_min[root] = min(comp_min.get(root, node), node)
    out = [(node, comp_min[find(node)]) for node in parent]
    schema = StructType(
        [StructField("node", node_type), StructField("cluster_id", node_type)]
    )
    # Explicit slice count: the default parallelize() fans this
    # driver-bounded list (≤ driver_threshold rows) across
    # defaultParallelism partitions, and every downstream stage then
    # pays 32 near-empty tasks (round-11 profile: ~0.4 s/stage on the
    # post-cluster joins). One slice per 50k rows keeps the frame a
    # handful of tasks at any size the driver path permits.
    slices = max(1, (len(out) + 49_999) // 50_000)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(out, slices), schema
    )


def connected_components_star(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    *,
    max_iter: int = 20,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the high-diameter scale path the hash-min
    propagation loop in :func:`connected_components` names: propagation
    needs DIAMETER rounds (a 10k-link chain = 10k shuffles), star
    contraction converges in O(log² n) rounds on ANY topology because
    each round re-points whole subtrees at their local minimum instead
    of moving labels one hop.

    Per round, both phases are one windowed min over the neighbor list
    (shuffle on the node id) plus a distinct:

    - **large-star**: for every node u, point each LARGER neighbor
      v > u at m = min(Γ(u) ∪ {u}). Cuts long chains in half and
      never creates new maxima, so edge count cannot grow unboundedly.
    - **small-star**: on the canonicalized (big, small) edge list,
      point each smaller-or-equal neighbor and u itself at m. Collapses
      the local stars produced by large-star.

    Fixpoint ⟺ the canonical edge set stops changing, detected by a
    (count, sum-of-xxhash64) fingerprint — one scalar aggregate per
    round, no join; at the fixpoint the edge list IS the answer: a
    union of stars (u, component_min). Output matches
    :func:`connected_components`: (node, cluster_id = component min)
    for every node appearing in ``pairs``. Rounds are lazily
    checkpointed so lineage stays flat across iterations.
    """
    fwd = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(
        eager=True
    )
    # canonical form: (u, v) with u > v, no self-loops, deduplicated.
    # Self-loop-ONLY nodes still get a singleton label at the end
    # (contract parity with connected_components and the recursive-CTE
    # oracle — near-dup pair lists normally have no reflexive rows, but
    # the contract must not depend on that).
    cur = (
        fwd.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _fingerprint(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row.n, row.h)

    def _with_selfloop_singletons(labels: DataFrame) -> DataFrame:
        selfs = (
            fwd.filter(F.col("u") == F.col("v"))
            .select(F.col("u").alias("node"))
            .distinct()
            .join(labels.select("node"), "node", "left_anti")
            .withColumn("cluster_id", F.col("node"))
        )
        return labels.unionByName(selfs)

    w = Window.partitionBy("u")
    prev = _fingerprint(cur)
    if prev[0] == 0:
        # no proper edges: every self-loop node is its own cluster
        empty = fwd.sparkSession.createDataFrame([], schema=_labels_schema(fwd))
        return _with_selfloop_singletons(empty)
    converged = False
    for _ in range(max_iter):
        # large-star over the symmetric view: m = min of neighborhood
        # (window min over neighbors, floored by u itself); each larger
        # neighbor re-points at m. Output is already canonical: m ≤ u < v.
        sym = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        ls = (
            sym.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star on the canonical list: neighbors here are all < u,
        # so m = min(neighbors); u and every neighbor re-point at m.
        # Both emitted edges come out of ONE pass over ls via a 2-row
        # explode — a union would reference (and recompute) the
        # large-star window stage twice per round.
        ss = (
            ls.withColumn("m", F.min("v").over(w))
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                        F.struct(F.col("u"), F.col("m").alias("v")),
                    )
                ).alias("e")
            )
            .select("e.u", "e.v")
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        cur = ss
        fp = _fingerprint(cur)
        if fp == prev:
            converged = True
            break
        prev = fp
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # fixpoint edge list is a union of stars: (member, component_min).
    # The defensive min-agg collapses the (impossible at fixpoint, cheap
    # to guard) case of a node carrying two centers.
    members = cur.groupBy("u").agg(F.min("v").alias("cluster_id"))
    centers = cur.select(F.col("v").alias("u")).distinct().withColumn(
        "cluster_id", F.col("u")
    )
    labels = (
        members.unionByName(centers)
        .groupBy(F.col("u").alias("node"))
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    return _with_selfloop_singletons(labels)


def _labels_schema(edges: DataFrame) -> StructType:
    node_type = edges.schema["u"].dataType
    return StructType(
        [StructField("node", node_type), StructField("cluster_id", node_type)]
    )


N_MINHASH = 16
BAND_SIZE = 4
MINHASH_EST_THRESHOLD = 0.5
#: Cross-engine MinHash family (round 7): base hash = the repo's
#: md5-prefix 32-bit integer of the shingle string, re-hashed per
#: signature slot by the textbook universal family h_i(x) =
#: (a_i·x + b_i) mod P with P = 4294967311, the smallest prime ABOVE
#: the 2^32 hash domain — the modulus must sit just above the domain
#: so the map wraps ~a_i/2 times and the slots decorrelate (a huge
#: modulus like 2^61−1 would make h_i MONOTONE in x, collapsing every
#: slot's argmin onto the same shingle and voiding the estimator).
#: Every step is exact BIGINT arithmetic both engines implement
#: identically (a_i < 2^31 and x < 2^32 keep a_i·x + b_i < 2^63 − 1,
#: no 64-bit overflow), which is what lets the DuckDB oracle replicate
#: whole signatures — the reason this replaced the earlier
#: engine-private xxhash64 family. Constants come from a fixed-seed
#: PRNG so the Spark builders and the oracle SQL interpolate the SAME
#: values from one definition.
MINHASH_P = 4294967311
_mh_rng = __import__("random").Random(0x9E3779B9)
#: 64 slots pre-generated (> N_MINHASH) so a caller widening the
#: signature never silently reuses slot constants.
MINHASH_A = tuple(_mh_rng.randrange(1, (1 << 31) - 1) for _ in range(64))
MINHASH_B = tuple(_mh_rng.randrange(1 << 32) for _ in range(64))
#: Manifest tag for on-disk signature stores: a store built under one
#: family must never serve reads for another (the ingest-recipe
#: staleness rule the TermStore/IVF caches already follow).
MINHASH_FAMILY = "md5affine32-v1"
#: Per-(band, key) bucket membership cap on the candidate join's RIGHT
#: side: a pathological bucket (thousands of byte-identical docs share
#: every band) otherwise does bucket² pair work. Capping ONE side keeps
#: the join linear in bucket size — every member still gets an edge to
#: the bucket's cap lowest ids, so connected-components clustering
#: collapses the whole family (the quadratic in-family pair list is
#: exactly the output that detonates at scale, and nothing downstream
#: needs it).
OVERSIZED_BUCKET_CAP = 20


def minhash_bands(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = N_MINHASH,
    band_size: int = BAND_SIZE,
    materialize: bool = True,
) -> DataFrame:
    """Banded MinHash signatures: one row per (doc, band) carrying the
    full signature (``mh0..mhN``) plus the band's bucket ``key``.

    Each shingle string is hashed ONCE to the 32-bit md5-prefix
    integer (the cross-engine convention); the N signature hashes
    re-hash that int with the fixed affine family MINHASH_A/B mod
    MINHASH_P (N BIGINT mults per row instead of N string-hashes) —
    every value reproducible in DuckDB, so q_dedup_minhash sits under
    the full driver hash gate. ``spread`` fans the md5-heavy map
    across cores on one-row-group local scans (the q_sketch_theta
    rule — md5 is ~20× heavier than the xxhash64 it replaced). The
    frame is ~(N+2)·8 B per doc per band — small enough to persist as
    the corpus's dedup index (see incremental_minhash_dedup)."""
    from ..tables import spread

    sh = shingled_docs(spread(docs), id_col=id_col, text_col=text_col).select(
        id_col, md5_prefix_int(F.col("sg")).alias("sgh")
    )
    sig = sh.groupBy(id_col).agg(
        *[
            F.min(
                (F.col("sgh") * F.lit(MINHASH_A[i]) + F.lit(MINHASH_B[i]))
                % F.lit(MINHASH_P)
            ).alias(f"mh{i}")
            for i in range(n_hashes)
        ]
    )
    n_bands = n_hashes // band_size
    bands = sig.select(
        id_col,
        *[F.col(f"mh{i}") for i in range(n_hashes)],
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
    ).select(id_col, *[f"mh{i}" for i in range(n_hashes)], "bk.band", "bk.key")
    if materialize:
        # both self-join sides read the checkpointed blocks instead of
        # recomputing the whole shingle→minhash pipeline per side (AQE
        # misses the ReuseExchange on identical self-join subplans).
        from ..tables import compact_checkpoint

        bands = compact_checkpoint(bands)
    return bands


def _split_hot_buckets(
    bands: DataFrame,
    *,
    id_col: str,
    bucket_cap: int | None,
    has_hot: bool | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """Cold/hot split of a banded (…, band, key) frame under the
    oversized-bucket guard — the ONE implementation both LSH candidate
    generators (minhash_candidates, hamming_candidates) consume, so cap
    semantics can never drift between them. Returns (cold, hot) where
    hot is None when no bucket exceeds the cap: a driver-side take(1)
    peek decides, because a healthy corpus has NO oversized buckets and
    the split plan costs ~6 extra fixed-overhead stages (measured
    +0.5 s at sf0.1 on local[32]) — the guard stages are planned only
    when a bucket actually needs them. The hot side keeps each bucket's
    ``bucket_cap`` lowest ids via a salted two-stage rank (no
    single-partition sort).

    ``has_hot`` lets a caller that ALREADY measured the bucket-size
    distribution (hamming_candidates folds max-bucket-size into its
    tier agg — one job instead of agg + peek, round-11 §1 profiling:
    the peek alone read ~0.44 s at sf0.1) pass the decision in; None
    keeps the self-contained probe."""
    if bucket_cap is not None:
        sizes = bands.groupBy("band", "key").agg(F.count(F.lit(1)).alias("_n"))
        hot = sizes.filter(F.col("_n") > bucket_cap).drop("_n")
        if has_hot is False or (has_hot is None and not hot.take(1)):
            bucket_cap = None
    if bucket_cap is None:
        return bands, None
    b_cold = bands.join(F.broadcast(hot), ["band", "key"], "left_anti")
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(32))
    w1 = Window.partitionBy("band", "key", "_salt").orderBy(id_col)
    w2 = Window.partitionBy("band", "key").orderBy(id_col)
    b_hot = (
        bands.join(F.broadcast(hot), ["band", "key"], "left_semi")
        .withColumn("_salt", salt)
        .withColumn("_rk", F.row_number().over(w1))
        .filter(F.col("_rk") <= bucket_cap)
        .withColumn("_rk", F.row_number().over(w2))
        .filter(F.col("_rk") <= bucket_cap)
        .drop("_salt", "_rk")
    )
    return b_cold, b_hot


def minhash_candidates(
    bands_a: DataFrame,
    bands_b: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    n_hashes: int = N_MINHASH,
    threshold: float = MINHASH_EST_THRESHOLD,
    bucket_cap: int | None = OVERSIZED_BUCKET_CAP,
) -> DataFrame:
    """Candidate near-dup pairs from banded signatures: docs sharing
    any band bucket, scored by signature agreement / n_hashes (the
    unbiased Jaccard estimator). One-frame form is the classic LSH
    self-join; the two-frame form joins a (small, new) left side
    against a (large, indexed) right side — the incremental shape.
    Pairs are (doc_a < doc_b), distinct across bands.

    Oversized-bucket guard (``bucket_cap``): buckets heavier than the
    cap — identified by a hash aggregate and broadcast, so the common
    bucket pays nothing — join the FULL left side against only their
    cap lowest-id members (salted two-stage rank, no single-partition
    sort). Pair work per bucket drops from |bucket|² to |bucket|·cap;
    every member still pairs with the bucket's lowest ids, so families
    collapse to one cluster via connected components and the keep-min
    survivor rule is unchanged. The intentionally-absent output is the
    quadratic pair list WITHIN an oversized family (doc 999 × doc 998
    of a thousand identical docs) — at 100 TB that list is the failure
    mode, not a deliverable. ``bucket_cap=None`` disables the guard."""
    two_frame = bands_b is not None
    a = bands_a.alias("a")
    b_src = bands_b if two_frame else bands_a
    on_bucket = (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key"))
    agree = sum(
        F.when(F.col(f"a.mh{i}") == F.col(f"b.mh{i}"), 1).otherwise(0)
        for i in range(n_hashes)
    )
    est = (agree / F.lit(float(n_hashes))).alias("est_jaccard")
    # Two-frame: the left (new) side's ids may be larger OR smaller
    # than the indexed right side's, so dedupe with != and normalize to
    # (min, max) — the a<b shortcut would silently drop new-vs-corpus
    # pairs whose corpus id is the smaller one. The hot-bucket branch
    # needs the same normalization even one-frame: its right side is
    # capped, so the surviving member of a pair may carry the LARGER id.
    norm = [
        F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("doc_a"),
        F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("doc_b"),
        est,
    ]
    b_cold, b_hot = _split_hot_buckets(b_src, id_col=id_col, bucket_cap=bucket_cap)
    if two_frame:
        cold_pred = F.col(f"a.{id_col}") != F.col(f"b.{id_col}")
        cold_out = norm
    else:
        # Self-join over uncontended buckets: a < b halves the join
        # output directly (already normalized).
        cold_pred = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
        cold_out = [
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            est,
        ]
    cand = a.join(
        b_cold.hint("SHUFFLE_HASH").alias("b"), on_bucket & cold_pred
    ).select(*cold_out)
    if b_hot is not None:
        hot_cand = a.join(
            b_hot.hint("SHUFFLE_HASH").alias("b"),
            on_bucket & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        ).select(*norm)
        cand = cand.unionByName(hot_cand)
    # NOTE (round 12, verified no-op — don't "optimize" this): moving
    # the threshold filter ahead of the cross-band distinct changes
    # NOTHING in the physical plan — Catalyst already pushes the
    # deterministic est_jaccard predicate through the distinct's
    # Aggregate and into the band self-join's condition (the captured
    # plans show `... >= threshold` inside the SHJ join condition in
    # both forms, byte-identical modulo expression ids), so the dedup
    # shuffle only ever carries surviving pairs.
    return (
        cand.distinct()
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("est_jaccard", 4).alias("est_jaccard"))
    )


SUPERBAND_MEAN_BUCKET = 8


def hamming_candidates(
    fp: DataFrame,
    *,
    id_col: str = "doc_id",
    n_bands: int = 8,
    radius: int = 7,
    bucket_cap: int | None = OVERSIZED_BUCKET_CAP,
    mean_bucket_limit: int = SUPERBAND_MEAN_BUCKET,
) -> DataFrame:
    """Near-dup pairs from banded bit-fingerprints (``b0..b{n-1}``
    columns, e.g. the 128-bit dHash shipped as 8 × 16-bit bands):
    candidates = docs sharing ANY exact band value (the multi-index
    Hamming scheme — pigeonhole guarantees every pair within Hamming
    distance ``bands - 1`` shares a band), scored by exact Hamming
    distance ``Σ bit_count(xor(band_a, band_b))`` and kept at
    ``<= radius``. All JVM-side: one explode, one equi-join on
    (band, value), two fingerprint re-joins for the distance — the
    q_dedup_minhash shape on a bit-sig instead of a minhash sig.

    ENTROPY-SCALED SUPER-BANDS (the scaled_sign_planes convention): a
    16-bit comparison band carries only ~14.4 bits of entropy (adjacent
    dHash bits share a pixel, so neighboring comparisons anti-
    correlate — inherent to difference hashes, not a synthesis
    artifact), so well before a million docs the mean bucket outgrows
    the oversized cap EVERYWHERE (64× stress at 320 k docs: median
    bucket 8, p90 31, 31 M candidate pairs — the blocking stops
    blocking). The tier is picked from the MEASURED bucket load, not a
    fixed doc count: one grouped agg over the checkpointed
    fingerprints' (band, key) buckets reads ``n·n_bands`` (= Σ bucket
    sizes), the distinct-key count ``Σ_b d_b`` AND the max bucket size
    (which answers the oversized-bucket guard's existence peek in the
    same pass — see bucket_stats), and
    when the mean bucket ``n·n_bands / Σ_b d_b`` exceeds
    ``mean_bucket_limit`` (exact-integer comparison, replayed verbatim
    by the oracles) the blocking key becomes PAIRS of adjacent bands
    (4 × 32-bit keys): the pigeonhole guarantee narrows from Hamming 7
    to 3, but any pair whose flips touch <= 2 base bands — e.g. the
    constructed 1-pixel image perturbations — still shares >= 2 of the
    4 super-bands. Measuring (rather than assuming) the entropy is
    what makes the rule robust to LOW-entropy corpora (mostly-flat
    images, near-silent audio): those run hot far below any doc-count
    threshold, and the distinct-key agg sees it directly. The limit
    defaults to ``n_bands`` (= mean bucket 8): ~2× above the 3.4-4.1
    floor the grouped near-dup families themselves impose (group
    members share 7 of 8 bands by construction), and well below the
    bucket_cap=20 region where the guard starts truncating recall —
    on the measured ~14.4-bit synthesis entropy that crosses at
    ~147 k docs, close to the retired fixed 100 k rule.

    Scale: pair work is Σ_bucket |bucket|², bounded by the same
    oversized-bucket guard as minhash_candidates — buckets heavier than
    ``bucket_cap`` pair the full side against only their cap lowest-id
    members (n·cap, not n²; families still collapse via the shared
    low-id members), and a driver-side take(1) peek plans the guard
    stages only when a bucket actually needs them. Unlike the minhash
    shape, the self-join sides carry ONLY (id, band, key) — 3 longs per
    row, never the fingerprint: carrying b0..b7 through the banded
    self-join 8×-duplicates every fingerprint into the join's
    per-partition hash maps (measured SparkOutOfMemoryError at the 64×
    stress point); the distance instead comes from two re-joins of the
    DISTINCT candidate pairs against the 1×-sized fingerprint frame."""
    from ..tables import compact_checkpoint

    band_cols = [f"b{k}" for k in range(n_bands)]
    # decode/fingerprint pipeline runs once for the band explode and
    # both scoring re-joins (the minhash_bands checkpoint rule); the
    # checkpoint is size-compacted so the FIVE downstream stages that
    # re-read it (tier agg, band explode × join sides, two scoring
    # re-joins) launch map tasks proportional to its SIZE, not to the
    # decode pipeline's 32-way width (round-11 §2: ~0.6 s/stage of
    # per-map-task shuffle-file overhead on a 700 KB frame).
    fp = compact_checkpoint(fp.select(id_col, *band_cols))

    def tier_keys(sb: int) -> list[Column]:
        return [
            (
                F.col(f"b{sb * k}")
                if sb == 1
                else (F.col(f"b{sb * k}") + F.col(f"b{sb * k + 1}") * F.lit(65536))
            ).cast("long")
            for k in range(n_bands // sb)
        ]

    def banded(sb: int) -> DataFrame:
        return fp.select(
            id_col,
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(k).alias("band"), key.alias("key"))
                        for k, key in enumerate(tier_keys(sb))
                    ]
                )
            ).alias("bk"),
        ).select(id_col, "bk.band", "bk.key")

    def bucket_stats(sb: int):
        """(Σ bucket sizes, distinct non-null keys, max bucket size) of
        the tier's (band, key) buckets in ONE grouped agg. Exact-integer
        equivalences the oracles rely on: Σ sizes = n_docs · n_keys
        (explode never drops a row, NULL keys form groups), and the
        non-null distinct-group count = Σ_band COUNT(DISTINCT key) —
        the entropy rule's inputs — while MAX(size) answers the
        oversized-bucket guard's existence peek over ALL groups
        (NULL-key buckets included, matching the sizes>cap filter the
        guard itself plans; NULL keys never equi-join, so flagging
        them changes plan shape only, never pairs)."""
        return (
            banded(sb)
            .groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(
                F.sum("_n").alias("total"),
                F.count(F.when(F.col("key").isNotNull(), F.lit(1))).alias("d"),
                F.max("_n").alias("maxb"),
            )
            .first()
        )

    # Tier pick + oversized-bucket peek in ONE job (round-11 §1
    # profiling: the previous shape — an 8-way count_distinct Expand
    # agg (~0.5 s at sf0.1) plus _split_hot_buckets' take(1) peek
    # (~0.44 s) — paid two sequential driver actions for scalars one
    # grouped agg already contains; the super-band tier pays a second
    # tiny probe for its own max bucket, same job count as before).
    # Decision integers are IDENTICAL to the count_distinct form (see
    # bucket_stats), so the oracles' replayed rule is untouched.
    raw = bucket_stats(1)
    n_docs_x_bands = raw["total"] or 0
    sum_distinct = raw["d"]
    sb = 2 if n_docs_x_bands > mean_bucket_limit * sum_distinct else 1
    if bucket_cap is None:
        has_hot = None
    elif sb == 1:
        has_hot = (raw["maxb"] or 0) > bucket_cap
    else:
        has_hot = (bucket_stats(2)["maxb"] or 0) > bucket_cap
    bands = banded(sb)
    a = bands.alias("a")
    on_bucket = (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key"))
    b_cold, b_hot = _split_hot_buckets(
        bands, id_col=id_col, bucket_cap=bucket_cap, has_hot=has_hot
    )
    cand = a.join(
        b_cold.alias("b"), on_bucket & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    ).select(
        F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
    )
    if b_hot is not None:
        hot_cand = a.join(
            b_hot.alias("b"),
            on_bucket & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        ).select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("doc_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("doc_b"),
        )
        cand = cand.unionByName(hot_cand)
    fa = fp.select(
        F.col(id_col).alias("doc_a"), *[F.col(c).alias(f"_a{c}") for c in band_cols]
    )
    fb = fp.select(
        F.col(id_col).alias("doc_b"), *[F.col(c).alias(f"_b{c}") for c in band_cols]
    )
    hamming = sum(
        F.bit_count(F.col(f"_a{c}").bitwiseXOR(F.col(f"_b{c}"))) for c in band_cols
    )
    # Eagerly materialize the deduped pair list BEFORE the scoring
    # joins, and materialize it DISK_ONLY: one query tree holding the
    # banded self-join, the distinct hash-agg AND two fingerprint joins
    # concurrently peaks executor memory at the SUM of the stages, and
    # the default deserialized MEMORY_AND_DISK checkpoint level makes
    # it worse — 32 tasks UNROLLING multi-million-row partitions into
    # storage memory while the distinct is still spilling is exactly
    # the measured heap death (MemoryStore.putIteratorAsValues in the
    # OOM stack; the temporal-dHash 64× stress corpus, whose majority
    # fold amplifies per-position bit bias into hot band keys, is the
    # trigger at ~10 M candidates). DISK_ONLY costs one write+read of
    # 16-byte pair rows and caps the stage's storage footprint at the
    # unroll buffer.
    from pyspark.storagelevel import StorageLevel

    cand = compact_checkpoint(
        cand.distinct(), storage_level=StorageLevel.DISK_ONLY
    )
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= radius)
        .select("doc_a", "doc_b", "hamming")
    )


DHASH_FAMILY = "dhash-128/luma-999/8x16le-v1"
#: Audio loudness-envelope fingerprints share the banded 8×16-bit
#: layout but are NOT comparable to visual dHashes — an audio pipeline
#: passes this family tag so one store can never silently mix the two
#: (the SignatureStore family guard turns the mistake into an error).
ENVELOPE_FAMILY = "envhash-128/abs-env-129w-v1"
#: Temporal-majority video dHashes fold many per-frame dHashes into one
#: fingerprint — same 8×16-bit layout, DIFFERENT recipe: a video
#: fingerprint colliding with a still image's says nothing, so video
#: stores carry their own tag.
VIDEO_DHASH_FAMILY = "vdhash-128/majority-stride2-v1"


def incremental_hamming_dedup(
    new_fp: DataFrame,
    store_path: str,
    *,
    id_col: str = "doc_id",
    n_bands: int = 8,
    radius: int = 7,
    bucket_cap: int | None = OVERSIZED_BUCKET_CAP,
    family: str = DHASH_FAMILY,
    earlier_below: int | None = None,
) -> DataFrame:
    """Incremental PERCEPTUAL near-dup detection against a persistent
    fingerprint store — incremental_minhash_dedup's contract applied to
    banded bit-fingerprints (the dHash image/video family): per batch
    of (id, b0..b{n-1}) fingerprints, (1) drop already-indexed ids
    (idempotent re-delivery is a no-op), (2) candidates = new×corpus ∪
    new×new via one raw-band bucket join of the small new side against
    store ∪ new, (3) append the new banded rows to the store. Returns
    (doc_a < doc_b, hamming <= radius) pairs.

    ``earlier_below`` switches to the RANGE-DETERMINISTIC form the
    ingest DAGs need (the ingest_dedup/ingest_semdedup convention):
    the "earlier corpus" becomes stored rows with id < earlier_below —
    derived from the batch RANGE, not from store content — the
    already-indexed anti-join is skipped (the caller's id-range
    batching is the delivery authority), and the append is guarded by
    skip_if_range_indexed. Deleting a batch target and re-running then
    reproduces IDENTICAL pairs even though the store was already
    appended; the default (None) keeps the at-least-once streaming
    semantics, where re-delivered ids are dropped against the store.

    The store is the SAME manifest-backed SignatureStore layout under
    the dHash family tag: one row per (doc, band) carrying the full
    fingerprint, segments range-clustered on (band, key), so the
    corpus side of the candidate join is pruned to the batch's bucket
    keys via a pushed In(key, ...) parquet filter — per-batch store IO
    ~O(batch), never O(corpus). Blocking here is RAW 16-bit bands (the
    stored key layout), not the batch-mode super-band tier: the join is
    batch×pruned-corpus, so candidate volume is bounded by the batch
    and the oversized-bucket guard, and pigeonhole keeps its full
    radius-7 guarantee on the incremental path."""
    from .sigstore import SignatureStore, collect_prune_keys

    spark = new_fp.sparkSession
    band_cols = [f"b{k}" for k in range(n_bands)]
    store = SignatureStore(store_path, family=family)
    bounds = new_fp.agg(F.min(id_col).alias("lo"), F.max(id_col).alias("hi")).first()
    fresh_fp = new_fp.select(id_col, *band_cols)
    if earlier_below is None and bounds.lo is not None:
        known = store.known_ids(spark, id_min=bounds.lo, id_max=bounds.hi, id_col=id_col)
        if known is not None:
            fresh_fp = fresh_fp.join(known, id_col, "left_anti")
    # fingerprints materialize ONCE for the explode, the scoring joins
    # and the append (the hamming_candidates checkpoint rule).
    # dropDuplicates: at-least-once delivery can duplicate an id WITHIN
    # one batch too — without this, every pair involving it is emitted
    # per copy and the store gains duplicate rows forever (the minhash
    # twin is immune by construction: minhash_bands' groupBy collapses
    # per id).
    from ..tables import compact_checkpoint

    fresh_fp = compact_checkpoint(fresh_fp.dropDuplicates([id_col]))
    fresh = fresh_fp.select(
        id_col,
        *band_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"), F.col(f"b{k}").cast("long").alias("key")
                    )
                    for k in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, *band_cols, "bk.band", "bk.key")
    keys = collect_prune_keys(fresh)
    empty_pairs = (
        fresh.limit(0)
        .select(
            F.col(id_col).alias("doc_a"),
            F.col(id_col).alias("doc_b"),
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    if keys == []:
        return empty_pairs
    corpus = store.read_signatures(
        spark, keys=keys, id_col=id_col, id_below=earlier_below
    )
    right = fresh if corpus is None else fresh.unionByName(corpus)
    # slim join sides (id, band, key) — the fingerprints re-join for
    # scoring; carrying b0..b7 through the banded join is the measured
    # 64× OOM shape (see hamming_candidates)
    a = fresh.select(id_col, "band", "key").alias("a")
    b_cold, b_hot = _split_hot_buckets(
        right.select(id_col, "band", "key"), id_col=id_col, bucket_cap=bucket_cap
    )
    on_bucket = (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key"))
    norm = [
        F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("doc_a"),
        F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("doc_b"),
    ]
    cand = a.join(
        b_cold.alias("b"), on_bucket & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
    ).select(*norm)
    if b_hot is not None:
        cand = cand.unionByName(
            a.join(
                b_hot.alias("b"),
                on_bucket & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
            ).select(*norm)
        )
    from pyspark.storagelevel import StorageLevel

    cand = compact_checkpoint(
        cand.distinct(), storage_level=StorageLevel.DISK_ONLY
    )
    # every stored row carries the full fingerprint, so the pruned
    # corpus read already holds the b-columns scoring needs
    fp_all = fresh_fp
    if corpus is not None:
        fp_all = fp_all.unionByName(
            corpus.select(id_col, *band_cols)
        ).dropDuplicates([id_col])
    fa = fp_all.select(
        F.col(id_col).alias("doc_a"), *[F.col(c).alias(f"_a{c}") for c in band_cols]
    )
    fb = fp_all.select(
        F.col(id_col).alias("doc_b"), *[F.col(c).alias(f"_b{c}") for c in band_cols]
    )
    hamming = sum(
        F.bit_count(F.col(f"_a{c}").bitwiseXOR(F.col(f"_b{c}"))) for c in band_cols
    )
    pairs = (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= radius)
        .select("doc_a", "doc_b", "hamming")
    )
    span = fresh_fp.agg(F.min(id_col).alias("lo"), F.max(id_col).alias("hi")).first()
    if span.lo is not None:
        store.append(
            fresh,
            id_min=span.lo,
            id_max=span.hi,
            skip_if_range_indexed=earlier_below is not None,
        )
    return pairs


def incremental_minhash_dedup(
    new_docs: DataFrame,
    store_path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = MINHASH_EST_THRESHOLD,
) -> DataFrame:
    """Incremental near-dup detection against a persistent signature
    store: signatures are computed ONCE per document, ever.

    Per batch: (1) drop docs whose id is already indexed (idempotent
    re-delivery is a no-op — the reference's target-existence semantics,
    O2, applied to dedup state); (2) compute banded signatures for the
    genuinely new docs; (3) candidates = new×corpus ∪ new×new via one
    band-bucket join of the small new side against store ∪ new; (4)
    append the new signatures to the store. Returns the candidate pairs
    (doc_a < doc_b, est_jaccard ≥ threshold).

    100 TB shape (round-2 verdict fix): the store is a manifest-backed
    :class:`..operators.sigstore.SignatureStore` — segments
    range-clustered on (band, key). The already-indexed check reads
    only the id column of manifest-intersecting segments (usually
    NOTHING: a genuinely new id range touches zero store files), and
    the candidate join's store side is pruned to the new batch's bucket
    keys via a pushed ``In(key, ...)`` parquet filter, so per-batch
    store IO is ~O(batch), never O(corpus)."""
    from .sigstore import SignatureStore, collect_prune_keys

    spark = new_docs.sparkSession
    store = SignatureStore(store_path)
    bounds = new_docs.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).first()
    fresh_docs = new_docs
    if bounds.lo is not None:
        known = store.known_ids(spark, id_min=bounds.lo, id_max=bounds.hi, id_col=id_col)
        if known is not None:
            fresh_docs = new_docs.join(known, id_col, "left_anti")
    fresh = minhash_bands(fresh_docs, id_col=id_col, text_col=text_col)
    # The batch's bucket keys for store-side pruning — collected with
    # the driver-safe limit probe (at most MAX_PRUNE_KEYS+1 rows reach
    # the driver; None = batch too wide to prune, scan the selected
    # segments instead). `fresh` is checkpointed, so no recompute.
    keys = collect_prune_keys(fresh)
    if keys == []:
        # nothing genuinely new (re-delivery, empty batch, or all-short
        # docs with no shingles): no pairs, and nothing to index.
        return minhash_candidates(fresh, fresh, id_col=id_col, threshold=threshold)
    corpus = store.read_signatures(spark, keys=keys, id_col=id_col)
    right = fresh if corpus is None else fresh.unionByName(corpus)
    pairs = minhash_candidates(fresh, right, id_col=id_col, threshold=threshold)
    # No checkpoint-before-append needed anymore: `corpus` reads an
    # explicit segment-path list frozen at read time and segments are
    # immutable, so the append below (a NEW segment) cannot leak into
    # a lazy evaluation of `pairs`.
    span = fresh.agg(F.min(id_col).alias("lo"), F.max(id_col).alias("hi")).first()
    store.append(fresh, id_min=span.lo, id_max=span.hi)
    return pairs


#: Family tag for the exact-content store: one row per doc, blocking
#: key = 32-bit md5-prefix integer of the text, full md5 hex carried
#: for the (collision-free) pair predicate. Incomparable with the
#: MinHash family's affine signatures — hence its own tag.
EXACT_FAMILY = "md5exact-v1"


def incremental_exact_dedup(
    new_docs: DataFrame,
    store_path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    earlier_below: int | None = None,
) -> DataFrame:
    """Incremental EXACT dedup against a persistent content-hash store —
    the cheapest stage of the curation-ingest funnel
    (pipelines/ingest_curation.py), run BEFORE shingling so
    byte-identical copies never pay the MinHash stage.

    Per batch of (id, text) docs: hash each text once (md5; the
    q_dedup_exact rule), block on the 32-bit md5-prefix integer
    (``key`` — range-clustered in the store, so the corpus side of the
    bucket join is pruned to the batch's keys via a pushed In(key,...)
    parquet filter, per-batch store IO ~O(batch)), pair on FULL md5
    equality, and emit per rejected doc exactly ONE star edge
    ``(doc_a = the group's smallest smaller-id member, doc_b = doc)``
    — the q_curation_ingest oracle's ``ex_edges`` shape, and the same
    transitive closure as the full same-hash clique. A doc with no
    smaller-id same-hash partner (the group minimum so far) survives.

    ``earlier_below`` selects the RANGE-DETERMINISTIC ingest form (the
    incremental_hamming_dedup convention): "earlier corpus" = stored
    rows with id < earlier_below, the already-indexed anti-join is
    skipped, and the append is guarded by skip_if_range_indexed —
    deleting a batch target and re-running reproduces identical
    edges. The default (None) keeps at-least-once streaming semantics
    (re-delivered ids drop against the store)."""
    from ..functions.text import md5_prefix_int
    from .sigstore import SignatureStore, collect_prune_keys

    spark = new_docs.sparkSession
    store = SignatureStore(store_path, family=EXACT_FAMILY)
    sigs = new_docs.select(
        id_col,
        F.lit(0).alias("band"),
        md5_prefix_int(F.col(text_col)).alias("key"),
        F.md5(F.col(text_col).cast("binary")).alias("h"),
    )
    if earlier_below is None:
        bounds = sigs.agg(F.min(id_col).alias("lo"), F.max(id_col).alias("hi")).first()
        if bounds.lo is not None:
            known = store.known_ids(
                spark, id_min=bounds.lo, id_max=bounds.hi, id_col=id_col
            )
            if known is not None:
                sigs = sigs.join(known, id_col, "left_anti")
    fresh = sigs.dropDuplicates([id_col]).localCheckpoint(eager=True)
    empty = fresh.limit(0).select(
        F.col(id_col).alias("doc_a"), F.col(id_col).alias("doc_b")
    )
    keys = collect_prune_keys(fresh)
    if keys == []:
        return empty
    corpus = store.read_signatures(
        spark, keys=keys, id_col=id_col, id_below=earlier_below
    )
    right = fresh if corpus is None else fresh.unionByName(corpus)
    a = fresh.alias("a")
    pairs = (
        a.join(
            right.alias("b"),
            (F.col("a.key") == F.col("b.key"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("doc_b"))
        .agg(F.min(F.col(f"b.{id_col}")).alias("doc_a"))
        .select("doc_a", "doc_b")
    )
    span = fresh.agg(F.min(id_col).alias("lo"), F.max(id_col).alias("hi")).first()
    if span.lo is not None:
        store.append(
            fresh,
            id_min=span.lo,
            id_max=span.hi,
            skip_if_range_indexed=earlier_below is not None,
        )
    return pairs
