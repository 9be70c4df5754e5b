"""Plan-shape assertions: the 100 TB scale discipline as CI checks.

Every property here is a claim the engine makes about its physical
plans (SURVEY.md §4.2): predicate pushdown reaches the parquet scan,
column pruning narrows ReadSchema, tiny dims broadcast, top-k avoids a
global sort, aggregations shuffle exactly once. A regression that
de-optimizes a plan fails these tests even while results stay correct.
"""

from __future__ import annotations

import pytest

from production_ready_ds_spark.plans import (
    broadcast_join_count,
    exchange_input_columns,
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
)
from production_ready_ds_spark.queries import catalog


@pytest.fixture(scope="module")
def cat():
    return catalog()


def test_pushed_filters_splits_in_lists_at_top_level():
    """An In-list's closing ']' must neither end the payload nor split
    the entry — a dual-predicate scan reports BOTH filters."""
    from production_ready_ds_spark.plans.audit import _split_top_level

    entry = "In(list_id, [1,2,3]), IsNotNull(lang), In(lang, [de,fr])"
    assert _split_top_level(entry) == [
        "In(list_id, [1,2,3])",
        "IsNotNull(lang)",
        "In(lang, [de,fr])",
    ]
    assert _split_top_level("") == []
    assert _split_top_level("IsNotNull(x)") == ["IsNotNull(x)"]


def test_filter_pushdown_reaches_scan(spark, sf_small, cat):
    df = cat["q_filter_range"].fn(spark, sf_small)
    pushed = " ".join(pushed_filters(df))
    assert "o_orderdate" in pushed, f"range predicate not pushed: {pushed}"


def test_like_pushdown_reaches_scan(spark, sf_small, cat):
    df = cat["q_filter_like"].fn(spark, sf_small)
    pushed = " ".join(pushed_filters(df))
    assert "StringContains" in pushed or "p_type" in pushed


def test_column_pruning_on_projection(spark, sf_small, cat):
    df = cat["q_scan_project"].fn(spark, sf_small)
    schemas = read_schema_columns(df)
    assert schemas, "no parquet scan found"
    read = set().union(*schemas)
    # 5 of lineitem's 11 columns — the rest must never be deserialized
    assert read == {"l_orderkey", "l_partkey", "l_linenumber", "l_quantity", "l_extendedprice"}


def test_flagship_agg_reads_only_needed_columns(spark, sf_small, cat):
    df = cat["q_agg_pricing"].fn(spark, sf_small)
    read = set().union(*read_schema_columns(df))
    assert read == {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    }


def test_flagship_agg_single_shuffle(spark, sf_small, cat):
    df = cat["q_agg_pricing"].fn(spark, sf_small)
    assert shuffle_count(df) <= 1, explain_str(df)


def test_star_join_broadcasts_dimensions(spark, sf_small, cat):
    df = cat["q_join_star"].fn(spark, sf_small)
    assert broadcast_join_count(df) >= 2, "nation+region must broadcast"


def test_range_join_is_broadcast_not_cartesian(spark, sf_small, cat):
    df = cat["q_join_range"].fn(spark, sf_small)
    s = explain_str(df)
    assert "BroadcastNestedLoopJoin" in s
    assert "CartesianProduct" not in s


def test_topk_uses_take_ordered_not_global_sort(spark, sf_small, cat):
    df = cat["q_sort_topk"].fn(spark, sf_small)
    assert "TakeOrderedAndProject" in explain_str(df)


def test_semi_anti_joins_prune_right_columns(spark, sf_small, cat):
    for name in ("q_join_semi", "q_join_anti"):
        df = cat[name].fn(spark, sf_small)
        schemas = read_schema_columns(df)
        orders_scan = [s for s in schemas if any(c.startswith("o_") for c in s)]
        assert orders_scan, "orders scan missing"
        # the orders side must read only the join key (+ pushdown column)
        assert all(len(s) <= 2 for s in orders_scan), schemas


def test_broadcast_dim_join(spark, sf_small, cat):
    assert has_broadcast_join(cat["q_join_broadcast"].fn(spark, sf_small))


def test_dedup_exact_single_shuffle(spark, sf_small, cat):
    df = cat["q_dedup_exact"].fn(spark, sf_small)
    assert shuffle_count(df) <= 1


def test_sim_topk_probe_side_broadcast(spark, sf_small, cat):
    df = cat["q_sim_cosine_topk"].fn(spark, sf_small)
    assert has_broadcast_join(df), "probe set must broadcast, corpus must stream"


def test_asof_join_single_shuffle_no_join(spark, sf_small, cat):
    """The as-of join must compile to union + one window exchange on the
    key — never a join operator (the quadratic-per-key shape)."""
    df = cat["q_join_asof"].fn(spark, sf_small)
    s = explain_str(df)
    assert "Join" not in s, s
    assert shuffle_count(df) == 1, s


def test_sim_topk_probes_broadcast(spark, sf_small, cat):
    """Brute-force cosine must broadcast the probe side; the corpus
    side streams in one pass."""
    df = cat["q_sim_cosine_topk"].fn(spark, sf_small)
    assert has_broadcast_join(df), explain_str(df)


def test_ngram_jaccard_reuses_shingle_exchange(spark, sf_small, cat):
    """The shingle self-join reads its shuffle once (ReuseExchange) and
    the whole query runs in <=3 exchanges: shingle (reused) + pair key."""
    df = cat["q_dedup_ngram_jaccard"].fn(spark, sf_small)
    assert shuffle_count(df) <= 3, explain_str(df)


def test_dedup_self_joins_read_checkpoint_not_parquet(spark, sf_small, cat):
    """The expensive shingle/signature pipelines are eagerly
    checkpointed, so the final plan's self-join consumes the
    materialized RDD — the documents parquet must NOT appear (it would
    mean the pipeline recomputes per join side; AQE misses the
    ReuseExchange that would otherwise dedup it)."""
    for name in ("q_dedup_ngram_jaccard", "q_dedup_minhash"):
        df = cat[name].fn(spark, sf_small)
        s = explain_str(df)
        assert "ExistingRDD" in s, s
        assert "parquet" not in s.lower(), f"{name} recomputes the scan: {s}"


def test_event_rollup_single_shuffle(spark, sf_small, cat):
    df = cat["q_event_rollup"].fn(spark, sf_small)
    assert shuffle_count(df) <= 1, explain_str(df)




def test_stratified_sample_is_map_only(spark, sf_small, cat):
    """sampleBy + final count is one shuffle total (the agg); the sample
    itself must stay a map-side filter with no exchange."""
    df = cat["q_sample_stratified"].fn(spark, sf_small)
    assert shuffle_count(df) <= 1, explain_str(df)


def test_tpch_q4_decorrelates_to_semi_join(spark, sf_small, cat):
    """The correlated EXISTS must become a LEFT SEMI join (no row
    duplication + re-distinct), with the quarter filter pushed to the
    orders scan."""
    df = cat["q_tpch_q4"].fn(spark, sf_small)
    s = explain_str(df)
    assert "LeftSemi" in s, s
    pushed = " ".join(pushed_filters(df))
    assert "o_orderdate" in pushed, f"quarter filter not pushed: {pushed}"


def test_tpch_q14_broadcasts_part(spark, sf_small, cat):
    """part is the dimension side: it must broadcast, and the one-month
    slice must reach the lineitem scan."""
    df = cat["q_tpch_q14"].fn(spark, sf_small)
    assert has_broadcast_join(df), explain_str(df)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed, f"month filter not pushed: {pushed}"


def test_tpch_q22_no_shuffle_for_threshold(spark, sf_small, cat):
    """The scalar average must arrive as a broadcast (literal cross
    join), and the date bound must prune the orders scan before the
    anti join."""
    df = cat["q_tpch_q22"].fn(spark, sf_small)
    s = explain_str(df)
    assert "BroadcastNestedLoopJoin" in s or "BroadcastHashJoin" in s, s
    pushed = " ".join(pushed_filters(df))
    assert "o_orderdate" in pushed, f"date bound not pushed: {pushed}"


def test_interpolate_windows_are_spine_sized(spark, sf_small, cat):
    """The LOCF fill must window over the generated spine (hours ×
    types), never over raw events: the plan's window operator sits
    above the spine join, and raw events only feed bucket-level
    aggregates (asserted indirectly: every events scan reads only the
    3 needed columns)."""
    df = cat["q_event_interpolate"].fn(spark, sf_small)
    s = explain_str(df)
    assert "Window" in s, s
    for cols in read_schema_columns(df):
        assert cols <= {"ts", "event_type", "value"}, cols


def test_histogram_bounds_broadcast(spark, sf_small, cat):
    """Bucket assignment must be map-side arithmetic against broadcast
    bounds — no UDF, no extra shuffle of the orders table beyond the
    20-row hash agg."""
    df = cat["q_histogram"].fn(spark, sf_small)
    s = explain_str(df)
    assert "BroadcastNestedLoopJoin" in s or "BroadcastExchange" in s, s
    assert "pythonUDF" not in s and "BatchEvalPython" not in s, s


def test_tfidf_broadcasts_vocabulary_sides(spark, sf_small, cat):
    """The df (document-frequency) and N sides are vocabulary-sized /
    one-row: both must broadcast, and no Python UDF may appear."""
    df = cat["q_tfidf_top_terms"].fn(spark, sf_small)
    s = explain_str(df)
    assert broadcast_join_count(df) >= 2, s
    assert "BatchEvalPython" not in s and "pythonUDF" not in s, s


def test_vocab_build_single_corpus_shuffle(spark, sf_small, cat):
    """One corpus-wide hash-agg on token; the rank window runs over the
    min-count-filtered vocabulary only (a single-partition exchange of
    vocab-sized data is acceptable and expected)."""
    df = cat["q_vocab_build"].fn(spark, sf_small)
    s = explain_str(df)
    assert "Window" in s, s
    assert "BatchEvalPython" not in s, s


def test_tpch_q10_pushes_filters_and_broadcasts_nation(spark, sf_small, cat):
    """Return-flag and quarter predicates must reach their scans; the
    nation dim must broadcast; the top-20 must be TakeOrderedAndProject
    (no global sort materialization)."""
    df = cat["q_tpch_q10"].fn(spark, sf_small)
    pushed = " ".join(pushed_filters(df))
    assert "l_returnflag" in pushed and "o_orderdate" in pushed, pushed
    s = explain_str(df)
    assert "BroadcastHashJoin" in s, s
    assert "TakeOrderedAndProject" in s, s


def test_tpch_q19_pushes_disjunctive_branches(spark, sf_small, cat):
    """The OR-of-conjuncts must yield per-side implied disjunctions in
    PushedFilters (brand/size on part, quantity on lineitem) — a plan
    that evaluates the whole disjunction post-join reads both tables
    unpruned."""
    df = cat["q_tpch_q19"].fn(spark, sf_small)
    pushed = " ".join(pushed_filters(df))
    assert "p_brand" in pushed, f"part-side disjunction not pushed: {pushed}"
    assert "l_quantity" in pushed, f"lineitem-side disjunction not pushed: {pushed}"


def test_tpch_q21_single_aggregate_decorrelation(spark, sf_small, cat):
    """The EXISTS + NOT-EXISTS pair must ride ONE shuffle of lineitem:
    both per-order distinct-supplier counts come from collect_set
    windows sharing a partition spec (no correlated re-scans, no
    LeftSemi/LeftAnti, no Expand from a dual countDistinct — the
    Expand formulation measured 2× slower), and lineitem is scanned
    exactly once."""
    df = cat["q_tpch_q21"].fn(spark, sf_small)
    s = explain_str(df)
    assert "LeftSemi" not in s and "LeftAnti" not in s, s
    assert "Expand" not in s, s
    assert s.count("lineitem.parquet") == 1, s
    assert "TakeOrderedAndProject" in s, s


def test_dedup_normalized_single_shuffle(spark, sf_small, cat):
    """Normalize+hash dedup must be map-side normalize → ONE exchange
    for the final hash agg — the same shape as exact dedup (no window,
    no join, no Python)."""
    df = cat["q_dedup_normalized"].fn(spark, sf_small)
    s = explain_str(df)
    assert shuffle_count(df) == 1, s
    assert "BatchEvalPython" not in s and "Window" not in s, s


def test_sample_quota_single_source_shuffle(spark, sf_small, cat):
    """Quota sampling shuffles ONCE on source for the rank window;
    nothing else (the md5 sort key is computed map-side)."""
    df = cat["q_sample_quota"].fn(spark, sf_small)
    s = explain_str(df)
    assert shuffle_count(df) == 1, s
    assert "Window" in s, s


def test_audio_features_only_spread_exchange(spark, sf_small, cat):
    """Synth + decode is one mapInPandas pass. The only permitted
    exchange is tables.spread's RoundRobin fan-out of the narrow scan
    (no-op on many-row-group lakes) — never a data-dependent hash/range
    shuffle."""
    df = cat["q_audio_features"].fn(spark, sf_small)
    s = explain_str(df)
    assert shuffle_count(df) <= 1, s
    assert "hashpartitioning" not in s and "rangepartitioning" not in s, s


def test_ngram_profile_bounded_aggregate(spark, sf_small, cat):
    """Trigram profile: explode is map-side (no pre-explode exchange);
    the per-lang top-k window runs AFTER the (lang, trigram) aggregate
    whose cardinality is alphabet-bounded — assert the length filter is
    pushed to the scan and there is no Python stage."""
    df = cat["q_ngram_lang_profile"].fn(spark, sf_small)
    s = explain_str(df)
    assert "BatchEvalPython" not in s, s
    pushed = " ".join(pushed_filters(df))
    assert "text" in pushed, pushed


def test_fuzzy_join_broadcasts_vocabulary(spark, sf_small, cat):
    """The fuzzy join verifies candidates over the DISTINCT name
    vocabulary with one side broadcast — the verify pass must be a
    broadcast hash join (no shuffle of the vocabulary self-join) and
    levenshtein must stay JVM-side (no Python stage)."""
    df = cat["q_join_fuzzy"].fn(spark, sf_small)
    s = explain_str(df)
    assert has_broadcast_join(df), s
    assert "BatchEvalPython" not in s, s


def test_dedup_segments_two_shuffles(spark, sf_small, cat):
    """Segment dedup: segmentization is a map-side explode; exactly two
    exchanges are allowed — the window on seg and the per-doc rollup.
    No Python stage anywhere."""
    df = cat["q_dedup_segments"].fn(spark, sf_small)
    s = explain_str(df)
    assert shuffle_count(df) == 2, s
    assert "Window" in s and "BatchEvalPython" not in s, s


def test_event_transitions_single_event_shuffle(spark, sf_small, cat):
    """The lag window is the ONLY shuffle that scales with event
    volume; everything after runs on the |types|²-bounded aggregate.
    Exactly: user window exchange + (from,to) agg + from_type window
    on constant-size data = 3 exchanges, no Python."""
    df = cat["q_event_transitions"].fn(spark, sf_small)
    s = explain_str(df)
    assert shuffle_count(df) <= 3, s
    assert "BatchEvalPython" not in s, s


def test_dup_graph_stats_edge_joins_unpinned(spark, sf_small, cat):
    """The one-row stat combines are forced broadcast; the wedge/
    closure joins are deliberately NOT hinted (an edge list can be
    corpus-scale at 100 TB — AQE broadcasts them only when measured
    small). The documents parquet must not appear (pairs are
    checkpointed once), and nothing Python."""
    df = cat["q_dup_graph_stats"].fn(spark, sf_small)
    s = explain_str(df)
    assert broadcast_join_count(df) >= 2, s
    assert "parquet" not in s.lower(), s
    assert "BatchEvalPython" not in s, s


def test_user_journey_shares_session_exchange(spark, sf_small, cat):
    """The session flag, session id, and within-session rank windows
    must all ride ONE exchange+sort on user_id; only the per-session
    path agg and the constant-size top-10 add shuffles. No Python."""
    df = cat["q_user_journey"].fn(spark, sf_small)
    s = explain_str(df)
    assert shuffle_count(df) <= 4, s
    assert "BatchEvalPython" not in s, s


def test_embed_quantize_mapside_no_udf(spark, sf_small, cat):
    """int8 quantization must be ONE map-side pass: zero shuffles, no
    Python evaluation, and only (vec_id, embedding) read from the
    store."""
    df = cat["q_embed_quantize"].fn(spark, sf_small)
    s = explain_str(df)
    assert shuffle_count(df) == 0, s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s, s
    read = set().union(*read_schema_columns(df))
    assert read == {"vec_id", "embedding"}, read


def test_cdc_dedup_single_aggregate_no_window(spark, sf_small, cat):
    """CDC chunking must stay per-document array work: no Window over
    the corpus, no Python, no join. Permitted exchanges: the spread
    fan-out plus the two-level distinct-count aggregate (partial on
    (sig, doc_id), final on sig — Spark's standard exact-countDistinct
    shape, both levels map-side-combined)."""
    df = cat["q_dedup_cdc"].fn(spark, sf_small)
    s = explain_str(df)
    assert "Window" not in s, s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s, s
    assert "Join" not in s, s
    assert shuffle_count(df) <= 3, s


def test_curation_funnel_narrow_join(spark, sf_small, cat):
    """The funnel's keep join must move only narrow rows: text-derived
    flags are computed map-side, so no Window, no Python, and the
    whole report runs in at most the dedup agg + keep join + source
    agg exchanges."""
    df = cat["q_curation_funnel"].fn(spark, sf_small)
    s = explain_str(df)
    assert "Window" not in s, s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s, s
    assert shuffle_count(df) <= 4, s


def test_tpch_q2_broadcasts_snowflake_and_takeordered(spark, sf_small, cat):
    """part's type/size filters must reach its scan; the part dim and
    the EUROPE supplier→nation→region snowflake must all broadcast (4
    broadcast joins incl. the snowflake's internals); lineitem — the
    pair-table derivation — is scanned exactly once; the top-100 is
    TakeOrderedAndProject, not a global sort."""
    df = cat["q_tpch_q2"].fn(spark, sf_small)
    pushed = " ".join(pushed_filters(df))
    assert "p_type" in pushed and "p_size" in pushed, pushed
    s = explain_str(df)
    assert broadcast_join_count(df) >= 3, s
    assert s.count("lineitem.parquet") == 1, s
    assert "TakeOrderedAndProject" in s, s


def test_tpch_q9_pushes_name_filter_single_fact_shuffle(spark, sf_small, cat):
    """The %red% name filter must prune part BEFORE broadcast
    (StringContains in PushedFilters); part/supplier/nation all
    broadcast so the only shuffle-joined pair is lineitem⋈orders;
    lineitem is scanned once."""
    df = cat["q_tpch_q9"].fn(spark, sf_small)
    pushed = " ".join(pushed_filters(df))
    assert "StringContains" in pushed, pushed
    s = explain_str(df)
    assert broadcast_join_count(df) >= 3, s
    assert s.count("lineitem.parquet") == 1, s


def test_tpch_q11_scalar_cut_no_second_scan(spark, sf_small, cat):
    """The 3×AVG scalar-subquery threshold must decorrelate to a window
    over the per-part aggregate — lineitem scanned ONCE (a naive
    translation scans it again for the total); the region's supplier
    keys broadcast."""
    df = cat["q_tpch_q11"].fn(spark, sf_small)
    s = explain_str(df)
    assert s.count("lineitem.parquet") == 1, s
    assert broadcast_join_count(df) >= 1, s


def test_tpch_q16_anti_join_is_broadcast(spark, sf_small, cat):
    """The NOT-IN exclusion must plan as a BROADCAST left-anti join
    (the excluded-supplier set is tiny); part's brand/type/size filters
    push to its scan; lineitem scanned once for the pair distinct."""
    df = cat["q_tpch_q16"].fn(spark, sf_small)
    s = explain_str(df)
    assert "LeftAnti" in s and "BroadcastHashJoin" in s, s
    pushed = " ".join(pushed_filters(df))
    assert "p_brand" in pushed and "p_size" in pushed, pushed
    assert s.count("lineitem.parquet") == 1, s


def test_tpch_q20_pushes_shipdate_window_on_aggregate(spark, sf_small, cat):
    """The 1996 ship-date range must reach the lineitem scan; red parts
    and both dims broadcast; the dominance share is a window over the
    (part, supplier) AGGREGATE (pair-table-sized), never a second
    lineitem scan."""
    df = cat["q_tpch_q20"].fn(spark, sf_small)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed, pushed
    s = explain_str(df)
    assert broadcast_join_count(df) >= 3, s
    assert s.count("lineitem.parquet") == 1, s


def test_snapshot_diff_full_outer_join_is_narrow(spark, sf_small, cat):
    """The snapshot diff must reduce each side to (doc_id, md5)
    MAP-SIDE before the id join — document text never shuffles; the
    join itself is the FULL OUTER shape with no window or Python."""
    df = cat["q_snapshot_diff"].fn(spark, sf_small)
    s = explain_str(df)
    assert "FullOuter" in s, s
    assert "Window" not in s and "EvalPython" not in s, s
    # the exchanges move hashes, not text: no shuffle's INPUT column
    # list may contain the raw text column (exchange_input_columns
    # reads the formatted plan's Input lines — the partitioning
    # arguments alone would be a vacuous check, keys are always narrow)
    shuffled = exchange_input_columns(df)
    assert shuffled, "expected at least one exchange in the diff plan"
    for cols in shuffled:
        assert "text" not in cols, cols


def test_heavy_hitters_candidate_pass_is_map_side(spark, sf_small, cat):
    """The Misra-Gries candidate pass must run BEFORE any exchange
    (scan → explode → mapInPandas, all map-side). The query checkpoints
    the summary, so the pass is audited on the operator frame directly;
    the full query plan is then checked for bounded shuffles (the
    candidate distinct + recount aggregation — never a full-token-
    cardinality aggregation)."""
    from pyspark.sql import functions as F

    from production_ready_ds_spark.functions.text import tokens_expr
    from production_ready_ds_spark.operators.sketch import misra_gries_candidates
    from production_ready_ds_spark.tables import load

    toks = load(spark, sf_small, "documents").select(
        F.explode(tokens_expr(F.col("text"))).alias("token")
    )
    summ = misra_gries_candidates(toks, "token", k=100)
    s = explain_str(summ)
    assert "MapInPandas" in s, s
    tree = s.split("\n\n")[0].splitlines()
    mp = next(i for i, l in enumerate(tree) if "MapInPandas" in l)
    below = tree[mp + 1 :]
    scan = next(i for i, l in enumerate(below) if "Scan parquet" in l)
    assert not any("Exchange" in l for l in below[:scan]), below[: scan + 1]

    df = cat["q_heavy_hitters"].fn(spark, sf_small)
    assert shuffle_count(df) <= 4, explain_str(df)


# ------------------------------ round-4 operators ---------------------


def test_pack_bestfit_is_one_hash_agg_no_window_over_corpus(spark, sf_small, cat):
    """Harmonic shelf packing's whole point: bin counts from ONE hash
    aggregate; the only window runs over the few-thousand-row class
    table, so no corpus-sized exchange carries more than (lang, n)."""
    df = cat["q_pack_bestfit"].fn(spark, sf_small)
    plan = explain_str(df)
    assert plan.count("HashAggregate") >= 2  # partial + final of the one agg
    for cols in exchange_input_columns(df):
        assert "text" not in cols and "doc_id" not in cols, cols


def test_perplexity_shuffles_narrow_and_combines_map_side(spark, sf_small, cat):
    """The corpus-wide stages of the bigram scorer must shuffle only
    narrow columns (tokens/ids/counts — never text), and the per-doc
    aggregate must have a partial (map-side) level."""
    df = cat["q_quality_perplexity"].fn(spark, sf_small)
    plan = explain_str(df)
    assert "partial_count" in plan or "partial_sum" in plan
    for cols in exchange_input_columns(df):
        assert "text" not in cols, cols


def test_substring_runs_selfjoin_reads_checkpoint_with_shuffle_hash(spark, sf_small, cat):
    """The chunk-signature self-join must consume the materialized
    capped frame (Scan ExistingRDD, not a parquet re-scan per side) via
    a shuffled-hash join, mirroring the jaccard discipline."""
    df = cat["q_dedup_substring_runs"].fn(spark, sf_small)
    plan = explain_str(df)
    assert "ShuffledHashJoin" in plan, plan[:800]
    assert plan.count("Scan ExistingRDD") >= 2, "self-join sides must read the checkpoint"
    assert plan.count("Scan parquet") == 0, "no side may re-run the chunk pipeline"


def test_semantic_dedup_pairs_stay_bucket_local(spark, sf_small, cat):
    """q_dedup_semantic must generate pairs via the cogrouped
    per-bucket kernel (FlatMapCoGroupsInPandas) — never a cartesian or
    unbucketed join of the embedding table with itself."""
    df = cat["q_dedup_semantic"].fn(spark, sf_small)
    plan = explain_str(df)
    assert "FlatMapCoGroupsInPandas" in plan, plan[:800]
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_mix_temperature_rate_table_broadcasts(spark, sf_small, cat):
    """The |languages|-row rate table must broadcast; the corpus pass
    itself is map-side plus one count aggregate."""
    df = cat["q_mix_temperature"].fn(spark, sf_small)
    assert has_broadcast_join(df), explain_str(df)[:800]
    for cols in exchange_input_columns(df):
        assert "text" not in cols, cols


def test_novelty_and_report_shuffle_hashes_not_text(spark, sf_small, cat):
    """q_text_novelty and q_corpus_report must never put the text
    column on the wire — only hashes/ids/counts shuffle."""
    for name in ("q_text_novelty", "q_corpus_report"):
        df = cat[name].fn(spark, sf_small)
        for cols in exchange_input_columns(df):
            assert "text" not in cols and "ts" not in cols, (name, cols)


def test_theta_exact_side_has_no_hash_selfjoin(spark, sf_small, cat):
    """q_sketch_theta's exact intersections must come from the
    collect_set pair expansion (map-side generates), not the old
    corpus-wide self-join on the hash — and shingle STRINGS never
    shuffle (only their 8-byte hashes)."""
    df = cat["q_sketch_theta"].fn(spark, sf_small)
    plan = explain_str(df)
    assert plan.count("explode(ss") >= 2, plan[:600]
    for cols in exchange_input_columns(df):
        assert "sg" not in cols and "text" not in cols, cols


def test_semdedup_ingest_earlier_read_is_probed_lists_only(spark, tmp_path):
    """The incremental semantic-dedup DAG's earlier-corpus read must be
    O(probed lists), never a store scan: the batch's list ids reach the
    parquet scan as a pushed In(list_id, ...) predicate (row-group
    pruning on list-clustered segments), and the frame returns rows of
    those lists only."""
    from production_ready_ds_spark.operators.ivfstore import IVFStore
    from production_ready_ds_spark.pipelines.ingest_semdedup import SemDedupBatch
    from production_ready_ds_spark.plans.audit import pushed_filters
    from production_ready_ds_spark.workflow import build

    root = str(tmp_path / "out")
    src = "/root/testdata/sf0.001/embeddings.parquet"
    build([SemDedupBatch(data_root=root, source_path=src, batch=0)])
    store = IVFStore(f"{root}/ingest/ivf_store")
    # the exact read the batch-1 task performs for its earlier corpus
    probe_lists = [0, 2, 5]
    earlier = store.read_lists(spark, probe_lists)
    pushed = " ".join(pushed_filters(earlier))
    assert "list_id" in pushed and "In(" in pushed, pushed
    got_lists = {r.list_id for r in earlier.select("list_id").distinct().collect()}
    assert got_lists <= set(probe_lists)


def test_bm25_is_map_side_plus_takeordered(spark, sf_small, cat):
    """q_search_bm25's only corpus-ordered stage must be a
    TakeOrderedAndProject (partition-local top-k + a 20-row merge),
    never a corpus-wide sort or global window; the stats row joins by
    broadcast and text never shuffles."""
    df = cat["q_search_bm25"].fn(spark, sf_small)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan[:800]
    assert has_broadcast_join(df), plan[:800]
    for cols in exchange_input_columns(df):
        assert "text" not in cols and "ts" not in cols, cols


def test_hybrid_rerank_stays_candidate_sized(spark, sf_small, cat):
    """q_search_hybrid's semantic stage must touch only the k BM25
    candidates: the candidate frame and the 1-row seed join by
    broadcast, the rerank window runs on <= k rows, and document text
    never reaches an exchange."""
    df = cat["q_search_hybrid"].fn(spark, sf_small)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan[:800]  # the BM25 stage
    assert plan.count("BroadcastExchange") >= 2, plan[:800]
    for cols in exchange_input_columns(df):
        assert "text" not in cols and "ts" not in cols, cols


def test_rrf_fusion_stays_candidate_sized(spark, sf_small, cat):
    """q_search_rrf: the lexical stage is the TakeOrderedAndProject
    BM25 plan, the seed and ANN-candidate frames join by broadcast,
    and document text never reaches an exchange — fusion itself only
    ever touches <= 2k rows."""
    df = cat["q_search_rrf"].fn(spark, sf_small)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan[:800]
    assert plan.count("BroadcastExchange") >= 2, plan[:800]
    for cols in exchange_input_columns(df):
        assert "text" not in cols and "ts" not in cols, cols


def test_ann_recall_report_never_shuffles_embeddings(spark, sf_small, cat):
    """q_ann_recall: probes/budgets/bucket-rank frames ride broadcasts;
    the embedding vectors themselves never cross an exchange (the
    candidate and truth passes are map-side against broadcast probes,
    and only (nprobe, probe, neighbor) hit rows reach the final
    aggregate)."""
    df = cat["q_ann_recall"].fn(spark, sf_small)
    plan = explain_str(df)
    assert "BroadcastExchange" in plan, plan[:800]
    for cols in exchange_input_columns(df):
        assert "embedding" not in cols and "pe" not in cols and "ce" not in cols, cols


def test_readability_gate_is_map_only(spark, sf_small, cat):
    """q_quality_readability: pure per-row column arithmetic — the
    plan must contain NO exchange at all (the gate composes as one
    more column on a curation map pass at any corpus size)."""
    df = cat["q_quality_readability"].fn(spark, sf_small)
    plan = explain_str(df)
    assert "Exchange" not in plan, plan[:800]


def test_highlight_decoration_is_k_row_broadcast(spark, sf_small, cat):
    """q_search_highlight: retrieval is the audited BM25 plan; the
    decoration must join the 20-row rank frame by BROADCAST onto the
    doc table and tokenize after the join — document text/token
    arrays never reach an exchange, so snippet cost is O(k) at any
    corpus size."""
    df = cat["q_search_highlight"].fn(spark, sf_small)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan[:800]  # the BM25 stage
    assert has_broadcast_join(df), plan[:800]
    for cols in exchange_input_columns(df):
        assert "text" not in cols and "ts" not in cols and "snippet" not in cols, cols


def test_mlt_scoring_is_the_bm25_plan(spark, sf_small, cat):
    """q_search_mlt: after the bounded profile point-read, scoring IS
    the audited fixed-term bm25_topk plan — map-side tf columns on
    the resident token array, the 1-row stats frame broadcast back,
    TakeOrderedAndProject as the only ordered stage, and corpus
    text/token arrays never reaching an exchange."""
    df = cat["q_search_mlt"].fn(spark, sf_small)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan[:800]
    assert has_broadcast_join(df), plan[:800]
    for cols in exchange_input_columns(df):
        assert "text" not in cols and "ts" not in cols, cols


def test_join_full_runs_on_preaggregated_arms(spark, sf_small, cat):
    """q_join_full: both arms aggregate BEFORE the full-outer join
    (the year filters are pushed to the scan and each arm's partial
    count combines map-side), so the unavoidable key shuffle moves
    per-customer count rows, never raw orders; no broadcast is
    expected — full outer can't broadcast by semantics."""
    df = cat["q_join_full"].fn(spark, sf_small)
    plan = explain_str(df)
    assert "FullOuter" in plan or "full_outer" in plan.lower(), plan[:800]
    pushed = " ".join(pushed_filters(df))
    assert "o_orderdate" in pushed, f"year range not pushed: {pushed}"
    # every exchange carries (key, count)-shaped rows, nothing wider
    for cols in exchange_input_columns(df):
        assert len(cols) <= 2, cols


def test_phrase_highlight_decoration_is_k_row_broadcast(spark, sf_small, cat):
    """q_search_phrase_highlight: ranking is the map-only phrase plan;
    the span-aware decoration joins the k-row frame by broadcast and
    corpus text/token arrays never reach an exchange."""
    df = cat["q_search_phrase_highlight"].fn(spark, sf_small)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan[:800]
    assert has_broadcast_join(df), plan[:800]
    for cols in exchange_input_columns(df):
        assert "text" not in cols and "ts" not in cols and "snippet" not in cols, cols


def test_boilerplate_clean_shuffles_hashes_only(spark, sf_small, cat):
    """q_clean_boilerplate: the only corpus-wide shuffle is the
    line-frequency aggregate over md5 hashes — line text never
    reaches an exchange; the hot verdict arrives as a one-row
    broadcast array and the rebuild is a map-side HOF filter."""
    df = cat["q_clean_boilerplate"].fn(spark, sf_small)
    plan = explain_str(df)
    assert "BroadcastExchange" in plan, plan[:800]
    for cols in exchange_input_columns(df):
        assert "text" not in cols and "ts" not in cols and "lines" not in cols, cols


def test_sim_topk_filtered_prunes_before_similarity(spark, sf_small, cat):
    """The vector facet must be PUSHED into the documents scan and the
    eligible set applied as a semi join (pre-similarity candidate
    pruning) — never a post-filter of ranked rows."""
    from production_ready_ds_spark.plans.audit import explain_str

    df = cat["q_sim_topk_filtered"].fn(spark, sf_small)
    pushed = " ".join(pushed_filters(df))
    assert "lang" in pushed and "In(" in pushed, pushed
    assert "LeftSemi" in explain_str(df)


def test_search_faceted_prunes_before_scoring(spark, sf_small, cat):
    """The text facet's scan twin: lang pushed to the documents scan,
    eligible ids semi-joined before the rank window."""
    from production_ready_ds_spark.plans.audit import explain_str

    df = cat["q_search_faceted"].fn(spark, sf_small)
    pushed = " ".join(pushed_filters(df))
    assert "lang" in pushed and "In(" in pushed, pushed
    assert "LeftSemi" in explain_str(df)


def test_layout_queries_read_only_cluster_columns(spark, sf_small, cat):
    """Both clustering-layout twins must prune the lineitem scan to the
    two cluster keys — a layout pass that deserializes all 11 columns
    reads 5x the bytes it needs at 100 TB."""
    for name in ("q_zorder_layout", "q_hilbert_layout"):
        df = cat[name].fn(spark, sf_small)
        schemas = [s for s in read_schema_columns(df) if s]
        assert schemas, name
        for s in schemas:
            assert s <= {"l_partkey", "l_suppkey"}, (name, s)
        assert has_broadcast_join(df), f"{name}: bounds must broadcast"


def test_embed_project_is_one_pass_with_broadcast_signs(spark, sf_small, cat):
    """The JL projection must stay map-side: the only exchange is
    spread()'s round-robin widen (a no-op on real lakes), the sign
    matrix rides a broadcast, and the scan reads only (vec_id,
    embedding)."""
    df = cat["q_embed_project"].fn(spark, sf_small)
    assert shuffle_count(df) <= 1, explain_str(df)
    assert has_broadcast_join(df), "sign frame must broadcast"
    read = set().union(*[s for s in read_schema_columns(df) if s])
    assert read == {"vec_id", "embedding"}


def test_scd2_history_never_windows_and_reads_three_columns(spark, sf_small, cat):
    """The SCD2 merge is joins + unions on the business key — a window
    over the history would sort per key and not scale; the customer
    scan must prune to (key, attr, seed columns)."""
    df = cat["q_scd2_history"].fn(spark, sf_small)
    plan = explain_str(df, "simple")
    assert "Window" not in plan, plan
    read = set().union(*[s for s in read_schema_columns(df) if s])
    assert read == {"c_custkey", "c_mktsegment"}


def test_mmr_candidate_pass_broadcasts_probes(spark, sf_small):
    """MMR's distributed stage is the candidate pass: probes ride a
    broadcast against the streaming corpus, and the corpus never
    shuffles its embedding/quantized column. The pin attaches to the
    PRE-checkpoint operator frame (_mmr_relevance) — the final query
    plan is a Scan ExistingRDD that hides everything upstream (the
    localCheckpoint rule)."""
    from production_ready_ds_spark.queries.llm import _mmr_relevance

    _, rels = _mmr_relevance(spark, sf_small)
    assert has_broadcast_join(rels), explain_str(rels, "simple")
    for cols in exchange_input_columns(rels):
        assert "embedding" not in cols and "qe" not in cols, cols


def test_compact_checkpoint_scale_contract(spark):
    """Pin BOTH branches of the size-adaptive checkpoint (round-11
    verdict item 7 — the contract lived only in the docstring):
    (a) a bench-scale cached frame NARROWS to ceil(bytes / target),
    (b) a frame whose cached bytes exceed target x producer-width
    keeps FULL width — the >=1 GB warehouse no-op — asserted by
    shrinking CKPT_TARGET_BYTES instead of caching a gigabyte (the
    branch condition is bytes-vs-target, identical either way), and
    (c) the coalesce never WIDENS a frame and respects min_parts."""
    from production_ready_ds_spark import tables
    from production_ready_ds_spark.tables import compact_checkpoint

    # (a) narrow: a few KB cached over 8 producer partitions -> 1 part
    small = spark.range(0, 10_000, 1, 8)
    ck = compact_checkpoint(small)
    assert ck.rdd.getNumPartitions() == 1, ck.rdd.getNumPartitions()
    assert ck.count() == 10_000

    # (c) min_parts floor on the same bench-scale shape
    ck_min = compact_checkpoint(spark.range(0, 10_000, 1, 8), min_parts=4)
    assert ck_min.rdd.getNumPartitions() == 4

    # (b) no-op past the target: with a 1-byte target every cached
    # frame is "warehouse-scale" (want >= parts), so the producer's
    # width must survive untouched
    old = tables.CKPT_TARGET_BYTES
    tables.CKPT_TARGET_BYTES = 1
    try:
        wide = compact_checkpoint(spark.range(0, 10_000, 1, 8))
        assert wide.rdd.getNumPartitions() == 8, wide.rdd.getNumPartitions()
        assert wide.count() == 10_000
    finally:
        tables.CKPT_TARGET_BYTES = old
