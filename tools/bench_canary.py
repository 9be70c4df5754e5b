#!/usr/bin/env python
"""Machine-band canary: a FIXED 10-query set run in a fresh subprocess
JVM, min-of-5 per query (round-8 verdict item 4).

Three rounds of bench adjudication (r4-r8) re-litigated the same
phenomenon: per-query wall times on this box wander in a 1.0-1.24x
cross-session band (burst-credit/thermal state) with ZERO plan
changes, and each round's >25% per-query flags had to be re-measured
by hand to prove it. This canary measures the band ONCE per round,
as data: the set below has had stable, test-pinned plans since early
rounds (mix of sub-second and heavy), `tools/canary_floor.json`
records a quiet-box reference measured when the set was frozen, and
bench.py runs this script in a SUBPROCESS (own JVM, cold codegen)
AFTER the protocol loop — running it first depleted the box's CPU
burst budget and inflated the round-9 protocol numbers 1.4x, so the
ratios recorded in BENCH_DETAIL.json under "canary" are an
END-OF-BENCH SESSION-HEAT band (parent JVM still resident), an upper
bound on the quiet-box band rather than a cold-start floor (see the
position comment in bench.py). A canary query >1.3x its floor with an
unchanged plan is a machine-band datum, not a regression debate; a
plan regression would move its query in BOTH the canary and the
protocol run.

Standalone: python tools/bench_canary.py  (one JSON line on stdout)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Frozen set — do NOT rotate these with the headline set: the value
#: of the canary is the longitudinal comparison against the committed
#: floor. 5 sub-second + 5 heavy, all plan-pinned in tests/test_plans
#: or stress-measured in SCALE.md, none touched since round 7.
CANARY_QUERIES = (
    "q_scan_project",
    "q_dedup_exact",
    "q_agg_pricing",
    "q_window_rank",
    "q_event_tumbling",
    "q_tpch_q9",
    "q_dedup_ngram_jaccard",
    "q_search_bm25",
    "q_dedup_minhash",
    "q_sim_cosine_topk",
)

FLOOR_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "canary_floor.json")


def run_canary(sf_dir: str, cpus: str, n_runs: int = 5) -> dict:
    from production_ready_ds_spark.queries import catalog
    from production_ready_ds_spark.session import get_spark

    load_start = round(os.getloadavg()[0], 2)
    spark = get_spark("bench-canary", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    cat = catalog()
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in CANARY_QUERIES:
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            cat[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        cold[name] = round(runs[0], 3)
        timings[name] = round(min(runs), 3)
    out = {
        "queries": timings,
        "cold_queries": cold,
        "total": round(sum(timings.values()), 3),
        "mode": f"isolated_cold_jvm_min_of_{n_runs}",
        "sf_dir": sf_dir,
        "load_avg_start": load_start,
        "load_avg_end": round(os.getloadavg()[0], 2),
    }
    floor = load_floor()
    if floor and floor.get("sf_dir") not in (None, sf_dir):
        # the floor is a quiet-box reference at ITS recorded scale
        # factor — ratios against a different sf are meaningless
        out["floor_skipped"] = (
            f"floor measured at {floor['sf_dir']}, this run at {sf_dir}"
        )
        floor = None
    if floor:
        ratios = {
            n: round(timings[n] / floor["queries"][n], 3)
            for n in timings
            if floor["queries"].get(n)
        }
        out["floor_total"] = floor["total"]
        out["band_vs_floor"] = round(out["total"] / floor["total"], 3)
        out["query_ratios_vs_floor"] = ratios
    spark.stop()
    return out


def load_floor() -> dict | None:
    try:
        with open(FLOOR_PATH) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out = run_canary(sf_dir, cpus)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
