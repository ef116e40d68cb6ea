"""Benchmark harness (driver contract, see repo instructions).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is materialized with a noop sink (full execution, no
driver-side collect bottleneck). Timings are end-to-end per query,
cold plans, shared warm JVM/session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_mp_transactions_spark import registry  # noqa: E402
from etl_mp_transactions_spark.session import get_spark  # noqa: E402

# headline set: one per operator family (SURVEY.md §2 coverage)
HEADLINE = [
    "flagship_silver",      # nested flatten + full silver transform
    "q1_pricing_summary",   # scan + hash agg
    "q3_join_agg_topk",     # 3-way join + agg + top-k
    "f3_anti_join",         # broadcast anti join
    "j1_two_phase_anti",    # staged anti joins
    "a2_group_kv",          # two-level agg + collect_list
    "w2_topk_per_group",    # window top-k
    "window_session",       # session windows
    "dedup_exact",          # content-hash dedup
    "dedup_minhash_lsh",    # minhash + LSH band join
    "dedup_ngram_jaccard",  # blocked exact jaccard
    "ann_cosine_topk",      # brute-force vector top-k
    "ann_lsh_bucketed",     # bucketed ANN
    "j2_anomaly_pairs",     # similarity blend join
    "text_quality",         # text feature scan
    "multimodal_features",  # Arrow mapInPandas path
    "corpus_curation",      # composed quality->dedup->neardup pipeline
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # box-load attribution (VERDICT r7 task #4): loadavg at start/end
    # makes round-over-round headline deltas attributable — on a
    # quiet box (1-min loadavg well under the cpu count at start) a
    # delta is a plan change; on a loaded box it is noise.
    # Quiet-box closing rule (VERDICT r10 task #4): rather than just
    # FLAG a loud sample, wait (bounded) for the 1-min loadavg to
    # drop below the quiet criterion before starting, so the recorded
    # artifact is baseline-comparable whenever the box quiets down
    # within the budget. SPARK_GRAFT_QUIET_WAIT=0 disables.
    wait_budget = float(os.environ.get("SPARK_GRAFT_QUIET_WAIT", "600"))
    waited = 0.0
    while os.getloadavg()[0] >= 0.1 * cpus and waited < wait_budget:
        print(
            f"# loadavg {os.getloadavg()[0]:.2f} >= {0.1 * cpus:.1f};"
            f" waiting for quiet box ({waited:.0f}s/{wait_budget:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(15)
        waited += 15
    load_start = os.getloadavg()
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=2 * cpus)

    # absorb JVM/codegen warmup so the first headline query isn't
    # charged for JIT compilation
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    # stage the nested bronze fixture outside the timings: fixture
    # synthesis is test scaffolding, not part of the scan→flatten→silver
    # operator under measurement (real bronze arrives already nested)
    from etl_mp_transactions_spark.sources.bronze import staged_bronze

    staged_bronze(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # full registry, headline set first (keeps their timings comparable
    # round-over-round), then every remaining query so regressions in
    # non-headline operators are visible against the 2x guardrail.
    # Headline queries run 3x and report the MEDIAN: BASELINE.md records
    # a 27.8-35.4s noise band on identical code, so single-shot numbers
    # made round-over-round deltas mostly noise; medians are signal.
    # Non-headline queries stay single-shot (they feed the 2x guardrail,
    # not the baseline comparison, and 3x the 100+ tail is minutes).
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    qs = registry.queries()
    order = HEADLINE + sorted(n for n in qs if n not in HEADLINE)
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in order:
        fn = qs[name]
        runs = []
        for _ in range(n_runs if name in HEADLINE else 1):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        runs.sort()
        timings[name] = runs[len(runs) // 2]  # median (single run = itself)
        if len(runs) > 1:
            spread[name] = [runs[0], runs[-1]]
        print(f"# {name}: {timings[name]}s {runs if len(runs) > 1 else ''}",
              file=sys.stderr)

    import re

    m = re.fullmatch(r"sf([0-9.]+)", os.path.basename(sf_dir.rstrip("/")))
    # The driver captures only the last ~2000 chars of output and JSON-parses
    # the final line; a full 120-query timings dict overflows that window
    # (BENCH_r02/r03 recorded "parsed": null). Keep stdout to the headline
    # set and park the full per-query map in BENCH_FULL_LOCAL.json.
    full = {
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "full_registry_total": round(sum(timings.values()), 3),
        "n_queries": len(timings),
        "headline_runs": n_runs,
        "headline_min_max": spread,
        "queries": timings,
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_FULL_LOCAL.json"), "w"
    ) as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
    load_end = os.getloadavg()
    # headline comparability flag. 0.1*cpus (not 0.5) — BASELINE.md's
    # own band analysis treats loadavg 3-4 on this 32-cpu box as the
    # LOADED regime, so the flag must mean "loadavg < ~3", i.e. the
    # near-idle standard the recorded bands were calibrated against.
    quiet_box = load_start[0] < 0.1 * cpus
    out = {
        # headline total stays the headline metric (baseline-comparable);
        # per-query values are medians of n_runs since r5
        "metric": "headline_queries_total_wall",
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in load_end],
        "quiet_box": quiet_box,
        "cpus": cpus,
        "value": round(sum(timings[n] for n in HEADLINE), 3),
        "unit": "sec",
        "headline_runs": n_runs,
        "full_registry_total": full["full_registry_total"],
        "n_queries": len(timings),
        "queries": {n: timings[n] for n in HEADLINE},
        "sf": float(m.group(1)) if m else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
