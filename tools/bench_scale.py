"""Scale-up measurement runner (VERDICT r4 #1).

Times every registry query (single-shot, noop sink — same
materialization as bench.py) at one SF directory and writes a JSON
map. Run at two SFs of the same generator (tools/gen_scale_data.py)
and compare with tools/scale_report.py to get per-query scaling
ratios — the measured evidence behind the 100x design claims.

A watchdog cancels a query's job group after --timeout seconds
(default 1200) and records it as DNF rather than hanging the sweep.

Usage: python tools/bench_scale.py <sf_dir> <out.json> [timeout_s]
       [--only=name1,name2,...]   (sweep a subset, e.g. new queries)
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_mp_transactions_spark import registry  # noqa: E402
from etl_mp_transactions_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = list(sys.argv[1:])
    only: set[str] = set()
    for a in list(args):
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
            args.remove(a)
    sf_dir = os.path.abspath(args[0])
    out_path = args[1]
    timeout_s = float(args[2]) if len(args) > 2 else 1200.0
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # sf1 in one local JVM needs executor-sized heap (32 concurrent
    # tasks share it); overridable via SPARK_GRAFT_DRIVER_MEM
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark("bench-scale", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus)
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    from etl_mp_transactions_spark.sources.bronze import staged_bronze

    staged_bronze(spark, sf_dir).write.format("noop").mode("overwrite").save()

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    qs = registry.queries()
    sc = spark.sparkContext
    timings: dict[str, object] = {}
    rows_out: dict[str, object] = {}
    for name in sorted(qs):
        if only and name not in only:
            continue
        group = f"scale-{name}"
        sc.setJobGroup(group, name, interruptOnCancel=True)
        cancelled = threading.Event()

        def _cancel():
            cancelled.set()
            sc.cancelJobGroup(group)

        watchdog = threading.Timer(timeout_s, _cancel)
        watchdog.start()
        t0 = time.time()
        try:
            # rows-out rides the same action via observe() — zero extra
            # passes, no plan change; output-bound operators (e.g.
            # dedup_minhash_lsh, whose candidate volume grows with the
            # dup-heavy corpus by CONTRACT) are then judged on
            # sec-per-output-row, not raw wall ratio (VERDICT r9 #8)
            obs = Observation(f"rows-{name}")
            df = qs[name](spark, sf_dir).observe(
                obs, F.count(F.lit(1)).alias("n")
            )
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
            rows_out[name] = obs.get["n"]
        except Exception as ex:
            if cancelled.is_set():
                timings[name] = f"DNF>{int(timeout_s)}s"
            else:
                timings[name] = f"ERR:{str(ex)[:160]}"
        finally:
            watchdog.cancel()
            sc.setJobGroup("", "")
        print(f"# {name}: {timings[name]}", file=sys.stderr, flush=True)

    with open(out_path, "w") as fh:
        json.dump(
            {"sf_dir": sf_dir, "cpus": cpus, "timeout_s": timeout_s,
             "queries": timings, "rows_out": rows_out},
            fh, indent=1, sort_keys=True,
        )
    print(json.dumps({"n": len(timings), "out": out_path}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
