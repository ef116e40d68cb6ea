"""Time individual registry queries with the bench methodology
(noop sink, shared warm session), printing per-query median of N.

Usage: SPARK_GRAFT_CPUS=32 python tools/solo_bench.py [--runs=3] [sf_dir] query [...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_mp_transactions_spark import registry  # noqa: E402
from etl_mp_transactions_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0].startswith("--runs="):
        runs = int(args[0].split("=")[1])
        args = args[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "solo-bench", master=f"local[{cpus}]", shuffle_partitions=2 * cpus
    )
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    from etl_mp_transactions_spark.sources.bronze import staged_bronze

    staged_bronze(spark, sf_dir).write.format("noop").mode("overwrite").save()
    qs = registry.queries()
    out = {}
    for name in names:
        ts = []
        for _ in range(runs):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.time() - t0, 3))
        ts.sort()
        out[name] = ts[len(ts) // 2]
        print(f"# {name}: median {out[name]}s of {ts}", file=sys.stderr)
    print(json.dumps({"loadavg": os.getloadavg()[0], "queries": out}))


if __name__ == "__main__":
    main()
