"""session_window boundary semantics: a gap of EXACTLY the session
duration merges (the right edge of [start, last+gap) is treated as
touching, not disjoint) — the oracle's gaps-and-islands rewrite must
use strict `>` for its new-session flag. Locked here because it is
easy to 'fix' in the wrong direction."""

import datetime

from pyspark.sql import functions as F


def test_exact_gap_merges_just_over_splits(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base), (1, base + datetime.timedelta(minutes=30)),               # == gap
        (2, base), (2, base + datetime.timedelta(minutes=30, seconds=1)),    # > gap
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    out = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .groupBy("user_id")
        .count()
        .collect()
    )
    sessions = {r["user_id"]: r["count"] for r in out}
    assert sessions == {1: 1, 2: 2}
