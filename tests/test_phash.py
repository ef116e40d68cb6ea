"""Perceptual-hash image dedup (image_phash_neardup): structural
invariants (earliest-match attribution, hamming within the declared
radius, one attribution row per duplicated asset) and partition-count
invariance. Value correctness is pinned by the full DuckDB oracle at
all three SFs (the hash is computed from REAL codec output; the
oracle recomputes it from the independently reconstructed buffer)."""

from etl_mp_transactions_spark.registry import queries


def test_structure(spark, sf_dir):
    rows = queries()["image_phash_neardup"](spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["hamming"] in (0, 1) for r in rows)
    assert all(r["matched_earlier_id"] < r["asset_id"] for r in rows)
    ids = [r["asset_id"] for r in rows]
    assert len(ids) == len(set(ids))  # one attribution per asset


def test_partition_invariance(spark, sf_dir):
    fn = queries()["image_phash_neardup"]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, fn(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b
