"""Stream-stream funnel join: streaming result must equal the batch
join over the same data (watermarks only bound state, they must not
drop anything in a single AvailableNow pass over bounded input)."""

from pyspark.sql import functions as F

from etl_mp_transactions_spark.sources.tables import SCHEMAS, load_table
from etl_mp_transactions_spark.streaming.filesource import stage_events_as_files
from etl_mp_transactions_spark.streaming.joins import funnel_join, run_funnel_stream


def test_funnel_stream_matches_batch(spark, sf_dir, tmp_path):
    stage = str(tmp_path / "in")
    stage_events_as_files(spark, sf_dir, stage, n_files=2)

    out = run_funnel_stream(
        spark, stage, SCHEMAS["events"],
        str(tmp_path / "ckpt"), str(tmp_path / "out"),
    )

    ev = load_table(spark, sf_dir, "events")
    batch = funnel_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    got = {(r["click_id"], r["purchase_id"]) for r in out.collect()}
    want = {(r["click_id"], r["purchase_id"]) for r in batch.collect()}
    assert got == want
    assert len(want) > 0  # fixture actually produces funnel pairs


def test_funnel_window_bound_respected(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    pairs = funnel_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        within="30 minutes",
    )
    bad = pairs.filter(
        (F.col("purchase_ts") <= F.col("click_ts"))
        | (F.col("purchase_ts") > F.col("click_ts") + F.expr("INTERVAL 30 minutes"))
    )
    assert bad.count() == 0
