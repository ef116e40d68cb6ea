"""Streaming + multimodal registry entries.

These are the non-SQL-expressible operators (custom stateful streaming,
Arrow mapInPandas): the driver records rows-only checks; full semantic
assertions live in tests/test_streaming.py and tests/test_multimodal.py.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators import multimodal
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


@query("multimodal_features")  # rows-only: mapInPandas feature extraction
def multimodal_features(spark, sf_dir):
    """Binary media columns → byte-level features via Arrow
    mapInPandas; histogram rendered as a string for stable output."""
    docs = load_table(spark, sf_dir, "documents")
    assets = multimodal.synthesize_assets(docs)
    feats = multimodal.extract_features(assets)
    return feats.select(
        "asset_id",
        "media_type",
        "n_bytes",
        F.round("byte_entropy", 6).alias("byte_entropy"),
        F.array_join(F.transform("histogram", lambda x: x.cast("string")), ",").alias(
            "histogram"
        ),
    )


@query(
    "r1_stream_dedup",
    # the streamed result IS SQL-checkable here: base event_ids are
    # unique and the replayed file contains byte-identical rows, so
    # whichever copy the state store keeps, the output relation equals
    # the base event set — a full oracle, not rows-only
    "SELECT event_id, user_id, event_type FROM events",
)
def r1_stream_dedup(spark, sf_dir):
    """R1/R3: file-source micro-batch stream with exactly-once
    dropDuplicates on event_id. Events are staged into 4 files and the
    first file is duplicated (the replayed-GCS-notification case) —
    output must equal the distinct event set. Replay-across-restart is
    asserted in tests/test_streaming.py."""
    import shutil
    import uuid

    from etl_mp_transactions_spark.streaming.filesource import (
        stage_events_as_files,
        stream_dedup_run,
    )

    # fixed per-sf workdir, wiped at entry: repeated gate/bench runs
    # reuse one footprint instead of leaking a staging copy per call
    # (the returned DataFrame reads from this dir, so it must outlive
    # the call — bounded reuse, not post-hoc deletion)
    sf_tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    work = os.path.join(tempfile.gettempdir(), f"sg_stream_{sf_tag}")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    stage = os.path.join(work, "in")
    stage_events_as_files(spark, sf_dir, stage, n_files=4)
    # duplicate one input file → replayed notification
    part = sorted(f for f in os.listdir(stage) if f.endswith(".parquet"))[0]
    shutil.copy(
        os.path.join(stage, part), os.path.join(stage, f"replay-{uuid.uuid4().hex}.parquet")
    )
    out = stream_dedup_run(
        spark, stage, os.path.join(work, "ckpt"), os.path.join(work, "out"),
        key="event_id",
    )
    return out.select("event_id", "user_id", "event_type")
