"""Video scene-change detection and per-scene keyframe extraction
over the synthetic binary asset table (SURVEY.md §2.9 multimodal —
the temporal-segmentation side of the family: shot detection is how a
training pipeline turns raw video into per-scene clips/thumbnails; no
reference counterpart, north-star additions).

The asset contract is operators/multimodal.synthesize_assets (content
= 32 md5-derived bytes standing in for encoded media; a real decoder
would emit per-frame luma planes through the same schema). Each video
asset is read as 8 frames × 4 bytes; per-frame luminance = exact byte
sum; a scene CUT is |lum_t − lum_{t−1}| > 256 (θ at ~1.2σ of the
frame-diff distribution for uniform bytes — deterministic, stated);
scenes are the cut-flag running sum (gaps-and-islands), keyframes the
brightest frame per scene.

Exactness: everything is exact integer byte arithmetic — the oracle
re-derives the byte stream in md5-hex space (the multimodal_features
pattern) and parses nibbles with strpos arithmetic, the Spark side
stays in JVM expressions (hex + conv), and integer equality needs no
expression-shape matching. Windows are per-asset (8 rows each), never
data-scale. At 100 TB: one scan of the asset table, per-asset-bounded
state, no shuffle beyond the per-asset grouping."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

_FRAMES = 8
_FRAME_BYTES = 4
_THETA = 256  # cut threshold on |lum diff|

# nibble value of the hex char at 1-indexed position p of hx
_NIB = "(strpos('0123456789ABCDEF', substr(hx, {p}, 1)) - 1)"

_DUCK_CTES = f"""vh AS (
      SELECT doc_id AS asset_id,
             upper(md5(text) || md5('x' || text)) AS hx
      FROM documents WHERE doc_id % 3 = 2
    ),
    fr AS (
      SELECT asset_id, CAST(t.i AS BIGINT) AS frame_idx,
             CAST(list_sum(list_transform(generate_series(0, {_FRAME_BYTES - 1}),
               b -> {_NIB.format(p="t.i * 8 + 2 * b + 1")} * 16
                  + {_NIB.format(p="t.i * 8 + 2 * b + 2")}))
                  AS BIGINT) AS lum,
             substr(hx, t.i * 8 + 1, 8) AS frame_hex
      FROM vh, unnest(generate_series(0, {_FRAMES - 1})) AS t(i)
    ),
    df AS (
      SELECT *, lum - lag(lum) OVER (PARTITION BY asset_id
                                     ORDER BY frame_idx) AS d
      FROM fr
    ),
    fl AS (
      SELECT asset_id, frame_idx, frame_hex, lum, abs(d) AS diff,
             CASE WHEN d IS NULL OR abs(d) > {_THETA} THEN 1 ELSE 0 END
               AS cut
      FROM df
    ),
    sc AS (
      SELECT *, CAST(sum(cut) OVER (PARTITION BY asset_id
                                    ORDER BY frame_idx
                                    ROWS UNBOUNDED PRECEDING)
                     AS BIGINT) AS scene_id
      FROM fl
    )"""


@query(
    "video_scene_cuts",
    f"""
    WITH {_DUCK_CTES}
    SELECT asset_id, scene_id,
           CAST(min(frame_idx) AS BIGINT) AS start_frame,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(coalesce(max(CASE WHEN cut = 1 THEN NULL ELSE diff END),
                         0) AS BIGINT) AS intra_max_diff
    FROM sc GROUP BY 1, 2
    """,
)
def video_scene_cuts(spark, sf_dir):
    """Scene segments per video asset: luminance-diff cut detection
    (θ = 256) + gaps-and-islands segmentation; per scene the start
    frame, length, and the largest intra-scene frame diff."""
    sc = _scenes(spark, sf_dir)
    return sc.groupBy("asset_id", "scene_id").agg(
        F.min("frame_idx").cast("long").alias("start_frame"),
        F.count("*").cast("long").alias("n_frames"),
        F.coalesce(
            F.max(F.when(F.col("cut") == 1, None).otherwise(F.col("diff"))),
            F.lit(0),
        )
        .cast("long")
        .alias("intra_max_diff"),
    )


@query(
    "video_scene_keyframes",
    f"""
    WITH {_DUCK_CTES}
    SELECT asset_id, scene_id, frame_idx AS keyframe_idx,
           frame_hex AS keyframe_hex, lum AS keyframe_lum
    FROM (SELECT *, row_number() OVER (PARTITION BY asset_id, scene_id
                                       ORDER BY lum DESC, frame_idx)
                      AS rn
          FROM sc) WHERE rn = 1
    """,
)
def video_scene_keyframes(spark, sf_dir):
    """Per-scene keyframe (the brightest frame, deterministic
    tie-break) with its raw 4-byte content in hex — the thumbnail
    extraction step of a clip pipeline."""
    sc = _scenes(spark, sf_dir)
    w = Window.partitionBy("asset_id", "scene_id").orderBy(
        F.desc("lum"), "frame_idx"
    )
    return (
        sc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "asset_id",
            "scene_id",
            F.col("frame_idx").alias("keyframe_idx"),
            F.col("frame_hex").alias("keyframe_hex"),
            F.col("lum").alias("keyframe_lum"),
        )
    )


def _scenes(spark, sf_dir):
    return scenes_from_docs(load_table(spark, sf_dir, "documents"))


def scenes_from_docs(docs):
    """Per-frame scene table from a documents frame — shared by the
    batch queries and the r24 streaming twin (scene detection is
    per-asset, so any row subset computes independently)."""
    from etl_mp_transactions_spark.operators.multimodal import (
        synthesize_assets,
    )

    assets = synthesize_assets(docs).filter(
        F.col("media_type") == "video"
    )
    hx = assets.select("asset_id", F.hex("content").alias("hx"))
    fr = hx.select(
        "asset_id",
        F.explode(F.sequence(F.lit(0), F.lit(_FRAMES - 1))).alias("fi"),
        "hx",
    ).select(
        "asset_id",
        F.col("fi").cast("long").alias("frame_idx"),
        F.expr(
            f"aggregate(transform(sequence(0, {_FRAME_BYTES - 1}),"
            " b -> cast(conv(substring(hx, cast(fi * 8 + 2 * b + 1"
            " as int), 2), 16, 10) as bigint)),"
            " 0L, (a, v) -> a + v)"
        ).alias("lum"),
        F.expr("substring(hx, cast(fi * 8 + 1 as int), 8)").alias(
            "frame_hex"
        ),
    )
    aw = Window.partitionBy("asset_id").orderBy("frame_idx")
    df = fr.withColumn("d", F.col("lum") - F.lag("lum").over(aw))
    fl = df.select(
        "asset_id",
        "frame_idx",
        "frame_hex",
        "lum",
        F.abs("d").alias("diff"),
        F.when(
            F.col("d").isNull() | (F.abs("d") > _THETA), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("cut"),
    )
    return fl.withColumn(
        "scene_id",
        F.sum("cut")
        .over(aw.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
