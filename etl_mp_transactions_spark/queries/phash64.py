"""Production-width (64-bit, 8×8 grid) perceptual-hash image
near-dedup (VERDICT r9 task #9) — the scale answer to the honest
caveat on ``image_phash_neardup`` (queries/streaming_mm.py): that
query's thumbnail-sized inputs only support a 12-bit hash, whose
band buckets fill as the corpus grows. Here larger synthetic images
(16..20 × 16..19 px) carry the standard 8×8 block-mean hash — 64
bits, banded as 4×16-bit words with hamming ≤ 2 verification
(pigeonhole: 2 flips touch ≤ 2 bands, so ≥ 2 of 4 bands stay intact
— candidate generation is COMPLETE with a band to spare).

Two engineering choices vs the 12-bit pipeline, both the production
shape:

- the hash is stored as two 32-bit words (hi = blocks 32..63,
  lo = 0..31) so no expression ever shifts into the sign bit —
  DuckDB raises on ``1 << 63`` and signed-wrap semantics differ per
  engine; hamming = bit_count(hi⊕hi') + bit_count(lo⊕lo');
- band buckets key on the band VALUE alone (not image dims): the
  8×8 block grid makes the hash resolution-invariant, exactly why
  production systems (pHash/aHash family) compare across sizes.

The image path is REAL: buffers go through the container encode →
from-spec decode of operators/imagecodec.py (the multimodal_decode
path), and the hash is computed from what the decoder produced.

Scale: decode is map-only Arrow batches (blobs never shuffle); the
pixel explode is ≤ 380 rows/image with map-side-combined 8×8 block
sums; the pair stage joins 16-bit band buckets — 65536 values per
band, so buckets stay near-uniform except for true duplicates
(occupancy asserted bounded in tests/test_phash64.py and swept at
the 10× step).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_mp_transactions_spark.operators import multimodal
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

HAM_MAX = 2
N_BANDS = 4


@query(
    "image_phash64_neardup",
    f"""
    WITH st AS (
      SELECT doc_id AS asset_id,
             CAST(doc_id % 5 + 16 AS INT) AS w,
             CAST(doc_id % 4 + 16 AS INT) AS h,
             CAST((doc_id % 5 + 16) * (doc_id % 4 + 16) * 3 AS INT) AS n,
             doc_id % 7 = 3 AS pert,
             upper(md5(text) || md5('x' || text)) AS hex64
      FROM documents
    ),
    ph AS (
      SELECT asset_id, w, h, n,
             CASE WHEN pert THEN substr(fhex, 1, n * 2 - 4) || 'FFFF'
                  ELSE fhex END AS phex
      FROM (SELECT *, substr(repeat(hex64,
                                    CAST((n * 2 + 63) // 64 AS INT)),
                             1, n * 2) AS fhex
            FROM st)
    ),
    px AS (
      SELECT asset_id, i,
             ('0x' || substr(phex, i * 6 + 1, 2))::BIGINT
           + ('0x' || substr(phex, i * 6 + 3, 2))::BIGINT
           + ('0x' || substr(phex, i * 6 + 5, 2))::BIGINT AS lum,
             ((i // w) * 8 // h) * 8 + ((i % w) * 8 // w) AS blk
      FROM ph, unnest(generate_series(0, w * h - 1)) AS t(i)
    ),
    bs AS (
      SELECT asset_id, blk,
             CAST(sum(lum) AS BIGINT) AS bsum,
             CAST(count(*) AS BIGINT) AS nb
      FROM px GROUP BY asset_id, blk
    ),
    tot AS (
      SELECT asset_id, sum(bsum) AS ts, sum(nb) AS np
      FROM bs GROUP BY asset_id
    ),
    hsh AS (
      SELECT b.asset_id,
             CAST(sum(CASE WHEN b.bsum * t.np > t.ts * b.nb
                            AND b.blk >= 32
                           THEN CAST(1 AS BIGINT) << (b.blk - 32)
                           ELSE 0 END) AS BIGINT) AS hi,
             CAST(sum(CASE WHEN b.bsum * t.np > t.ts * b.nb
                            AND b.blk < 32
                           THEN CAST(1 AS BIGINT) << b.blk
                           ELSE 0 END) AS BIGINT) AS lo
      FROM bs b JOIN tot t USING (asset_id)
      GROUP BY b.asset_id
    ),
    bands AS (
      SELECT asset_id, hi, lo, band,
             CASE WHEN band < 2 THEN (lo >> (16 * band)) & 65535
                  ELSE (hi >> (16 * (band - 2))) & 65535 END AS bv
      FROM hsh, unnest([0, 1, 2, 3]) AS u(band)
    ),
    cand AS (
      SELECT DISTINCT a.asset_id AS na, b.asset_id AS ob,
             a.hi AS ha, a.lo AS la, b.hi AS hb, b.lo AS lb
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bv = b.bv
                  AND a.asset_id > b.asset_id
    ),
    ver AS (
      SELECT na, ob,
             bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS ham
      FROM cand
      WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= {HAM_MAX}
    )
    SELECT asset_id, ob AS matched_earlier_id,
           CAST(ham AS BIGINT) AS hamming
    FROM (SELECT na AS asset_id, ob, ham,
                 row_number() OVER (PARTITION BY na ORDER BY ob) AS rn
          FROM ver)
    WHERE rn = 1
    ORDER BY asset_id
    """,
)
def image_phash64_neardup(spark, sf_dir):
    """64-bit perceptual-hash near-dedup over the synthesized image
    corpus (module docstring): real encode→decode per asset, 8×8
    block-mean hash in two 32-bit words (exact cross-multiplied mean
    comparisons — no division), 4×16-bit banded candidate join
    (complete for hamming ≤ {HAM_MAX} by pigeonhole), exact hamming
    verification, earliest-match attribution."""
    docs = load_table(spark, sf_dir, "documents")
    staged = (
        docs.select(
            F.col("doc_id").alias("asset_id"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("ppm"))
            .otherwise(F.lit("bmp"))
            .alias("fmt"),
            (F.col("doc_id") % 5 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 4 + 16).cast("int").alias("height"),
            (F.col("doc_id") % 7 == 3).alias("pert"),
            F.upper(
                F.concat(
                    F.md5("text"), F.md5(F.concat(F.lit("x"), F.col("text")))
                )
            ).alias("hex64"),
        )
        .withColumn("n", F.col("width") * F.col("height") * 3)
        .withColumn(
            "fhex",
            F.expr(
                "substring(repeat(hex64,"
                " cast((n * 2 + 63) div 64 as int)), 1, n * 2)"
            ),
        )
        .withColumn(
            "phex",
            F.when(
                F.col("pert"),
                F.expr("concat(substring(fhex, 1, n * 2 - 4), 'FFFF')"),
            ).otherwise(F.col("fhex")),
        )
        .select(
            "asset_id", "fmt", "width", "height",
            F.unhex("phex").alias("raw"),
        )
    )
    dec = multimodal.encode_decode_images(staged)
    # r15 optimization (guide §2.3 "shuffle fewer bytes" applied to the
    # explode): the previous shape exploded a per-pixel INDEX and kept
    # the whole ~2-6 KB pixel_hex string on every exploded row (w·h
    # rows per asset each carrying the full image), substring-ing it
    # per row — ~Σw·h × |image| bytes materialized through the
    # generate+project. Splitting the hex into 6-char pixel chunks
    # FIRST means each exploded row carries only its own pixel. Chunk
    # i == substring(pixel_hex, i*6+1, 6) by construction (n_bytes =
    # w·h·3 ⇒ |pixel_hex| = 6·w·h), so lum/blk are bit-identical.
    px = dec.select(
        "asset_id",
        F.col("width").alias("w"),
        F.col("height").alias("h"),
        F.posexplode(
            F.expr("regexp_extract_all(pixel_hex, '.{6}', 0)")
        ).alias("i", "px6"),
    ).select(
        "asset_id",
        F.expr(
            "cast(conv(substring(px6, 1, 2), 16, 10) as bigint)"
            " + cast(conv(substring(px6, 3, 2), 16, 10) as bigint)"
            " + cast(conv(substring(px6, 5, 2), 16, 10) as bigint)"
        ).alias("lum"),
        F.expr(
            "((i div w) * 8 div h) * 8 + ((i % w) * 8 div w)"
        ).alias("blk"),
    )
    bs = px.groupBy("asset_id", "blk").agg(
        F.sum("lum").cast("bigint").alias("bsum"),
        F.count("*").cast("bigint").alias("nb"),
    )
    tot = bs.groupBy("asset_id").agg(
        F.sum("bsum").alias("ts"), F.sum("nb").alias("np")
    )
    above = "bsum * np > ts * nb"
    hsh = (
        bs.join(tot, "asset_id")
        .groupBy("asset_id")
        .agg(
            F.sum(
                F.expr(
                    f"CASE WHEN {above} AND blk >= 32"
                    " THEN shiftleft(cast(1 as bigint), blk - 32)"
                    " ELSE cast(0 as bigint) END"
                )
            ).cast("bigint").alias("hi"),
            F.sum(
                F.expr(
                    f"CASE WHEN {above} AND blk < 32"
                    " THEN shiftleft(cast(1 as bigint), blk)"
                    " ELSE cast(0 as bigint) END"
                )
            ).cast("bigint").alias("lo"),
        )
    )
    bands = hsh.select(
        "asset_id",
        "hi",
        "lo",
        F.explode(
            F.array(*[F.lit(i) for i in range(N_BANDS)])
        ).alias("band"),
    ).withColumn(
        "bv",
        F.expr(
            "CASE WHEN band < 2 THEN shiftright(lo, 16 * band) & 65535"
            " ELSE shiftright(hi, 16 * (band - 2)) & 65535 END"
        ),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.asset_id") > F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("na"),
            F.col("b.asset_id").alias("ob"),
            F.col("a.hi").alias("ha"),
            F.col("a.lo").alias("la"),
            F.col("b.hi").alias("hb"),
            F.col("b.lo").alias("lb"),
        )
        .distinct()
    )
    ver = cand.withColumn(
        "ham", F.expr("bit_count(ha ^ hb) + bit_count(la ^ lb)")
    ).filter(F.col("ham") <= HAM_MAX)
    w1 = Window.partitionBy("na").orderBy("ob")
    return (
        ver.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .select(
            F.col("na").alias("asset_id"),
            F.col("ob").alias("matched_earlier_id"),
            F.col("ham").cast("bigint").alias("hamming"),
        )
        .orderBy("asset_id")
    )
