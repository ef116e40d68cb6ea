"""Multimodal columns (SURVEY.md §2.9): images/audio/video as opaque
``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The container ships no codec libraries, so image decode is done by
the from-spec pure-Python codecs in ``operators/imagecodec.py``
(Netpbm PPM P6/P3 and 24-bit BI_RGB BMP — public formats, same
approach as sources/avro_py.py took for Avro). `decode_image` sniffs
the magic and returns (format, width, height, top-down RGB bytes);
formats beyond those two (JPEG/PNG need entropy coders worth a
library, not a re-implementation) raise ImageFormatError. The schema
contract, binary column plumbing, mapInPandas batch shape, and
partitioning story are exercised end-to-end by the oracle-checked
``multimodal_*`` registry entries.

Scale shape: media blobs are large — the asset table should store
(uri, byte_range) pointers with small inline thumbnails rather than
full blobs where possible; feature extraction is a map-only pass, so
throughput scales linearly with executors and the Arrow batch size
(spark.sql.execution.arrow.maxRecordsPerBatch) bounds executor memory
per batch. Never collect blobs to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from fractions import Fraction

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_mp_transactions_spark.functions.exactmath import LN2_FRAC, ln_frac

N_HIST_BUCKETS = 16

# (c/32)·log2(c/32) for bucket count c in [0, 32], precomputed once
# with exact rational arithmetic (exactmath.py) — the entropy of a
# 32-byte asset is a fixed-order sum of these shared literals, so
# the UDF, the DuckDB oracle, and any future engine agree bitwise
# with NO libm log2 anywhere (VERDICT r11 task #2)
ENT32_TERM = [0.0] + [
    float(Fraction(c, 32) * ln_frac(Fraction(c, 32)) / LN2_FRAC)
    for c in range(1, 33)
]


def _nano_nearest(f: Fraction) -> int:
    n = f.numerator * 2 * 10**9 + (
        f.denominator if f.numerator >= 0 else -f.denominator
    )
    return n // (2 * f.denominator)


# nearest-nano INTEGER twin of ENT32_TERM (r15 float purge): entropy
# becomes an exact BIGINT sum of these literals — no float sum, no
# round(x, 6) on the result path
ENT32_NANO = [0] + [
    _nano_nearest(Fraction(c, 32) * ln_frac(Fraction(c, 32)) / LN2_FRAC)
    for c in range(1, 33)
]

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("histogram", T.ArrayType(T.LongType())),
    ]
)


def synthesize_assets(docs: DataFrame) -> DataFrame:
    """Deterministic fake asset table from `documents`: content =
    md5-derived bytes (stands in for encoded media), typed metadata
    derived from doc stats. Real pipelines get this shape from the
    ingest layer."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.unhex(F.concat(F.md5("text"), F.md5(F.concat(F.lit("x"), F.col("text"))))).alias(
            "content"
        ),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            F.lit(32).cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(content: bytes) -> tuple[str, int, int, bytes]:
    """Decode an image container → (format, width, height, top-down
    RGB bytes) via the from-spec PPM/BMP codecs (operators/
    imagecodec.py). Raises ImageFormatError for anything else."""
    from etl_mp_transactions_spark.operators.imagecodec import decode_image as _dec

    return _dec(bytes(content))


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("pixel_hex", T.StringType()),
    ]
)


def encode_decode_images(assets: DataFrame) -> DataFrame:
    """Container encode → from-spec decode round trip over raw pixel
    buffers: input rows (asset_id, fmt, width, height, raw) are
    encoded into their container format (PPM P6 or 24bpp BMP) and
    decoded back with `decode_image`. Output is what the DECODER
    produced — so pinning it against an independently-computed oracle
    verifies the decoder really inverts the container layout (BMP's
    bottom-up BGR padded rows, PPM's header grammar), not just that
    bytes passed through.

    Scale: map-only mapInPandas, blobs never shuffle; per-asset Python
    is the honest cost of a codec (a C library would slot into the
    same batch loop)."""
    from etl_mp_transactions_spark.operators import imagecodec as ic

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fmts, ws, hs, ns, hexes = [], [], [], [], [], []
            for asset_id, fmt, w, h, raw in zip(
                pdf["asset_id"], pdf["fmt"], pdf["width"], pdf["height"], pdf["raw"]
            ):
                raw = bytes(raw)
                if fmt == "ppm":
                    container = ic.encode_ppm(int(w), int(h), raw)
                else:
                    container = ic.encode_bmp24(int(w), int(h), raw)
                dfmt, dw, dh, px = ic.decode_image(container)
                ids.append(int(asset_id))
                fmts.append(dfmt)
                ws.append(dw)
                hs.append(dh)
                ns.append(len(px))
                hexes.append(px.hex().upper())
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "fmt": fmts,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "n_bytes": pd.array(ns, dtype="int32"),
                    "pixel_hex": hexes,
                }
            )

    return assets.mapInPandas(batches, DECODE_SCHEMA)


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary content:
    byte histogram (16 buckets) + byte entropy — the deterministic
    stand-in for embed/resize/frame-sample, with the exact mapInPandas
    shape a real extractor uses."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            hists, ents, sizes = [], [], []
            for content in pdf["content"]:
                b = np.frombuffer(bytes(content), dtype=np.uint8)
                hist = np.bincount(b >> 4, minlength=N_HIST_BUCKETS)
                n = b.size
                if n == 32:
                    # literal-grid entropy terms, summed in bucket
                    # index order (matches the oracle's list_sum)
                    ents.append(-sum(ENT32_TERM[c] for c in hist))
                elif n:
                    p = hist[hist > 0] / n
                    ents.append(float(-(p * np.log2(p)).sum()))
                else:
                    ents.append(0.0)
                hists.append(hist.astype("int64").tolist())
                sizes.append(int(n))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": sizes,
                    "byte_entropy": ents,
                    "histogram": hists,
                }
            )

    return assets.mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_hex", T.StringType()),
    ]
)


def sample_frames(
    assets: DataFrame, frame_bytes: int = 4, stride: int = 2
) -> DataFrame:
    """Frame sampling plumbing: treat `content` as a sequence of
    fixed-size frames and emit every `stride`-th frame as its own row
    — the 1→N mapInPandas fan-out a real video sampler uses (binary
    in, per-frame rows out; a codec would replace the byte slicing).
    Frames are surfaced as hex so downstream engines without blob
    slicing can verify; a real pipeline keeps bytes.

    Scale: map-only; output rows = assets × frames/stride, bounded by
    the Arrow batch size per task. Blobs never shuffle — the fan-out
    happens inside the task that read them."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hexes = [], [], []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                for i in range(0, len(b) // frame_bytes, stride):
                    ids.append(int(asset_id))
                    idxs.append(i)
                    hexes.append(b[i * frame_bytes : (i + 1) * frame_bytes].hex().upper())
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "frame_hex": hexes}
            )

    return assets.mapInPandas(batches, FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("content_small", T.BinaryType()),
        T.StructField(
            "meta_small",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def resize_assets(assets: DataFrame, factor: int = 2) -> DataFrame:
    """Resize plumbing: binary in → smaller binary out with updated
    typed metadata — the mapInPandas contract of a real thumbnailer
    (which would decode, scale, re-encode; here the deterministic
    stand-in keeps every `factor`-th byte). Meta dimensions divide by
    the factor so downstream layout logic sees consistent types.

    Scale: map-only, output strictly smaller than input; the natural
    place for this is the same pass that extracts features so blobs
    are read once."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_content, out_meta = [], [], []
            for asset_id, content, meta in zip(
                pdf["asset_id"], pdf["content"], pdf["meta"]
            ):
                b = bytes(content)[::factor]
                out_ids.append(int(asset_id))
                out_content.append(b)
                out_meta.append(
                    {
                        "width": int(meta["width"]) // factor,
                        "height": int(meta["height"]) // factor,
                        "n_bytes": len(b),
                    }
                )
            yield pd.DataFrame(
                {
                    "asset_id": out_ids,
                    "content_small": out_content,
                    "meta_small": out_meta,
                }
            )

    return assets.mapInPandas(batches, RESIZE_SCHEMA)


AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("energy", T.LongType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)

AUDIO_FRAME_LEN = 16
AUDIO_FRAME_HOP = 8


def frame_audio(
    assets: DataFrame,
    frame_len: int = AUDIO_FRAME_LEN,
    hop: int = AUDIO_FRAME_HOP,
) -> DataFrame:
    """Audio framing plumbing: treat `content` as unsigned 8-bit PCM
    samples, centered as s = 2b−255 (odd, never zero), and emit
    overlapping analysis frames with the classic per-frame features —
    energy Σs², peak |s|, and zero-crossing count. All
    three are INTEGER, so the operator oracles exactly (unlike
    entropy there is no float anywhere). A real pipeline swaps the
    uint8 view for an int16 decode; shapes and batching are
    identical.

    Scale: map-only Arrow fan-out like sample_frames — blobs never
    shuffle, frames are produced inside the task that read the
    bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            ids, idxs, energies, peaks, zcs = [], [], [], [], []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                # centered sample 2b-255 is always odd, hence never
                # zero — zero-crossing needs no sign-adoption rule
                s = 2 * np.frombuffer(
                    bytes(content), dtype=np.uint8
                ).astype(np.int64) - 255
                n_frames = (
                    (len(s) - frame_len) // hop + 1 if len(s) >= frame_len else 0
                )
                for f in range(n_frames):
                    w = s[f * hop : f * hop + frame_len]
                    ids.append(int(asset_id))
                    idxs.append(f)
                    energies.append(int((w * w).sum()))
                    peaks.append(int(np.abs(w).max()))
                    zcs.append(int((w[1:] * w[:-1] < 0).sum()))
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "frame_idx": idxs,
                    "energy": pd.array(energies, dtype="int64"),
                    "peak": peaks,
                    "zero_crossings": zcs,
                }
            )

    return assets.mapInPandas(batches, AUDIO_FRAME_SCHEMA)


WHT_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("coeff_checksum", T.StringType()),
        T.StructField("spec_energy", T.LongType()),
        T.StructField("time_energy", T.LongType()),
        T.StructField("parseval_ok", T.IntegerType()),
    ]
)


def wht_spectrum(
    assets: DataFrame,
    frame_len: int = AUDIO_FRAME_LEN,
    hop: int = AUDIO_FRAME_HOP,
) -> DataFrame:
    """Exact integer spectral transform of the audio frames: the
    16-point Walsh-Hadamard transform (H[i][j] = (-1)^popcount(i&j) —
    the ±1 orthogonal transform, public) over the same centered
    samples as frame_audio. Every coefficient is an exact integer
    (sums of ±samples), so the whole spectrum oracles via an md5
    checksum of the canonical comma-joined rendering, and Parseval's
    identity Σc² = N·Σs² is carried IN the result as an integer
    equality — a self-verifying transform. A real DSP pipeline swaps
    WHT for an FFT (floats); the plumbing, framing, and batch shape
    are identical.

    Scale: map-only Arrow fan-out; the N×N matmul per frame is a
    constant (16×16)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        n = frame_len
        h = np.array(
            [
                [
                    1 if bin(i & j).count("1") % 2 == 0 else -1
                    for j in range(n)
                ]
                for i in range(n)
            ],
            dtype=np.int64,
        )
        for pdf in it:
            ids, idxs, cks, specs, times, oks = [], [], [], [], [], []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                s = 2 * np.frombuffer(
                    bytes(content), dtype=np.uint8
                ).astype(np.int64) - 255
                n_frames = (
                    (len(s) - n) // hop + 1 if len(s) >= n else 0
                )
                for f in range(n_frames):
                    w = s[f * hop : f * hop + n]
                    c = h @ w
                    spec = int((c * c).sum())
                    te = int((w * w).sum())
                    ids.append(int(asset_id))
                    idxs.append(f)
                    cks.append(
                        hashlib.md5(
                            ",".join(str(int(x)) for x in c).encode()
                        ).hexdigest()
                    )
                    specs.append(spec)
                    times.append(te)
                    oks.append(int(spec == n * te))
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "frame_idx": idxs,
                    "coeff_checksum": cks,
                    "spec_energy": pd.array(specs, dtype="int64"),
                    "time_energy": pd.array(times, dtype="int64"),
                    "parseval_ok": oks,
                }
            )

    return assets.mapInPandas(batches, WHT_SCHEMA)
