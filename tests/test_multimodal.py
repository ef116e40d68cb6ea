"""Multimodal plumbing: binary columns, typed metadata, mapInPandas
batch shape; unsupported formats must fail loudly, not silently."""

import pytest

from etl_mp_transactions_spark.operators import multimodal


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world", "en", "s", 11), (2, "bye", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long")


def test_asset_schema_contract(spark):
    assets = multimodal.synthesize_assets(_docs(spark))
    got = [(f.name, f.dataType.simpleString()) for f in assets.schema.fields]
    want = [(f.name, f.dataType.simpleString()) for f in multimodal.ASSET_SCHEMA.fields]
    assert got == want


def test_features_deterministic_and_consistent(spark):
    assets = multimodal.synthesize_assets(_docs(spark))
    f1 = {r["asset_id"]: r for r in multimodal.extract_features(assets).collect()}
    f2 = {r["asset_id"]: r for r in multimodal.extract_features(assets).collect()}
    assert f1.keys() == f2.keys() == {1, 2}
    for k in f1:
        assert f1[k]["histogram"] == f2[k]["histogram"]
        assert f1[k]["n_bytes"] == 32  # two md5 digests
        assert sum(f1[k]["histogram"]) == 32
        assert 0.0 <= f1[k]["byte_entropy"] <= 4.0  # log2(16) max


def test_decode_routes_to_real_codecs():
    from etl_mp_transactions_spark.operators.imagecodec import (
        ImageFormatError,
        encode_bmp24,
        encode_ppm,
    )

    px = bytes(range(12))  # 2x2 RGB
    assert multimodal.decode_image(encode_ppm(2, 2, px)) == ("ppm", 2, 2, px)
    assert multimodal.decode_image(encode_bmp24(2, 2, px)) == ("bmp", 2, 2, px)
    # unsupported containers fail loudly (no silent passthrough)
    with pytest.raises(ImageFormatError):
        multimodal.decode_image(b"\x00\x01")


def test_audio_frames_match_hashlib_reference(spark, sf_dir):
    import hashlib

    import duckdb

    from etl_mp_transactions_spark.operators import multimodal
    from etl_mp_transactions_spark.queries.streaming_mm import (
        multimodal_audio_frames,
    )

    rows = multimodal_audio_frames(spark, sf_dir).collect()
    assert rows
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    # every audio asset yields exactly 3 frames (32 samples, 16/8)
    assert all(len(v) == 3 for v in by_asset.values())

    con = duckdb.connect()
    texts = dict(
        con.execute(
            f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
            f"WHERE doc_id % 3 = 1"
        ).fetchall()
    )
    con.close()
    assert set(by_asset) == set(texts)
    # full per-frame recompute from the raw md5 bytes, independent of
    # both engines' SQL
    for doc_id, text in texts.items():
        raw = bytes.fromhex(
            hashlib.md5(text.encode()).hexdigest()
            + hashlib.md5(("x" + text).encode()).hexdigest()
        )
        s = [2 * b - 255 for b in raw]
        for r in by_asset[doc_id]:
            w = s[r.frame_idx * 8 : r.frame_idx * 8 + 16]
            assert r.energy == sum(x * x for x in w)
            assert r.peak == max(abs(x) for x in w)
            assert r.zero_crossings == sum(
                1 for a, b2 in zip(w, w[1:]) if a * b2 < 0
            )
