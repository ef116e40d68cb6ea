"""Semantic invariants for the video scene-cut family (queries/
video.py): a full Python byte-level replay of the segmentation plus
structural properties."""

import hashlib
from collections import defaultdict

import pandas as pd

from etl_mp_transactions_spark.queries.video import (
    _FRAMES,
    _THETA,
    video_scene_cuts,
    video_scene_keyframes,
)


def _frames(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    out = {}
    for _, r in docs.iterrows():
        if r.doc_id % 3 != 2:
            continue
        h = (
            hashlib.md5(r.text.encode()).hexdigest()
            + hashlib.md5(b"x" + r.text.encode()).hexdigest()
        )
        b = bytes.fromhex(h)
        out[r.doc_id] = [
            (sum(b[i * 4 : i * 4 + 4]), h[i * 8 : i * 8 + 8].upper())
            for i in range(_FRAMES)
        ]
    return out


def _segment(frames):
    scenes = defaultdict(list)  # scene_id -> [(idx, lum, hex, diff, cut)]
    sid = 0
    prev = None
    for i, (lum, hx) in enumerate(frames):
        d = None if prev is None else abs(lum - prev)
        cut = 1 if d is None or d > _THETA else 0
        sid += cut
        scenes[sid].append((i, lum, hx, d, cut))
        prev = lum
    return scenes


def test_scene_cuts_python_replay(spark, sf_dir):
    assets = _frames(sf_dir)
    expected = set()
    for aid, frames in assets.items():
        for sid, rows in _segment(frames).items():
            intra = [d for (_, _, _, d, cut) in rows if cut == 0]
            expected.add(
                (aid, sid, rows[0][0], len(rows), max(intra, default=0))
            )
    got = {
        (r.asset_id, r.scene_id, r.start_frame, r.n_frames, r.intra_max_diff)
        for r in video_scene_cuts(spark, sf_dir).collect()
    }
    assert got == expected and len(got) > 0


def test_keyframes_python_replay(spark, sf_dir):
    assets = _frames(sf_dir)
    expected = set()
    for aid, frames in assets.items():
        for sid, rows in _segment(frames).items():
            idx, lum, hx, _, _ = max(
                rows, key=lambda t: (t[1], -t[0])
            )
            expected.add((aid, sid, idx, hx, lum))
    got = {
        (r.asset_id, r.scene_id, r.keyframe_idx, r.keyframe_hex,
         r.keyframe_lum)
        for r in video_scene_keyframes(spark, sf_dir).collect()
    }
    assert got == expected


def test_scene_partition_covers_all_frames(spark, sf_dir):
    rows = video_scene_cuts(spark, sf_dir).collect()
    by_asset = defaultdict(list)
    for r in rows:
        by_asset[r.asset_id].append(r)
    for aid, rs in by_asset.items():
        rs.sort(key=lambda r: r.scene_id)
        # scenes tile the 8 frames contiguously
        assert sum(r.n_frames for r in rs) == _FRAMES
        assert rs[0].scene_id == 1 and rs[0].start_frame == 0
        nxt = 0
        for r in rs:
            assert r.start_frame == nxt
            nxt += r.n_frames


def test_stream_scene_cuts_equals_batch(spark, sf_dir):
    """r24 (19th stream==batch pin): the streamed scene table must
    equal batch video_scene_cuts bit for bit; the replay file must
    contribute zero (scene ids unique per asset)."""
    from etl_mp_transactions_spark.registry import queries

    def rows(df):
        return sorted(
            (r.asset_id, r.scene_id, r.start_frame, r.n_frames,
             r.intra_max_diff)
            for r in df.collect()
        )

    stream = rows(queries()["r24_stream_scene_cuts"](spark, sf_dir))
    batch = rows(queries()["video_scene_cuts"](spark, sf_dir))
    assert stream == batch and len(stream) > 0
    assert len({(a, s) for a, s, *_ in stream}) == len(stream)
