"""DSIR importance selection (queries/dsir.py): a pure-Python replay
of the exact statistic (hashed-bigram LMs, integer ratio scores,
length-normalized weight, (weight desc, doc_id) top-k) must reproduce
Spark's selection — a third engine beyond the DuckDB oracle — plus
weight bounds and partition-count invariance."""

import hashlib
from collections import Counter

from etl_mp_transactions_spark.queries.dsir import (
    DSIR_NB,
    DSIR_SCALE,
    DSIR_TARGET_LANG,
    DSIR_TOPK,
)
from etl_mp_transactions_spark.registry import queries
from etl_mp_transactions_spark.sources.tables import load_table


def _feat(a, b):
    h = hashlib.md5(f"{a} {b}".encode()).hexdigest()[:8]
    return int(h, 16) % DSIR_NB


def _python_dsir(rows):
    raw, tgt = Counter(), Counter()
    doc_feats, doc_lang = {}, {}
    for r in rows:
        ws = r["text"].split(" ")
        fs = [
            _feat(ws[i], ws[i + 1])
            for i in range(len(ws) - 1)
            if ws[i] and ws[i + 1]
        ]
        doc_feats[r["doc_id"]] = fs
        doc_lang[r["doc_id"]] = r["lang"]
        raw.update(fs)
        if r["lang"] == DSIR_TARGET_LANG:
            tgt.update(fs)
    s = {f: ((tgt[f] + 1) * DSIR_SCALE) // (c + 1) for f, c in raw.items()}
    scored = []
    for d, fs in doc_feats.items():
        if not fs:
            continue
        w = (sum(s[f] for f in fs) * DSIR_SCALE) // len(fs)
        scored.append((-w, d))
    scored.sort()
    return [
        (d, doc_lang[d], -nw, i + 1)
        for i, (nw, d) in enumerate(scored[:DSIR_TOPK])
    ]


def test_matches_pure_python_replay(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .collect()
    )
    want = _python_dsir(rows)
    got = [
        (r["doc_id"], r["lang"], r["weight"], r["rank"])
        for r in queries()["dsir_importance_select"](spark, sf_dir).collect()
    ]
    assert got == want


def test_weight_bounds_and_ranks(spark, sf_dir):
    rows = queries()["dsir_importance_select"](spark, sf_dir).collect()
    assert 0 < len(rows) <= DSIR_TOPK
    # s <= SCALE (target is a subset of raw), so weight <= SCALE^2
    assert all(0 < r["weight"] <= DSIR_SCALE * DSIR_SCALE for r in rows)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    ws = [r["weight"] for r in rows]
    assert ws == sorted(ws, reverse=True)


def test_partition_invariance(spark, sf_dir):
    fn = queries()["dsir_importance_select"]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, fn(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b
