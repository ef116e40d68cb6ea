"""IVF-PQ composite index (operators/ivfpq.py): code shape and
nibble-pack roundtrip, the probed-lists-only scan invariant (every
scored vector lives in one of the query's nprobe nearest lists), the
ADC self-distance identity (the query's own list always ranks first
among probes, so ADC(q, q) equals q's residual distortion), and exact
reconstruction of the residual codebook seeds (a seed's residual IS
codeword k in every subspace, so its distortion is 0)."""

from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators import ivfpq
from etl_mp_transactions_spark.operators.pq import PQ_KS, PQ_M
from etl_mp_transactions_spark.sources.tables import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").limit(300)


def test_codes_shape_and_packing(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    codes, packed = ivfpq.ivfpq_encode(emb)
    c = codes.agg(
        F.min("code"), F.max("code"), F.min("cid"), F.max("cid"),
        F.count("*"), F.count_distinct("vec_id"),
    ).collect()[0]
    assert c[0] >= 0 and c[1] < PQ_KS
    assert c[2] >= 0 and c[3] < ivfpq.IVFPQ_KC
    assert c[4] == c[5] * PQ_M  # exactly M codes per vector
    unpacked = packed.select(
        "vec_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {PQ_M - 1}),"
                " m -> named_struct('m', m,"
                " 'code', cast(shiftright(pq_code, 4 * m) & 15 as int)))"
            )
        ).alias("e"),
    ).select("vec_id", F.col("e.m").alias("m"), F.col("e.code").alias("u"))
    joined = unpacked.join(codes, ["vec_id", "m"])
    assert joined.filter(F.col("u") != F.col("code")).count() == 0


def test_scan_touches_only_probed_lists(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    top = ivfpq.ivfpq_adc_topk(emb, k_neighbors=300)
    cb = ivfpq.coarse_books(emb)
    qid = top.select("query_id").first()["query_id"]
    qv = (
        emb.filter(F.col("vec_id") == qid)
        .select(
            F.expr(
                "transform(embedding, x -> cast(round(x * 1e6) as bigint))"
            ).alias("qqv")
        )
        .crossJoin(F.broadcast(cb))
        .select(
            "c",
            F.expr(
                "aggregate(zip_with(qqv, ccqv, (x, y) -> (x - y) * (x - y)),"
                " cast(0 as bigint), (acc, v) -> acc + v)"
            ).alias("cd2"),
        )
        .orderBy("cd2", "c")
        .limit(ivfpq.IVFPQ_NPROBE)
        .collect()
    )
    probed = {r["c"] for r in qv}
    scanned = {r["cid"] for r in top.select("cid").distinct().collect()}
    assert scanned <= probed


def test_adc_self_distance_is_distortion(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    _, packed = ivfpq.ivfpq_encode(emb)
    top = ivfpq.ivfpq_adc_topk(emb, k_neighbors=300)
    qid = top.select("query_id").first()["query_id"]
    self_row = top.filter(F.col("vec_id") == qid).collect()
    # the query's own centroid has the minimal cd2, so its list is
    # always probed and the query scores itself
    assert len(self_row) == 1
    dist = packed.filter(F.col("vec_id") == qid).first()["distortion"]
    assert self_row[0]["adc_d2"] == dist


def test_residual_seeds_have_zero_distortion(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cb = ivfpq.coarse_books(emb)
    resid = ivfpq.coarse_assign(emb, cb)
    pb = ivfpq.residual_books(resid)
    _, packed = ivfpq.ivfpq_encode(emb)
    seed_rqvs = {tuple(r["pcqv"]) for r in pb.collect()}
    seed_ids = [
        r["vec_id"]
        for r in resid.collect()
        if tuple(r["rqv"]) in seed_rqvs
    ]
    assert len(seed_ids) >= PQ_KS  # ties possible, at least KS
    zero = packed.filter(F.col("vec_id").isin(seed_ids[:PQ_KS]))
    assert zero.filter(F.col("distortion") != 0).count() == 0


def test_incremental_encode_is_per_vector_independent(spark, sf_dir):
    # frozen codebooks => each arriving vector's code is independent
    # of which other vectors arrive in the same batch (the ingest
    # contract: replays/reorderings can never change stored codes)
    emb = _emb(spark, sf_dir)
    base = emb.filter(F.expr("vec_id % 8 <> 0"))
    arriving = emb.filter(F.expr("vec_id % 8 = 0"))
    cb = ivfpq.coarse_books(base)
    pb = ivfpq.residual_books(ivfpq.coarse_assign(base, cb))
    _, full = ivfpq.encode_against_books(arriving, cb, pb)
    sub = arriving.filter(F.expr("vec_id % 16 = 0"))
    _, part = ivfpq.encode_against_books(sub, cb, pb)
    want = {
        r["vec_id"]: (r["cid"], r["pq_code"], r["distortion"])
        for r in full.collect()
        if r["vec_id"] % 16 == 0
    }
    got = {
        r["vec_id"]: (r["cid"], r["pq_code"], r["distortion"])
        for r in part.collect()
    }
    assert got == want and len(got) > 0


def test_adc_batch_structure_and_probed_lists(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    out = ivfpq.ivfpq_adc_batch(emb, k_neighbors=5).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
    assert len(per_q) == ivfpq.IVFPQ_QBATCH
    cb = ivfpq.coarse_books(emb)
    crows = cb.collect()
    qv = {
        r["vec_id"]: r["qv"]
        for r in emb.selectExpr(
            "vec_id",
            "transform(embedding, x -> cast(round(x * 1e6) as bigint)) qv",
        ).collect()
    }
    # recompute each query's probed lists and its members' cids
    cid_of = {
        r["vec_id"]: r["cid"]
        for r in ivfpq.coarse_assign(emb, cb).collect()
    }
    for q, rows in per_q.items():
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] \
            == list(range(1, len(rows) + 1))
        d2s = [r["adc_d2"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert d2s == sorted(d2s)
        d2c = sorted(
            (
                sum((a - b) * (a - b) for a, b in zip(qv[q], r["ccqv"])),
                r["c"],
            )
            for r in crows
        )
        probed = {c for _, c in d2c[: ivfpq.IVFPQ_NPROBE]}
        assert {cid_of[r["vec_id"]] for r in rows} <= probed
