"""Product quantization (operators/pq.py): code range, nibble-pack
roundtrip, the ADC self-distance identity (ADC(q, q) equals q's own
distortion — the LUT hits exactly q's per-subspace minima), and
monotone consistency of ADC against the exact distance for the
codeword vectors themselves (a codeword's subvector distance to its
own code is 0, so seeds reconstruct exactly in every subspace they
won)."""

from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators import pq
from etl_mp_transactions_spark.sources.tables import load_table


def test_codes_and_packing(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    codes, packed = pq.pq_encode(emb)
    c = codes.agg(
        F.min("code"), F.max("code"), F.count("*"),
        F.count_distinct("vec_id"),
    ).collect()[0]
    assert c[0] >= 0 and c[1] < pq.PQ_KS
    assert c[2] == c[3] * pq.PQ_M  # exactly M codes per vector
    # unpack nibbles from the packed word and compare to codes
    unpacked = packed.select(
        "vec_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {pq.PQ_M - 1}),"
                " m -> named_struct('m', m,"
                " 'code', cast(shiftright(pq_code, 4 * m) & 15 as int)))"
            )
        ).alias("e"),
    ).select("vec_id", F.col("e.m").alias("m"), F.col("e.code").alias("u"))
    joined = unpacked.join(codes, ["vec_id", "m"])
    assert joined.filter(F.col("u") != F.col("code")).count() == 0


def test_adc_self_distance_is_distortion(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    _, packed = pq.pq_encode(emb)
    top = pq.pq_adc_topk(emb, k_neighbors=200)
    qid = top.select("query_id").first()["query_id"]
    self_row = top.filter(F.col("vec_id") == qid).collect()
    assert len(self_row) == 1
    dist = packed.filter(F.col("vec_id") == qid).first()["distortion"]
    assert self_row[0]["adc_d2"] == dist


def test_seed_vectors_have_zero_subspace_minima(spark, sf_dir):
    # a seed's subvector IS one of the codewords, so its per-subspace
    # minimum distance is 0 in every subspace -> distortion 0
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    books = pq.pq_codebooks(emb)
    _, packed = pq.pq_encode(emb)
    seed_qvs = {tuple(r["cqv"]) for r in books.collect()}
    q = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(x * 1e6) as bigint))"
        ).alias("qv"),
    )
    seed_ids = [
        r["vec_id"] for r in q.collect() if tuple(r["qv"]) in seed_qvs
    ]
    assert len(seed_ids) >= pq.PQ_KS  # ties possible, at least KS
    zero = packed.filter(F.col("vec_id").isin(seed_ids[: pq.PQ_KS]))
    assert zero.filter(F.col("distortion") != 0).count() == 0
