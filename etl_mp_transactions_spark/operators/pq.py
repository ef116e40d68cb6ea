"""Product quantization (PQ) for embedding compression + asymmetric
distance (ADC) scan — the memory side of the 100 TB ANN story
(SURVEY.md §2.9 similarity search; Jégou et al. 2011, "Product
quantization for nearest neighbor search", public).

A 64-dim float32 vector is 256 B; its PQ code here is M=8 subspace
codes of 4 bits = one 32-bit word — a 64x compression that turns a
corpus-wide similarity scan from a memory/shuffle problem into a
CPU-bound code-table walk. Everything is exact integer arithmetic on
micro-unit quantized vectors (the kmeans_lloyd_step policy), so
codes, distortions and ADC distances are bit-identical across
engines and the DuckDB oracle reproduces the whole pipeline:

- codebooks: per subspace m (dims 8m..8m+7), the KS=16 codewords are
  the corresponding subvectors of 16 md5-rank-picked seed vectors —
  the ``seed_centroids`` quantizer shape (deterministic, documented
  bounded K-row collect; operators/ivfpq_train.py implements the
  Lloyd refinement of these books — per-subspace exact k-means
  preserving this packed layout — for the IVF-PQ composite);
- encode: code_m(v) = argmin_k sum((v_sub − c_k,sub)^2) with k-asc
  tiebreak, an exact BIGINT fold; codes pack little-endian 4-bit
  nibbles into one BIGINT; per-vector distortion = sum of subspace
  minima rides along (the quantization-quality metric);
- ADC: for a query vector, one 128-row lookup table (M x KS exact
  subspace distances) broadcasts; each corpus vector's approximate
  distance is the sum of M table hits on its codes — a linear scan
  that never touches the original vectors.

Scale: encode is an n x KS x M row stream (linear; the only shuffle
is the per-(vec, subspace) argmin aggregate with map-side combine);
ADC is a broadcast-LUT map + TakeOrdered top-k. KS=16/M=8 are sized
for the 64-dim test corpus, not recall benchmarks — the parameters,
not the plan shape, are what a production run retunes.

Reference parity: the reference's similarity machinery is the O(n*m)
in-memory sweep in src/ai.py:42-60; PQ is the standard compression
path any at-scale deployment of that capability requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from etl_mp_transactions_spark.functions.literalframe import literal_frame

PQ_M = 8  # subspaces
PQ_KS = 16  # codewords per subspace (4-bit codes)
PQ_SUB = 8  # dims per subspace (64-dim corpus)
SEED_TAG = ":pq-seed-1"


def _quantized(embeddings: DataFrame, id_col: str) -> DataFrame:
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.expr(
            "transform(embedding, x -> cast(round(x * 1e6) as bigint))"
        ).alias("qv"),
    )


def pq_codebooks(embeddings: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """KS codeword rows (k, cqv) — the md5-rank seed pick
    (TakeOrderedAndProject + bounded KS-row collect, the
    seed_centroids shape). Each seed's full vector carries all M
    subspace codewords at once."""
    q = _quantized(embeddings, id_col)
    seed_rows = (
        q.select(
            "vec_id",
            "qv",
            F.md5(
                F.concat(F.col("vec_id").cast("string"), F.lit(SEED_TAG))
            ).alias("sk"),
        )
        .orderBy("sk", "vec_id")
        .limit(PQ_KS)
        .collect()
    )
    seed_rows.sort(key=lambda r: (r["sk"], r["vec_id"]))
    spark = embeddings.sparkSession
    return literal_frame(
        spark,
        [(k, list(r["qv"])) for k, r in enumerate(seed_rows)],
        "k int, cqv array<bigint>",
    )


def _sub_d2(qcol: str, ccol: str):
    """Exact BIGINT squared distance of subspace m (0-based col "m"):
    fold over the M-th 8-dim slice of both vectors."""
    return F.expr(
        f"aggregate(zip_with(slice({qcol}, m * {PQ_SUB} + 1, {PQ_SUB}),"
        f" slice({ccol}, m * {PQ_SUB} + 1, {PQ_SUB}),"
        " (a, b) -> (a - b) * (a - b)),"
        " cast(0 as bigint), (acc, x) -> acc + x)"
    )


def _sub_d2_lit(qcol: str, ccol: str, m: int):
    """_sub_d2 with the subspace index fixed at plan time — lets all
    M subspace argmins run as parallel aggregates of ONE n×KS-row
    groupBy instead of exploding to n×KS×M rows (measured 8× less
    aggregate input volume at the 10× scale step)."""
    return F.expr(
        f"aggregate(zip_with(slice({qcol}, {m * PQ_SUB + 1}, {PQ_SUB}),"
        f" slice({ccol}, {m * PQ_SUB + 1}, {PQ_SUB}),"
        " (a, b) -> (a - b) * (a - b)),"
        " cast(0 as bigint), (acc, x) -> acc + x)"
    )


def subspace_codes(sub, keys: list[str]):
    """Per-``keys`` argmin codeword of every subspace in ONE grouped
    aggregate over (keys, k, qv-vs-cqv) rows: M parallel
    min(struct(d2_m, k)) columns (map-side combined), exploded back to
    the long (m, code, d2) layout afterwards — the aggregate input
    stays n×KS rows. ``sub`` must carry columns ``k`` and the two
    vector columns named ``xv``/``cv``."""
    aggs = [
        F.min(F.struct(_sub_d2_lit("xv", "cv", m).alias("d2"), F.col("k")))
        .alias(f"b{m}")
        for m in range(PQ_M)
    ]
    wide = sub.groupBy(*keys).agg(*aggs)
    pairs = ", ".join(
        f"named_struct('m', {m}, 'code', b{m}.k, 'd2', b{m}.d2)"
        for m in range(PQ_M)
    )
    return wide.select(
        *keys, F.explode(F.expr(f"array({pairs})")).alias("e")
    ).select(
        *keys,
        F.col("e.m").alias("m"),
        F.col("e.code").alias("code"),
        F.col("e.d2").alias("d2"),
    )


def subspace_codes_lit(
    df: DataFrame, pb_rows: list[list[int]], keys: list[str], xv: str
) -> DataFrame:
    """(keys, m, code, d2): per-subspace argmin codewords as a
    LITERAL-books map-only projection (r16, guide §2.4). ``pb_rows``
    is the index-contiguous codebook (row k = codeword k's full
    packed vector); for each subspace m the expression takes
    ``array_min`` over the KS literal slices — field-lexicographic
    struct(d2, k) min, the exact (d2 asc, k asc) tiebreak of the
    ``min(struct(d2, k))`` aggregate it replaces — then posexplodes
    the M results to the long layout. The former shape crossJoined
    n×KS rows and shuffled the corpus through a groupBy(keys); this
    has zero joins and zero exchanges."""
    bests = []
    for m in range(PQ_M):
        lit = "array(" + ", ".join(
            "named_struct('k', {k}, 'cv', array({v}))".format(
                k=k,
                v=", ".join(
                    f"{x}L" for x in cv[m * PQ_SUB : (m + 1) * PQ_SUB]
                ),
            )
            for k, cv in enumerate(pb_rows)
        ) + ")"
        d2 = (
            f"aggregate(zip_with(slice({xv}, {m * PQ_SUB + 1}, {PQ_SUB}),"
            " p.cv, (a, b) -> (a - b) * (a - b)),"
            " cast(0 as bigint), (acc, x) -> acc + x)"
        )
        bests.append(
            f"array_min(transform({lit},"
            f" p -> named_struct('d2', {d2}, 'k', p.k)))"
        )
    arr = F.expr("array(" + ", ".join(bests) + ")")
    return (
        df.select(*keys, F.posexplode(arr).alias("m", "e"))
        .select(
            *keys,
            F.col("m").cast("int").alias("m"),
            F.col("e.k").alias("code"),
            F.col("e.d2").alias("d2"),
        )
    )


def pq_encode(
    embeddings: DataFrame, id_col: str = "vec_id"
) -> tuple[DataFrame, DataFrame]:
    """Returns (codes, packed): ``codes`` is the per-(vec, subspace)
    assignment (vec_id, m, code, d2) for ADC reuse; ``packed`` is one
    row per vector (vec_id, pq_code BIGINT little-endian 4-bit
    nibbles, distortion)."""
    q = _quantized(embeddings, id_col)
    books = pq_codebooks(embeddings, id_col)
    pb_rows = [
        [int(x) for x in r["cqv"]]
        for r in sorted(books.collect(), key=lambda r: int(r["k"]))
    ]
    # literal-books per-subspace argmin: map-only, no n×KS crossJoin
    # and no corpus groupBy shuffle (subspace_codes_lit)
    codes = subspace_codes_lit(q, pb_rows, ["vec_id"], "qv")
    packed = codes.groupBy("vec_id").agg(
        F.sum(
            F.expr("shiftleft(cast(code as bigint), 4 * m)")
        ).cast("bigint").alias("pq_code"),
        F.sum("d2").cast("bigint").alias("distortion"),
    )
    return codes, packed


def pq_adc_topk(
    embeddings: DataFrame, k_neighbors: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """ADC top-k for the deterministic query vector (min vec_id):
    broadcast M x KS lookup table, linear code scan, exact integer
    approximate distances, (distance, vec_id) tiebreak."""
    q = _quantized(embeddings, id_col)
    books = pq_codebooks(embeddings, id_col)
    codes, _ = pq_encode(embeddings, id_col)
    qvec = q.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv")
    )
    lut = (
        qvec.crossJoin(F.broadcast(books))
        .select(
            "query_id",
            "k",
            F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("m"),
            "qqv",
            "cqv",
        )
        .select(
            "query_id",
            F.col("m"),
            F.col("k").alias("code"),
            _sub_d2("qqv", "cqv").alias("ld2"),
        )
    )
    scored = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .groupBy("vec_id", "query_id")
        .agg(F.sum("ld2").cast("bigint").alias("adc_d2"))
    )
    w = Window.orderBy("adc_d2", "vec_id")
    # top-k via global sort-limit (TakeOrdered — k is tiny); the
    # row_number gives a stable rank column for the oracle compare
    return (
        scored.orderBy("adc_d2", "vec_id")
        .limit(k_neighbors)
        .select(
            "query_id",
            "vec_id",
            "adc_d2",
            F.row_number().over(w).alias("rank"),
        )
    )
