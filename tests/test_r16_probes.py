"""Pin the r16 precomputed-probes path of ivf_knn_topk: passing a
per-run ``_probes_df`` frame (or filtered/unioned views of one, as the
streaming graph-maintenance runners do) must yield row-identical
graphs to the default recompute-per-call path — including the shared-
lineage shapes (both cogroup sides derived from ONE probes frame) that
the insert/delete runners produce."""

from pyspark.sql import functions as F

from etl_mp_transactions_spark.queries.graphann import (
    _GANN_NPROBE,
    _probes_df,
    gann_books,
    ivf_knn_topk,
    load_table,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_precomputed_probes_match_default(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    books = gann_books(emb)
    base = emb.filter(F.expr("vec_id % 10 <> 7"))
    arriving = emb.filter(F.expr("vec_id % 10 = 7"))

    probes_all = _probes_df(emb, books, _GANN_NPROBE).localCheckpoint()
    base_probes = probes_all.filter(F.expr("vec_id % 10 <> 7"))
    arr_probes = probes_all.filter(F.expr("vec_id % 10 = 7"))

    # self-build with a precomputed frame
    assert _rows(ivf_knn_topk(emb, emb, books, q_probes=probes_all)) == _rows(
        ivf_knn_topk(emb, emb, books)
    )
    # cross build, both sides precomputed, shared lineage (the r25
    # shape: fresh vs existing, probes filtered from one assignment)
    assert _rows(
        ivf_knn_topk(
            arriving, base, books, q_probes=arr_probes, m_probes=base_probes
        )
    ) == _rows(ivf_knn_topk(arriving, base, books))
    # member side = union of shared-lineage slices (the r25 corpus_now
    # shape), query side anti-joined (the r26 survivor shape)
    surv_probes = probes_all.join(
        arriving.select("vec_id"), "vec_id", "left_anti"
    )
    survivors = emb.join(arriving.select("vec_id"), "vec_id", "left_anti")
    assert _rows(
        ivf_knn_topk(
            survivors,
            survivors,
            books,
            q_probes=surv_probes,
            m_probes=surv_probes,
        )
    ) == _rows(ivf_knn_topk(survivors, survivors, books))
