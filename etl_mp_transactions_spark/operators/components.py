"""Connected components over near-duplicate pair edges (SURVEY.md
§2.9 dedup family, cluster-assignment stage).

Pair emitters (MinHash/SimHash/Jaccard/embedding banding) find EDGES;
an actual dedup pass needs the transitive closure — "A~B and B~C"
must put A, B, C in one group so exactly one canonical survives. This
operator assigns every node the minimum node id of its component via
iterative min-label propagation:

    lbl⁰(v) = v
    lblᵗ⁺¹(v) = min(lblᵗ(v), min_{u∈N(v)} lblᵗ(u))

followed by a pointer-jumping shortcut lbl(v) ← lbl(lbl(v)) each
round (the hash-to-min idea from Kiveris et al., "Connected
Components in MapReduce", public). Each round is a neighbor join +
groupBy-min + one label-of-label self-join — three hash shuffles on
uniformly-distributed ids — and path compression makes convergence
O(log n) rounds even on adversarial chain graphs (near-dup clusters
converge in 2-4). `DataFrame.localCheckpoint` cuts lineage each
round: without it the plan doubles per iteration and the job dies on
plan size long before data size. A max-round guard raises rather
than silently emitting unconverged labels.

Reference parity: the reference has no clustering stage (its dedup is
checksum-equality only, /root/reference/etl/transformations/
validation.py); this is part of the mandated §2.9 training-data
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_rounds: int = 25,
) -> DataFrame:
    """Label every node with min(node id) of its connected component.

    nodes: one row per node (singletons keep their own id).
    edges: undirected pairs (each emitted once in either direction).
    Returns (node_col, component).
    """
    sym = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
    sym = sym.localCheckpoint(eager=True)

    labels = nodes.select(F.col(node_col).alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_rounds):
        msgs = sym.join(labels, sym.a == labels.node).select(
            F.col("b").alias("node"), "lbl"
        )
        cand = (
            labels.select("node", "lbl")
            .union(msgs)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )
        # pointer jumping: lbl(v) ← lbl(lbl(v)). Propagation alone
        # moves the min one hop per round (O(chain length)); the
        # shortcut join compresses paths for O(log n) rounds even on
        # adversarial chains (tests/test_components.py exercises a
        # 40-node path).
        parent = cand.select(
            F.col("node").alias("p_node"), F.col("lbl").alias("p_lbl")
        )
        new_labels = (
            cand.join(parent, cand.lbl == F.col("p_node"), "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("p_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), "node")
            .filter(F.col("o.lbl") != F.col("n.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(F.col("node").alias(node_col), F.col("lbl").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds — "
        "pathological chain graph; switch to large-star/small-star"
    )
