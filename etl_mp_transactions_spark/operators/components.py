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

    # iterate only over nodes that touch an edge: singletons (the
    # overwhelming majority of a deduped corpus) never change label
    # and join back at the end — per-round frames shrink from |V| to
    # |V_edges|
    labels = (
        sym.select(F.col("a").alias("node")).distinct().withColumn("lbl", F.col("node"))
    )
    labels = labels.localCheckpoint(eager=True)

    done = None
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
        jumped = cand.join(parent, cand.lbl == F.col("p_node"), "left").select(
            "node",
            F.least(F.col("lbl"), F.coalesce(F.col("p_lbl"), F.col("lbl"))).alias(
                "lbl"
            ),
        )
        # carry the change flag inside the materialized frame: the
        # convergence probe is then a scan-agg over the checkpoint,
        # not an extra join job per round
        new_labels = (
            jumped.join(
                labels.select("node", F.col("lbl").alias("old_lbl")), "node"
            )
            .select("node", "lbl", (F.col("lbl") != F.col("old_lbl")).alias("chg"))
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("chg").limit(1).count()
        labels = new_labels.select("node", "lbl")
        if changed == 0:
            done = labels
            break
    if done is None:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds — "
            "pathological chain graph; switch to large-star/small-star"
        )
    all_nodes = nodes.select(F.col(node_col).alias("node")).distinct()
    return (
        all_nodes.join(done.select("node", "lbl"), "node", "left")
        .select(
            F.col("node").alias(node_col),
            F.coalesce(F.col("lbl"), F.col("node")).alias("component"),
        )
    )
