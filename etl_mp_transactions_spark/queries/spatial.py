"""Spatial-join operator family (SURVEY.md §2.9 extensions): grid-
cell-blocked ε-distance self-join, plus per-dimension quantile
normalization of the embedding corpus.

spatial_cell_join is the canonical scale pattern for distance joins
(the same blocking idea PostGIS/Sedona grids implement): hash-derive
deterministic micro-coordinates for each customer, bucket points
into a 32×32 grid with cell size > ε, replicate each point to its 9
neighbor cells ("probe"), and equi-join probes against home cells.
Because cell size exceeds ε, every qualifying pair (a<b) is found
EXACTLY once (a's probe set contains b's home cell), so no distinct
is needed — the test pins this against a brute-force O(n²) check.
Everything is integer: coordinates in micro-units, squared distance
compared against ε² — no sqrt, no floats.

embedding_quantile_normalize is the ML-preprocessing op: each
dimension's values are ranked (row_number with vec_id tiebreak —
deterministic under float ties) and mapped to [0, 1e6] micro-units
by rank. The full normalized matrix is pinned per vector through an
md5 checksum of the canonical 'd:v,…' rendering, keeping the output
one row per vector while the oracle still checks every cell. Scale:
64 independent per-dimension global sorts (range-partitionable),
one reassembly groupBy.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

GRID_N = 32
COORD_MAX = 1_000_000  # micro-unit coordinate space [0, 1e6)
CELL = COORD_MAX // GRID_N  # 31250 > EPS: neighbor blocking is complete
EPS = 10_000  # pair distance threshold (micro-units)
TOP_PAIRS = 100


@query(
    "spatial_cell_join",
    f"""
    WITH pts AS (
      SELECT c_custkey AS id,
             ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':x'), 1, 8))::BIGINT
               % {COORD_MAX} AS x,
             ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':y'), 1, 8))::BIGINT
               % {COORD_MAX} AS y
      FROM customer
    ),
    homed AS (
      SELECT id, x, y, x // {CELL} AS cx, y // {CELL} AS cy FROM pts
    ),
    probes AS (
      SELECT h.id, h.x, h.y,
             h.cx + dx.d AS pcx, h.cy + dy.d AS pcy
      FROM homed h
      CROSS JOIN (VALUES (-1), (0), (1)) AS dx(d)
      CROSS JOIN (VALUES (-1), (0), (1)) AS dy(d)
    ),
    pairs AS (
      SELECT a.id AS c1, b.id AS c2,
             (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
               AS dist2
      FROM probes a JOIN homed b
        ON a.pcx = b.cx AND a.pcy = b.cy AND a.id < b.id
      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
            <= {EPS} * {EPS}
    )
    SELECT c1, c2, dist2
    FROM pairs
    ORDER BY dist2 ASC, c1 ASC, c2 ASC
    LIMIT {TOP_PAIRS}
    """,
)
def spatial_cell_join(spark, sf_dir):
    """ε-distance customer pairs via 9-cell grid blocking (module
    docstring): top-{TOP_PAIRS} closest pairs under ε, exact integer
    squared distances."""
    cust = load_table(spark, sf_dir, "customer")

    def coord(seed):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("c_custkey").cast("string"), F.lit(seed)
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % COORD_MAX
        )

    pts = cust.select(
        F.col("c_custkey").alias("id"),
        coord(":x").alias("x"),
        coord(":y").alias("y"),
    )
    homed = pts.select(
        "*",
        F.expr(f"div(x, {CELL})").alias("cx"),
        F.expr(f"div(y, {CELL})").alias("cy"),
    )
    offs = spark.range(-1, 2).select(F.col("id").cast("int").alias("d"))
    probes = (
        homed.crossJoin(F.broadcast(offs.select(F.col("d").alias("dx"))))
        .crossJoin(F.broadcast(offs.select(F.col("d").alias("dy"))))
        .select(
            "id",
            "x",
            "y",
            (F.col("cx") + F.col("dx")).alias("pcx"),
            (F.col("cy") + F.col("dy")).alias("pcy"),
        )
    )
    a = probes.alias("a")
    b = homed.alias("b")
    dist2 = (F.col("a.x") - F.col("b.x")) * (
        F.col("a.x") - F.col("b.x")
    ) + (F.col("a.y") - F.col("b.y")) * (F.col("a.y") - F.col("b.y"))
    pairs = (
        a.join(
            b,
            (F.col("a.pcx") == F.col("b.cx"))
            & (F.col("a.pcy") == F.col("b.cy"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("c1"),
            F.col("b.id").alias("c2"),
            dist2.alias("dist2"),
        )
        .filter(F.col("dist2") <= EPS * EPS)
    )
    return pairs.orderBy(
        F.asc("dist2"), F.asc("c1"), F.asc("c2")
    ).limit(TOP_PAIRS)


@query(
    "embedding_quantile_normalize",
    """
    WITH elems AS (
      SELECT vec_id, i - 1 AS d, embedding[i] AS val
      FROM (SELECT vec_id, embedding FROM embeddings),
           unnest(generate_series(1, len(embedding))) AS t(i)
    ),
    ranked AS (
      SELECT vec_id, d,
             row_number() OVER (PARTITION BY d ORDER BY val, vec_id) AS rk,
             count(*) OVER (PARTITION BY d) AS n
      FROM elems
    ),
    normed AS (
      SELECT vec_id, d, ((rk - 1) * 1000000) // (n - 1) AS nm
      FROM ranked
    )
    SELECT vec_id,
           md5(string_agg(CAST(d AS VARCHAR) || ':' || CAST(nm AS VARCHAR),
                          ',' ORDER BY d)) AS norm_checksum,
           min(nm) AS min_norm,
           max(nm) AS max_norm
    FROM normed
    GROUP BY vec_id
    ORDER BY vec_id
    """,
)
def embedding_quantile_normalize(spark, sf_dir):
    """Per-dimension quantile normalization to [0, 1e6] micro-units
    (module docstring): rank-deterministic under ties, every
    normalized cell pinned through the per-vector md5 checksum."""
    emb = load_table(spark, sf_dir, "embeddings")
    elems = emb.select(
        "vec_id", F.posexplode("embedding").alias("d", "val")
    )
    wd = Window.partitionBy("d")
    ranked = elems.select(
        "vec_id",
        "d",
        F.row_number()
        .over(wd.orderBy(F.asc("val"), F.asc("vec_id")))
        .alias("rk"),
        F.count("*").over(wd).alias("n"),
    )
    normed = ranked.select(
        "vec_id",
        "d",
        # rank is INT from row_number: widen BEFORE the 1e6 multiply
        # or ANSI mode overflows past ~2.1k rows/dim (the 10x scale
        # sweep caught exactly this at sf1)
        F.expr(
            "div(cast(rk - 1 as bigint) * 1000000, n - 1)"
        ).alias("nm"),
    )
    return (
        normed.select(
            "vec_id",
            "nm",
            F.concat_ws(
                ":", F.col("d").cast("string"), F.col("nm").cast("string")
            ).alias("cell"),
            F.col("d"),
        )
        .groupBy("vec_id")
        .agg(
            F.md5(
                F.expr(
                    "array_join(transform(array_sort(collect_list("
                    "struct(d, cell))), x -> x.cell), ',')"
                )
            ).alias("norm_checksum"),
            F.min("nm").alias("min_norm"),
            F.max("nm").alias("max_norm"),
        )
        .orderBy("vec_id")
    )


DB_GRID = 16
DB_CELL = COORD_MAX // DB_GRID  # 62500 >= max eps: 9-cell probe complete
DB_EPS_BASE = 20_600  # eps at n=1500 -> expected degree ~2 (subcritical)
DB_EPS_CAP = 50_000  # never exceeds DB_CELL, so blocking stays complete
DB_MINNBR = 3  # core iff >= 3 neighbors within eps (minPts=4 incl. self)


@query(
    "dbscan_clusters",
    f"""
    WITH RECURSIVE pts AS (
      SELECT c_custkey AS id,
             ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':x'), 1, 8))::BIGINT
               % {COORD_MAX} AS x,
             ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':y'), 1, 8))::BIGINT
               % {COORD_MAX} AS y
      FROM customer
    ),
    eps AS (
      SELECT least(CAST({DB_EPS_CAP} AS BIGINT),
                   CAST(round({DB_EPS_BASE} * sqrt(1500.0 / count(*)))
                        AS BIGINT)) AS e
      FROM customer
    ),
    homed AS (
      SELECT id, x, y, x // {DB_CELL} AS cx, y // {DB_CELL} AS cy FROM pts
    ),
    probes AS (
      SELECT h.id, h.x, h.y,
             h.cx + dx.d AS pcx, h.cy + dy.d AS pcy
      FROM homed h
      CROSS JOIN (VALUES (-1), (0), (1)) AS dx(d)
      CROSS JOIN (VALUES (-1), (0), (1)) AS dy(d)
    ),
    pairs AS (
      SELECT a.id AS c1, b.id AS c2
      FROM probes a JOIN homed b
        ON a.pcx = b.cx AND a.pcy = b.cy AND a.id < b.id
      CROSS JOIN eps
      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
            <= eps.e * eps.e
    ),
    sym AS (
      SELECT c1 AS a, c2 AS b FROM pairs
      UNION ALL
      SELECT c2 AS a, c1 AS b FROM pairs
    ),
    deg AS (SELECT a AS id, count(*) AS n_nbrs FROM sym GROUP BY 1),
    core AS (SELECT id FROM deg WHERE n_nbrs >= {DB_MINNBR}),
    cedges AS (
      SELECT s.a, s.b FROM sym s
      JOIN core ca ON s.a = ca.id
      JOIN core cb ON s.b = cb.id
    ),
    reach(a, b) AS (
      SELECT a, b FROM cedges
      UNION
      SELECT r.a, e.b FROM reach r JOIN cedges e ON r.b = e.a
    ),
    comp AS (
      SELECT a AS id, least(a, min(b)) AS cluster FROM reach GROUP BY a
    ),
    corelab AS (
      SELECT c.id, coalesce(comp.cluster, c.id) AS cluster
      FROM core c LEFT JOIN comp ON comp.id = c.id
    ),
    border AS (
      SELECT s.a AS id, min(cl.cluster) AS cluster
      FROM sym s
      JOIN corelab cl ON s.b = cl.id
      WHERE s.a NOT IN (SELECT id FROM core)
      GROUP BY 1
    )
    SELECT p.id,
           CASE WHEN cl.id IS NOT NULL THEN 'core'
                WHEN bo.id IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role,
           coalesce(cl.cluster, bo.cluster, -1) AS cluster,
           coalesce(d.n_nbrs, 0) AS n_nbrs
    FROM pts p
    LEFT JOIN corelab cl ON p.id = cl.id
    LEFT JOIN border bo ON p.id = bo.id
    LEFT JOIN deg d ON p.id = d.id
    ORDER BY p.id
    """,
)
def dbscan_clusters(spark, sf_dir):
    """Exact DBSCAN (Ester et al. 1996, KDD — public) composed
    entirely from the repo's scale-safe primitives: the grid-blocked
    ε-pair join above (cell > ε ⇒ complete + duplicate-free), an
    integer neighbor-count degree pass, core points (≥ {DB_MINNBR}
    ε-neighbors), min-label connected components over the core-core
    subgraph (operators/components.py — log-rounds pointer jumping,
    the same engine as dedup_components), deterministic border
    assignment (min core-neighbor cluster; vanilla DBSCAN's
    "whichever core claims it first" nondeterminism removed), and
    noise = everything else (cluster -1). Oracle: identical grid
    pairs + recursive-CTE reachability closure.

    Scale: pair count is the ε-graph contract (grows with density at
    fixed ε — the operator's cost IS its output size); every join is
    equi-keyed; the closure is O(log n) rounds. No step is
    all-pairs."""
    from etl_mp_transactions_spark.operators.components import (
        connected_components,
    )

    cust = load_table(spark, sf_dir, "customer")
    eps = cust.agg(
        F.least(
            F.lit(DB_EPS_CAP).cast("bigint"),
            F.round(
                F.lit(DB_EPS_BASE) * F.sqrt(F.lit(1500.0) / F.count("*"))
            ).cast("bigint"),
        ).alias("e")
    )

    def coord(salt):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("c_custkey").cast("string"),
                                   F.lit(salt))),
                    1, 8,
                ),
                16, 10,
            ).cast("bigint")
            % COORD_MAX
        )

    pts = cust.select(
        F.col("c_custkey").alias("id"),
        coord(":x").alias("x"),
        coord(":y").alias("y"),
    )
    homed = pts.select(
        "*",
        F.expr(f"div(x, {DB_CELL})").alias("cx"),
        F.expr(f"div(y, {DB_CELL})").alias("cy"),
    )
    offs = spark.range(-1, 2).select(F.col("id").cast("int").alias("d"))
    probes = (
        homed.crossJoin(F.broadcast(offs.select(F.col("d").alias("dx"))))
        .crossJoin(F.broadcast(offs.select(F.col("d").alias("dy"))))
        .select(
            "id", "x", "y",
            (F.col("cx") + F.col("dx")).alias("pcx"),
            (F.col("cy") + F.col("dy")).alias("pcy"),
        )
    )
    a, b = probes.alias("a"), homed.alias("b")
    dist2 = (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x")) + (
        F.col("a.y") - F.col("b.y")
    ) * (F.col("a.y") - F.col("b.y"))
    pairs = (
        a.join(
            b,
            (F.col("a.pcx") == F.col("b.cx"))
            & (F.col("a.pcy") == F.col("b.cy"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .crossJoin(F.broadcast(eps))
        .filter(dist2 <= F.col("e") * F.col("e"))
        .select(F.col("a.id").alias("c1"), F.col("b.id").alias("c2"))
    )
    sym = pairs.select(
        F.col("c1").alias("na"), F.col("c2").alias("nb")
    ).unionAll(pairs.select(F.col("c2").alias("na"), F.col("c1").alias("nb")))
    sym = sym.localCheckpoint(eager=True)
    deg = sym.groupBy(F.col("na").alias("id")).agg(
        F.count("*").alias("n_nbrs")
    )
    core = deg.filter(F.col("n_nbrs") >= DB_MINNBR).select("id")
    cedges = (
        sym.join(core.select(F.col("id").alias("na")), "na")
        .join(core.select(F.col("id").alias("nb")), "nb")
        .select("na", "nb")
    )
    corelab = connected_components(
        core.select(F.col("id")), cedges,
        node_col="id", src_col="na", dst_col="nb",
    ).select("id", F.col("component").alias("cluster"))
    border = (
        sym.join(core.select(F.col("id").alias("na")), "na", "left_anti")
        .join(corelab.select(F.col("id").alias("nb"), "cluster"), "nb")
        .groupBy(F.col("na").alias("id"))
        .agg(F.min("cluster").alias("cluster"))
    )
    cl = corelab.select("id", F.col("cluster").alias("core_cluster"))
    bo = border.select("id", F.col("cluster").alias("border_cluster"))
    return (
        pts.select("id")
        .join(cl, "id", "left")
        .join(bo, "id", "left")
        .join(deg, "id", "left")
        .select(
            "id",
            F.when(F.col("core_cluster").isNotNull(), "core")
            .when(F.col("border_cluster").isNotNull(), "border")
            .otherwise("noise")
            .alias("role"),
            F.coalesce(
                F.col("core_cluster"), F.col("border_cluster"), F.lit(-1)
            ).alias("cluster"),
            F.coalesce(F.col("n_nbrs"), F.lit(0)).alias("n_nbrs"),
        )
        .orderBy("id")
    )


# convex test polygon in micro-units (CCW): a hexagon over the middle
# of the coordinate space
PIP_POLY = (
    (300_000, 200_000),
    (700_000, 200_000),
    (900_000, 500_000),
    (700_000, 800_000),
    (300_000, 800_000),
    (100_000, 500_000),
)


def _pip_edge_terms(xcol: str, ycol: str):
    """Cross-product sign terms for each polygon edge (shared shape
    for both engines): ((x2-x1)*(y-y1) - (y2-y1)*(x-x1)) >= 0 for a
    CCW convex polygon <=> inside-or-on-boundary."""
    terms = []
    n = len(PIP_POLY)
    for i in range(n):
        x1, y1 = PIP_POLY[i]
        x2, y2 = PIP_POLY[(i + 1) % n]
        terms.append(
            f"(({x2} - {x1}) * ({ycol} - {y1})"
            f" - ({y2} - {y1}) * ({xcol} - {x1})) >= 0"
        )
    return terms


@query(
    "point_in_polygon_join",
    f"""
    WITH pts AS (
      SELECT c_custkey AS id,
             ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':x'), 1, 8))::BIGINT
               % {COORD_MAX} AS x,
             ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':y'), 1, 8))::BIGINT
               % {COORD_MAX} AS y
      FROM customer
    ),
    boxed AS (
      SELECT id, x, y FROM pts
      WHERE x >= {min(p[0] for p in PIP_POLY)}
        AND x <= {max(p[0] for p in PIP_POLY)}
        AND y >= {min(p[1] for p in PIP_POLY)}
        AND y <= {max(p[1] for p in PIP_POLY)}
    )
    SELECT id, x, y,
           CASE WHEN {" AND ".join(_pip_edge_terms("x", "y"))}
                THEN 1 ELSE 0 END AS inside
    FROM boxed
    ORDER BY id
    """,
)
def point_in_polygon_join(spark, sf_dir):
    """Exact point-in-convex-polygon containment over the hash-
    derived customer points: per-edge integer cross-product sign
    tests (CCW hexagon; inside-or-on-boundary = all signs >= 0), with
    the bounding-box prefilter that makes the expensive edge tests
    run only on box survivors — the standard spatial-pruning shape
    (at 100 TB the box predicate is the partition/zone-map prune; the
    edge tests are all-integer, no floats, no epsilon). Output keeps
    box survivors with their inside/boundary verdict so the oracle
    pins both the prefilter and the exact test."""
    cust = load_table(spark, sf_dir, "customer")

    def coord(salt):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("c_custkey").cast("string"),
                                   F.lit(salt))),
                    1, 8,
                ),
                16, 10,
            ).cast("bigint")
            % COORD_MAX
        )

    pts = cust.select(
        F.col("c_custkey").alias("id"),
        coord(":x").alias("x"),
        coord(":y").alias("y"),
    )
    xs = [p[0] for p in PIP_POLY]
    ys = [p[1] for p in PIP_POLY]
    boxed = pts.filter(
        (F.col("x") >= min(xs)) & (F.col("x") <= max(xs))
        & (F.col("y") >= min(ys)) & (F.col("y") <= max(ys))
    )
    inside = F.expr(
        "CASE WHEN " + " AND ".join(_pip_edge_terms("x", "y"))
        + " THEN 1 ELSE 0 END"
    )
    return boxed.select("id", "x", "y", inside.alias("inside")).orderBy("id")
