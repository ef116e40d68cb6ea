"""In-engine logistic regression (SURVEY.md §2.9 ML family): three
unrolled Newton/IRLS steps with exact integer state — the fifth
exact ITERATIVE oracle family (after pagerank, HITS, k-core, BFS),
and the first whose recurrence runs through float nonlinearities.

The order-dependence problem: Newton steps need Σ(y−p), Σ(y−p)x,
Σp(1−p), Σp(1−p)x, Σp(1−p)x² where p = σ(b0 + b1·x) — naive float
sums vary with partitioning. The repo's nano-unit pattern fixes it:
each ROW's contribution is one float expression immediately rounded
to an integer nano-unit, then summed as exact order-free BIGINTs, so
the model state after every step is a pair of exact NANO-unit
integers and the whole 3-step trajectory is deterministic and
oracle-checkable. The Newton solve per step is the shared-text 2x2
Cramer float (regression.py contract) rounded once back to nano.

Feature/target mirror gini_best_split: x = floor(acctbal/500) band,
y = (segment = BUILDING). Scale: each step is ONE scan + one
5-integer reduce; the model broadcast back is 2 integers. Three
steps = three passes — the standard fixed-iteration-count training
shape (convergence monitoring would read the gradient norms this
query already outputs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

N_STEPS = 3


def _contrib_sql(b0: str, b1: str) -> dict[str, str]:
    """Per-row nano-unit contribution expressions given nano params.
    Identical text in both engines (x, y are integer columns)."""
    z = f"(({b0} + {b1} * x) / 1e9)"
    p = f"(1.0 / (1.0 + exp(-{z})))"
    return {
        "g0": f"CAST(round(1e9 * (y - {p})) AS BIGINT)",
        "g1": f"CAST(round(1e9 * (y - {p}) * x) AS BIGINT)",
        "h00": f"CAST(round(1e9 * {p} * (1.0 - {p})) AS BIGINT)",
        "h01": f"CAST(round(1e9 * {p} * (1.0 - {p}) * x) AS BIGINT)",
        "h11": f"CAST(round(1e9 * {p} * (1.0 - {p}) * x * x) AS BIGINT)",
    }


def _newton_sql(prev: str, idx: int) -> str:
    """One Newton step as two CTEs reading params from `prev`."""
    c = _contrib_sql(f"{prev}.b0", f"{prev}.b1")
    return f"""
    s{idx} AS (
      SELECT sum({c['g0']}) AS g0, sum({c['g1']}) AS g1,
             sum({c['h00']}) AS h00, sum({c['h01']}) AS h01,
             sum({c['h11']}) AS h11
      FROM rows CROSS JOIN {prev}
    ),
    p{idx} AS (
      SELECT {prev}.b0 + CAST(round(1e9 *
               ((CAST(s{idx}.g0 AS DOUBLE) * s{idx}.h11
                 - CAST(s{idx}.g1 AS DOUBLE) * s{idx}.h01)
                / (CAST(s{idx}.h00 AS DOUBLE) * s{idx}.h11
                   - CAST(s{idx}.h01 AS DOUBLE) * s{idx}.h01))) AS BIGINT)
               AS b0,
             {prev}.b1 + CAST(round(1e9 *
               ((CAST(s{idx}.g1 AS DOUBLE) * s{idx}.h00
                 - CAST(s{idx}.g0 AS DOUBLE) * s{idx}.h01)
                / (CAST(s{idx}.h00 AS DOUBLE) * s{idx}.h11
                   - CAST(s{idx}.h01 AS DOUBLE) * s{idx}.h01))) AS BIGINT)
               AS b1,
             s{idx}.g0 AS g0, s{idx}.g1 AS g1,
             s{idx}.h00 AS h00, s{idx}.h01 AS h01, s{idx}.h11 AS h11
      FROM s{idx} CROSS JOIN {prev}
    )"""


def _oracle() -> str:
    ctes = ["p0 AS (SELECT CAST(0 AS BIGINT) AS b0, CAST(0 AS BIGINT) AS b1)"]
    for i in range(1, N_STEPS + 1):
        ctes.append(_newton_sql(f"p{i-1}", i))
    return f"""
    WITH rows AS (
      SELECT CAST(floor(c_acctbal / 500.0) AS BIGINT) AS x,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS y
      FROM customer
    ),
    {",".join(ctes)}
    SELECT b0 AS b0_nano, b1 AS b1_nano,
           g0 AS last_g0, g1 AS last_g1,
           h00 AS last_h00, h01 AS last_h01, h11 AS last_h11
    FROM p{N_STEPS}
    """


@query("logistic_newton_steps", _oracle())
def logistic_newton_steps(spark, sf_dir):
    """Three exact Newton steps of a 2-parameter logistic fit (module
    docstring): per-row nano-rounded contributions → exact BIGINT
    sums → shared-text Cramer solve → nano-integer model state; the
    full trajectory is deterministic and both engines land on the
    identical final (b0, b1)."""
    cust = load_table(spark, sf_dir, "customer")
    rows = cust.select(
        F.floor(F.col("c_acctbal") / F.lit(500.0)).cast("bigint").alias("x"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1)
        .otherwise(0)
        .alias("y"),
    )
    params = spark.range(1).select(
        F.lit(0).cast("bigint").alias("b0"),
        F.lit(0).cast("bigint").alias("b1"),
    )
    last_sums = None
    for _ in range(N_STEPS):
        c = _contrib_sql("b0", "b1")
        sums = (
            rows.crossJoin(F.broadcast(params))
            .agg(
                F.expr(f"sum({c['g0']})").alias("g0"),
                F.expr(f"sum({c['g1']})").alias("g1"),
                F.expr(f"sum({c['h00']})").alias("h00"),
                F.expr(f"sum({c['h01']})").alias("h01"),
                F.expr(f"sum({c['h11']})").alias("h11"),
            )
        )
        step = sums.crossJoin(F.broadcast(params)).select(
            (
                F.col("b0")
                + F.expr(
                    "CAST(round(1e9 *"
                    " ((CAST(g0 AS DOUBLE) * h11 - CAST(g1 AS DOUBLE) * h01)"
                    "  / (CAST(h00 AS DOUBLE) * h11"
                    "     - CAST(h01 AS DOUBLE) * h01))) AS BIGINT)"
                )
            ).alias("b0"),
            (
                F.col("b1")
                + F.expr(
                    "CAST(round(1e9 *"
                    " ((CAST(g1 AS DOUBLE) * h00 - CAST(g0 AS DOUBLE) * h01)"
                    "  / (CAST(h00 AS DOUBLE) * h11"
                    "     - CAST(h01 AS DOUBLE) * h01))) AS BIGINT)"
                )
            ).alias("b1"),
            "g0", "g1", "h00", "h01", "h11",
        )
        # materialize the tiny model state so the next pass reads two
        # integers, not a growing lineage (the components.py lesson)
        step = step.localCheckpoint(eager=True)
        params = step.select("b0", "b1")
        last_sums = step
    return last_sums.select(
        F.col("b0").alias("b0_nano"),
        F.col("b1").alias("b1_nano"),
        F.col("g0").alias("last_g0"),
        F.col("g1").alias("last_g1"),
        F.col("h00").alias("last_h00"),
        F.col("h01").alias("last_h01"),
        F.col("h11").alias("last_h11"),
    )
