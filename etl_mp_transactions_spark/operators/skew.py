"""Skew-mitigation operators (SURVEY.md 'optimize for scale': salting
for hot keys).

AQE's skew-join splitting handles joins at runtime (enabled in
session.py); *aggregations* on hot keys still funnel every row of a key
to one reducer. ``salted_agg`` is the standard two-phase rewrite:

    groupBy(key, salt) partial-agg  →  groupBy(key) final-agg

The salt fans a hot key out over N reducers; the second phase combines
the N partials. Correct for any algebraic aggregate (sum/count/min/
max); the helper takes the per-phase expression pairs explicitly so
the algebra stays visible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    n_salts: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    partial_aggs: name -> aggregate expression for phase 1 (over raw rows)
    final_aggs:   name -> aggregate expression for phase 2 (over partials,
                  referencing the phase-1 names)
    salt_on:      column whose hash spreads rows. Defaults to a hash of
                  the whole row — a pure function of row CONTENT, so
                  the salt (and every phase-1 partial) is identical
                  across task retries and repartitionings; a
                  partition-id or random salt would not be. Pass a
                  high-cardinality column explicitly when rows within
                  a hot key are near-identical (content-hash would
                  then under-spread).
    """
    salt_src = F.col(salt_on) if salt_on else F.hash(*[F.col(c) for c in df.columns])
    salted = df.withColumn("_salt", F.pmod(F.hash(salt_src), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, expr in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in final_aggs.items()]
    )
