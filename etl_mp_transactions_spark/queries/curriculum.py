"""Training-mixture optimization + curriculum scheduling (SURVEY.md
§2.9 LLM-pipeline extensions): the two decisions a large-scale
pretraining run makes AFTER curation — how much of each domain to
sample (DoReMi-style reweighting) and in what order to feed it
(difficulty curriculum with domain interleaving).

- doremi_domain_reweight is one exact multiplicative-weights update
  on domain sampling weights (DoReMi lineage, Xie et al. 2023,
  arXiv:2305.10429, public): domains with above-average excess loss
  get upweighted, w'_d ∝ w_d · (1 + η·excess_d), then renormalize.
  The linearized update (1 + ηx instead of exp(ηx)) keeps every
  quantity an exact integer in micro-units — no engine-divergent
  exp() — and is the standard first-order MW variant. The per-domain
  loss here is a deterministic structural proxy (mean chars-per-token
  in micro units — long-token domains read as "harder"); a production
  run plugs per-domain reference-model losses into the same plan.
- curriculum_interleave emits a full training schedule: within each
  domain docs rank by a difficulty score (type-token ratio in micro
  units, repetitive docs first), and the global order interleaves
  domains by (within-domain rank, domain) — so epoch position k
  cycles sources round-robin while difficulty rises monotonically
  per source. The within-domain rank is a partitioned window; the
  global interleave position is the two-phase range rank
  (operators/distranks.py), never a single-partition window.

Scale: both are one or two shuffles over per-doc/per-domain
aggregates; weights tables are domain-sized (broadcast class).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators.distranks import global_row_number
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

ETA_INV = 10  # η = 1/10 learning rate for the MW update


def _tokens():
    return F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
    )


@query(
    "doremi_domain_reweight",
    f"""
    WITH per_doc AS (
      SELECT source,
             n_chars,
             len(list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '')) AS n_tok
      FROM documents
    ),
    dom AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) * 1000000
               // CAST(sum(n_tok) AS BIGINT) AS loss_micro
      FROM per_doc GROUP BY source
    ),
    base AS (
      SELECT CAST(sum(n_chars) AS BIGINT) * 1000000
               // CAST(sum(n_tok) AS BIGINT) AS base_micro
      FROM per_doc
    ),
    upd AS (
      -- excess can be negative: snap the numerator to an exact
      -- multiple of eta_inv first so floor-vs-trunc division
      -- direction can't diverge between engines
      SELECT d.source, d.n_docs, d.loss_micro, b.base_micro,
             greatest(
               1000000 +
               ((d.loss_micro - b.base_micro)
                - (((d.loss_micro - b.base_micro) % {ETA_INV})
                   + {ETA_INV}) % {ETA_INV}) // {ETA_INV},
               0) AS factor_micro
      FROM dom d CROSS JOIN base b
    )
    SELECT source, n_docs, loss_micro,
           (loss_micro - base_micro) AS excess_micro,
           factor_micro,
           factor_micro * 1000000
             // (SELECT sum(factor_micro) FROM upd) AS weight_ppm
    FROM upd
    ORDER BY source
    """,
)
def doremi_domain_reweight(spark, sf_dir):
    """One exact DoReMi-style multiplicative-weights step on domain
    sampling weights (module docstring). Starting from uniform
    weights, w'_d ∝ max(0, 1 + η·(loss_d − baseline)) with every
    term an exact micro-unit integer; output is each domain's new
    weight in parts-per-million of the mixture."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source", "n_chars", F.size(_tokens()).alias("n_tok")
    )
    dom = per_doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.expr(
            "div(cast(sum(n_chars) as bigint) * 1000000,"
            " cast(sum(n_tok) as bigint))"
        ).alias("loss_micro"),
    )
    base = per_doc.agg(
        F.expr(
            "div(cast(sum(n_chars) as bigint) * 1000000,"
            " cast(sum(n_tok) as bigint))"
        ).alias("base_micro")
    )
    upd = dom.crossJoin(F.broadcast(base)).select(
        "source",
        "n_docs",
        "loss_micro",
        (F.col("loss_micro") - F.col("base_micro")).alias("excess_micro"),
        F.greatest(
            F.lit(1000000)
            + F.expr(
                f"div((loss_micro - base_micro)"
                f" - (((loss_micro - base_micro) % {ETA_INV})"
                f" + {ETA_INV}) % {ETA_INV}, {ETA_INV})"
            ),
            F.lit(0),
        ).alias("factor_micro"),
    )
    tot = upd.agg(F.sum("factor_micro").alias("tot_factor"))
    return (
        upd.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "loss_micro",
            "excess_micro",
            "factor_micro",
            F.expr("div(factor_micro * 1000000, tot_factor)").alias(
                "weight_ppm"
            ),
        )
        .orderBy("source")
    )


@query(
    "curriculum_interleave",
    """
    WITH scored AS (
      SELECT doc_id, source,
             len(list_distinct(list_filter(
                 string_split_regex(lower(text), '\\s+'), x -> x <> '')))
               * 1000000
               // len(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS ttr_micro
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, ttr_micro,
             row_number() OVER (PARTITION BY source
                                ORDER BY ttr_micro, doc_id) AS r
      FROM scored
    )
    SELECT row_number() OVER (ORDER BY r, source, doc_id) AS schedule_pos,
           doc_id, source, r AS domain_rank, ttr_micro
    FROM ranked
    ORDER BY schedule_pos
    """,
)
def curriculum_interleave(spark, sf_dir):
    """Full curriculum schedule (module docstring): difficulty =
    type-token ratio in exact micro units (repetitive docs first),
    round-robin across domains. The per-domain rank is a partitioned
    window; the global schedule position is the two-phase range rank
    — the plan stays parallel at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.expr(
            "div(size(array_distinct(filter(split(lower(text), '\\\\s+'),"
            " x -> x != ''))) * 1000000,"
            " size(filter(split(lower(text), '\\\\s+'), x -> x != '')))"
        ).alias("ttr_micro"),
    )
    wdom = Window.partitionBy("source").orderBy("ttr_micro", "doc_id")
    ranked = scored.withColumn("r", F.row_number().over(wdom))
    return (
        global_row_number(
            ranked,
            [F.asc("r"), F.asc("source"), F.asc("doc_id")],
            out_col="schedule_pos",
        )
        .select(
            "schedule_pos",
            "doc_id",
            "source",
            F.col("r").alias("domain_rank"),
            "ttr_micro",
        )
        .orderBy("schedule_pos")
    )
