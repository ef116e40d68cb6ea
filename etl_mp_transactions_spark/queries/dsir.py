"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
public) — select the raw-corpus documents whose token distribution
best matches a target domain, the standard pretraining-data curation
move when a small high-quality target set defines "what good data
looks like".

Featurization is the paper's: HASHED WORD BIGRAMS into NB={DSIR_NB}
buckets — the md5-prefix bucket hash every banded operator here uses
(cross-engine bit-identical), and the piece that makes the operator
scale: both language models are ≤ NB rows at ANY corpus size, so
the per-token score join is against a bounded table no matter how
many distinct bigrams the crawl has.

Exactness: logs are irrational, and the bit-length log2 surrogate
(queries/wordpiece.py) is too coarse here — measured: every
smoothed bucket ratio sits inside one power of two, all weights
collapse to 0. The declared statistic is instead the exact-integer
smoothed frequency ratio
    s(f) = ((c_tgt(f)+1) · SCALE) // (c_raw(f)+1)      (≤ SCALE,
                                                target ⊆ raw corpus)
and per-document weight = mean s over the document's bigram
occurrences, rescaled: weight = (Σ s · SCALE) // n_bigrams. The
constant factor N_raw/N_tgt of the true likelihood ratio is dropped
— it multiplies every document identically (ranking-invariant) and
keeping it would push intermediates past int64 at petabyte counts;
every retained intermediate is ≤ n_doc_tokens · SCALE² (< 2^63 for
any document). Selection = top {DSIR_TOPK} by (weight desc, doc_id)
— the deterministic argmax face of DSIR's Gumbel resampling
(sampling is un-oracle-able; the weight computation IS the
operator). Measured on the synthetic corpus: 74 of the top-100 are
target-language docs vs a 49% base rate.

Scale shape: one corpus-linear bigram explode; two ≤NB-row groupBys
(map-side combined); the score join is corpus ⋈ NB-row table (AQE
will broadcast it — correctly, since NB is a constant); the per-doc
weight is a map-side-combined sum; top-k is TakeOrdered, never a
global sort.

Reference parity: none — §2.9 training-data mandate (quality
scoring / data-mixing family, alongside doremi_domain_reweight and
source_temperature_mix).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

DSIR_TARGET_LANG = "en"
DSIR_TOPK = 100
DSIR_NB = 8192  # hashed-bigram feature buckets
DSIR_SCALE = 10_000


@query(
    "dsir_importance_select",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
    ),
    w AS (
      SELECT doc_id, lang,
             (('0x' || substr(md5(ws[i] || ' ' || ws[i + 1]), 1, 8))::BIGINT
              % {DSIR_NB}) AS f
      FROM toks, unnest(generate_series(1, len(ws) - 1)) AS t(i)
      WHERE ws[i] <> '' AND ws[i + 1] <> ''
    ),
    rawlm AS (
      SELECT f, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY f
    ),
    tgtlm AS (
      SELECT f, CAST(count(*) AS BIGINT) AS ct FROM w
      WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY f
    ),
    lm AS (
      SELECT r.f,
             ((coalesce(t.ct, 0) + 1) * {DSIR_SCALE}) // (r.c + 1) AS s
      FROM rawlm r LEFT JOIN tgtlm t ON t.f = r.f
    ),
    scored AS (
      SELECT w.doc_id, min(w.lang) AS lang,
             CAST((sum(lm.s) * {DSIR_SCALE}) // count(*) AS BIGINT)
               AS weight
      FROM w JOIN lm ON lm.f = w.f
      GROUP BY w.doc_id
    )
    SELECT doc_id, lang, weight,
           CAST(row_number() OVER (ORDER BY weight DESC, doc_id)
                AS BIGINT) AS rank
    FROM scored
    ORDER BY weight DESC, doc_id
    LIMIT {DSIR_TOPK}
    """,
)
def dsir_importance_select(spark, sf_dir):
    """Top-{DSIR_TOPK} documents by exact-integer DSIR importance
    weight against the lang='{DSIR_TARGET_LANG}' target LM over
    hashed-bigram features (module docstring): the
    distribution-matching selection a pretraining pipeline runs over
    the raw crawl."""
    docs = load_table(spark, sf_dir, "documents")
    # raw-position bigrams (both parts non-empty), hashed into NB
    # buckets with the repo-standard md5-prefix hash; the size guard
    # keeps sequence() off descending ranges on 1-word docs
    w = (
        docs.select(
            "doc_id",
            "lang",
            F.split("text", " ").alias("ws"),
        )
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "CASE WHEN size(ws) >= 2 THEN "
                    "filter(transform(sequence(0, size(ws) - 2),"
                    " i -> struct(ws[i] AS a, ws[i + 1] AS b)),"
                    " p -> p.a <> '' AND p.b <> '') "
                    "ELSE array() END"
                )
            ).alias("bg"),
        )
        .select(
            "doc_id",
            "lang",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(" ", "bg.a", "bg.b")), 1, 8
                    ),
                    16,
                    10,
                ).cast("bigint")
                % DSIR_NB
            ).alias("f"),
        )
    )
    rawlm = w.groupBy("f").agg(F.count("*").cast("bigint").alias("c"))
    tgtlm = (
        w.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("f")
        .agg(F.count("*").cast("bigint").alias("ct"))
    )
    lm = rawlm.join(tgtlm, "f", "left").select(
        "f",
        F.expr(
            f"div((coalesce(ct, 0) + 1) * {DSIR_SCALE}, c + 1)"
        ).alias("s"),
    )
    scored = (
        w.join(lm, "f")
        .groupBy("doc_id")
        .agg(
            F.min("lang").alias("lang"),
            F.expr(f"cast(div(sum(s) * {DSIR_SCALE}, count(*)) as bigint)")
            .alias("weight"),
        )
    )
    rw = Window.orderBy(F.desc("weight"), "doc_id")
    return (
        scored.orderBy(F.desc("weight"), "doc_id")
        .limit(DSIR_TOPK)
        .select(
            "doc_id",
            "lang",
            "weight",
            F.row_number().over(rw).cast("bigint").alias("rank"),
        )
    )
