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

import hashlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}

# Driver-attested result representation (r16, VERDICT r15 task #1).
# DuckDB types any uncast integer ``sum()`` / ``list_sum()`` (and
# arithmetic derived from them) as HUGEINT (INT128). The driver's
# result hash canonicalizes HUGEINT columns differently from BIGINT
# (pandas/Arrow renders HUGEINT as float64/decimal128, not int64), so
# a query whose ORACLE emits HUGEINT hashes red on the driver even
# when every value is identical — the exact local-green/driver-red
# signature of the r15 trio. The decisive evidence:
#   - every driver-red hash mismatch in r11–r15 (poscontrol,
#     conformal, multimodal_features after its r15 BIGINT conversion)
#     has >=1 HUGEINT oracle column;
#   - every probe that re-emitted the same values CAST to BIGINT or
#     VARCHAR went driver-green (predx, varchar twin, trajectory,
#     calibration, stats_via_sums, woe_information_value);
#   - BOOLEAN and DOUBLE mixes are attested green
#     (graph_ann_ivf_verdict, ivfpq_train_gain, flagship_silver), so
#     HUGEINT is the only discriminating type.
# The permanent fix: at registration, re-emit the affected ORACLE
# columns as BIGINT via DuckDB's ``SELECT * REPLACE`` — value- and
# order-preserving (CAST overflows loudly instead of wrapping), no
# Spark-side change (Spark already computes these columns as BIGINT).
# Every HUGEINT-emitting oracle in the registry is listed (not just
# the three driver-red ones): the rotation can sample any entry, so a
# latent HUGEINT column is a latent red.
_ORACLE_BIGINT_COLS: dict[str, tuple[str, ...]] = {
    "multimodal_features": ("byte_entropy_nano",),
    "conformal_prediction_interval": ("q_cents", "coverage_ppm"),
    "quality_classifier_poscontrol": ("accuracy_bp", "base_bp"),
    "quality_classifier_eval": ("accuracy_bp", "base_bp"),
    "r13_stream_custom_state": ("total_cents",),
    "r15_kappa_backfill_union": ("total_cents",),
    "array_function_breadth": ("total_chars",),
    "ngram_lm_quality": ("avg_logprob_nano",),
    "dataset_shard_assign": ("total_chars",),
    "variant_json_stats": ("sum_k",),
    "ewma_smoothing": ("daily_cents",),
    "markov_transitions": ("p_next_ppm",),
    "chi_square_independence": ("n_total", "chi2_nano"),
    "ks_two_sample": ("n0", "n1", "d_num", "d_micro"),
    "mann_whitney_u": ("n0", "n1", "r0_x2", "u0_x2", "u1_x2"),
    "duplicate_ngram_spans": ("dup_tokens", "dup_ppm"),
    "rfm_segmentation": ("monetary_cents",),
    "adamic_adar_linkpred": ("score_nano",),
    "cusum_changepoint": ("cusum_abs_num",),
    "stratified_allocation": ("base_alloc", "remainder_num", "alloc"),
    "hits_hubs_authorities": ("score",),
    "inverted_index_build": ("cf",),
    "embedding_quantization": ("total_err_pico",),
    "hll_from_definition": ("s_num",),
    "quantile_sketch_merge": ("n",),
    "pit_snapshot_join": ("revenue_cents",),
    "weighted_median": ("total_w",),
    "pareto_concentration": (
        "total_cents", "n_top80", "concentration_micro",
    ),
    "backtest_naive_mae": (
        "mae_naive_millicents", "mae_snaive_millicents",
    ),
    "runs_test_randomness": ("n_above", "n_below", "n_runs"),
    "crossval_fold_encoding": ("enc_ppm",),
    "isotonic_calibration": ("iso_rate_ppm",),
    "fifo_cost_matching": ("matched_qty",),
    "logistic_newton_steps": (
        "b0_nano", "b1_nano", "last_g0", "last_g1",
        "last_h00", "last_h01", "last_h11",
    ),
    "doremi_domain_reweight": ("weight_ppm",),
}


def _oracle_bigint(sql: str, cols: tuple[str, ...]) -> str:
    """Wrap ``sql`` so the named columns are re-emitted as BIGINT
    (see _ORACLE_BIGINT_COLS). ``* REPLACE`` keeps column order and
    every other column untouched; a misnamed column fails loudly at
    oracle execution."""
    rep = ", ".join(f"CAST({c} AS BIGINT) AS {c}" for c in cols)
    return f"SELECT * REPLACE ({rep}) FROM ({sql}) __attested"


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable, with optional
    DuckDB oracle SQL (omit only for non-SQL-expressible operators)."""

    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            cols = _ORACLE_BIGINT_COLS.get(name)
            _ORACLES[name] = (
                _oracle_bigint(oracle, cols) if cols else oracle
            )
        return fn

    return deco


# The driver's correctness gate samples the FIRST 50 registry entries,
# so the head of the iteration order is curated explicitly (the same
# intent the import ordering used to carry — see the streaming_mm
# module docstring: this promotes HARDER full-oracle entries into the
# sample, it never hides anything; every entry outside the window is
# still gated by the identical local harness at both SFs). Since r11
# the curated head holds 50 − _ROTATION_SLOTS names (one per operator
# family; every name asserted present at load) and the remaining
# window slots rotate deterministically over the non-spotlight
# registry per round (ADVICE r10).
_SPOTLIGHT: list[str] = [
    "flagship_silver",
    "f1_partition_filter",
    "f3_anti_join",
    "j1_two_phase_anti",
    "a1_a3_counts_distinct",
    "a2_group_kv",
    "q1_pricing_summary",
    "q3_join_agg_topk",
    "j3_explode_outer",
    "declarative_pipeline_silver",
    "semi_join_exists",
    "q17_avg_subquery",
    "f2_file_lineage",
    "s5_event_envelope",
    "c4_c6_encoding_json",
    "c8_regex_partition_extract",
    "k2_sink_shape",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_incremental_new_vs_old",
    "j2_anomaly_pairs",
    "j2_tfidf_exact_pairs",
    "ann_cosine_topk",
    "embedding_neardup",
    "text_lang_id",
    "text_quality",
    "sequence_packing",
    "multimodal_features",
    "multimodal_decode",
    "r1_stream_dedup",
    "r6_stream_tumbling",
    # r9-family representatives rotated into the driver window
    "dsir_importance_select",
    "label_propagation_communities",
    # r10: Lloyd-trained codebooks (distortion gain + recall audit),
    # the full unigram-EM training loop, maximal-span exact dedup
    "ivfpq_train_gain",
    "ivfpq_recall_at5",
    "viterbi_em_train",
    "duplicate_maximal_spans",
    # r10: trained quality-classifier gate (logistic over hashed
    # n-gram features) + production-width 64-bit perceptual hash
    "quality_classifier_train",
    "image_phash64_neardup",
    # r10 continuation: full k-means training with the in-result
    # monotone-inertia trajectory
    "kmeans_train_trajectory",
    # r11: exact re-rank stage (recall-vs-R lift) + positive-control
    # deployment gate (pinned until driver-green per VERDICT r11 #6)
    "ivfpq_rerank_recall",
    "quality_classifier_poscontrol",
    # r12 swaps (VERDICT r11 task #6): the remaining r11 serving-path
    # families get driver attestation — filtered+refined one-plan
    # serving, the refine-R auto-tuner, the index-artifact round
    # trip, and the calibration audit. Displaced (all driver-green in
    # r11, families still represented): ivfpq_adc_topk,
    # viterbi_em_recount, ivfpq_permute_gain, r21_stream_rerank_serving.
    "ivfpq_filtered_rerank_topk",
    "ivfpq_rerank_slo",
    "ivfpq_index_roundtrip",
    "quality_classifier_calibration",
]

# r12 in-round swaps: the two new flagship families built this round
# (hybrid retrieval serving, graph ANN) get driver attestation
# immediately. Displaced (both driver-green for many rounds, their
# families still represented: multimodal_features, r1_stream_dedup):
_SPOTLIGHT[_SPOTLIGHT.index("multimodal_decode")] = "hybrid_rrf_fusion"
_SPOTLIGHT[_SPOTLIGHT.index("r6_stream_tumbling")] = (
    "graph_ann_greedy_search"
)

# r13 swaps (VERDICT r12 tasks #1/#7): (a) the two poscontrol
# instrumentation probes pin next to the red cell so the driver's
# next artifact localizes the diverging stage itself; (b) the r12
# maintenance families get driver attestation (delete/upsert serving,
# video scene cuts, MMR diversification); (c) the quadratic exact
# graph build's spotlight slot moves to the IVF-seeded build verdict
# (task #3 — the scale-safe plan). Displaced (all driver-green for
# 2+ rounds, every family still represented in the window):
# text_lang_id (text_quality stays), sequence_packing,
# dsir_importance_select, label_propagation_communities
# (graph_ann_* stay), kmeans_train_trajectory (ivfpq_train_gain
# stays), ivfpq_index_roundtrip (5 ivfpq entries stay).
_SPOTLIGHT[_SPOTLIGHT.index("text_lang_id")] = (
    "quality_classifier_poscontrol_docx"
)
_SPOTLIGHT[_SPOTLIGHT.index("sequence_packing")] = (
    "quality_classifier_poscontrol_trajectory"
)
_SPOTLIGHT[_SPOTLIGHT.index("dsir_importance_select")] = (
    "ivfpq_delete_serve"
)
_SPOTLIGHT[_SPOTLIGHT.index("label_propagation_communities")] = (
    "ivfpq_upsert_serve"
)
_SPOTLIGHT[_SPOTLIGHT.index("kmeans_train_trajectory")] = (
    "video_scene_cuts"
)
_SPOTLIGHT[_SPOTLIGHT.index("ivfpq_index_roundtrip")] = (
    "hybrid_mmr_rerank"
)
_SPOTLIGHT[_SPOTLIGHT.index("graph_ann_greedy_search")] = (
    "graph_ann_ivf_verdict"
)

# r14 swaps (VERDICT r13 tasks #1/#2/#6): (a) the poscontrol Newton
# trajectory split into three SINGLE-ROW per-step entries so the
# driver's per-query hash names the first diverging step itself;
# (b) the two constant-literal arithmetic probes (data-independent:
# VALUES only, no table scan) plus the retired-128-bit diagnostic
# probe; (c) the r13 flagship families get driver attestation
# (IVF-seeded graph build, streaming graph insert). Displaced (all
# driver-green 2+ rounds, every family still represented in the
# window): hybrid_rrf_fusion (hybrid_mmr_rerank stays),
# ivfpq_delete_serve + ivfpq_upsert_serve (5 ivfpq entries stay),
# video_scene_cuts (multimodal_features, image_phash64 stay),
# dedup_incremental_new_vs_old (dedup_exact, dedup_minhash_lsh stay),
# embedding_neardup (ann_cosine_topk stays), j2_tfidf_exact_pairs
# (j2_anomaly_pairs stays), q17_avg_subquery (q1, q3 stay),
# viterbi_em_train (duplicate_maximal_spans stays).
for _old, _new in [
    ("hybrid_rrf_fusion", "quality_classifier_poscontrol_step1"),
    ("ivfpq_delete_serve", "quality_classifier_poscontrol_step2"),
    ("ivfpq_upsert_serve", "quality_classifier_poscontrol_step3"),
    ("video_scene_cuts", "cramer_probe"),
    ("dedup_incremental_new_vs_old", "cramer_probe_decimal128"),
    ("embedding_neardup", "sigmoid_grid_probe"),
    ("j2_tfidf_exact_pairs", "graph_ann_ivf_build"),
    ("q17_avg_subquery", "r25_stream_graph_insert"),
    # the r14 build==flat equivalence pin (task #4's done criterion;
    # replaces the r13 go/no-go audit, whose decision is executed)
    ("ivfpq_train_gain", "graph_ann_build_flat_equiv"),
    # r14 in-round: graph-index DELETE repair + its streaming twin
    # (complete the graph lifecycle; the displaced entries' families
    # keep 3 ivfpq pins / the multimodal_features pin respectively)
    ("ivfpq_recall_at5", "graph_ann_delete_repair"),
    ("image_phash64_neardup", "r26_stream_graph_delete"),
]:
    _SPOTLIGHT[_SPOTLIGHT.index(_old)] = _new

# r15 swaps (VERDICT r14 tasks #1/#2/#3): (a) the two DECISIVE
# poscontrol probes — the per-doc scored eval slice and the
# all-VARCHAR final-row re-emission — pin next to the 4-round-red
# original (they displace the three per-step entries, whose
# information the driver-green trajectory already carries); (b) the
# float-purge flagships get driver attestation on previously-latent
# round(division) queries: conformal (the r14 red, now integer ppm),
# stats_via_sums / association_rules / woe_information_value (the
# three structurally-different conversions: isqrt+corr kernel stack,
# limb scaled_div ranking key, signed all-integer ln products);
# (c) per VERDICT #3 the displaced ivfpq_train_gain returns.
# Displaced (all driver-green in r14, families still represented):
# step1/2/3 (trajectory + docx + calibration stay),
# cramer_probe_decimal128 + sigmoid_grid_probe (cramer_probe stays —
# both probes proved their point driver-green in r14),
# graph_ann_build_flat_equiv (equivalence pinned r14; 4 graph/stream
# graph entries stay), viterbi_em_train (duplicate_maximal_spans
# stays; also the single most expensive spotlight entry — VERDICT #5
# gate-cost watch).
for _old, _new in [
    ("quality_classifier_poscontrol_step1",
     "quality_classifier_poscontrol_predx"),
    ("quality_classifier_poscontrol_step2",
     "quality_classifier_poscontrol_varchar"),
    ("quality_classifier_poscontrol_step3",
     "conformal_prediction_interval"),
    ("cramer_probe_decimal128", "stats_via_sums"),
    ("sigmoid_grid_probe", "association_rules"),
    ("graph_ann_build_flat_equiv", "woe_information_value"),
    ("viterbi_em_train", "ivfpq_train_gain"),
]:
    _SPOTLIGHT[_SPOTLIGHT.index(_old)] = _new


# Rotation slots (ADVICE r10): the tail of the 50-entry driver window
# is NOT hand-curated — it is a deterministic per-round draw from the
# non-spotlight registry, so entries outside the curated head
# periodically get driver coverage instead of being permanently
# invisible to the driver gate. Bump the salt each round to rotate.
_ROTATION_SLOTS = 4
_ROTATION_SALT = "r16"


def _spotlight_first(d: dict) -> dict:
    missing = [n for n in _SPOTLIGHT if n not in d]
    if missing:  # fail loudly on drift (ADVICE r10) — a renamed entry
        # must be renamed here too, never silently shrink the window
        raise AssertionError(
            f"_SPOTLIGHT names missing from registry: {missing}"
        )
    rest = [n for n in d if n not in _SPOTLIGHT]
    rotated = sorted(
        rest,
        key=lambda n: hashlib.md5(
            (_ROTATION_SALT + ":" + n).encode()
        ).hexdigest(),
    )[:_ROTATION_SLOTS]
    out = {n: d[n] for n in (*_SPOTLIGHT, *rotated) if n in d}
    out.update((n, v) for n, v in d.items() if n not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return _spotlight_first(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return _spotlight_first(_ORACLES)


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
        ivfpq_train_q,
        quality_clf,
        phash64,
        kmeans_train,
        wordpiece_greedy,
        graph5,
        wordpiece,
        dsir,
        hybrid,
        pca,
        interleave,
        graphann,
        video,
    )

    _LOADED = True
