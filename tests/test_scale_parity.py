"""Scale-parity regression net: the two queries whose cross-engine
determinism broke ONLY at sf0.1 (ROUND(double, n)'s decimal-string path
differs between engines; fixed with FLOOR integer-unit quantization) are
re-checked at sf0.1 — the driver gate runs sf0.01 and would not see a
recurrence of this class."""

from __future__ import annotations

import pytest

import sales_telegram_bot_data_pipeline_spark.queries  # noqa: F401  (populate REGISTRY)
from sales_telegram_bot_data_pipeline_spark.oracle import compare_query, duckdb_connection

SF_BENCH = "/root/testdata/sf0.1"


@pytest.mark.parametrize(
    "name",
    [
        "pagerank_neardup_graph",
        "bigram_lm_score",
        "dsir_importance",
        # round-5 transcendental/quantized additions: LN through libm
        # (weighted_sample_aes, zipf_fit_audit) and hash-order-sensitive
        # selection (winnowing) — exactly the classes that only break at
        # scale, so they join the sf0.1 net
        "weighted_sample_aes",
        "zipf_fit_audit",
        "winnowing_doc_matches",
        "label_propagation_communities",
        # timezone-free epoch + ANSI WITHIN GROUP quantiles — the two
        # engine-divergence classes this query dodged, netted at sf0.1
        "user_cadence_profile",
        # top-k margin arithmetic (integer products + one double division)
        "bitext_margin_mining",
        # round-5 audits with integer-exact contracts: cross-sf drift
        # detection is free, so they ride the sf0.1 net (round-5 verdict
        # optional-hardening item)
        "snapshot_diff_audit",
        "incremental_agg_maintenance",
        # the de-NTILEd equi-depth histogram: distributed exact rank vs
        # the oracle's global NTILE — the class of divergence (rank
        # off-by-one at partition boundaries) only shows with many
        # populated range partitions, i.e. at scale
        "price_histogram_equidepth",
        # round-6 rank-based queries: same range-rank boundary class
        "quality_rank_blend",
        "source_quality_ranksum",
        # selection-order-sensitive candidate generation (per-engine hash
        # values order the prefix; only the lossless verify guarantees
        # parity — candidate diversity grows with corpus size)
        "dedup_prefix_filter_join",
        # per-config candidate counts + recall division at scale
        "lsh_band_tuning_audit",
        # bucketed-KS CDF division + size-aware critical value
        "split_distribution_drift",
        # Lloyd assignment at 10x corpus: integer-unit mean parity
        "cluster_balanced_sample",
        # range-rank bucket-of-rank boundaries again (decile cut points)
        "score_decile_lift",
        # hash-sampled synopsis + CMS at 10x key cardinality
        "join_cardinality_sketch_audit",
        # bit_or word aggregation + md5 positions at 10x probe keys
        "bloom_semijoin_prune_audit",
        # interleaved-bit bucket arithmetic over 10x rows
        "zorder_clustering_stats",
        # recall/scan divisions over 10x lists
        "ivf_nprobe_tuning_audit",
        # per-row libm EXP quantized to integer units pre-sum — exactly
        # the engine-divergence class this net exists for
        "freshness_decay_profile",
        # round-6 second wave: range-rank boundaries (quintiles / Gini /
        # tie-corrected average ranks) — the rank-at-partition-boundary
        # class only populated at scale
        "rfm_segmentation",
        "spearman_rank_correlation",
        "revenue_concentration_audit",
        # DECIMAL(38,0)-exact sums feeding double ratios at 10x mass
        "revenue_trend_ols",
        "time_weighted_average_value",
        # round-10: the float-moment-cancellation class that DID break at
        # sf0.1 during development (fixed with n-scaled exact decimals) —
        # permanent net membership
        "granger_lag_causality",
        # per-row x*ln(x) over the data-scale fact table, nano-quantized
        # pre-sum — the libm class at 10x rows
        "theil_inequality_decomposition",
        # range-rank file-boundary class across THREE layouts at 10x rows
        "hilbert_layout_audit",
        # libm EXP inside the logreg arm of the kappa join at 10x docs
        "quality_gate_agreement_kappa",
        # MG summaries evict under real pressure only at scale; output
        # still must equal the exact top-k (candidate-superset guarantee)
        "misra_gries_topk",
        # float dot-product sums + rank ties at 10x corpus
        "mips_topk_audit",
        # per-stratum variance ratios (DECIMAL moments -> double shares)
        "neyman_allocation_plan",
        # libm EXP (sigmoid) bin boundaries at 10x docs
        "quality_score_calibration",
        # round-7 additions whose divergence class only populates at scale:
        # exact interpolated median over 10x-mass weekly cents (pair join +
        # percentile vs quantile_cont interpolation arithmetic)
        "theilsen_trend_robust",
        # TVD double sums over a 10x-customer group grid
        "t_closeness_audit",
        # rolling integer-sum variance -> sqrt/z at 10x daily counts
        "control_chart_anomalies",
        # micro-unit credit quantization with real multi-touch journeys
        # (sf0.001 has almost none)
        "multitouch_attribution_credit",
        # MAX_BY weight ties across 10x docs (60-bit md5 weights)
        "rendezvous_shard_stability",
        # runtime-pruned fact scan at 10x partitions/files
        "dynamic_partition_pruned_join",
        # round-8 rotation candidates enter the net BEFORE entering the
        # driver window (round-7 verdict task 5); each name's sf0.1-only
        # divergence class:
        # integer milli-unit tf-idf weights + libm LN floor-quantization
        # at 10x vocabulary (threshold-edge pairs)
        "apss_cosine_join",
        # midrank DECIMAL numerator over 10x distinct score values
        "roc_auc_quality_score",
        # lower-weighted-median selection rule at 10x weight mass
        "weighted_median_by_flag",
        # prefix-sum closed form + one-time sigma floor at 10x weeks
        "cusum_change_detection",
        # bucketed write + zero-Exchange join at 10x rows per bucket
        "bucketed_join_colocated",
        # int8 code cosine vs float cosine error at 10x candidate pairs
        "sq8_quantization_error_audit",
        # nano-unit LN survival prefix products over 10x risk sets
        "kaplan_meier_repurchase",
        # distributed range-prefix-sum day spine at 10x users
        "hll_cumulative_distinct_audit",
        # round-8 additions (round-9 rotation candidates enter the net
        # before any can enter the window); divergence classes:
        # DECIMAL(38,0) shifted-weight sums at 10x weekly mass
        "ewma_dyadic_smoothing",
        # exact-moment double projection at 10x daily mass
        "seasonal_dow_decomposition",
        # integer sign comparisons + rank-adjacency flips at 10x days
        "runs_test_daily_revenue",
        # micro-unit integer distances + per-pair ratio at 10x pairs
        "jl_projection_distortion_audit",
        # distinct-incidence self-join + lift divisions at 10x events
        "covisitation_item_pairs",
        # range-rank adjacency over a 10x key sequence
        "key_gap_audit",
        # exact-integer MAE sums + MASE ratio at 10x daily mass
        "naive_forecast_backtest",
        # TakeOrdered top-word determinism + z-scores at 10x vocabulary
        "stylometric_burrows_delta",
        # per-row nano-nat LN quantization at 10x events (the libm class)
        "behavioral_entropy_profile",
        # bounded-coalition rate doubles + literal Shapley weights at 10x
        # users (coalition masks shift composition with scale)
        "shapley_channel_attribution",
        # order-statistic selection boundary + libm EXP (sigmoid scores)
        # at 10x calibration mass
        "conformal_coverage_audit",
        # inverted-index self-join counts at 10x vocabulary
        "source_vocab_overlap",
        # exact per-bin micro-unit moments -> bounded double projection
        # at 10x docs (libm EXP in the sigmoid scores)
        "brier_score_decomposition",
        # DECIMAL(38,0) pair mass + tie corrections at 10x rows
        "kendall_tau_b",
        # round-9 additions (round-10 rotation candidates enter the net
        # before any can enter the window); divergence classes:
        # DECIMAL(38,0) xy moments -> closed-form theta/rho^2 at 10x units
        "cuped_variance_reduction",
        # exact cell sums -> four NULLIF-guarded cell means at 10x orders
        "did_estimator",
        # idiv equi-width binning + minimax interval averages at 10x rows
        "isotonic_calibration_bins",
        # nano-unit floor-div scaling factors at 10x cell mass
        "ipf_raking_weights",
        # range-rank file assignment + idiv grid coords at 10x files
        "zorder_layout_audit",
        # floor-quantized MM ratios at 10x duel mass
        "bradley_terry_priorities",
        # cross-multiplied BIGINT CDF gaps at 10x distinct lengths
        "ks_two_sample_sources",
        # BIGINT daily-count moments -> VMR ratio at 10x days/events
        "overdispersion_audit",
        # DECIMAL(38,0) per-arm moments -> pooled-SD division at 10x units
        "covariate_balance_smd",
        # same moment base as CUPED + literal z arithmetic at 10x units
        "ab_power_mde",
        # round-9 continuation additions; divergence classes:
        # exact-moment Welch z^2 -> Chebyshev p ordering + step-up
        # frontier at 10x docs (rank ties on the p axis)
        "bh_fdr_source_audit",
        # integer discordance cells at 10x docs (pure-count class)
        "mcnemar_gate_disagreement",
        # 60-bit md5 bucket routing over a 10x bigram vocabulary
        "feature_hashing_collision_audit",
        # exact cent sums -> m-estimate division at 10x orders per cell
        "target_encoding_smoothed",
        # counts-of-counts class axis shifts composition at 10x bigram
        # mass (smallest-10 rank guard must stay deterministic)
        "good_turing_smoothing_audit",
        # floor-div threshold grid + conditional excess sums at 10x
        # order mass (exact-cent class)
        "mean_excess_tail_audit",
        # integer split cells -> Gini argmin ordering at 10x docs
        "decision_stump_split_audit",
        # exact-moment shrink factor + O(k) tail at 10x docs per source
        "james_stein_shrinkage",
        # nano-unit integer-division AP terms over a 10x score axis
        # (libm EXP in the sigmoid scores)
        "pr_auc_exact",
        # TakeOrdered top-20 determinism + dyadic weights at 10x parts
        "rbo_ranking_overlap",
        # nano-unit integer-division hazard steps over a 10x duration axis
        "nelson_aalen_hazard",
        # pure integer gate cells at 10x docs
        "cochran_q_gates",
        # dense (duration x bin) grid windows + BIGINT pair masses at 10x
        # cohort (grid rows grow with the day domain)
        "harrell_c_index",
        # exact BIGINT loss grid + integer argmin at 10x order mass
        "quantile_pinball_fit_audit",
        # md5 action routing + integer weight sums at 10x logs
        "snips_offpolicy_eval",
        # BM25 TakeOrdered top-25 determinism + nano-unit DCG terms at
        # 10x corpus (libm LN inside the BM25 scores)
        "ndcg_retrieval_eval",
        # banded pair graph composition + integer degree sums at 10x docs
        "graph_modularity_by_source",
        # exact-unit level aggregates + libm LN regression at 10x lines
        "price_elasticity_ols",
        # DECIMAL(38,0) lag moments -> closed-form t at 10x daily mass
        "adf_stationarity_audit",
        # per-row nano-unit calibration terms at 10x docs (libm EXP in
        # the sigmoid scores)
        "spiegelhalter_calibration_z",
    ],
)
def test_floor_quantized_queries_match_at_sf01(spark, name):
    con = duckdb_connection(SF_BENCH)
    r = compare_query(spark, con, name, SF_BENCH)
    assert r.ok, f"{name} diverged at sf0.1: {r.detail}"


def test_pca_model_invariant_under_input_partitioning_sf01(spark):
    """Oracle-free invariant for the rows-only PCA at sf0.1: the fitted
    model (mean + components) must be BIT-IDENTICAL regardless of how the
    input files are split into partitions — integer-quantized Gram
    partials + DECIMAL reduce make the covariance independent of
    partitioning, and the driver eigensolve is deterministic on identical
    input.  Equality is exact, not approximate."""
    import numpy as np

    from sales_telegram_bot_data_pipeline_spark.operators.similarity import _pca_model

    mu_a, c_a = _pca_model(spark, SF_BENCH)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(256 * 1024))
        mu_b, c_b = _pca_model(spark, SF_BENCH)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    np.testing.assert_array_equal(mu_a, mu_b)
    np.testing.assert_array_equal(c_a, c_b)
