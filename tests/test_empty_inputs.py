"""Empty-corpus robustness: every documents/embeddings operator must yield
an empty (or well-defined aggregate) result on a zero-row corpus — the
production shape of an empty ingest partition or an over-narrow date filter
— never an exception (sequence() on empty arrays, aggregates over no rows,
broadcast of an empty vocab are all edge paths worth pinning)."""

from __future__ import annotations

import os

import pytest

from sales_telegram_bot_data_pipeline_spark.queries import REGISTRY
from sales_telegram_bot_data_pipeline_spark.sources.tables import load_table

from conftest import SF_SMOKE

EMPTY_OK_ZERO = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_jaccard_stopshingle",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "simhash_neardup",
    "dedup_connected_components",
    "dedup_keep_canonical",
    "semantic_dedup",
    "kmeans_lloyd",
    "knn_cosine_bruteforce",
    "knn_cosine_lsh_bucketed",
    "knn_cosine_ivf",
    "embedding_cosine_neardup",
    "document_chunking",
    "sequence_packing",
    "vocab_coverage_score",
    "stratified_sample",
    "contamination_overlap",
    "quality_repetition",
    "pii_redaction",
    "bm25_topk_search",
    "word_segmentation",
    "lang_id_heuristic",
    "text_quality_stats",
    "token_count",
    "doc_fingerprint",
    # round-4 additions
    "dedup_duplicate_spans",
    "knn_cosine_sq8",
    "bigram_lm_score",
    "dsir_importance",
    "quality_logreg_score",
    "token_budget_selection",
    "standardize_embeddings",
    "dedup_incremental_lsh",
    "source_cap_sample",
    "symspell_name_correction",
    "lexical_diversity",
    "mixture_weights_alpha",
    "triangle_count_neardup",
    "split_balance_audit",
    "content_defined_chunks",
    "video_frame_sample",
    "ngram_novelty",
    "compression_ratio_quality",
    # round-5 additions (documents/embeddings-only inputs, zero-row output)
    "winnowing_fingerprint_density",
    "winnowing_doc_matches",
    "dedup_cluster_size_histogram",
    "label_propagation_communities",
    "countmin_heavy_hitters",
    "weighted_sample_aes",
    "snapshot_diff_audit",
    "incremental_agg_maintenance",
    "blocklist_scan",
    "collocation_pmi",
    "audio_window_features",
    "image_phash_dedup",
    "embedding_pca_project",
    "bitext_margin_mining",
    "dedup_containment",
    "dedup_keep_best_quality",
    "split_leakage_audit",
    # round-6 additions
    "tfidf_top_terms",
    "dedup_cluster_cap",
    "leakage_safe_split",
    "quality_rank_blend",
    "boilerplate_segment_removal",
    "dedup_prefix_filter_join",
    "source_quality_ranksum",
    "cluster_balanced_sample",
    "score_decile_lift",
    # (lsh_band_tuning_audit excluded: it emits its 4 config rows with
    # zero counts on an empty corpus — a well-defined aggregate, pinned in
    # test_round6b_ops.py instead)
    # round-6 second wave
    "misra_gries_topk",
    "graph_bfs_hops",
    "mmr_diversified_topk",
    "kmeans_separation_audit",
    # round-7 continuation (documents/embeddings inputs, zero-row output;
    # scalar-shaped ops like anova/sq8-audit emit their one NULL-aggregate
    # row on empty input and are excluded like lsh_band_tuning_audit)
    "roc_auc_quality_score",
    "welch_ttest_sources",
    "skyline_pareto_docs",
    "padding_waste_audit",
    "stratified_kfold_plan",
    "ppmi_window_cooccurrence",
    "langid_eval_confusion",
    "vocab_novelty_by_source",
    "vocab_coverage_curve",
    "apss_cosine_join",
    "clustering_coefficient_neardup",
    "psi_split_drift",
    "neyman_allocated_sample",
    # round-8 additions: ewma/seasonal/runs/covisitation/key-gap are
    # orders/events-grain (outside this documents/embeddings fixture) and
    # carry explicit empty-input guards in code;
    # jl_projection_distortion_audit is scalar-shaped (one NULL-aggregate
    # row on empty input) and excluded like sq8_quantization_error_audit;
    # round-9: inference_http_echo is aggregate-shaped (its 2 summary
    # rows survive an empty part table with zero counts) and excluded
    # like the other scalar-shaped ops
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """A scale-factor dir whose documents/embeddings tables have the real
    schemas but zero rows."""
    d = str(tmp_path_factory.mktemp("sf_empty"))
    # part: symspell builds its vocabulary from documents UNION part names
    for t in ("documents", "embeddings", "part"):
        load_table(spark, SF_SMOKE, t).limit(0).write.parquet(os.path.join(d, f"{t}.parquet"))
    return d


@pytest.mark.parametrize("name", EMPTY_OK_ZERO)
def test_empty_corpus_yields_zero_rows(spark, empty_sf_dir, name):
    assert REGISTRY[name].fn(spark, empty_sf_dir).count() == 0
