package graft

/** The controlled-protocol per-query minima (SCALE.md's record, in
  * machine-readable form) — the reference [[Bench.noisyOf]] judges a
  * run's ledger-visible rows against: a row beyond 2.5× its minimum
  * (+0.2 s jitter guard) marks the artifact noisy, so a loaded-window
  * driver bench self-adjudicates instead of waiting for a judge rerun
  * (the r17 artifact carried t19c at 4.67 s vs the 1.17 s quiet min
  * under loadavg 2.69, below the old fixed load threshold).
  *
  * MAINTENANCE: re-recorded with each round's closing protocol (the
  * SCALE.md discipline — min over the round's sf0.1 protocol runs);
  * only rows at or above [[Bench.FastFloor]] matter (sub-floor rows
  * never print their own ledger entry, and the 2.5× test skips smaller
  * minima anyway). Rows absent here (new since the last protocol)
  * never trip the flag — absence is "no record yet", not "fast".
  * The round-18 record is a LOADED-window protocol (ambient loadavg
  * 2.4–3.8 across all seven runs — SCALE.md), so these minima sit
  * above the true quiet floor for the heavy rows; the 2.5× flag is
  * correspondingly conservative until a quieter protocol re-records
  * them. */
object BenchProtocol {
  /** Per-query protocol minima in seconds, keyed by full registry name
    * (min over the round-18 7× sf0.1 protocol, local[32]). */
  val mins: Map[String, Double] = Map(
    "a3_batch_outcomes" -> 0.28,
    "a4_count_per_type" -> 0.33,
    "a5d_approx_distinct" -> 0.41,
    "c1_curated_corpus" -> 5.35,
    "c2_incremental_admission" -> 0.53,
    "c2b_semantic_admission" -> 0.46,
    "c3_leakage_safe_split" -> 2.61,
    "c4_curate_and_split" -> 4.49,
    "c5_quality_ensemble" -> 0.83,
    "c5b_quality_ensemble_bigram" -> 1.49,
    "c6_multimodal_admission" -> 0.64,
    "c6b_trimodal_admission" -> 0.57,
    "d10b_bloom_screen_sharded" -> 0.43,
    "d1_exact_dedup" -> 0.27,
    "d2x_minhash_xxh64" -> 1.08,
    "d3b_simhash_neardups" -> 0.8,
    "d4_ngram_jaccard" -> 2.09,
    "d5_incremental_dedup" -> 1.25,
    "d6_dedup_groups" -> 1.06,
    "d6b_quality_keepers" -> 0.29,
    "d7_incremental_groups" -> 4.92,
    "d8_decontamination" -> 0.48,
    "d8b_semantic_decontamination" -> 0.85,
    "d9_span_dedup" -> 1.81,
    "d9b_incremental_spans" -> 1.86,
    "e11_pq_topk" -> 1.93,
    "e11b_pq_served_topk" -> 0.66,
    "e12_ivfadc_topk" -> 0.48,
    "e13_filtered_topk" -> 0.29,
    "e13b_filtered_ivf_topk" -> 0.26,
    "e13c_filtered_ivf_adaptive" -> 0.46,
    "e2_ann_lsh_topk" -> 0.31,
    "e3_cosine_neardups" -> 0.44,
    "e4_ivf_topk" -> 0.57,
    "e6_knn_classify" -> 0.49,
    "e7_semantic_dedup" -> 2.85,
    "e8_cluster_sample" -> 0.25,
    "e9_ivf_drift" -> 0.25,
    "j1_dynfield_parent_join" -> 0.39,
    "j1b_bucketed_parent_join" -> 0.62,
    "j2_children_resolver" -> 0.34,
    "j2b_bucketed_children" -> 0.32,
    "j3_enrichment" -> 0.25,
    "j5_cross_source_dedup" -> 0.57,
    "k4_metrics" -> 0.51,
    "m1_media_meta" -> 2.13,
    "m1b_media_meta_from_table" -> 0.48,
    "m2_resize" -> 1.99,
    "m2b_thumb_hashes" -> 1.27,
    "m3_frame_sample" -> 1.31,
    "m3b_frame_near_dups" -> 2.01,
    "m3c_frame_near_dups_served" -> 1.22,
    "m3d_frame_dihedral_near_dups" -> 0.51,
    "m4b_image_dup_groups" -> 0.51,
    "m4c_image_near_dups" -> 0.85,
    "m4d_image_near_dups_served" -> 1.92,
    "m4e_image_dhash" -> 1.14,
    "m4f_image_dhash_near_dups" -> 0.52,
    "m4g_image_lens_union" -> 1.0,
    "m4h_image_lens_union_served" -> 2.06,
    "m4i_image_lens_union_maintained" -> 2.24,
    "m4l_image_dihedral_near_dups" -> 0.65,
    "m4m_image_dihedral_dup_groups" -> 0.25,
    "m4n_image_dihedral_served_maintained" -> 1.05,
    "m5_audio_meta" -> 0.83,
    "m5c_audio_dups_served" -> 0.39,
    "m5d_audio_near_dups" -> 0.73,
    "m5e_audio_near_dups_served" -> 1.12,
    "m5f_audio_near_dups_maintained" -> 1.12,
    "m5g_audio_meta_from_table" -> 0.6,
    "m5h_audio_shift_near_dups" -> 1.53,
    "m6_media_card" -> 2.08,
    "m7_video_meta" -> 1.02,
    "m7b_video_near_dups" -> 1.57,
    "m7c_video_near_dups_served" -> 0.89,
    "m7d_video_dup_groups" -> 0.25,
    "m7e_video_dihedral_near_dups" -> 0.47,
    "m7f_video_dihedral_served_maintained" -> 0.69,
    "o3_count_by_owner_kind" -> 0.26,
    "p7_dynfield_parents" -> 0.38,
    "p9_deletion_split" -> 0.45,
    "q1_agg" -> 0.38,
    "s2_range_scan_skip" -> 0.63,
    "s4_cursor_walk" -> 0.26,
    "t13_vocabulary" -> 0.25,
    "t17_quantile_gate" -> 0.94,
    "t18_bpe_merges" -> 1.89,
    "t18c_bpe_subwords" -> 0.69,
    "t18e_bpe_sample_trained" -> 0.64,
    "t19_unigram_nll" -> 0.54,
    "t19b_unigram_nll_served" -> 0.38,
    "t19c_bigram_nll" -> 1.27,
    "t19d_bigram_nll_served" -> 0.55,
    "t21_winnow_fingerprints" -> 0.4,
    "t21b_winnow_similarity" -> 1.19,
    "t21c_winnow_screen" -> 1.61,
    "t21d_winnow_screen_served" -> 1.0,
    "t4_fingerprints" -> 0.27,
    "t7_budget_pack" -> 0.29,
    "t7b_budget_pack_scalable" -> 0.92,
    "t8_lang_mix" -> 0.35,
    "t9b_seq_pack_scalable" -> 0.47,
    "u2b_ranges_with_stop" -> 0.34,
    "u3_range_anti_join" -> 0.43,
    "w1_hourly_counts" -> 0.32,
    "w2_sliding_counts" -> 0.3,
    "w3_session_counts" -> 0.28)
}
