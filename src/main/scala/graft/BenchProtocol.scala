package graft

/** The controlled-protocol per-query minima (SCALE.md's record, in
  * machine-readable form) — the reference [[Bench.noisyOf]] judges a
  * run's ledger-visible rows against: a row beyond 2.5× its minimum
  * (+0.2 s jitter guard) marks the artifact noisy, and since round 19
  * the covered rows' SUM beyond [[Bench.TotalNoisyRatio]]× the covered
  * minima sum does too (the uniform-inflation shape no per-row test can
  * see), so a loaded-window driver bench self-adjudicates instead of
  * waiting for a judge rerun.
  *
  * MAINTENANCE: re-recorded with each round's closing protocol as the
  * MERGE min(previous record, this round's per-query minimum) — a
  * loaded-window protocol must never RAISE a recorded floor (the r19
  * rule; 44 carried rows dipped below their r18 loaded-window records
  * this round). Only rows at or above [[Bench.FastFloor]] matter
  * (sub-floor rows never print their own ledger entry, and both noisy
  * signals skip smaller minima). Rows absent here (new since the last
  * protocol) never trip — absence is "no record yet", not "fast".
  * The round-19 protocol was ANOTHER loaded window (11 runs, ambient
  * loadavg 1.5–5.4 throughout, totals 145–250 s), so the new rows'
  * first records (m3f/m3g/m3h, m5m/m5n/m5o, c6c — plus m5k/m5l, which
  * landed post-protocol in r18) sit above their true quiet floors and
  * the flag is correspondingly conservative until a quiet window
  * re-records them. */
object BenchProtocol {
  /** Per-query protocol minima in seconds, keyed by full registry name
    * (merge of the r18 record with the round-19 11× sf0.1 protocol
    * minima, local[32]). */
  val mins: Map[String, Double] = Map(
    "a3_batch_outcomes" -> 0.27,
    "a4_count_per_type" -> 0.3,
    "a5b_distinct_types_by_owner" -> 0.25,
    "a5d_approx_distinct" -> 0.37,
    "c1_curated_corpus" -> 4.98,
    "c2_incremental_admission" -> 0.53,
    "c2b_semantic_admission" -> 0.42,
    "c3_leakage_safe_split" -> 2.61,
    "c4_curate_and_split" -> 4.49,
    "c5_quality_ensemble" -> 0.83,
    "c5b_quality_ensemble_bigram" -> 1.38,
    "c6_multimodal_admission" -> 0.64,
    "c6b_trimodal_admission" -> 0.57,
    "c6c_shift_admission" -> 1.05,
    "d10b_bloom_screen_sharded" -> 0.43,
    "d1_exact_dedup" -> 0.27,
    "d2x_minhash_xxh64" -> 1.0,
    "d3b_simhash_neardups" -> 0.8,
    "d4_ngram_jaccard" -> 2.09,
    "d5_incremental_dedup" -> 1.25,
    "d6_dedup_groups" -> 1.06,
    "d6b_quality_keepers" -> 0.29,
    "d7_incremental_groups" -> 4.23,
    "d8_decontamination" -> 0.41,
    "d8b_semantic_decontamination" -> 0.79,
    "d9_span_dedup" -> 1.55,
    "d9b_incremental_spans" -> 1.86,
    "d9c_span_scrub" -> 0.26,
    "e10_exact_vector_dedup" -> 0.25,
    "e11_pq_topk" -> 1.83,
    "e11b_pq_served_topk" -> 0.66,
    "e12_ivfadc_topk" -> 0.47,
    "e13_filtered_topk" -> 0.27,
    "e13b_filtered_ivf_topk" -> 0.26,
    "e13c_filtered_ivf_adaptive" -> 0.43,
    "e2_ann_lsh_topk" -> 0.25,
    "e3_cosine_neardups" -> 0.44,
    "e4_ivf_topk" -> 0.47,
    "e6_knn_classify" -> 0.49,
    "e7_semantic_dedup" -> 2.41,
    "e8_cluster_sample" -> 0.25,
    "e9_ivf_drift" -> 0.25,
    "j1_dynfield_parent_join" -> 0.34,
    "j1b_bucketed_parent_join" -> 0.6,
    "j2_children_resolver" -> 0.33,
    "j2b_bucketed_children" -> 0.31,
    "j3_enrichment" -> 0.29,
    "j5_cross_source_dedup" -> 0.55,
    "k4_metrics" -> 0.47,
    "m1_media_meta" -> 1.91,
    "m1b_media_meta_from_table" -> 0.48,
    "m2_resize" -> 1.96,
    "m2b_thumb_hashes" -> 1.14,
    "m3_frame_sample" -> 1.2,
    "m3b_frame_near_dups" -> 1.69,
    "m3c_frame_near_dups_served" -> 1.1,
    "m3d_frame_dihedral_near_dups" -> 0.44,
    "m3e_frame_dihedral_served_maintained" -> 0.77,
    "m3f_frame_shift_near_dups" -> 2.46,
    "m3g_frame_shift_served" -> 2.71,
    "m3h_frame_shift_maintained" -> 1.28,
    "m4b_image_dup_groups" -> 0.37,
    "m4c_image_near_dups" -> 0.85,
    "m4d_image_near_dups_served" -> 1.92,
    "m4e_image_dhash" -> 1.13,
    "m4f_image_dhash_near_dups" -> 0.52,
    "m4g_image_lens_union" -> 1.0,
    "m4h_image_lens_union_served" -> 2.06,
    "m4i_image_lens_union_maintained" -> 2.01,
    "m4l_image_dihedral_near_dups" -> 0.52,
    "m4n_image_dihedral_served_maintained" -> 0.86,
    "m5_audio_meta" -> 0.69,
    "m5c_audio_dups_served" -> 0.32,
    "m5d_audio_near_dups" -> 0.64,
    "m5e_audio_near_dups_served" -> 0.9,
    "m5f_audio_near_dups_maintained" -> 0.92,
    "m5g_audio_meta_from_table" -> 0.55,
    "m5h_audio_shift_near_dups" -> 1.34,
    "m5i_audio_shift_served" -> 1.44,
    "m5j_audio_shift_maintained" -> 1.02,
    "m5k_audio_reversal_phash" -> 0.63,
    "m5l_audio_reversal_near_dups" -> 1.36,
    "m5m_audio_revwin_near_dups" -> 1.68,
    "m5n_audio_revwin_served" -> 2.23,
    "m5o_audio_revwin_maintained" -> 1.61,
    "m6_media_card" -> 2.07,
    "m7_video_meta" -> 0.95,
    "m7b_video_near_dups" -> 1.5,
    "m7c_video_near_dups_served" -> 0.77,
    "m7d_video_dup_groups" -> 0.26,
    "m7e_video_dihedral_near_dups" -> 0.34,
    "m7f_video_dihedral_served_maintained" -> 0.52,
    "o3_count_by_owner_kind" -> 0.25,
    "p7_dynfield_parents" -> 0.29,
    "p9_deletion_split" -> 0.37,
    "q1_agg" -> 0.29,
    "s2_range_scan_skip" -> 0.51,
    "s4_cursor_walk" -> 0.26,
    "t13_vocabulary" -> 0.25,
    "t15_oov_stats" -> 0.26,
    "t17_quantile_gate" -> 0.84,
    "t18_bpe_merges" -> 1.62,
    "t18c_bpe_subwords" -> 0.59,
    "t18e_bpe_sample_trained" -> 0.56,
    "t19_unigram_nll" -> 0.46,
    "t19b_unigram_nll_served" -> 0.37,
    "t19c_bigram_nll" -> 1.24,
    "t19d_bigram_nll_served" -> 0.52,
    "t21_winnow_fingerprints" -> 0.4,
    "t21b_winnow_similarity" -> 1.14,
    "t21c_winnow_screen" -> 1.44,
    "t21d_winnow_screen_served" -> 1.0,
    "t4_fingerprints" -> 0.27,
    "t5_quality_filter" -> 0.26,
    "t7_budget_pack" -> 0.29,
    "t7b_budget_pack_scalable" -> 0.92,
    "t8_lang_mix" -> 0.35,
    "t9b_seq_pack_scalable" -> 0.47,
    "u1_union_routes" -> 0.26,
    "u2_descending_ranges" -> 0.26,
    "u2b_ranges_with_stop" -> 0.31,
    "u3_range_anti_join" -> 0.37,
    "w1_hourly_counts" -> 0.31,
    "w2_sliding_counts" -> 0.3,
    "w3_session_counts" -> 0.28)
}
