package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the EXACT gate-name set the driver checks: round 6 silently
  * lost three green gates when a registry edit dropped them from the
  * list and nothing turned red. Any rename/removal must be a
  * DELIBERATE edit here too; additions only grow the set (asserted
  * superset + no-duplicate-names). No SparkSession needed — this is a
  * registry shape check, so it runs even where testdata is absent.
  */
class GateRegistrySpec extends AnyFunSuite {

  // the round-8 driver list (CORRECTNESS_r08.json keys, 176 names)
  // plus the round-9 additions — 180 total
  private val pinned: Set[String] = Set(
    "a10_duration", "a11_rollup", "a12_guarded_duration", "a1_groupby_agg",
    "a2_filtered_agg", "a3_ratio_nullif", "a4_pivot", "a5_count_distinct",
    "a6_time_bucket", "a7_minmax_freshness", "a8_having", "a9_case_bucket",
    "d1_dedup_latest", "d2_dedup_maxby", "d4_distinct", "d6_golden_record",
    "d7_scd2_intervals", "e1_explode_tokens", "e6_explode_keep_latest", "j10_bucketed_join",
    "j11_salted_skew_join", "j1_funnel_join", "j3_left_enrich", "j4_computed_key_join",
    "j5_semi_join", "j6_anti_join", "j7_range_join_bucketed", "j8_asof_join",
    "j9_join_view_delta", "k5_null_filter", "k6_entry_key", "o1_order_by",
    "o3_topn", "p1_json_extract", "p2_coalesce_fallback", "p4_first_match",
    "p9_concat_trim", "s2_pushdown_filter", "s4_deleted_filter", "t01_dedup_exact",
    "t02_fingerprint", "t03_token_stats", "t04_quality_score", "t05_langid",
    "t06_shingle_stats", "t07_minhash_bands", "t08_minhash_pairs", "t09_simhash",
    "t100_containment_pairs", "t101_containment_dedup", "t102_token_windows", "t103_containment_incremental",
    "t104_mixture_epochs", "t105_wht_phash", "t106_pack_spans", "t107_bpe_roundtrip",
    "t108_change_feed", "t109_image_neardup_twosig", "t10_ann_cosine_topk", "t110_kmv_intersect",
    "t111_html_extract", "t112_pca_moments", "t113_url_canonical", "t114_psi_drift",
    "t115_y4m_frames", "t116_pagerank", "t117_bm25_topk", "t118_rrf_fusion",
    "t119_interchange_roundtrip", "t11_ann_lsh_buckets", "t120_heavy_hitters", "t121_mad_outliers",
    "t122_lexical_diversity", "t123_alaw_audio", "t124_histogram_quantile", "t12_ngram_jaccard",
    // round-9 additions
    "t125_containment_capped", "t126_ivfpq_search_refined",
    "t127_mp3_frames", "t128_mp3_xing",
    // round-10 additions
    "t129_containment_df_asset", "t130_id3v2_text",
    // round-12 additions
    "t142_mpeg_video", "t143_ogg_pages", "t144_containment_pairs_path",
    "t145_delta_import", "t146_delta_mirror",
    "t131_vorbis_comment", "t132_riff_info",
    "t13_embedding_stats", "t14_embedding_neardup", "t15_ann_ivf_cells", "t16_neardup_survivors",
    "t17_ann_ivf_search", "t18_simhash_survivors", "t19_curate_survivors", "t20_embedding_dedup",
    "t21_curate_stats", "t22_rolling_fingerprint", "t23_ivf_train", "t24_neardup_components",
    "t25_simhash_paired_pairs", "t26_simhash_incremental", "t27_minhash_incremental", "t28_pq_encode",
    "t29_pq_search", "t30_hash_sample", "t31_tfidf_topk", "t32_ngram_spans",
    "t33_pack_shards", "t34_ivfpq_search", "t35_ivfpq_residual", "t36_contamination",
    "t37_clean_text", "t38_token_budget_sample", "t39_curate_to_shards", "t40_sketch_distinct",
    "t41_sketch_quantile", "t42_embedding_contamination", "t43_embedding_contamination_ivf", "t44_temperature_mixture",
    "t45_cdc_chunks", "t46_chunk_dup_stats", "t47_cdc_rolling", "t48_contamination_report",
    "t49_pack_sequences", "t50_char_lm_quality", "t51_repetition_signals", "t52_pii_scrub",
    "t53_remove_dup_spans", "t54_semantic_dedup", "t55_dsir_weights", "t56_semantic_incremental",
    "t57_leakage_safe_split", "t58_source_cap", "t59_media_features", "t60_canonical_survivor",
    "t61_video_frames", "t62_source_cap_incremental", "t63_mjpeg_frames", "t64_audio_windows",
    "t65_snapshot_export", "t66_ivfpq_append", "t67_audio_spectral", "t68_export_partition_prune",
    "t69_ivfpq_retrain", "t70_ivf_cell_stats", "t71_deterministic_shuffle", "t72_image_dhash",
    "t73_image_neardup", "t74_g711_audio", "t75_gif_frames", "t76_audio_fingerprint",
    "t77_audio_neardup", "t78_image_neardup_incremental", "t79_scene_changes", "t80_video_neardup",
    "t81_cluster_balanced_sample", "t82_adpcm_audio", "t83_media_curation", "t84_webdataset_shards",
    "t85_tar_roundtrip", "t86_flac_audio", "t87_optimize_zorder", "t88_countmin_freq",
    "t89_paragraph_dedup", "t90_snapshot_diff", "t91_stats_pruned_scan", "t92_cdc_apply",
    "t93_paragraph_dedup_incremental", "t94_weighted_sample", "t95_edit_distance_pairs", "t96_schema_evolution",
    "t97_quantized_topk", "t98_contamination_bloom", "t99_quantize_clip_drift", "u1_union_counts",
    "v2_dup_scan", "v3_uniqueness_delta", "v5_date_anomaly", "v9_gap_analysis",
    "w1_window_rank", "w2_lag_sessionize", "w3_gapfill_locf", "w4_hop_window",
    "w5_ntile", "w6_running_sum", "w7_session_stats", "w8_percent_rank")

  test("every pinned gate name is still registered") {
    val names = SparkEntry.allDefs.map(_.name)
    val missing = pinned -- names.toSet
    assert(missing.isEmpty,
      s"gates vanished from the registry: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("registry has no duplicate names (later dup would shadow in the Map)") {
    val names = SparkEntry.allDefs.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate gate names: ${dups.mkString(", ")}")
  }

  test("every gate has an oracle (rows-only checks are a weaker gate)") {
    val noOracle = SparkEntry.allDefs.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle.isEmpty,
      s"gates without DuckDB oracle: ${noOracle.mkString(", ")}")
  }
}
