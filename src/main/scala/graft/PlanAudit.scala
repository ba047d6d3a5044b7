package graft

/** Prints formatted physical plans for the plan-shape-critical queries so
  * pushdown/broadcast/window-group-limit regressions are visible.
  * Usage: runMain graft.PlanAudit [sfDir] [queryName...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("s3_p1_scan_project", "j1_enrich_users", "j2_sales_by_segment",
        "a1_genre_kpis", "a3_w1_top_songs", "p9_kpis_one_day", "dedup_minhash_lsh",
        "sim_bruteforce_topk", "sim_ivf_topk", "sim_pq_topk", "sim_ivfpq_topk",
        "range_join_ship_window", "range_join_keyless_interval",
        "doc_sample_stratified", "asof_join_native", "decontaminate",
        "text_vocab_tfidf", "j5_bucketed_join", "l1_metric_lookup_daily",
        "text_repetition", "train_pack", "train_mixture",
        "train_holdout_split", "text_length_floor", "curate_funnel",
        "curate_quality_buckets", "quality_perplexity_bigram",
        "classify_nb_pred", "dsir_select", "search_bm25", "dedup_paragraphs",
        "decontaminate_bloom", "cluster_kmeans_assign", "bpe_encode_stats",
        "dedup_canonical_rank", "corpus_source_overlap",
        "corpus_source_scorecard", "embed_drift_means",
        "classify_lr_pred", "quality_perplexity_kn", "dedup_embed_cosine",
        "dedup_semantic", "dedup_simhash", "dedup_substring_rewrite",
        "a9_kmv_distinct", "a13_retention_cohorts", "a14_event_funnel",
        "dedup_containment", "dedup_apply_containment",
        "text_extract_markup", "train_pack_spans", "audio_decode_stats",
        "decon_semantic", "dedup_containment_incr", "video_decode_stats",
        "video_shot_cuts", "mm_hist_neighbors", "mm_multimodal_profile",
        "stream_media_gate", "decon_media", "dedup_image_phash",
        "dedup_audio_fp", "dedup_video_fp", "dedup_image_groups",
        "corpus_release_mm")
    val spark = GraftSession.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n=================== $n ===================")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
