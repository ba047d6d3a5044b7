package graft.ext

import graft.{SparkEntry, SparkSuite}

/** Plan-shape pins for the media family: `decon_media` must keep its
  * TWO-BroadcastHashJoin shape — the single OR-condition join it
  * replaced planned as a BroadcastNestedLoopJoin that never finished
  * the 100× fixture — and no media query may carry an unbounded
  * nested-loop join or cartesian product. The only
  * BroadcastNestedLoopJoin tolerated is each pair report's ONE-ROW
  * cap-telemetry cross join ([[MediaDedup]]'s `n_capped_buckets`),
  * whose build side is a single aggregate row by construction.
  * (The streamed ingest's tier joins share the same equi-key
  * discipline — pinned behaviorally by MediaIngestSpec; the store
  * serves' no-decode-kernel pin lives in MediaFeaturesSpec.)
  */
class MediaPlanSpec extends SparkSuite {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  private def occurrences(plan: String, op: String): Int =
    op.r.findAllMatchIn(plan).size

  test("decon_media: two broadcast HASH joins, never the OR-join BNLJ") {
    val p = planOf("decon_media")
    assert(occurrences(p, "BroadcastHashJoin") == 2,
      s"decon_media's two-tier hash-join shape changed:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"decon_media reintroduced a nested-loop/cartesian join:\n$p")
  }

  test("media family: no unbounded nested-loop join in any plan") {
    val allowedBnlj = Map( // the 1-row telemetry cross join only
      "dedup_image_phash" -> 1, "dedup_audio_fp" -> 1, "dedup_video_fp" -> 1,
      "dedup_video_percep" -> 1, "dedup_audio_percep" -> 1,
      "dedup_image_groups" -> 1)
    val family = Seq("dedup_image_phash", "dedup_apply_image",
      "dedup_image_groups", "dedup_audio_fp", "dedup_video_fp",
      "dedup_video_percep", "dedup_audio_percep",
      "decon_media_apply", "decon_media_av", "mm_quality_gate",
      "mm_feature_store", "mm_hist_neighbors", "video_shot_cuts",
      "corpus_release_mm")
    for (q <- family) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q grew a cartesian:\n$p")
      assert(occurrences(p, "BroadcastNestedLoopJoin") <=
        allowedBnlj.getOrElse(q, 0),
        s"$q grew a nested-loop join beyond the 1-row telemetry cross:\n$p")
    }
  }
}
