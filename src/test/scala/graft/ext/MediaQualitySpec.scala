package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Media quality gates ([[MediaQuality]]): each constructed degenerate
  * payload fires exactly its own gate (through a REAL kernel decode of
  * the constructed bytes), healthy modalities stay clean, and the
  * funnel's media stages chain monotonically after the text stages.
  */
class MediaQualitySpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, sfDir)
  private lazy val dir: String = {
    val d = "target/mediaqualityspec/store"
    deleteRecursively(d)
    MediaFeatures.ensure(spark, docs, d)
  }

  private def flagTuples(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "undecodable", "audio_silent", "audio_clipped",
        "video_black", "video_static", "img_dark", "img_bright")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))).toMap

  test("each planted degenerate payload fires exactly its own gate") {
    val flags = flagTuples(MediaQuality.qualityFlags(
      MediaFeatures.decodeMedia(MediaQuality.plantedArrivals(spark))))
    assert(flags(MediaQuality.PlantBase + 1) == ((0L, 1L, 0L, 0L, 0L, 0L, 0L)))
    assert(flags(MediaQuality.PlantBase + 2) == ((0L, 0L, 1L, 0L, 0L, 0L, 0L)))
    // all-zero planes are both black AND static — the one double fire
    assert(flags(MediaQuality.PlantBase + 3) == ((0L, 0L, 0L, 1L, 1L, 0L, 0L)))
    assert(flags(MediaQuality.PlantBase + 4) == ((0L, 0L, 0L, 0L, 1L, 0L, 0L)))
    assert(flags(MediaQuality.PlantBase + 5) == ((0L, 0L, 0L, 0L, 0L, 1L, 0L)))
    assert(flags(MediaQuality.PlantBase + 6) == ((0L, 0L, 0L, 0L, 0L, 0L, 1L)))
  }

  test("an undecodable payload FAILS the gate, never sails through it") {
    import org.apache.spark.sql.functions.expr
    // truncate each modality's payload by one byte → the strict kernels
    // quarantine to NULL stats; the gate must reject, not all-pass
    val broken = MediaQuality.plantedArrivals(spark)
      .limit(1)
      .select(col("doc_id"),
        expr("substring(img, 1, length(img) - 1)").as("img"),
        expr("substring(wav, 1, length(wav) - 1)").as("wav"),
        expr("substring(y4m, 1, length(y4m) - 1)").as("y4m"))
    val flags = flagTuples(MediaQuality.qualityFlags(
      MediaFeatures.decodeMedia(broken)))
    assert(flags.values.head._1 == 1L, s"undecodable must flag, got $flags")
    val ok = MediaQuality.qualityFlags(MediaFeatures.decodeMedia(broken))
      .select((col("undecodable") + col("audio_silent") === 0).as("pass"))
      .collect().head.getBoolean(0)
    assert(!ok, "a gate built on null stats must fail closed")
  }

  test("gate report = flagged corpus docs (static videos) + the six plants") {
    val rows = MediaQuality.qualityGate(spark, dir)
      .select(col("doc_id"), col("video_static"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (plants, corpus) = rows.partition(_._1 >= MediaQuality.PlantBase)
    assert(plants.length == 6)
    // every flagged CORPUS doc on this clean fixture is a static video
    assert(corpus.forall(_._2 == 1L),
      s"unexpected corpus gate fire: ${corpus.filter(_._2 == 0L).mkString(",")}")
  }

  test("funnel media stages chain monotonically after the text stages") {
    val funnel = TextAnalysis.curationFunnel(docs,
        mediaOk = Some(MediaQuality.mediaOkFlags(spark, dir)))
      .orderBy(col("stage_idx"))
      .select(col("stage"), col("n_docs")).as[(String, Long)].collect()
    assert(funnel.map(_._1).toSeq ==
      Seq("input", "length_floor", "stopword_cap", "repetition", "sample",
        "media_audio", "media_video", "media_image"))
    val counts = funnel.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"funnel must be non-increasing: ${counts.mkString(",")}")
  }
}
