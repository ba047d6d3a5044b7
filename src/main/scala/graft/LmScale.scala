package graft

import org.apache.spark.sql.functions._

/** Scale evidence for the model-based curation layer: at one fixture,
  * measure (a) the unigram-LM artifact build, (b) warm perplexity
  * scoring, (c) an O(batch) [[graft.ext.LanguageModel.appendLm]] of a
  * fixed-size batch — which must stay flat as the corpus grows — then
  * an O(removed) [[graft.ext.LanguageModel.removeLm]] of the same
  * batch (the fingerprint must round-trip: re-ensure serves), and
  * (d) SemDeDup pair search both at a FIXED cell count (the shape that
  * goes quadratic per cell as the corpus grows) and with cells scaled
  * ∝ corpus (the paper's own lever: constant expected cell size keeps
  * within-cell work linear). Prints one JSON line.
  *
  * Usage: `runMain graft.LmScale [sfDir] [cellFactor]` — cellFactor
  * multiplies the default 16 cells for the scaled-cells measurement
  * (pass the fixture's ScaleUp factor).
  */
object LmScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cellFactor = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.{Artifact, LanguageModel, Similarity}

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docs = Tables.documents(spark, sfDir)
    val lmDir = s"${Artifact.root(sfDir)}/unigram_lm"
    Fs.deleteTree(lmDir)
    val buildSec = timed(LanguageModel.ensureLm(spark, docs, lmDir))
    val scoreSec = timed(GraftSession.forceAndCount(
      LanguageModel.score(spark, docs, lmDir)))

    // fixed 500-doc batch, ids disjoint from any corpus: append cost
    // must track the BATCH, not the corpus
    val batch = spark.range(500)
      .select((col("id") + 2000000000L).as("doc_id"),
        concat(lit("appended tokens row "), col("id")).as("text"))
    val appendSec = timed(LanguageModel.appendLm(spark, batch, lmDir))
    // remove the same batch: must also track the BATCH (negative deltas
    // + tombstones), and the subtracted fingerprint must land back on
    // the original corpus's — asserted by re-ensuring WITHOUT deleting:
    // a rebuild here would mean the fingerprint arithmetic drifted
    val removeSec = timed(LanguageModel.removeLm(spark, batch, lmDir))
    val metaAfter = Artifact.readMeta(spark, lmDir)
    LanguageModel.ensureLm(spark, docs, lmDir)
    require(Artifact.readMeta(spark, lmDir) == metaAfter,
      "append+remove must round-trip the fingerprint (ensure rebuilt!)")

    // the bigram model's lifecycle must show the same shape: build ∝
    // corpus once, scoring ∝ batch, append/remove ∝ batch with the
    // fingerprint round-tripping (both ledgers take deltas)
    val lm2Dir = s"${Artifact.root(sfDir)}/bigram_lm"
    Fs.deleteTree(lm2Dir)
    val build2Sec = timed(graft.ext.BigramModel.ensureLm2(spark, docs, lm2Dir))
    val score2Sec = timed(GraftSession.forceAndCount(
      graft.ext.BigramModel.score2(spark, docs, lm2Dir)))
    val append2Sec = timed(graft.ext.BigramModel.appendLm2(spark, batch, lm2Dir))
    val remove2Sec = timed(graft.ext.BigramModel.removeLm2(spark, batch, lm2Dir))
    val meta2After = Artifact.readMeta(spark, lm2Dir)
    graft.ext.BigramModel.ensureLm2(spark, docs, lm2Dir)
    require(Artifact.readMeta(spark, lm2Dir) == meta2After,
      "bigram append+remove must round-trip the fingerprint (ensure rebuilt!)")

    val emb = Tables.embeddings(spark, sfDir)
    val semFixedSec = timed(GraftSession.forceAndCount(
      Similarity.semanticTopKPairs(emb, nCells = 16)))
    val semScaled =
      if (cellFactor <= 1) ""
      else {
        val s = timed(GraftSession.forceAndCount(
          Similarity.semanticTopKPairs(emb, nCells = 16 * cellFactor)))
        s""""semantic_cells${16 * cellFactor}_sec":$s,"""
      }

    println(s"""{"metric":"lm_scale","unit":"sec","build_sec":$buildSec,""" +
      s""""score_warm_sec":$scoreSec,"append_batch_sec":$appendSec,"remove_batch_sec":$removeSec,""" +
      s""""lm2_build_sec":$build2Sec,"lm2_score_warm_sec":$score2Sec,""" +
      s""""lm2_append_batch_sec":$append2Sec,"lm2_remove_batch_sec":$remove2Sec,""" +
      s""""semantic_cells16_sec":$semFixedSec,$semScaled""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
