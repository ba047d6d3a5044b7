package graft

import org.apache.spark.sql.functions._

/** Scale evidence for the inverted-index retrieval layer: at one
  * fixture, measure (a) the index build (∝ corpus, paid once),
  * (b) warm BM25 and conjunctive search — which must track the QUERY
  * TERMS' posting lists, not the corpus: `ScaleUp` token-renames every
  * replica, so the query's postings are constant-size as the corpus
  * grows and search must stay FLAT, (c) an O(batch)
  * [[graft.ext.InvertedIndex.appendIndex]] of a fixed 500-doc batch,
  * (d) an O(removed) [[graft.ext.InvertedIndex.removeIndex]] of the
  * same batch with the fingerprint round-trip asserted (the following
  * ensure must SERVE — any drift in the subtract arithmetic would
  * rebuild and fail the run), and (e) compaction. Prints one JSON line.
  *
  * Usage: `runMain graft.IndexScale [sfDir]`
  */
object IndexScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.{Artifact, InvertedIndex}

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docs = Tables.documents(spark, sfDir)
    val dir = s"${Artifact.root(sfDir)}/invindex"
    Fs.deleteTree(dir)
    val buildSec = timed(InvertedIndex.ensureIndex(spark, docs, dir))

    // warm BOTH measured paths once (plan codegen, driver-side bucket
    // hashing, footer reads for each query's buckets), then measure the
    // steady state
    GraftSession.forceAndCount(
      InvertedIndex.searchBm25(spark, dir, "spark window join merge", 20))
    GraftSession.forceAndCount(
      InvertedIndex.searchAll(spark, dir, "spark query stream"))
    val bm25Sec = timed(GraftSession.forceAndCount(
      InvertedIndex.searchBm25(spark, dir, "spark window join merge", 20)))
    val conjSec = timed(GraftSession.forceAndCount(
      InvertedIndex.searchAll(spark, dir, "spark query stream")))

    // fixed 500-doc batch, ids disjoint from any corpus replica: append
    // and removal cost must track the BATCH, not the corpus
    val batch = spark.range(500)
      .select((col("id") + 2000000000L).as("doc_id"),
        concat(lit("appended index row tokens "), col("id")).as("text"))
    val appendSec = timed(InvertedIndex.appendIndex(spark, batch, dir))
    val removeSec = timed(InvertedIndex.removeIndex(spark, batch, dir))
    val metaAfter = Artifact.readMeta(spark, dir)
    InvertedIndex.ensureIndex(spark, docs, dir)
    require(Artifact.readMeta(spark, dir) == metaAfter,
      "append+remove must round-trip the fingerprint (ensure rebuilt!)")
    val compactSec = timed(InvertedIndex.compactIndex(spark, dir))

    println(s"""{"metric":"index_scale","unit":"sec","build_sec":$buildSec,""" +
      s""""bm25_warm_sec":$bm25Sec,"conjunctive_warm_sec":$conjSec,""" +
      s""""append_batch_sec":$appendSec,"remove_batch_sec":$removeSec,""" +
      s""""compact_sec":$compactSec,"sf":"$sfDir"}""")
    spark.stop()
  }
}
