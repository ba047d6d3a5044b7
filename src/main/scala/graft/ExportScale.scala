package graft

import graft.ext.TrainingSet
import org.apache.spark.sql.functions._

/** Scale evidence for the shard-export lifecycle: build the export over
  * corpora of different sizes, then fold in the SAME fixed batch and
  * run the maintenance ops. The claim under test is O(batch) append /
  * O(removed) deletion: the only corpus-sized term in either is the
  * narrow `ids/` read, so per-batch seconds should stay near-flat while
  * the corpus grows 30×. Prints one JSON line.
  *
  * Usage: `runMain graft.ExportScale <corpusSfDir> <batchSfDir>`
  */
object ExportScale {
  def main(args: Array[String]): Unit = {
    val corpusDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val batchDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = s"target/export_scale/${new java.io.File(corpusDir).getName}"
    Fs.deleteTree(dir)

    val corpus = Tables.documents(spark, corpusDir).select(col("doc_id"), col("text"), col("lang"))
    val corpusRows = corpus.count()
    // fixed-size batch under ids clear of any corpus id space
    val batch = Tables.documents(spark, batchDir)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"), col("lang"))
      .localCheckpoint()
    val batchRows = batch.count()

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val buildSec = timed(TrainingSet.writeShards(spark, corpus, dir, nShards = 8))
    val appendSec = timed(TrainingSet.appendShards(spark, batch, dir))
    val replaySec = timed(TrainingSet.appendShards(spark, batch, dir)) // no-op path
    val removed = batch.orderBy(col("doc_id")).limit(50).localCheckpoint()
    val removeSec = timed(TrainingSet.removeFromShards(spark, removed, dir))
    val compactSec = timed(TrainingSet.compactShards(spark, dir))

    println(s"""{"metric":"export_append_sec","value":$appendSec,"unit":"sec","corpus_rows":$corpusRows,"batch_rows":$batchRows,"build_sec":$buildSec,"replay_sec":$replaySec,"remove_sec":$removeSec,"compact_sec":$compactSec,"corpus":"$corpusDir"}""")
    spark.stop()
  }
}
