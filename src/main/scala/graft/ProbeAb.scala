package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Committed A/B probe harness behind the SCALING.md kernel claims —
  * so every "native kernel vs compositional tree" number in the doc is
  * reproducible from the tree it ships with. Each probe is a named
  * thunk over `SPARK_GRAFT_SF_DIR`; the runner times two runs of each
  * requested name (run2 = warm number, the one the doc quotes).
  *
  *   sbt "runMain graft.ProbeAb cms_kernel cms_hex"     # CMS A/B
  *   sbt "runMain graft.ProbeAb bpe_stream bpe_kernel bpe_fold"
  *
  * The BPE trio decomposes the encode family: `bpe_stream` is the
  * word stream alone (explode + filter + per-doc agg, no
  * segmentation), so kernel-vs-fold deltas read against the floor the
  * segmentation can never beat.
  */
object ProbeAb {

  private def wordStream(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")

  def probes: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CMS sketch build: one digest + byte-mask loop per token…
    "cms_kernel" -> ((s, d) =>
      ext.Sketches.cmsBuild(ext.Sketches.tokenStream(Tables.documents(s, d)))),
    // …vs the d×(substring + base-conv) expression tree the oracle replays
    "cms_hex" -> ((s, d) =>
      ext.Sketches.tokenStream(Tables.documents(s, d))
        .select(posexplode(ext.Sketches.bucketsHex(col("term"), 4))
          .as(Seq("row_i", "bucket")))
        .groupBy(col("row_i"), col("bucket"))
        .agg(count(lit(1)).as("c"))),
    // BPE word stream floor: no segmentation at all
    "bpe_stream" -> ((s, d) =>
      wordStream(Tables.documents(s, d))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"), sum(length(col("w"))).as("n_tokens"))),
    // native single-loop kernel per word
    "bpe_kernel" -> ((s, d) => {
      val merges = ext.Bpe.trained(s, Tables.documents(s, d), d)._1
      wordStream(Tables.documents(s, d))
        .withColumn("k", functions.native.bpe_token_count(col("w"),
          merges.map(_.lhs).toArray, merges.map(_.rhs).toArray))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"), sum(col("k")).as("n_tokens"))
    }),
    // whole-document kernel: split + segmentation in one call, no explode
    "bpe_doc" -> ((s, d) => {
      val merges = ext.Bpe.trained(s, Tables.documents(s, d), d)._1
      ext.Bpe.encodeStats(Tables.documents(s, d), merges)
    }),
    // the M layered aggregate-fold trees the oracle replays
    "bpe_fold" -> ((s, d) => {
      val merges = ext.Bpe.trained(s, Tables.documents(s, d), d)._1
      wordStream(Tables.documents(s, d))
        .withColumn("k",
          size(ext.Bpe.applyMerges(col("w"), merges)).cast("long"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"), sum(col("k")).as("n_tokens"))
    }))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.read.parquet(s"$sfDir/documents.parquet").foreach(_ => ())
    val (flags, names) = args.partition(_.startsWith("--"))
    names.foreach { name =>
      if (flags.contains("--explain"))
        println(s"[probe] $name plan:\n" +
          probes(name)(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        GraftSession.forceAndCount(probes(name)(spark, sfDir))
        println(s"[probe] $name run$i ${(System.nanoTime() - t0) / 1e9}")
      }
    }
    spark.stop()
  }
}
