package graft

import graft.stream.IncrementalIngest
import org.apache.spark.sql.functions._

/** Scale evidence for the streaming ingest path: ingest the SAME fixed
  * batch against corpora of different sizes and report the per-batch
  * wall seconds. The claim under test is the O(batch) dataflow shape of
  * `incrementalPairs` + `appendBandIndex`: per-batch work that shuffles
  * is batch-sized (batch bands broadcast, candidate pairs, candidate
  * texts); the only corpus-sized terms are narrow ids-only scans that
  * never shuffle — so batch seconds should grow far slower than corpus
  * size.
  *
  * Usage: `runMain graft.IngestScale <corpusSfDir> <batchSfDir>` —
  * corpus seeded from corpusSfDir's documents, batch = 1/10th of
  * batchSfDir's documents under remapped ids. Prints one JSON line.
  */
object IngestScale {
  def main(args: Array[String]): Unit = {
    val corpusDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val batchDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val root = s"target/ingest_scale/${new java.io.File(corpusDir).getName}"

    val seed = Tables.documents(spark, corpusDir).select(col("doc_id"), col("text"))
    // fixed-size batch, ids remapped clear of any corpus id space
    val batch = Tables.documents(spark, batchDir)
      .filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      .localCheckpoint()
    val batchRows = batch.count()
    val corpusRows = seed.count()

    Fs.deleteTree(root)
    val t0 = System.nanoTime()
    IncrementalIngest.init(spark, seed, root)
    val initSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val stats = IncrementalIngest.ingestBatch(spark, batch, root)
    val ingestSec = (System.nanoTime() - t1) / 1e9
    // replay cost: the admission-only path a re-delivered batch takes
    val t2 = System.nanoTime()
    IncrementalIngest.ingestBatch(spark, batch, root)
    val replaySec = (System.nanoTime() - t2) / 1e9
    // dup-heavy batch: corpus docs under fresh ids — every row must be
    // rejected vs the index, timing the candidate-verification path
    val dupBatch = seed.orderBy(col("doc_id")).limit(batchRows.toInt)
      .select((col("doc_id") + 20000000L).as("doc_id"), col("text"))
      .localCheckpoint()
    val t3 = System.nanoTime()
    val dupStats = IncrementalIngest.ingestBatch(spark, dupBatch, root)
    val dupSec = (System.nanoTime() - t3) / 1e9
    // LSH recall is probabilistic-by-design (a clone can slip through a
    // skew-capped bucket), so an imperfect catch is REPORTED, not fatal —
    // dup_uncaught should be 0 or near it on the standard fixtures.
    val dupUncaught = batchRows - dupStats.rejectedVsCorpus

    println(s"""{"metric":"ingest_batch_sec","value":$ingestSec,"unit":"sec","corpus_rows":$corpusRows,"batch_rows":$batchRows,"init_sec":$initSec,"replay_sec":$replaySec,"dup_batch_sec":$dupSec,"dup_uncaught":$dupUncaught,"accepted":${stats.accepted},"rejected_vs_corpus":${stats.rejectedVsCorpus},"rejected_within":${stats.rejectedWithinBatch},"corpus":"$corpusDir"}""")
    spark.stop()
  }
}
