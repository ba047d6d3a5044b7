package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout decisions (SURVEY.md §4): the reference stores its
  * stream files unpartitioned, so its PROCESS_DATE filter re-reads
  * everything. At 100 TB the fact table is written date-partitioned so
  * day-scoped queries prune at the source (`PartitionFilters` in the
  * scan, zero I/O outside the day).
  */
object Layout {

  /** Write a fact frame date-partitioned (dynamic overwrite would keep
    * reruns idempotent per day at scale).
    */
  def writeDatePartitioned(df: DataFrame, tsCol: String, dir: String): Unit =
    df.withColumn("date", to_date(col(tsCol)))
      .write.mode("overwrite")
      .partitionBy("date")
      .parquet(dir)

  def readDay(spark: SparkSession, dir: String, day: String): DataFrame =
    spark.read.parquet(dir).filter(col("date") === lit(day))

  /** Incremental materialized-aggregate maintenance: recompute ONLY the
    * date partitions a new batch touches and dynamically overwrite them
    * in the output table — the daily-merge pattern that replaces the
    * reference's full recompute (`music-streaming-transform.py` reruns
    * the whole aggregation every day).
    *
    * Scale shape: affected dates come from the (small) batch; the fact
    * re-read is partition-pruned to exactly those dates; dynamic
    * partition overwrite (`partitionOverwriteMode=dynamic`) swaps only
    * the rewritten date directories, so the job touches O(batch dates),
    * not O(history), and reruns are idempotent per day.
    *
    * @param aggregate full-day aggregation: day-scoped facts → output
    *                  rows carrying the `date` partition column
    */
  def mergeDaily(spark: SparkSession, factDir: String, outDir: String,
                 batch: DataFrame, aggregate: DataFrame => DataFrame): Seq[String] = {
    val affected = batch.select(to_date(col("ts")).cast("string").as("d"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    if (affected.nonEmpty) {
      val facts = spark.read.parquet(factDir)
        .filter(col("date").isin(affected.map(lit): _*))
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try aggregate(facts)
        .write.mode("overwrite").partitionBy("date").parquet(outDir)
      finally prev.fold(
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
    }
    affected
  }

  /** Small-file compaction: rewrite a directory into ~`targetFiles`
    * files. Streaming ingestion produces one file per micro-batch per
    * partition; at 100 TB the resulting millions of small files
    * dominate scan planning time, so periodic compaction (or AQE
    * coalesced writes) is part of the table's lifecycle. Returns the
    * new file count.
    */
  def compact(spark: SparkSession, dir: String, targetFiles: Int): Int = {
    val tmp = dir.stripSuffix("/") + "_compacting"
    spark.read.parquet(dir).repartition(targetFiles)
      .write.mode("overwrite").parquet(tmp)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
    fs.listStatus(p).count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
  }
}
