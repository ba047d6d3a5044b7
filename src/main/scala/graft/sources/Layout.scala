package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Z-order key for two non-negative integer dimensions: interleave the
    * low `bits` bits (a in even positions, b in odd). Built from
    * codegen'd bitwise built-ins — no UDF. Sorting by this key clusters
    * rows so every data file covers a small *rectangle* of (a, b) space,
    * which is what lets min/max stats skip files for predicates on
    * EITHER dimension — a single-column sort only ever skips on its
    * leading column.
    */
  def zorder2(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i).bitwiseOR(
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce((x, y) => x.bitwiseOR(y))

  /** Write `df` clustered by the Z-order of two dimensions into
    * `nFiles` range-partitioned, internally sorted files. At 100 TB
    * this is the layout pass a table gets after ingestion so that
    * two-dimensional slice queries (user × time, region × day) read a
    * small fraction of files instead of all of them.
    */
  def writeZOrdered(df: DataFrame, dimA: String, dimB: String,
                    dir: String, nFiles: Int): Unit = {
    val keyed = df.withColumn("_z", zorder2(col(dimA), col(dimB)))
    keyed.repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(dir)
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
