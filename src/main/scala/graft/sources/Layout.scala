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
