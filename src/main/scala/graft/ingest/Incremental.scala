package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-mode incremental file processing — the reference's manifest
  * mechanism (S7, `dags/tasks/utils.py:45-67`, `validate.py:177-254`)
  * as a left-anti join against a processed-files table. The streaming
  * path ([[graft.stream.Pipeline]]) gets the same guarantee from the
  * file-source checkpoint; this batch analog exists for orchestrated
  * reruns (the reference's `@daily` catch-up mode).
  *
  * At scale the manifest is itself a table (not a driver-side set):
  * discovery is a listing job, the anti-join shuffles only file *names*,
  * and the commit appends to the manifest atomically after the batch
  * succeeds — the same write-ahead ordering the reference implements
  * with S3 rewrites.
  */
object Incremental {

  /** S5+S6: discover candidate files under a directory, name-filtered. */
  def discover(spark: SparkSession, dir: String, glob: String = "*.csv"): Dataset[String] = {
    import spark.implicits._
    val path = new org.apache.hadoop.fs.Path(dir)
    // path.getFileSystem, not FileSystem.get: the directory may live on
    // a different scheme (hdfs://, s3a://) than the default FS.
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val re = ("^" + glob.replace(".", "\\.").replace("*", ".*") + "$").r
    val names =
      if (!fs.exists(path)) Seq.empty[String]
      else fs.listStatus(path).toSeq
        .filter(s => s.isFile && re.findFirstIn(s.getPath.getName).isDefined)
        .map(_.getPath.toString)
    names.toDS()
  }

  /** S7 read side: files never seen before = all − processed (J3). */
  def newFiles(all: Dataset[String], processed: Dataset[String]): Dataset[String] = {
    import all.sparkSession.implicits._
    all.toDF("path").join(processed.toDF("path"), Seq("path"), "left_anti")
      .as[String]
  }

  /** Load the manifest table (empty on first run). Existence goes
    * through the Hadoop FileSystem of the manifest's own scheme — a
    * java.io.File check would report hdfs://…/s3a://… paths as absent
    * and silently reprocess everything every run.
    */
  def manifest(spark: SparkSession, manifestDir: String): Dataset[String] = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(manifestDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p))
      spark.read.parquet(manifestDir).select("path").as[String]
    else spark.emptyDataset[String]
  }

  /** S7 commit side: append the just-processed paths after success. */
  def commit(spark: SparkSession, manifestDir: String, paths: Dataset[String]): Unit =
    paths.toDF("path").write.mode("append").parquet(manifestDir)

  /** One incremental batch: discover → anti-join manifest → process →
    * commit. Returns the paths processed this run (empty = the
    * reference's `end_pipeline` branch).
    */
  def runBatch(spark: SparkSession, inputDir: String, manifestDir: String,
               glob: String = "*.csv")(process: Seq[String] => Unit): Seq[String] = {
    val fresh = newFiles(discover(spark, inputDir, glob),
      manifest(spark, manifestDir)).collect().toSeq.sorted
    if (fresh.nonEmpty) {
      process(fresh)
      import spark.implicits._
      commit(spark, manifestDir, fresh.toDS())
    }
    fresh
  }
}
