package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S1/K-side CSV source & sink (reference `dags/tasks/utils.py:18-29`,
  * pandas `read_csv` with inferred types → here a declared-schema read
  * with PERMISSIVE coercion, the model the reference's validation layer
  * approximates by hand — SURVEY.md §1.3).
  *
  * Scale notes: schema is always declared (inference means reading the
  * data twice); PERMISSIVE mode plus a corrupt-record column gives the
  * reference's resilient-validation semantics (`validate.py:34`) without
  * failing a 100 TB job for one bad file; the malformed rows stay
  * queryable for quarantine instead of killing the batch.
  */
object Csv {

  val CorruptCol = "_corrupt_record"

  /** Declared-schema CSV read; malformed rows land in [[CorruptCol]]. */
  def read(spark: SparkSession, path: String, schema: StructType,
           header: Boolean = true): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** Clean rows only (drop quarantine column). */
  def readClean(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val df = read(spark, path, schema)
    df.filter(df.col(CorruptCol).isNull).drop(CorruptCol)
  }

  /** Quarantined raw lines for the strict/resilient failure policy.
    *
    * Spark refuses a query whose pruned read schema is only the internal
    * corrupt-record column, so the read must be cached — but the full
    * input must not stay pinned for the caller's lifetime. The corrupt
    * subset (small by assumption: it's the quarantine) is eagerly
    * materialized with `localCheckpoint`, and the full-width cache is
    * dropped before returning.
    */
  def corruptRows(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val df = read(spark, path, schema).cache()
    try df.filter(df.col(CorruptCol).isNotNull).select(CorruptCol).localCheckpoint(true)
    finally df.unpersist()
  }

  def write(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)
}
