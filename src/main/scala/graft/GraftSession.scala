package graft

import org.apache.spark.sql.SparkSession

/** The one place the engine's required session config lives — every
  * entry point (Verify, Bench, Smoke, PlanAudit, tests) builds through
  * here so a new required setting cannot silently miss one of them.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS) — Spark 4 only reads it as
      // a long; graft.Tables.events converts to µs TimestampType.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // cast-or-null coercion semantics (reference validate.py errors="coerce")
      .config("spark.sql.ansi.enabled", "false")
      // runtime bloom-filter pushdown: at scale a selective dim filter
      // prunes the fact side of a shuffle join before the exchange.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // graft's native functions + the as-of join planner strategy,
      // injected the way a cluster deployment would.
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")

  def local(cpus: String): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
