package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional third arg: comma-separated query-name filter, for
    // iterating on a few queries without a full dump. The driver's
    // two-arg invocation dumps everything, unchanged.
    val only = args.lift(2).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    new java.io.File(outDir).mkdirs()
    // Build all persisted artifacts up front (any failure surfaces again
    // per-query below, where it is recorded properly).
    try Warm.ensureAll(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] warm failed: ${e.getMessage}")
    }
    var failed = List.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Always the FULL oracle map, even under a query filter: a filtered
    // iteration run otherwise overwrites oracle_sql.json with the
    // subset, and a later check of the same outDir silently downgrades
    // every other query's comparison to rows-only. The flip side — the
    // checker reporting loud NO-RESULT rows for queries a filtered run
    // didn't dump into a fresh dir — is intended: grep your query's
    // line; silent downgrades are the failure mode this prevents.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Machine-readable failure record so a gate simulator can distinguish
    // "query errored" from "query missing", instead of silently skipping.
    Files.writeString(Paths.get(s"$outDir/failed_queries.json"),
      failed.sorted.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
