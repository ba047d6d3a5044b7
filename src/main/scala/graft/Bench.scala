package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    // Untimed warmup: absorb session/codegen/parquet-listing startup so
    // the first measured query isn't charged for JVM warmup, and run in
    // sorted order so per-query numbers are comparable across rounds.
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => () }
    // Explicit artifact warm phase: cold builds are charged to one
    // reported build_sec line, not to the first alphabetical consumer.
    val buildSec =
      try Warm.ensureAll(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm failed: ${e.getMessage}"); -1.0
      }
    var errors = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { GraftSession.forceAndCount(fn(spark, sfDir)); true }
        catch { case e: Throwable =>
          errors ::= name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      // A failed query must not read as the fastest query: report -1.
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val good = results.filter(_._2 >= 0)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (good.nonEmpty) good.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","build_sec":$buildSec,"queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
