package graft

/** Dev utility: time one registered query by name.
  * `sbt "runMain graft.RunOne <name> [sfDir] [explain]"`
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => () }
    val fn = SparkEntry.queries(name)
    if (args.length > 2 && args(2) == "explain") fn(spark, sfDir).explain("formatted")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = GraftSession.forceAndCount(fn(spark, sfDir))
      println(f"[runone] $name run$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
