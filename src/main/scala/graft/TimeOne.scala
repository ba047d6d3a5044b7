package graft
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    args.foreach { name =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = GraftSession.forceAndCount(SparkEntry.queries(name)(spark, sfDir))
        println(s"[timeone] $name run$i ${(System.nanoTime() - t0) / 1e9} rows=$n")
      }
    }
    spark.stop()
  }
}
