package graft

/** Scale-slope evidence for the PCA moment pass: times the exact-
  * decimal covariance (the gate path) and the treeAggregate double
  * path (the 100 TB path) at a fixture dir, one JSON line each.
  *
  * Usage: `runMain graft.PcaScale <sfDir> [exact|fast|both]`
  */
object PcaScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val mode = args.lift(1).getOrElse("both")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count() // absorb scan warmup
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"op":"pca_cov_$label","sec":$sec,"n_vecs":$n,"sf":"$dir"}""")
    }
    if (mode == "exact" || mode == "both")
      timed("exact") { ext.Pca.covMatrix(ext.Pca.covariance(emb)) }
    if (mode == "fast" || mode == "both")
      timed("fast") { ext.Pca.covarianceFastMatrix(emb) }
    spark.stop()
  }
}
