package graft

import graft.ext.AnnIndex

/** Scale evidence for the ANN index family: at one fixture, the
  * build-vs-serve split per persisted index — (a) COLD build of each of
  * the four variants (artifact deleted first; the corpus-proportional
  * cost paid once per corpus fingerprint), (b) WARM top-k search from
  * the persisted index (the steady-state serve cost, measured after one
  * untimed warm-up query per variant). Run against sf0.1 and the
  * ScaleUp 10×/100× fixtures, this quantifies the claim every persisted
  * artifact makes: you pay the corpus scan at build time so queries
  * don't. Prints one JSON line.
  *
  * Usage: `runMain graft.AnnScale [sfDir]`
  */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val emb = Tables.embeddings(spark, sfDir)
    val nVecs = emb.count() // also warms the table scan out of the builds
    val root = AnnIndex.defaultRoot(sfDir)
    val variants: Seq[(String, String, () => String, String => org.apache.spark.sql.DataFrame)] = Seq(
      ("ivf", s"$root/ivf_c16",
        () => AnnIndex.ensureIvf(spark, emb, s"$root/ivf_c16"),
        dir => AnnIndex.searchIvf(spark, emb, dir)),
      ("pq", s"$root/pq_m8",
        () => AnnIndex.ensurePq(spark, emb, s"$root/pq_m8"),
        dir => AnnIndex.searchPq(spark, emb, dir)),
      ("ivfpq", s"$root/ivfpq_c16_m8",
        () => AnnIndex.ensureIvfPq(spark, emb, s"$root/ivfpq_c16_m8"),
        dir => AnnIndex.searchIvfPq(spark, emb, dir)),
      ("srp", s"$root/srp_h8t4",
        () => AnnIndex.ensureSrp(spark, emb, s"$root/srp_h8t4"),
        dir => AnnIndex.searchSrp(spark, emb, dir)))
    val rows = variants.map { case (name, dir, build, search) =>
      Fs.deleteTree(dir)
      val cold = timed(build())
      GraftSession.forceAndCount(search(dir)) // untimed plan/codegen warm-up
      val warm = timed(GraftSession.forceAndCount(search(dir)))
      (name, cold, warm)
    }
    val cells = rows.map { case (n, c, w) =>
      f""""$n":{"build_cold_sec":$c%.3f,"search_warm_sec":$w%.3f}"""
    }.mkString(",")
    println(s"""{"fixture":"$sfDir","n_vecs":$nVecs,$cells}""")
    spark.stop()
  }
}
