package graft

/** Throwaway probe for the serving_daily load cost (r18 optimization
  * round): times partition discovery, count, and persist separately.
  */
object ProbeDaily {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val store = s"target/artifacts/${new java.io.File(d).getName}/serving_daily/store"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val fp = t("fileFingerprint x2")(
      graft.ext.Artifact.fileFingerprint(spark, s"$d/customer.parquet") +
      graft.ext.Artifact.fileFingerprint(spark, s"$d/events.parquet",
        s"$d/lineitem.parquet", s"$d/documents.parquet"))
    println(s"[probe] fp len ${fp.length}")
    val df = t("read.parquet (schema+partition discovery)")(
      spark.read.parquet(store))
    t("count")(df.count())
    val df2 = t("re-read")(spark.read.parquet(store))
    t("re-count")(df2.count())
    val p = t("persist+count")({
      val x = spark.read.parquet(store)
        .select(org.apache.spark.sql.functions.col("pk"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      x.count(); x
    })
    p.unpersist()
    spark.stop()
  }
}
