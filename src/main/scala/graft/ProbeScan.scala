package graft

import org.apache.spark.sql.functions._

/** Throwaway probe (r18): is the single-file fixture scan a
  * parallelism bottleneck? Times a hash-everything pass over lineitem
  * at the session default split size vs small splits.
  */
object ProbeScan {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def t[A](name: String)(f: => A): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[probe] $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    def hashAll(df: org.apache.spark.sql.DataFrame): Long =
      GraftSession.forceAndCount(df)
    t("lineitem default splits")(hashAll(spark.read.parquet(s"$d/lineitem.parquet")))
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")
    t("lineitem 2m splits")(hashAll(spark.read.parquet(s"$d/lineitem.parquet")))
    spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
    t("events default")(hashAll(spark.read.parquet(s"$d/events.parquet")))
    spark.conf.set("spark.sql.files.maxPartitionBytes", "512k")
    t("events 512k splits")(hashAll(spark.read.parquet(s"$d/events.parquet")))
    spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
    t("j2-shape default")({
      val li = spark.read.parquet(s"$d/lineitem.parquet")
      val o = spark.read.parquet(s"$d/orders.parquet")
      val c = spark.read.parquet(s"$d/customer.parquet")
      hashAll(li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), Tables.drevenue(col("l_extendedprice"), col("l_discount")).as("rev")))
    })
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")
    t("j2-shape 2m splits")({
      val li = spark.read.parquet(s"$d/lineitem.parquet")
      val o = spark.read.parquet(s"$d/orders.parquet")
      val c = spark.read.parquet(s"$d/customer.parquet")
      hashAll(li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), Tables.drevenue(col("l_extendedprice"), col("l_discount")).as("rev")))
    })
    spark.stop()
  }
}
