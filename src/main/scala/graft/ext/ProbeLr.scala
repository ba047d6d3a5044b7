package graft.ext
import org.apache.spark.sql.functions._
object ProbeLr {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("8")
    s.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.01")
    val seed = LrClassifier.fixtureSeed(docs)
    import s.implicits._
    for (it <- Seq(1, 2)) {
      val (_, w, b) = LrClassifier.train(s, seed, iters = it)
      w.toSeq.toDF("token", "w").withColumn("b", lit(b))
        .coalesce(1).write.mode("overwrite").parquet(s"target/probe_lr6_w$it")
      println(s"[probe] it=$it b=$b")
    }
    s.stop()
  }
}
