package graft.ext

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class LrClassifierSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)

  test("training is bit-deterministic across runs") {
    val seed = LrClassifier.fixtureSeed(docs)
    val (v1, w1, b1) = LrClassifier.train(spark, seed, iters = 3)
    val (v2, w2, b2) = LrClassifier.train(spark, seed, iters = 3)
    assert(v1 == v2)
    assert(w1 == w2, "weight maps must be identical across trainings")
    assert(b1 == b2)
    // integer micro-unit contract: weights ARE longs on the 1e-6 grid
    // (no double enters the update path), bounded well inside the
    // exact-product range the halfaway arithmetic assumes
    w1.values.foreach(wu => assert(math.abs(wu) < (1L << 40), s"wu=$wu"))
  }

  test("a learnable planted signal is actually learned") {
    // Synthetic distillation corpus with a WIDE margin: positive docs
    // are 'good'-heavy, negative docs 'junk'-heavy. The student must
    // recover the rule from normalized counts — guards against the
    // degenerate always-one-class model a mis-tuned GD produces.
    val rows = (0L until 200L).map { i =>
      val good = i % 2 == 0
      val body = if (good) "good signal clean text data" else "junk noise spam filler waste"
      (i, s"$body common filler words here", if (good) 1.0 else 0.0)
    }
    val labeled = rows.toDF("doc_id", "text", "y")
    val (_, w, b) = LrClassifier.train(spark, labeled, vocabSize = 64, iters = 8)
    val dir = s"target/test_lrclass_${System.nanoTime()}"
    // score via a throwaway artifact
    labeled.select(col("doc_id"), col("text")).count() // force nothing, clarity
    val adir = LrClassifier.ensureLr(spark, labeled, dir, vocabSize = 64, iters = 8)
    val pred = LrClassifier.predict(spark, labeled.select(col("doc_id"), col("text")), adir)
      .join(labeled.select(col("doc_id"), col("y")), Seq("doc_id"))
    val acc = pred.filter(
      (col("pred_label") === "keep") === (col("y") === 1.0)).count() / 200.0
    assert(acc >= 0.95, s"planted wide-margin rule must be learned, acc=$acc")
    assert(b != 0.0 || w.values.exists(_ != 0.0))
    deleteRecursively(dir)
  }

  test("fixture distillation: non-degenerate predictions, teacher agreement") {
    val dir = s"target/test_lrclass_fix_${System.nanoTime()}"
    val seed = LrClassifier.fixtureSeed(docs)
    val adir = LrClassifier.ensureLr(spark, seed, dir)
    val pred = LrClassifier.predict(spark, docs, adir).cache()
    val n = pred.count()
    val keeps = pred.filter(col("pred_label") === "keep").count()
    assert(keeps > 0 && keeps < n,
      s"degenerate one-class model: $keeps/$n keep")
    // agreement with the teacher gate on the labeled seed (train-set
    // accuracy) must beat the majority baseline
    val teacher = seed.select(col("doc_id"), col("y"))
    val joined = pred.join(teacher, Seq("doc_id"))
    val agree = joined.filter(
      (col("pred_label") === "keep") === (col("y") === 1.0)).count()
    val total = joined.count()
    val base = math.max(
      teacher.filter(col("y") === 1.0).count(),
      teacher.filter(col("y") === 0.0).count())
    assert(agree.toDouble / total > base.toDouble / total,
      s"student must beat majority baseline: $agree/$total vs $base/$total")
    pred.unpersist()
    deleteRecursively(dir)
  }

  test("agreementReport: segments partition the corpus, floors pass, ppm exact") {
    val dir = s"target/test_lrclass_rep_${System.nanoTime()}"
    val adir = LrClassifier.ensureLr(spark, LrClassifier.fixtureSeed(docs), dir)
    val rep = LrClassifier.agreementReport(spark, docs, adir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rep.keySet == Set("all", "seed", "holdout"))
    val (all, seed, hold) = (rep("all"), rep("seed"), rep("holdout"))
    assert(seed.getLong(1) + hold.getLong(1) == all.getLong(1))
    assert(seed.getLong(2) + hold.getLong(2) == all.getLong(2))
    rep.values.foreach { r =>
      // ppm is the half-up integer form of n_agree/n_docs; the double
      // is exactly ppm/1e6; pass is the integer floor compare
      val (n, a, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ppm == (2 * a * 1000000L + n) / (2 * n))
      assert(r.getDouble(4) == ppm.toDouble / 1e6)
      assert(r.getBoolean(6) == (ppm >= r.getLong(5)))
    }
    // the absolute floors are calibrated for the GATE scales (sf0.01 /
    // sf0.1, where the correctness snapshot pins pass=true); on this
    // 50-doc fixture (10 seed docs) just require better-than-chance
    // agreement — the beats-majority claim is pinned by the
    // "fixture distillation" test above on the seed segment
    assert(all.getLong(3) > 550000L,
      s"all-segment agreement must beat chance: ${all.getLong(3)} ppm")
    deleteRecursively(dir)
  }

  test("artifact: fingerprint-guarded rebuild, kind check") {
    val dir = s"target/test_lrclass_art_${System.nanoTime()}"
    val seed = LrClassifier.fixtureSeed(docs)
    val d1 = LrClassifier.ensureLr(spark, seed, dir, iters = 2)
    val w1 = spark.read.parquet(s"$d1/weights").as[(String, Double)].collect().toMap
    // same seed: ensure is a freshness check, weights unchanged
    LrClassifier.ensureLr(spark, seed, dir, iters = 2)
    val w2 = spark.read.parquet(s"$d1/weights").as[(String, Double)].collect().toMap
    assert(w1 == w2)
    intercept[Exception] {
      LrClassifier.score(spark,
        docs, s"target/definitely_missing_${System.nanoTime()}")
    }
    deleteRecursively(dir)
  }
}
