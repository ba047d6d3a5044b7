package graft

import graft.ext.{Artifact, Dedup}

/** The all-artifact compaction sweep: every built artifact compacts
  * without touching content, metadata, or served results.
  */
class MaintenanceSpec extends SparkSuite {
  import spark.implicits._

  test("compactAll sweeps every built artifact; metas and served content unchanged") {
    Warm.ensureAll(spark, sfDir)
    val root = Artifact.root(sfDir)
    val pairsBefore = Dedup.loadPairs(spark, s"$root/neardup")
      .as[(Long, Long, Double)].collect().toSet
    val groupsBefore = Dedup.loadGroups(spark, s"$root/dupgroups")
      .as[(Long, Long)].collect().toSet
    val metasBefore = Seq(s"$root/neardup", s"$root/dupgroups", s"$root/bandindex",
      s"$root/serving").map(d => d -> Artifact.readMeta(spark, d)).toMap

    val results = Maintenance.compactAll(spark, sfDir)
    val names = results.map(_._1).toSet
    assert(Set("neardup", "dupgroups", "bandindex", "serving", "shards", "unigram_lm",
      "ivf_c16", "pq_m8", "ivfpq_c16_m8", "srp_h8t4").subsetOf(names),
      s"every built artifact must be swept: $names")
    assert(results.forall { case (_, b, a) => a <= b },
      s"compaction must never grow a file set: $results")

    metasBefore.foreach { case (d, m) =>
      assert(Artifact.readMeta(spark, d) == m, s"meta must survive compaction: $d")
    }
    assert(Dedup.loadPairs(spark, s"$root/neardup")
      .as[(Long, Long, Double)].collect().toSet == pairsBefore)
    assert(Dedup.loadGroups(spark, s"$root/dupgroups")
      .as[(Long, Long)].collect().toSet == groupsBefore)
    // a second sweep is a no-op-safe idempotent pass
    assert(Maintenance.compactAll(spark, sfDir).forall { case (_, b, a) => a <= b })
  }

  test("the nightly sweep reaches an appended LM artifact and folds its deltas") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a dedicated fixture root so the appends don't perturb the shared one
    val fixture = "target/maintspec_lm"
    val lmDir = s"${Artifact.root(fixture)}/unigram_lm"
    deleteRecursively(Artifact.root(fixture))
    def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    graft.ext.LanguageModel.ensureLm(spark, docs((1L, "a b a")), lmDir)
    (2 to 6).foreach(i =>
      graft.ext.LanguageModel.appendLm(spark, docs((i.toLong, "a b c")), lmDir))
    val meta = Artifact.readMeta(spark, lmDir)
    val vocab = graft.ext.LanguageModel.vocab(spark, lmDir, 10)
      .as[(String, Long)].collect().toSeq

    val results = Maintenance.compactAll(spark, fixture)
    val lm = results.find(_._1 == "unigram_lm")
    assert(lm.isDefined,
      s"the sweep must reach the unigram LM artifact (gated on the live " +
        s"MetaPrefix, not a stale literal): $results")
    assert(lm.get._3 < lm.get._2,
      s"five appended delta files must fold back: $lm")
    assert(Artifact.readMeta(spark, lmDir) == meta)
    assert(graft.ext.LanguageModel.vocab(spark, lmDir, 10)
      .as[(String, Long)].collect().toSeq == vocab)
    // the per-token deltas merged to one row each
    assert(spark.read.parquet(s"$lmDir/counts")
      .groupBy(col("token")).count().filter(col("count") > 1).isEmpty)
  }
}
