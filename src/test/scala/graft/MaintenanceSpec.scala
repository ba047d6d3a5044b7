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
    assert(Set("neardup", "dupgroups", "bandindex", "serving",
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
}
