package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The persisted containment index ([[Dedup.ensureContainment]]):
  * build/serve equivalence with the live path, the append → remove →
  * compact lifecycle, and the O(batch) incremental admission probe.
  */
class ContainmentIndexSpec extends SparkSuite {
  import spark.implicits._

  private val long1 = (1 to 120).map(i => s"w$i").mkString(" ")
  private val short1 = (30 to 41).map(i => s"w$i").mkString(" ") // ⊂ long1
  private val other = (500 to 560).map(i => s"u$i").mkString(" ")
  private val lone = (900 to 940).map(i => s"z$i").mkString(" ")

  private def corpus = Seq(
    (1L, long1), (2L, short1), (3L, other), (4L, other), (5L, lone)
  ).toDF("doc_id", "text").withColumn("n_chars", length(col("text")))

  private def freshDir(name: String): String = {
    val dir = s"target/containmentspec/$name"
    deleteRecursively(dir)
    dir
  }

  test("stored serve equals the live path on both containment queries") {
    val docs = graft.Tables.documents(spark, sfDir)
    val dir = freshDir("live_eq")
    Dedup.ensureContainment(spark, docs, dir)
    val liveTop = Dedup.containmentTopK(docs, topK = 10)
      .select("a_id", "b_id", "containment")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val storedTop = Dedup.containmentTopKStored(spark, docs, dir, topK = 10)
      .select("a_id", "b_id", "containment")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(storedTop == liveTop)
    val liveKept = Dedup.applyContainment(docs)
      .select("doc_id").as[Long].collect().toSet
    val storedKept = Dedup.applyContainmentStored(spark, docs, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(storedKept == liveKept)
  }

  test("second ensure serves without rebuild; changed corpus rebuilds") {
    val dir = freshDir("freshness")
    Dedup.ensureContainment(spark, corpus, dir)
    val meta = Artifact.readMeta(spark, dir)
    Dedup.ensureContainment(spark, corpus, dir)
    assert(Artifact.readMeta(spark, dir) == meta, "unchanged corpus must serve")
    Dedup.ensureContainment(spark,
      corpus.withColumn("text", concat(col("text"), lit(" x"))), dir)
    assert(Artifact.readMeta(spark, dir) != meta, "changed corpus must rebuild")
  }

  test("mismatched parameters fail fast, not silently") {
    val dir = freshDir("params")
    Dedup.ensureContainment(spark, corpus, dir, w = 5, dfCap = 64)
    intercept[IllegalStateException] {
      Dedup.containmentTopKStored(spark, corpus, dir, w = 3)
    }
    intercept[IllegalStateException] {
      Dedup.appendContainmentIndex(spark, corpus.limit(1), dir, dfCap = 32)
    }
  }

  test("append folds a batch in O(batch) and equals a from-scratch build") {
    val dir = freshDir("append")
    Dedup.ensureContainment(spark, corpus, dir)
    val batch = Seq(
      (10L, (70 to 81).map(i => s"w$i").mkString(" ")), // ⊂ long1 (doc 1)
      (11L, (600 to 640).map(i => s"v$i").mkString(" "))
    ).toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
    Dedup.appendContainmentIndex(spark, batch, dir)
    // idempotent: a double-submitted batch is a no-op
    val metaAfter = Artifact.readMeta(spark, dir)
    Dedup.appendContainmentIndex(spark, batch, dir)
    assert(Artifact.readMeta(spark, dir) == metaAfter)
    val union = corpus.unionByName(batch)
    // ensure over the union SERVES (additive fingerprint), no rebuild
    Dedup.ensureContainment(spark, union, dir)
    assert(Artifact.readMeta(spark, dir) == metaAfter)
    // served results equal a from-scratch build over the union
    val scratch = freshDir("append_scratch")
    Dedup.ensureContainment(spark, union, scratch)
    def kept(d: String) = Dedup.applyContainmentStored(spark, union, d)
      .select("doc_id").as[Long].collect().toSet
    assert(kept(dir) == kept(scratch))
    assert(!kept(dir).contains(10L), "appended subset doc must be caught")
    def top(d: String) = Dedup.containmentTopKStored(spark, union, d, topK = 5)
      .select("a_id", "b_id", "containment")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(top(dir) == top(scratch))
  }

  test("removal masks pairs AND surfaces pairs the removal creates") {
    // three-copy cluster: (3,4,6) share everything (df=3 shingles).
    // Removing 6 must (a) drop every pair involving 6, (b) make the
    // df=3 shingles df=2 — the (3,4) pair stays discoverable.
    val six = corpus.unionByName(Seq((6L, other)).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text"))))
    val dir = freshDir("removal")
    Dedup.ensureContainment(spark, six, dir)
    val before = Dedup.containmentTopKStored(spark, six, dir, topK = 25)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(before.contains((3L, 6L)) && before.contains((4L, 6L)))
    Dedup.removeFromContainmentIndex(spark, six.filter(col("doc_id") === 6L), dir)
    val live = six.filter(col("doc_id") =!= 6L)
    val after = Dedup.containmentTopKStored(spark, live, dir, topK = 25)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(!after.exists(p => p._1 == 6L || p._2 == 6L), s"removed doc in $after")
    assert(after.contains((3L, 4L)), "survivor pair must remain discoverable")
    // fingerprint subtracted arithmetically: ensure over the shrunken
    // corpus serves without rebuild
    val meta = Artifact.readMeta(spark, dir)
    Dedup.ensureContainment(spark, live, dir)
    assert(Artifact.readMeta(spark, dir) == meta)
  }

  test("compaction rewrites to one live row per shingle; serve unchanged") {
    val dir = freshDir("compact")
    Dedup.ensureContainment(spark, corpus, dir)
    val batch = Seq((12L, (30 to 43).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
    Dedup.appendContainmentIndex(spark, batch, dir)
    Dedup.removeFromContainmentIndex(spark, corpus.filter(col("doc_id") === 2L), dir)
    val live = corpus.filter(col("doc_id") =!= 2L).unionByName(batch)
    val before = Dedup.containmentTopKStored(spark, live, dir, topK = 10)
      .select("a_id", "b_id", "containment")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    Dedup.compactContainmentIndex(spark, dir)
    assert(!Artifact.hasTombstones(spark, dir))
    // one row per shingle, all gen 0, no masked ids left
    val sh = spark.read.parquet(s"$dir/shingles")
    assert(sh.groupBy("shh").count().filter(col("count") > 1).isEmpty)
    assert(sh.filter(col("gen") =!= 0L).isEmpty)
    assert(sh.filter(exists(Dedup.reconstructIdsForTest,
      id => id === 2L)).isEmpty, "tombstoned id physically dropped")
    val after = Dedup.containmentTopKStored(spark, live, dir, topK = 10)
      .select("a_id", "b_id", "containment")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(after == before)
  }

  test("appends crossing the df cap agree with a from-scratch build; exclusion survives compaction and is monotone under removal") {
    // a duplicate cluster whose shingles cross dfCap=3 ACROSS
    // generations: 2 copies at build (df=2 ≤ 3 → pair discoverable),
    // +2 on append (union df=4 > 3 → a from-scratch build over the
    // union generates NO candidates through them)
    val cl = (1 to 12).map(i => s"c$i").mkString(" ")
    def doc(id: Long) = (id, cl)
    def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val base = df(Seq(doc(101L), doc(102L), (201L, long1), (202L, short1)))
    val dir = freshDir("capcross")
    Dedup.ensureContainment(spark, base, dir, dfCap = 3)
    val before = Dedup.containmentTopKStored(spark, base, dir, dfCap = 3, topK = 25)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(before.contains((101L, 102L)), "under-cap cluster pair must be found")

    val batch = df(Seq(doc(103L), doc(104L)))
    Dedup.appendContainmentIndex(spark, batch, dir, dfCap = 3)
    val union = base.unionByName(df(Seq(doc(103L), doc(104L))))
    val scratch = freshDir("capcross_scratch")
    Dedup.ensureContainment(spark, union, scratch, dfCap = 3)
    def kept(d: String, docs: org.apache.spark.sql.DataFrame) =
      Dedup.applyContainmentStored(spark, docs, d, dfCap = 3)
        .select("doc_id").as[Long].collect().toSet
    def top(d: String, docs: org.apache.spark.sql.DataFrame) =
      Dedup.containmentTopKStored(spark, docs, d, dfCap = 3, topK = 25)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(top(dir, union) == top(scratch, union),
      "appended index must agree with a from-scratch union build")
    assert(kept(dir, union) == kept(scratch, union))
    assert(!top(dir, union).exists(p => p._1 >= 101L && p._1 <= 104L),
      s"over-cap cluster pairs must be excluded, got ${top(dir, union)}")
    assert(kept(dir, union).contains(102L),
      "over-cap cluster docs are KEPT (the exact-dedup family's job)")

    // compaction preserves the exclusion memory: a later 1-doc append
    // must not re-admit pairs through the over-cap cluster
    Dedup.compactContainmentIndex(spark, dir, dfCap = 3)
    Dedup.appendContainmentIndex(spark, df(Seq(doc(105L))), dir, dfCap = 3)
    val union5 = union.unionByName(df(Seq(doc(105L))))
    val scratch5 = freshDir("capcross_scratch5")
    Dedup.ensureContainment(spark, union5, scratch5, dfCap = 3)
    assert(top(dir, union5) == top(scratch5, union5),
      "exclusion memory must survive compaction")
    assert(kept(dir, union5) == kept(scratch5, union5))

    // monotone under removal (DOCUMENTED one-sided approximation):
    // removing three copies brings the true union df back to 2, but
    // membership of an over-cap shingle was never stored — the index
    // keeps the cluster excluded where a rebuild would re-find it
    Dedup.removeFromContainmentIndex(spark,
      df(Seq(doc(103L), doc(104L), doc(105L))), dir, dfCap = 3)
    val shrunk = base
    assert(!top(dir, shrunk).contains((101L, 102L)),
      "exclusion is monotone: no resurrection without a rebuild")
    val rebuilt = freshDir("capcross_rebuilt")
    Dedup.ensureContainment(spark, shrunk, rebuilt, dfCap = 3)
    assert(top(rebuilt, shrunk).contains((101L, 102L)),
      "a rebuild over the survivors re-finds the now-under-cap pair")
  }

  test("a doc appended before compaction can be removed after it — and re-appended") {
    // regression: compaction resets the generation counter to 1, so a
    // docs-manifest row keeping its pre-compaction gen (1) would
    // satisfy `gen >= tgen` for the next removal's tombstone (tgen=1)
    // and mask-proof itself — a zombie row turning every later
    // re-append of that doc into a silent no-op
    val dir = freshDir("zombie")
    Dedup.ensureContainment(spark, corpus, dir)
    val docA = Seq((30L, (30 to 44).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
    Dedup.appendContainmentIndex(spark, docA, dir)    // docs row gen=1
    Dedup.compactContainmentIndex(spark, dir)         // counter resets
    Dedup.removeFromContainmentIndex(spark, docA, dir) // tgen = 1
    val afterRemove = Dedup.containmentTopKStored(spark, corpus, dir, topK = 25)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(!afterRemove.exists(p => p._1 == 30L || p._2 == 30L),
      s"removed doc must leave the pair table, got $afterRemove")
    // re-append: the manifest must treat the doc as absent, so the
    // append is REAL and the pair (30 ⊂ 1) is discoverable again
    Dedup.appendContainmentIndex(spark, docA, dir)
    val union = corpus.unionByName(docA)
    val afterReappend = Dedup.containmentTopKStored(spark, union, dir, topK = 25)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(afterReappend.contains((1L, 30L)),
      s"re-appended doc must be discoverable again, got $afterReappend")
  }

  test("incremental admission finds the planted contained batch doc") {
    val dir = freshDir("incr")
    Dedup.ensureContainment(spark, corpus, dir)
    val batch = Seq(
      (20L, (50 to 62).map(i => s"w$i").mkString(" ")), // ⊂ long1 (doc 1)
      (21L, "completely novel content with nothing shared at all here")
    ).toDF("doc_id", "text")
    val found = Dedup.incrementalContainment(spark, batch, corpus, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(found.toSeq == Seq((20L, 1L, 1.0)),
      s"expected exactly the planted subset pair, got ${found.toSeq}")
  }
}
