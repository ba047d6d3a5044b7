package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Domain curation invariants beyond the oracle replay: extraction,
  * share accounting, and both filter sides on a planted fixture.
  */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  private def docs = graft.Tables.documents(spark, sfDir)

  test("domainStats: shares account for the whole corpus") {
    val rows = Curation.domainStats(docs).collect()
    assert(rows.length == 20, "one row per synthetic source host")
    val nd = docs.count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nd)
    // half-up ppm shares sum to 1e6 within one rounding unit per row
    val docShare = rows.map(_.getAs[Long]("doc_share_ppm")).sum
    assert(math.abs(docShare - 1000000L) <= rows.length,
      s"doc shares must cover the corpus: $docShare")
    val charShare = rows.map(_.getAs[Long]("char_share_ppm")).sum
    assert(math.abs(charShare - 1000000L) <= rows.length)
  }

  test("caller-supplied url column: the real-deployment seam works end to end") {
    // a crawl with its own URL column routes through the same three
    // functions via the `url` parameter — no fixtureUrl anywhere
    val crawl = Seq(
      (1L, "https://a.other.org/p1", 10L), (2L, "https://a.other.org/p2", 30L),
      (3L, "https://b.other.org/p1", 20L))
      .toDF("doc_id", "crawl_url", "n_chars")
    val stats = Curation.domainStats(crawl, col("crawl_url"))
    assert(stats.collect().map(r =>
      (r.getString(0), r.getAs[Long]("n_docs"))).toSet ==
      Set(("a.other.org", 2L), ("b.other.org", 1L)))
    val kept = Curation.domainFilter(crawl,
      Seq("b.other.org").toDF("domain"),
      allowPattern = "^[a-z.]+\\.other\\.org$", url = col("crawl_url"))
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    val capped = Curation.domainCap(crawl, maxPerDomain = 1,
      url = col("crawl_url"))
    assert(capped.select("doc_id").as[Long].collect().toSet == Set(2L, 3L),
      "cap keeps the longest doc per domain")
  }

  test("domainFilter: blocklist drops, allow pattern drops, rest survives") {
    val planted = Seq(
      (1L, "t", "en", "src5", 5L),   // survives
      (2L, "t", "en", "src0", 5L),   // blocked host
      (3L, "t", "en", "evil", 5L)    // evil.example.com — NOT blocked
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = Curation.domainFilter(planted, Curation.fixtureBlocklist(spark))
      .collect()
    assert(kept.map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(kept.forall(_.getAs[String]("domain").endsWith(".example.com")))
    // a host outside the allow pattern is dropped even if unblocked
    val foreign = Seq((4L, "t", "en", "bad_host!", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Curation.domainFilter(foreign,
      Curation.fixtureBlocklist(spark)).count() == 0L)
  }

  test("domainCap: cap honored, quality order, WindowGroupLimit in plan") {
    val df = Curation.domainCap(docs, maxPerDomain = 3)
    val rows = df.collect()
    val byDom = rows.groupBy(_.getAs[String]("domain"))
    assert(byDom.size == 20 && byDom.values.forall(_.length == 3))
    byDom.values.foreach { members =>
      val sorted = members.sortBy(_.getAs[Int]("domain_rank"))
      // longest-first, ranks dense from 1
      assert(sorted.map(_.getAs[Int]("domain_rank")).toSeq == Seq(1, 2, 3))
      val chars = sorted.map(_.getAs[Long]("n_chars"))
      assert(chars.zip(chars.tail).forall { case (a, b) => a >= b })
    }
    // rank-limit pushdown: the per-group top-k runs below the sort
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit pushdown:\n$plan")
  }

  test("domainFilter plan: blocklist side broadcasts, no shuffle on the corpus") {
    val plan = Curation.domainFilter(docs, Curation.fixtureBlocklist(spark))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"blocklist must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle:\n$plan")
  }
}
