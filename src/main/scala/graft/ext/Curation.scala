package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain curation — the first-class stage real web-corpus
  * pipelines (C4, RefinedWeb, FineWeb) run before any content filter:
  * extract the registrable domain from each document's URL, report
  * per-domain document/byte concentration, and rewrite the corpus
  * against domain block/allow lists.
  *
  * Everything here is built-in-expression-only (concat / regexp
  * extract / one groupBy / one broadcast anti-join), so it is fully
  * SQL-replayable and scales as: domain extraction is map-only; the
  * stats are a single partial-aggregated shuffle keyed on domain
  * (counts and byte sums combine map-side, so a head-heavy domain
  * distribution — the web's — costs its row count, not a skewed
  * shuffle); the filter is one broadcast anti-join against a
  * blocklist that is tiny by construction (Blocklists are curated by
  * humans; UT1 is ~4M rows ≈ 100 MB, still broadcastable).
  *
  * The synthetic fixture has no URL column, so queries derive a
  * deterministic one ([[fixtureUrl]]) — replayable in any engine; a
  * real deployment passes its crawl's URL column instead, everything
  * downstream is unchanged.
  */
object Curation {

  /** Deterministic fixture URL: source maps to a host, lang and a
    * doc_id residue to a path — shaped like a real crawl URL
    * (`https://src7.example.com/en/42`) and exactly re-derivable in
    * the DuckDB oracle.
    */
  def fixtureUrl: Column =
    concat(lit("https://"), col("source"), lit(".example.com/"),
      col("lang"), lit("/"), pmod(col("doc_id"), lit(97L)).cast("string"))

  /** Host part of a URL (scheme-agnostic, drops path/query/port-less
    * — the fixture carries none). A plain regexp so the oracle uses
    * the identical pattern; Spark's parse_url would work here too but
    * has no DuckDB twin.
    */
  def domainOf(url: Column): Column =
    regexp_extract(url, "^[a-z]+://([^/]+)/", 1)

  /** Per-domain concentration report: docs, chars, and each domain's
    * half-up micro-unit share of both totals — the table an operator
    * reads before deciding caps (a single domain holding >x% of the
    * corpus is the classic pre-dedup smell). Char shares are carried
    * in DECIMAL(38,0)/HUGEINT: at 100 TB `sum_chars · 2·10⁶`
    * overflows a long.
    */
  def domainStats(docs: DataFrame, url: Column = fixtureUrl): DataFrame = {
    val perDom = docs
      .select(domainOf(url).as("domain"), col("n_chars"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
    val totals = perDom.agg(
      sum(col("n_docs")).as("tot_docs"), sum(col("n_chars")).as("tot_chars"))
    perDom.crossJoin(broadcast(totals))
      .select(col("domain"), col("n_docs"), col("n_chars"),
        expr("(2 * n_docs * 1000000 + tot_docs) DIV (2 * tot_docs)")
          .as("doc_share_ppm"),
        expr("""CAST((2 * CAST(n_chars AS DECIMAL(38,0)) * 1000000 + tot_chars)
                DIV (2 * tot_chars) AS BIGINT)""").as("char_share_ppm"))
  }

  /** Blocklist/allowlist corpus rewrite: keep documents whose domain
    * is NOT on the blocklist AND matches the allow pattern. The
    * blocklist joins as a broadcast anti-join (never a filter against
    * a collected set — the list is a table, maintained like one); the
    * allow pattern is a pushable per-row predicate.
    */
  def domainFilter(docs: DataFrame, blocklist: DataFrame,
                   allowPattern: String = "^[a-z0-9.-]+\\.example\\.com$",
                   url: Column = fixtureUrl): DataFrame = {
    val withDom = docs
      .withColumn("url", url)
      .withColumn("domain", domainOf(col("url")))
    withDom
      .filter(col("domain").rlike(allowPattern))
      .join(broadcast(blocklist.select(col("domain"))), Seq("domain"), "left_anti")
      .select(col("doc_id"), col("domain"), col("url"))
  }

  /** The fixture blocklist: two of the twenty synthetic source hosts —
    * enough rows survive AND drop that the oracle checks both sides.
    */
  def fixtureBlocklist(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq("src0.example.com", "src13.example.com").toDF("domain")
  }

  /** Per-domain document cap (the RefinedWeb/C4 concentration guard
    * [[domainStats]] informs): keep at most `maxPerDomain` documents
    * per domain, ranked by a deterministic quality proxy (longest
    * first, doc_id tie-break). The rank-filter shape is the P10
    * family: Spark's WindowGroupLimit pushes the per-partition top-k
    * below the window sort, so a boilerplate-heavy domain with 10⁹
    * documents never fully sorts — each map task keeps its own top
    * `maxPerDomain` before the exchange.
    */
  def domainCap(docs: DataFrame, maxPerDomain: Int = 10,
                url: Column = fixtureUrl): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    docs
      .withColumn("domain", domainOf(url))
      .withColumn("domain_rank", row_number().over(w))
      .filter(col("domain_rank") <= maxPerDomain)
      .select(col("doc_id"), col("domain"), col("domain_rank"), col("n_chars"))
  }
}
