package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form distributed OLS — the cheap linear proxy a curation
  * pipeline fits against an expensive scorer (here: predict `n_chars`
  * from token count and distinct-token count) and then applies
  * corpus-wide to rank structural outliers.
  *
  * Shape: the ENTIRE fit is one partial-aggregated pass producing the
  * ten Gram-matrix moments (X'X and X'y for k=2 features + intercept),
  * then a driver-free in-plan 3×3 Cramer solve on the single moment
  * row. Scoring broadcasts that one row back over the corpus — no
  * shuffle beyond the moment reduce, no iteration, no driver collect;
  * at 100 TB this is a map-reduce of 10 doubles plus one map pass.
  *
  * Determinism contract (same discipline as the BM25/cosine oracles):
  * features and target are integers, so every moment is an exact
  * BIGINT sum; moments cast to double exactly (all < 2^53 at fixture
  * scales — the 100 TB deployment would move moments to decimal(38,0)
  * before the cast); the determinant expressions are written with one
  * pinned association order, mirrored token-for-token in the DuckDB
  * oracle, so the final round-6 betas are bit-identical.
  */
object Regression {

  /** Integer design matrix: x1 = token count, x2 = distinct-token
    * count, y = n_chars. Exact on both engines by construction.
    */
  def features(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("x1"),
      size(array_distinct(TextAnalysis.tokens(col("text")))).cast("long").as("x2"),
      col("n_chars").as("y"))

  /** One-pass Gram moments. Symmetric 3×3 normal matrix
    * [[m11,m12,m13],[m12,m22,m23],[m13,m23,m33]] and rhs (v1,v2,v3).
    */
  private def moments(feats: DataFrame): DataFrame =
    feats.agg(
      count(lit(1)).cast("double").as("m11"),
      sum(col("x1")).cast("double").as("m12"),
      sum(col("x2")).cast("double").as("m13"),
      sum(col("x1") * col("x1")).cast("double").as("m22"),
      sum(col("x1") * col("x2")).cast("double").as("m23"),
      sum(col("x2") * col("x2")).cast("double").as("m33"),
      sum(col("y")).cast("double").as("v1"),
      sum(col("x1") * col("y")).cast("double").as("v2"),
      sum(col("x2") * col("y")).cast("double").as("v3"),
      sum(col("y") * col("y")).cast("double").as("syy"),
      count(lit(1)).as("n"))

  // 3×3 determinant expansion along the first row/column — the exact
  // association order the oracle SQL repeats.
  private def dets(m: DataFrame): DataFrame = m
    .withColumn("det",
      col("m11") * (col("m22") * col("m33") - col("m23") * col("m23"))
        - col("m12") * (col("m12") * col("m33") - col("m23") * col("m13"))
        + col("m13") * (col("m12") * col("m23") - col("m22") * col("m13")))
    .withColumn("det0",
      col("v1") * (col("m22") * col("m33") - col("m23") * col("m23"))
        - col("m12") * (col("v2") * col("m33") - col("m23") * col("v3"))
        + col("m13") * (col("v2") * col("m23") - col("m22") * col("v3")))
    .withColumn("det1",
      col("m11") * (col("v2") * col("m33") - col("v3") * col("m23"))
        - col("v1") * (col("m12") * col("m33") - col("m23") * col("m13"))
        + col("m13") * (col("m12") * col("v3") - col("v2") * col("m13")))
    .withColumn("det2",
      col("m11") * (col("m22") * col("v3") - col("m23") * col("v2"))
        - col("m12") * (col("m12") * col("v3") - col("v2") * col("m13"))
        + col("v1") * (col("m12") * col("m23") - col("m22") * col("m13")))

  /** Fitted model as one row: (n, beta0, beta1, beta2, r2), round-6.
    * r2 comes from the same moments (SSE = Syy − β·X'y), no second
    * pass over the data.
    */
  def fit(feats: DataFrame): DataFrame =
    dets(moments(feats)).select(
      col("n"),
      round(col("det0") / col("det"), 6).as("beta0"),
      round(col("det1") / col("det"), 6).as("beta1"),
      round(col("det2") / col("det"), 6).as("beta2"),
      round(lit(1.0) - (col("syy")
          - (((col("det0") / col("det")) * col("v1")
            + (col("det1") / col("det")) * col("v2"))
            + (col("det2") / col("det")) * col("v3")))
        / (col("syy") - col("v1") * col("v1") / col("m11")), 6).as("r2"))

  /** Corpus-wide scoring with the ROUND-6 betas (so the oracle scores
    * with literally the same coefficients): top-k largest absolute
    * residuals — the documents whose length is least explained by
    * their token structure.
    */
  def topResiduals(feats: DataFrame, k: Int): DataFrame = {
    val betas = fit(feats).select(col("beta0"), col("beta1"), col("beta2"))
    feats.crossJoin(broadcast(betas))
      .withColumn("pred", round(
        (col("beta0") + col("beta1") * col("x1")) + col("beta2") * col("x2"), 6))
      .withColumn("resid", round(col("y") - col("pred"), 6))
      .select(col("doc_id"), col("y"), col("pred"), col("resid"))
      .orderBy(abs(col("resid")).desc, col("doc_id").asc)
      .limit(k)
  }
}
