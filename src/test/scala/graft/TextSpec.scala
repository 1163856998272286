package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextAnalysis

class TextSpec extends AnyFunSuite with SparkFixture {

  test("langid picks the language whose stopwords dominate") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat in the house and the dog is that"),
      (2L, "el perro y la casa de que en un es"),
      (3L, "le chat est dans la maison et le chien de que"),
      (4L, "der hund und die katze in das haus ist zu ein"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.langId(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "fr", 4L -> "de"))
  }

  test("rolling fingerprint is order-sensitive, bow fingerprint is not") {
    import spark.implicits._
    import graft.dedup.Dedup
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"))
      .toDF("doc_id", "text")
    val roll = df.select(TextAnalysis.rollingFingerprint(col("text")))
      .collect().map(_.getLong(0))
    assert(roll(0) != roll(1))
    val bow = df.select(Dedup.bowFingerprint(col("text")))
      .collect().map(_.getString(0))
    assert(bow(0) == bow(1))
  }

  test("quality features are consistent") {
    val q = TextAnalysis.quality(Tables.documents(spark, sfDir), "doc_id", "text")
    assert(q.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() == 0)
    assert(q.filter(col("n_tokens") <= 0).count() == 0)
  }
}
