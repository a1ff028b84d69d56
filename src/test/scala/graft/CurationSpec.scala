package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Curation

/** Semantic evidence for the curation operators (the DuckDB oracle
  * proves engine parity; these prove the operators mean what they
  * claim on planted inputs).
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("repetitionScore: looping text scores high, diverse text scores 0") {
    val docs = Seq(
      Doc(1, "spam spam spam spam spam spam spam spam"),
      Doc(2, "one two three four five six seven eight")).toDF
    val r = Curation.repetitionScore(docs)
      .select("doc_id", "repetition").as[(Long, Double)].collect().toMap
    assert(r(1L) > 0.8, s"looping doc scored ${r(1L)}")
    assert(r(2L) == 0.0, s"diverse doc scored ${r(2L)}")
  }

  test("hashSplit: deterministic, exhaustive, roughly proportional") {
    val docs = (0L until 1000L).map(i => Doc(i, "x")).toDF
    val s1 = Curation.hashSplit(docs).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val s2 = Curation.hashSplit(docs).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(s1 == s2, "split not deterministic")
    assert(s1.values.sum == 1000)
    assert(s1("train") > 700 && s1("train") < 900, s"train=${s1("train")}")
    assert(s1("val") > 50 && s1("val") < 150, s"val=${s1("val")}")
  }

  test("stratifiedSample: deterministic subset at ~permille rate") {
    val docs = (0L until 1000L).map(i => Doc(i, "x")).toDF
    val n1 = Curation.stratifiedSample(docs, permille = 100).count()
    val n2 = Curation.stratifiedSample(docs, permille = 100).count()
    assert(n1 == n2)
    assert(n1 > 50 && n1 < 150, s"sampled $n1 of 1000 at 10%")
  }

  test("contamination: flags the doc sharing trigrams with the benchmark doc") {
    // doc 0 is the benchmark (0 % 97 == 0); doc 5 copies a span of it
    val docs = Seq(
      Doc(0, "alpha beta gamma delta epsilon zeta eta theta"),
      Doc(5, "alpha beta gamma delta unrelated tail words here"),
      Doc(7, "completely different text with no overlap at all")).toDF
    val flagged = Curation.contamination(docs, benchMod = 97, minShared = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(flagged == Set(5L), s"flagged $flagged")
  }

  test("vocabTopK: most frequent token first, ties on token") {
    val docs = Seq(Doc(1, "b b b a a c"), Doc(2, "a b d d")).toDF
    val top = Curation.vocabTopK(docs, k = 3)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("b", 4L), ("a", 3L), ("d", 2L)), s"got $top")
  }
}
