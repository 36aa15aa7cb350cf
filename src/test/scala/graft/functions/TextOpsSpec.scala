package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextOpsSpec extends SparkSpec {

  private def one(text: String, c: org.apache.spark.sql.Column) = {
    val sess = spark
    import sess.implicits._
    Seq(text).toDF("text").select(c).head()
  }

  test("langId identifies genuinely multilingual snippets") {
    val cases = Seq(
      "the cat and the dog is in the house" -> "en",
      "der hund und die katze ist nicht da" -> "de",
      "el perro que es un gato la casa" -> "es",
      "le chat et les maisons est une idee" -> "fr",
      "我 是 不 了 在 有" -> "zh")
    cases.foreach { case (text, expected) =>
      assert(one(text, TextOps.langId(col("text"))).getString(0) === expected,
        s"for: $text")
    }
  }

  test("langId breaks ties alphabetically") {
    // no markers at all → every hit count is 0 → first lang alphabetically
    assert(one("xyz abc", TextOps.langId(col("text"))).getString(0) === "de")
  }

  test("BPE-ish token count splits letter runs, digits and punctuation") {
    // "hello" "," "world" "42" "!" → 5 (note: pattern is lowercase-ascii)
    assert(one("hello, world 42!",
      TextOps.tokenCountBpe(col("text"))).getLong(0) === 5L)
  }

  test("quality score stays in [0,1] and rewards diverse stopword-bearing text") {
    val good = one("the quick brown fox jumps over the lazy dog and it runs home",
      TextOps.qualityScore(col("text"))).getDouble(0)
    val degenerate = one(Seq.fill(30)("spam").mkString(" "),
      TextOps.qualityScore(col("text"))).getDouble(0)
    assert(good >= 0.0 && good <= 1.0)
    assert(degenerate >= 0.0 && degenerate <= 1.0)
    assert(good > degenerate)
  }

  test("type-token ratio and avg word length") {
    assert(one("a a b", TextOps.typeTokenRatio(col("text"))).getDouble(0)
      === 2.0 / 3.0)
    assert(one("ab cdef", TextOps.avgWordLen(col("text"))).getDouble(0) === 3.0)
  }

  test("q120 vocabCoverage: top-k cut, tie-break, per-lang OOV") {
    val sess = spark
    import sess.implicits._
    // corpus freq: aa=3, bb=2, cc=2, dd=1; k=2 keeps aa and bb (bb
    // beats cc on the lexicographic tie-break at the boundary)
    val docs = Seq(
      ("en", "aa aa bb cc"),
      ("fr", "aa bb cc dd")).toDF("lang", "text")
    val rows = graft.operators.TextQueries.vocabCoverage(docs, k = 2)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getAs[Long]("total_tokens"),
        r.getAs[Long]("covered_tokens"), r.getAs[Long]("oov_types"),
        r.getAs[Double]("cov_ratio")))
    assert(rows.toSeq === Seq(
      ("en", 4L, 3L, 1L, 0.75),   // cc OOV
      ("fr", 4L, 2L, 2L, 0.5)))   // cc, dd OOV
  }

  test("q119 bpePairs: frequency weighting, in-word repeats, 1-char guard") {
    val sess = spark
    import sess.implicits._
    // vocab: "abab" ×2 docs-occurrences, "ba" ×1, "x" ×1 (no pairs)
    val docs = Seq((1L, "abab ba x"), (2L, "abab")).toDF("doc_id", "text")
    val rows = graft.operators.TextQueries.bpePairs(docs)
      .orderBy("pair").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // "abab" pairs: ab, ba, ab -> ab weight 2 per occurrence ×2 = 4
    // appearing in 1 word type; ba from both "abab"(×2) and "ba"(×1)
    assert(rows.toSeq === Seq(("ab", 4L, 1L), ("ba", 3L, 2L)))
  }
}
