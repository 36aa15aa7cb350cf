package graft.functions

import java.math.{BigDecimal => JBigDecimal, MathContext}

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables._

/** User-defined function surface (SURVEY.md §2b q47–q49): scalar UDF,
  * typed Aggregator UDAF, and a generator. q49's generator is the true
  * Catalyst form since round 11 ([[graft.plans.WordBigrams]] — one row
  * per bigram straight off the string); the UDF-array + explode form it
  * replaced survives here as [[bigrams]] for the spec-side equivalence
  * law.
  *
  * UDFs are optimizer-opaque (no pushdown through them) — each is kept
  * leaf-level over an already-pruned projection. */
object UdfQueries {

  /** Scalar UDF: whitespace-normalize text. */
  val normalizeText: String => String =
    s => if (s == null) null
      // Locale.ROOT: default-locale toLowerCase diverges from DuckDB's
      // lower() under e.g. tr-TR (dotless i)
      else s.toLowerCase(java.util.Locale.ROOT).trim.replaceAll("\\s+", " ")

  /** Typed UDAF: exact Σx² over quantities as BigDecimal — deterministic
    * (decimal addition is associative/commutative, any accumulation order
    * gives the same result). */
  object SumSqAgg extends Aggregator[Double, JBigDecimal, JBigDecimal] {
    override def zero: JBigDecimal = JBigDecimal.ZERO
    override def reduce(b: JBigDecimal, x: Double): JBigDecimal = {
      val d = JBigDecimal.valueOf(x)
      b.add(d.multiply(d, MathContext.UNLIMITED))
    }
    override def merge(a: JBigDecimal, b: JBigDecimal): JBigDecimal = a.add(b)
    override def finish(r: JBigDecimal): JBigDecimal =
      r.setScale(4, java.math.RoundingMode.HALF_UP)
    override def bufferEncoder: Encoder[JBigDecimal] = Encoders.DECIMAL
    override def outputEncoder: Encoder[JBigDecimal] = Encoders.DECIMAL
  }

  /** Word bigrams — the element producer behind the q49 generator. */
  val bigrams: String => Array[String] =
    s => if (s == null) Array.empty
      // limit -1 keeps trailing empty tokens, matching Spark's split()
      // and DuckDB's string_split on trailing whitespace
      else s.split(" ", -1).iterator.sliding(2).withPartial(false)
        .map(_.mkString(" ")).toArray

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_udf_norm" -> { (s, dir) =>
      val norm = udf(normalizeText)
      tWide(s, dir, "documents")
        .select(col("lang"), norm(col("text")).as("norm_text"))
        .groupBy("lang")
        .agg(countDistinct(col("norm_text")).as("n_norm"),
          count(lit(1)).as("n_docs"))
        .orderBy("lang")
    },

    "q48_udaf_sumsq" -> { (s, dir) =>
      val sumsq = udaf(SumSqAgg)
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(sumsq(col("l_quantity")).cast(D).cast("double").as("sum_sq"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // True Catalyst Generator (graft.plans.WordBigrams): one row per
    // bigram straight off the string — no intermediate array, no UDF
    // boundary. The UDF-array + explode form this replaces survives in
    // GraftFunctionsSpec as the equivalence law.
    "q49_udtf_bigrams" -> { (s, dir) =>
      tWide(s, dir, "documents")
        .select(graft.plans.GraftExpressions.word_bigrams(col("text"))
          .as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("bigram"))
        .limit(10)
    },
  )

  def oracle: Map[String, String] = Map(
    "q47_udf_norm" ->
      """SELECT lang,
        | count(DISTINCT trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS n_norm,
        | count(*) AS n_docs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q48_udaf_sumsq" ->
      """SELECT l_returnflag,
        | CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_sq,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q49_udtf_bigrams" ->
      """SELECT bg AS bigram, count(*) AS cnt FROM (
        | SELECT unnest(list_transform(range(0, len(sp) - 1),
        |   i -> array_to_string(sp[i+1:i+2], ' '))) AS bg
        | FROM (SELECT string_split(text, ' ') AS sp FROM documents) t) u
        |GROUP BY bg ORDER BY cnt DESC, bg LIMIT 10""".stripMargin,
  )
}
