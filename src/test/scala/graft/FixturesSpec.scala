package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Fixture-schema drift detection + loadEvents encoding contract.
  *
  * The r8 fixture regeneration silently flipped `events.ts` from parquet
  * TIMESTAMP(NANOS) to TIMESTAMP_MICROS(isAdjustedToUTC=false) and took
  * 23 gated keys down for two rounds with nothing in-repo noticing. This
  * suite is that detector: (1) the Spark-read schema of every fixture
  * table at sf0.001 is pinned column-by-column, so the NEXT format change
  * fails here first, naming the table and column; (2) `Tables.loadEvents`
  * is exercised against tiny in-test parquet files in BOTH encodings it
  * supports, asserting they surface identical micros instants, plus the
  * loud-failure path for an unsupported type.
  */
class FixturesSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  /** (table -> (column -> catalogString)). catalogString deliberately
    * drops nullability — parquet read marks everything nullable; drift
    * we care about is name/type/order. */
  private val Expected: Seq[(String, Seq[(String, String)])] = Seq(
    "region" -> Seq(
      "r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq(
      "n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq(
      "c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq(
      "s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq(
      "p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string",
      "p_size" -> "int", "p_retailprice" -> "double"),
    "orders" -> Seq(
      "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq(
      "l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "events" -> Seq(
      "event_id" -> "bigint", "ts" -> "timestamp_ntz",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq(
      "doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string",
      "n_chars" -> "bigint"),
    "embeddings" -> Seq(
      "vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int"),
  )

  test("fixture schemas at sf0.001 match the pinned contract, per table and column") {
    val drift = Expected.flatMap { case (tab, cols) =>
      val got = Tables.t(spark, SfDir, tab).schema
        .map(f => f.name -> f.dataType.catalogString)
      if (got == cols) Nil
      else {
        val missing = cols.filterNot(c => got.contains(c))
          .map { case (n, t) => s"$tab.$n: expected $t, " +
            got.find(_._1 == n).map(g => s"got ${g._2}").getOrElse("column absent") }
        val extra = got.map(_._1).diff(cols.map(_._1))
          .map(n => s"$tab.$n: unexpected new column")
        val order = if (missing.isEmpty && extra.isEmpty)
          Seq(s"$tab: column order changed (${got.map(_._1).mkString(",")})")
          else Nil
        missing ++ extra ++ order
      }
    }
    assert(drift.isEmpty,
      "FIXTURE DRIFT — regenerate loaders/oracles for:\n  " +
        drift.mkString("\n  "))
  }

  // ---- loadEvents encoding contract ---------------------------------

  /** The three instants every encoding must reproduce exactly. */
  private val InstantsUs =
    Seq(0L, 1700000000000000L, 1700000000123456L)

  private def writeEvents(mk: org.apache.spark.sql.Column): String = {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft_fixtures").toString
    InstantsUs.toDF("expect_us")
      .select(mk.as("ts"), col("expect_us"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def roundTrip(dir: String): Seq[(Long, Long)] =
    Tables.loadEvents(spark, dir)
      .select(unix_micros(col("ts")).as("got_us"), col("expect_us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq.sorted

  test("loadEvents: nanos-as-long encoding surfaces exact micros instants") {
    // the nanosAsLong conf presents parquet TIMESTAMP(NANOS) as LongType
    // nanos; a written long column exercises the identical read surface
    val dir = writeEvents(col("expect_us") * 1000L)
    roundTrip(dir).foreach { case (got, want) =>
      assert(got === want, s"nanos path: $got != $want")
    }
  }

  test("loadEvents: micros-NTZ encoding surfaces exact micros instants") {
    // Spark writes TimestampNTZType as TIMESTAMP_MICROS(utc=false) —
    // byte-identical to the current driver fixtures
    val dir = writeEvents(
      timestamp_micros(col("expect_us")).cast(TimestampNTZType))
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType === TimestampNTZType,
      "in-test fixture must reproduce the NTZ read surface")
    roundTrip(dir).foreach { case (got, want) =>
      assert(got === want, s"micros-NTZ path: $got != $want")
    }
  }

  test("loadEvents: both encodings of the same instants are indistinguishable downstream") {
    val nanos = roundTrip(writeEvents(col("expect_us") * 1000L))
    val ntz = roundTrip(writeEvents(
      timestamp_micros(col("expect_us")).cast(TimestampNTZType)))
    assert(nanos === ntz, "encoding leaked into query-visible instants")
  }

  test("loadEvents: an unsupported ts type fails loudly, naming the column") {
    val dir = writeEvents(col("expect_us").cast("string"))
    val e = intercept[IllegalStateException] {
      Tables.loadEvents(spark, dir)
    }
    assert(e.getMessage.contains("events.ts"),
      s"error must name the column: ${e.getMessage}")
  }
}
