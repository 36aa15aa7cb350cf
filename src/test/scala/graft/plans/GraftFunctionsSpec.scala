package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions evaluate like their Column twins") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_poly_hash('hello') AS h,
        |       graft_poly_hash('hello', 137) AS h137,
        |       graft_seq_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                     array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d
        |""".stripMargin).head()
    assert(r.getLong(0) === 792145564L)
    assert(r.getLong(1) !== r.getLong(0))
    assert(r.getDouble(2) === 11.0)
  }

  test("WordBigrams generator equals the UDF-array + explode form (the q49 equivalence law)") {
    import org.apache.spark.sql.functions._
    val sess = spark
    import sess.implicits._
    // edges on purpose: normal text, single token (no bigram), empty
    // string (split -1 gives one empty token — no bigram), trailing
    // space (trailing empty token SURVIVES and pairs), null (no rows)
    val docs = Seq[(Long, String)](
      (1L, "a b c d"), (2L, "solo"), (3L, ""), (4L, "x y "),
      (6L, "a b c d")).toDF("doc_id", "text")
      .unionByName(Seq(5L).toDF("doc_id").withColumn("text",
        lit(null).cast("string")))
    val viaGen = docs
      .select(col("doc_id"),
        GraftExpressions.word_bigrams(col("text")).as("bigram"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val bg = udf(graft.functions.UdfQueries.bigrams)
    val viaUdf = docs
      .select(col("doc_id"), explode(bg(col("text"))).as("bigram"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(viaGen === viaUdf)
    assert(viaGen.contains((4L, "y ")), "trailing empty token must pair")
    assert(!viaGen.exists(_._1 == 5L) && !viaGen.exists(_._1 == 2L))
    // SQL surface
    GraftFunctions.register(spark)
    val sql = spark.sql("SELECT graft_bigrams('p q r') AS bigram")
      .collect().map(_.getString(0)).toSeq
    assert(sql === Seq("p q", "q r"))
  }

  test("sorted_intersect matches array_intersect size on sorted inputs") {
    GraftFunctions.register(spark)
    val sess = spark
    import sess.implicits._
    // random-ish sorted duplicate-free arrays incl. empty and disjoint
    val rows = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 5L, 10L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq(-5L, 0L, 7L), Seq(-5L, 0L, 7L))).toDF("a", "b")
    val out = rows.select(
      GraftExpressions.sorted_intersect($"a", $"b").as("fast"),
      org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.array_intersect($"a", $"b"))
        .cast("long").as("ref"))
      .collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
    // SQL surface
    val sql = spark.sql(
      "SELECT graft_sorted_intersect(array(1L,2L,3L), array(2L,3L,9L)) AS c")
      .head().getLong(0)
    assert(sql === 2L)
    // null elements never match (getLong on a null slot would read 0)
    val nulls = spark.sql(
      "SELECT graft_sorted_intersect(array(0L, 1L), array(CAST(NULL AS BIGINT))) AS c")
      .head().getLong(0)
    assert(nulls === 0L)
  }

  test("zip_equal matches the interpreted zip_with formulation") {
    GraftFunctions.register(spark)
    val sess = spark
    import sess.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 0L)),   // 2 agree
      (Seq.empty[Long], Seq.empty[Long]),            // empty
      (Seq(7L, 7L), Seq(7L, 7L)),                    // all agree
      (Seq(-1L, 0L), Seq(1L, 5L))).toDF("a", "b")    // none agree
    val out = rows.select(
      GraftExpressions.zip_equal($"a", $"b").as("fast"),
      size(filter(zip_with($"a", $"b", (x, y) => x === y), p => p))
        .cast("long").as("ref"))
      .collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
    // SQL surface + null slots never match
    assert(spark.sql(
      "SELECT graft_zip_equal(array(1L, NULL, 3L), array(1L, NULL, 9L)) AS c")
      .head().getLong(0) === 1L)
    // ragged arrays fail loudly
    val e = intercept[Exception] {
      spark.sql("SELECT graft_zip_equal(array(1L,2L), array(1L))").head()
    }
    assert(e.getMessage.contains("length mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("length mismatch"))
  }

  test("poly_hash of a literal is constant-folded by Catalyst") {
    GraftFunctions.register(spark)
    val opt = spark.sql("SELECT graft_poly_hash('hello') AS h")
      .queryExecution.optimizedPlan.toString
    assert(opt.contains("792145564"),
      s"expected folded literal in optimized plan:\n$opt")
  }

  test("sign_lsh_bands equals the per-plane seq_dot formulation") {
    // the q73 kernel vs the r4 shape it replaced: for random vectors
    // (including exact-zero dots, which both sides must call NOT > 0),
    // bit t of band b's key must equal when(seq_dot(v, plane_{b·bits+t})
    // > 0) — the global-index, MSB-first plane convention
    import org.apache.spark.sql.functions._
    val sess = spark
    import sess.implicits._
    val bands = 2; val bits = 2; val dims = 8
    val planes = bands * bits
    def sign(i: Int, j: Int): Double =
      if (((i * 73 + j * 179) % 7) % 2 == 0) 1.0 else -1.0
    val signs = Array.tabulate(planes * dims)(idx =>
      sign(idx % dims + 1, idx / dims))
    val rnd = new scala.util.Random(573)
    val vecs = Seq.fill(40)(Seq.fill(dims)(rnd.nextFloat() * 2f - 1f)) ++
      Seq(Seq.fill(dims)(0f)) // all-zero vector: every dot is 0 → bit 0
    val df = vecs.toDF("v").select($"v".cast("array<float>").as("v"))
    val bitCols = (0 until planes).map { j =>
      val plane = array((1 to dims).map(i => lit(sign(i, j).toFloat)): _*)
      when(GraftExpressions.seq_dot($"v", plane) > 0, 1)
        .otherwise(0).as(s"bit$j")
    }
    val withCode = df.select(
      GraftExpressions.sign_lsh_bands($"v", signs, bands, bits, dims)
        .as("keys") +: bitCols: _*)
    withCode.collect().foreach { r =>
      val keys = r.getSeq[Long](0)
      assert(keys.length === bands)
      for (b <- 0 until bands; t <- 0 until bits) {
        val expected = r.getInt(1 + b * bits + t)
        val actual = ((keys(b) >> (bits - 1 - t)) & 1L).toInt
        assert(actual === expected, s"band $b bit $t of keys $keys")
      }
    }
  }

  test("sign_lsh_bands carries the r13 recall ladder's widest rung " +
      "(150 bands × 12 bits = 1800 planes) past the single-BIGINT cap") {
    // the two-dimensional band scheme (CorpusQueries.bandBits ×
    // bandCount) needs up to 150 × 12 planes — impossible in one packed
    // BIGINT (the r12 kernel's 63-plane cap was exactly why band count
    // stayed frozen at 4 and recall collapsed); every per-band key must
    // stay in [0, 2^bits) so shiftright extraction agrees with DuckDB's
    // variable-width fold
    import org.apache.spark.sql.functions._
    val sess = spark
    import sess.implicits._
    val bands = 150; val bits = 12; val dims = 8
    def sign(i: Int, j: Int): Double =
      if (((i * 73 + j * 179) % 7) % 2 == 0) 1.0 else -1.0
    val signs = Array.tabulate(bands * bits * dims)(idx =>
      sign(idx % dims + 1, idx / dims))
    val rnd = new scala.util.Random(12901)
    val vecs = Seq.fill(10)(Seq.fill(dims)(rnd.nextFloat() * 2f - 1f))
    val df = vecs.toDF("v").select($"v".cast("array<float>").as("v"))
    val rows = df.select($"v",
      GraftExpressions.sign_lsh_bands($"v", signs, bands, bits, dims)
        .as("keys"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val keys = r.getSeq[Long](1)
      assert(keys.length === bands)
      assert(keys.forall(k => k >= 0L && k < (1L << bits)))
      for (b <- 0 until bands; t <- 0 until bits) {
        val j = b * bits + t
        var acc = 0.0
        for (i <- 0 until dims) acc += v(i).toDouble * sign(i + 1, j)
        val expected = if (acc > 0) 1L else 0L
        assert(((keys(b) >> (bits - 1 - t)) & 1L) === expected,
          s"band $b bit $t")
      }
    }
  }

  test("seq_dot_long equals the interpreted zip_with+aggregate formulation") {
    import org.apache.spark.sql.functions._
    val sess = spark
    import sess.implicits._
    val rnd = new scala.util.Random(90)
    val vecs = Seq.fill(20)((
      Seq.fill(16)(rnd.nextInt(255).toLong - 127),
      Seq.fill(16)(rnd.nextInt(255).toLong - 127)))
    val df = vecs.toDF("a", "b")
    val rows = df.select(
      GraftExpressions.seq_dot_long($"a", $"b").as("k"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("i")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // length mismatch fails loudly, not a truncated-prefix dot
    val ragged = Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
    val e = intercept[Exception] {
      ragged.select(GraftExpressions.seq_dot_long($"a", $"b")).collect()
    }
    assert(e.getMessage != null)
  }

  test("wrong input types are rejected at analysis, not mid-job") {
    GraftFunctions.register(spark)
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_poly_hash(123)").head()
    }
    assert(e1.getMessage.toLowerCase.contains("string"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_seq_dot(array(1.0, 2.0), array(3.0, 4.0))").head()
    }
    assert(e2.getMessage.toLowerCase.contains("float"))
  }

  test("seq_dot fails loudly on ragged arrays") {
    val sess = spark
    import sess.implicits._
    val df = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(GraftExpressions.seq_dot(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b"))).head()
    }
    assert(e.getMessage.contains("length mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("length mismatch"))
  }

  test("extensions class injects both functions") {
    // construct the injection point directly; a cluster reaches this via
    // spark.sql.extensions=graft.plans.GraftExtensions at builder time
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)   // must not throw
  }

  test("round-5 kernels are SQL-callable: morton, seq_dot_long, MG, topk") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_morton(3L, 1L) AS z,
        |       graft_seq_dot_long(array(1L, 2L), array(3L, 4L)) AS d
        |""".stripMargin).head()
    // x=3 -> bits 0,2 set (0b0101); y=1 -> bit 1 set (0b0010) => 0b0111
    assert(r.getLong(0) === 7L)
    assert(r.getLong(1) === 11L)
    val agg = spark.sql(
      """SELECT s.cand AS cand, s.n AS n, t AS top FROM (
        |  SELECT graft_misra_gries(g, 4) AS s, graft_topk(v, id, 2) AS t
        |  FROM VALUES ('a', 1.0D, 10L), ('a', 3.0D, 11L), ('b', 2.0D, 12L)
        |    AS data(g, v, id))
        |""".stripMargin).head()
    assert(agg.getSeq[String](0).toSet === Set("a", "b"))
    assert(agg.getLong(1) === 3L)
    val top = agg.getSeq[org.apache.spark.sql.Row](2)
    assert(top.map(_.getDouble(0)) === Seq(3.0, 2.0))
    // non-literal k must be rejected, not miscompiled
    intercept[Exception] {
      spark.sql("SELECT graft_topk(v, id, id) FROM VALUES (1.0D, 1L) AS d(v, id)")
        .collect()
    }
    // fractional k must be rejected, not truncated to 2
    intercept[Exception] {
      spark.sql("SELECT graft_topk(v, id, 2.9) FROM VALUES (1.0D, 1L) AS d(v, id)")
        .collect()
    }
    // a BIGINT k outside int range must be rejected, not int-wrapped
    // (4294967298 = 2^32 + 2 wraps to 2 under Number.intValue)
    intercept[Exception] {
      spark.sql("SELECT graft_topk(v, id, 4294967298) FROM VALUES (1.0D, 1L) AS d(v, id)")
        .collect()
    }
    // k < 1 must be rejected with the same contract error
    intercept[Exception] {
      spark.sql("SELECT graft_misra_gries(g, 0) FROM VALUES ('a') AS d(g)")
        .collect()
    }
    // wrong input types fail at ANALYSIS, not mid-job ClassCastException
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT graft_topk(CAST(v AS DECIMAL(10,2)), id, 3) FROM VALUES (1.0D, 1L) AS d(v, id)")
        .collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_misra_gries(id, 4) FROM VALUES (1L) AS d(id)")
        .collect()
    }
  }

  test("morton interleave: reference equality, injectivity, tile locality") {
    import org.apache.spark.sql.functions._
    import GraftExpressions.morton
    val sess = spark
    import sess.implicits._
    // plain-Scala reference interleave
    def spreadRef(v: Long): Long = {
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((v >> i) & 1L) << (2 * i))
      }
    }
    val rnd = new scala.util.Random(3)
    val pts = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), morton(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z === (spreadRef(x) | (spreadRef(y) << 1)),
        s"magic-mask spread must equal the naive bit loop for ($x,$y)")
    }
    // injective on the 16-bit domain
    assert(got.map(_._3).distinct.length === got.map(t => (t._1, t._2)).distinct.length)
    // tile locality: same z>>26 bucket => both coords within a 2^13 tile
    got.groupBy(_._3 >> 26).foreach { case (_, g) =>
      assert(g.map(_._1).max - g.map(_._1).min < 8192)
      assert(g.map(_._2).max - g.map(_._2).min < 8192)
    }
  }
}
