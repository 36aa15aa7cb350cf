package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class StagingSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("graft_staging").toString

  test("store -> keysList -> vacuum round trip (the reference's staging cycle)") {
    val sess = spark
    import sess.implicits._
    val dir = tmp() + "/stage"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")

    val uri = Staging.store(df, dir)
    assert(uri.startsWith("file:"), s"qualified URI expected, got $uri")

    val keys = Staging.keysList(spark, dir)
    assert(keys.exists(_.endsWith(".parquet")), s"parquet files expected in $keys")
    assert(spark.read.parquet(dir).count() === 2)

    assert(Staging.vacuum(spark, dir))
    assert(Staging.keysList(spark, dir).isEmpty)
    assert(!Staging.vacuum(spark, dir), "vacuum of missing prefix is a no-op")
  }

  test("csv, json and orc staging round-trips preserve data") {
    val sess = spark
    import sess.implicits._
    val base = tmp()
    val df = Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("id", "name", "score")
    Staging.store(df, s"$base/csv", format = "csv")
    Staging.store(df, s"$base/json", format = "json")
    Staging.store(df, s"$base/orc", format = "orc")
    val csv = spark.read.schema(df.schema).csv(s"$base/csv")
    val json = spark.read.schema(df.schema).json(s"$base/json")
    val orc = spark.read.orc(s"$base/orc")
    assert(csv.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
    assert(json.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
    assert(orc.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
  }

  test("partitioned store lays out hive-style directories") {
    val sess = spark
    import sess.implicits._
    val dir = tmp() + "/part"
    val df = Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("id", "lang")
    Staging.store(df, dir, partitionBy = Seq("lang"))
    val keys = Staging.keysList(spark, dir)
    assert(keys.exists(_.contains("lang=en")) && keys.exists(_.contains("lang=de")))
    // partition pruning: only lang=en files are read
    val pruned = spark.read.parquet(dir).filter("lang = 'en'")
    assert(pruned.count() === 2)
    val scanned = pruned.queryExecution.executedPlan.toString
    assert(scanned.contains("PartitionFilters"), "expect partition filters in scan")
  }

  test("co-bucketed tables join without exchange or sort") {
    val sess = spark
    import sess.implicits._
    val fact = (1 to 2000).map(i => (i.toLong % 100, i.toLong)).toDF("k", "v")
    val dim = (0 to 99).map(i => (i.toLong, s"d$i")).toDF("k2", "name")
    Staging.storeBucketed(fact, "fact_b", Seq("k"), 8)
    Staging.storeBucketed(dim, "dim_b", Seq("k2"), 8)
    val joined = spark.table("fact_b")
      .join(spark.table("dim_b").hint("merge"), $"k" === $"k2")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"co-bucketed join must not shuffle:\n$plan")
    assert(joined.count() === 2000)
    spark.sql("DROP TABLE fact_b"); spark.sql("DROP TABLE dim_b")
  }

  test("appendBucketed grows an index without losing bucket co-location") {
    val sess = spark
    import sess.implicits._
    // day-1 corpus build, then a day-2 ingest APPENDS — the q106/q108
    // per-ingest growth path. The combined table must (a) equal a
    // one-shot build's row set and (b) still join bucket-aligned with
    // zero exchange on the index side.
    val day1 = (1 to 600).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    val day2 = (601 to 900).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    Staging.storeBucketed(day1, "idx_grow", Seq("k"), 8)
    Staging.appendBucketed(day2, "idx_grow", Seq("k"), 8)
    val combined = spark.table("idx_grow")
    assert(combined.count() === 900)
    assert(combined.select("v").as[Long].collect().toSet === (1L to 900L).toSet)
    // probe: shuffled batch side joins the index with no index-side
    // exchange (batch side may shuffle into the bucket scheme)
    val probe = (0 to 49).map(i => (i.toLong, s"p$i")).toDF("pk", "tag")
    val joined = combined.join(probe.hint("merge"), $"k" === $"pk")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"),
      s"appended index must still scan bucketed:\n$plan")
    // exactly one exchange: the probe side clustering into the buckets
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"only the probe side may shuffle after an append:\n$plan")
    assert(joined.count() === 900)
    // mismatched bucket spec must be refused, not silently corrupt
    intercept[Exception] {
      Staging.appendBucketed(day2, "idx_grow", Seq("k"), 16)
    }
    spark.sql("DROP TABLE idx_grow")
  }

  test("compactBucketed restores one file per bucket and the sort-free merge") {
    val sess = spark
    import sess.implicits._
    // lifecycle: build + three ingest appends fragment the layout
    // (one extra file per written bucket per append); compaction must
    // (a) bring it back to exactly one file per bucket, (b) change no
    // rows, and (c) RESTORE the sort-free bucketed merge that the
    // one-file-per-bucket invariant licenses (q69's conf opt-in) —
    // the property appends degrade and path-level compact() would
    // destroy outright (it rewrites files without bucket-id names).
    val B = 8
    def day(lo: Int, hi: Int) =
      (lo to hi).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    Staging.storeBucketed(day(1, 400), "idx_cpt", Seq("k"), B)
    (1 to 3).foreach(d =>
      Staging.appendBucketed(day(400 * d + 1, 400 * d + 400),
        "idx_cpt", Seq("k"), B))
    assert(spark.table("idx_cpt").inputFiles.length > B,
      "appends must have fragmented the layout for the test to bite")
    val nFiles = Staging.compactBucketed(spark, "idx_cpt", Seq("k"), B)
    assert(nFiles === B, s"expected one file per bucket, got $nFiles")
    val t = spark.table("idx_cpt")
    assert(t.count() === 1600)
    assert(t.select("v").as[Long].collect().toSet === (1L to 1600L).toSet)
    val orderingConf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(orderingConf, "true")
    try {
      val other = (0 to 49).map(i => (i.toLong, i * 10L)).toDF("pk", "w")
      Staging.storeBucketed(
        other.repartition(B, $"pk"), "idx_cpt_dim", Seq("pk"), B)
      val j = spark.table("idx_cpt")
        .join(spark.table("idx_cpt_dim").hint("merge"), $"k" === $"pk")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"compacted bucketed join must not shuffle:\n$plan")
      assert(!plan.contains("Sort ["),
        s"one-file-per-bucket scan order must make the merge sort-free:\n$plan")
      assert(j.count() === 1600)
    } finally {
      spark.conf.unset(orderingConf)
      spark.sql("DROP TABLE IF EXISTS idx_cpt_dim")
    }
    spark.sql("DROP TABLE idx_cpt")
  }

  test("compact rewrites a many-small-files prefix into few files, same rows") {
    val sess = spark
    import sess.implicits._
    val dir = tmp() + "/frag"
    // 40 tiny files (streaming-sink shape)
    (1 to 40).toDF("id").repartition(40).write.parquet(dir)
    assert(spark.read.parquet(dir).inputFiles.length > 10)
    val before = spark.read.parquet(dir).collect().map(_.getInt(0)).sorted
    val nFiles = Staging.compact(spark, dir, targetBytes = Long.MaxValue)
    assert(nFiles === 1, "everything fits one target-size file")
    val after = spark.read.parquet(dir).collect().map(_.getInt(0)).sorted
    assert(after.toSeq === before.toSeq, "compaction must not change rows")
  }

  test("compact keeps hive partitioning when told, refuses sink outputs") {
    val sess = spark
    import sess.implicits._
    val dir = tmp() + "/part_frag"
    Seq((1, "en"), (2, "de"), (3, "en"), (4, "de"))
      .toDF("id", "lang").repartition(8)
      .write.partitionBy("lang").parquet(dir)
    Staging.compact(spark, dir, targetBytes = Long.MaxValue,
      partitionBy = Seq("lang"))
    val plan = spark.read.parquet(dir).filter($"lang" === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      s"partition layout must survive compaction:\n$plan")
    assert(spark.read.parquet(dir).count() === 4)
    // streaming-sink outputs are refused — compacting behind the sink's
    // _spark_metadata log hides data from metadata-aware readers
    val sinkDir = tmp() + "/sinkish"
    Seq(1).toDF("id").write.parquet(sinkDir)
    new java.io.File(sinkDir, "_spark_metadata").mkdir()
    val e = intercept[IllegalArgumentException] {
      Staging.compact(spark, sinkDir)
    }
    assert(e.getMessage.contains("_spark_metadata"))
  }

  test("upsert replaces matching keys and appends new ones") {
    val sess = spark
    import sess.implicits._
    val existing = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "score")
    val updates = Seq((2L, "b2", 21.0), (4L, "d", 40.0))
      .toDF("id", "name", "score")
    val merged = Staging.upsert(existing, updates, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(merged.toSeq === Seq(
      (1L, "a", 10.0), (2L, "b2", 21.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("upsert preserves column order when the key is not the first column") {
    // regression: the USING-column anti-join resolves key columns to the
    // front, which reordered the merged schema for non-leading keys and
    // broke serving-table round trips (read back -> merge again)
    val sess = spark
    import sess.implicits._
    val existing = Seq(("a", 1L, 10.0)).toDF("name", "id", "score")
    val updates = Seq(("b", 2L, 20.0)).toDF("name", "id", "score")
    val merged = Staging.upsert(existing, updates, Seq("id"))
    assert(merged.columns.toSeq === Seq("name", "id", "score"))
    assert(merged.orderBy("id").collect().map(_.getString(0)).toSeq ===
      Seq("a", "b"))
  }

  test("upsert rejects duplicate keys in updates") {
    val sess = spark
    import sess.implicits._
    val existing = Seq((1L, "a")).toDF("id", "v")
    val dupUpdates = Seq((2L, "x"), (2L, "y")).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Staging.upsert(existing, dupUpdates, Seq("id"))
    }
    assert(e.getMessage.contains("key-unique"))
  }

  test("JsonConfig rejects malformed JSON instead of returning empty") {
    val e = intercept[IllegalArgumentException] {
      JsonConfig.parse(spark, "definitely not json")
    }
    assert(e.getMessage.contains("malformed"))
  }

  test("JsonConfig rejects trailing garbage after the object") {
    // a config mangled by concatenation or truncate-then-append must
    // fail at the parse site, not silently half-parse
    val e = intercept[IllegalArgumentException] {
      JsonConfig.parse(spark, """{"user": "etl"} CORRUPTED-TAIL""")
    }
    assert(e.getMessage.contains("malformed"))
  }

  test("JsonConfig parses flat JSON objects (get_secret JSON analog)") {
    val cfg = JsonConfig.parse(spark, """{"user": "etl", "region": "us-east-1"}""")
    assert(cfg === Map("user" -> "etl", "region" -> "us-east-1"))
  }

  test("ConfigProvider resolves JSON and plain-text configs from spark.conf") {
    spark.conf.set("spark.graft.config.db_creds", """{"user":"etl","pw":"x"}""")
    spark.conf.set("spark.graft.config.api_token", "tok-123")
    assert(ConfigProvider.getJson(spark, "db_creds") ===
      Map("user" -> "etl", "pw" -> "x"))
    assert(ConfigProvider.getPlain(spark, "api_token") === "tok-123")
  }

  test("ConfigProvider honors the scope it is given (unlike secrets.py:41)") {
    // two scopes, two different values — the reference's get_secret would
    // have returned the hardcoded default scope's value for both
    spark.conf.set("spark.graft.config.us-east-1.db", "east")
    spark.conf.set("spark.graft.config.eu-west-1.db", "west")
    assert(ConfigProvider.getPlain(spark, "db", Some("us-east-1")) === "east")
    assert(ConfigProvider.getPlain(spark, "db", Some("eu-west-1")) === "west")
  }

  test("q69 bucketed tables at different scale factors do not collide") {
    // regression (VERDICT r2 item 3): unsuffixed catalog names let a
    // second q69 run drop/overwrite the first run's tables mid-plan.
    // Interleave two scale factors: build sf0.001's plan, run sf0.01's
    // storeBucketed (which under unsuffixed naming clobbered the tables),
    // then execute the sf0.001 plan — it must still see sf0.001 data.
    val q69 = graft.SparkEntry.queries("q69_join_bucketed")
    val dfSmall = q69(spark, "/root/testdata/sf0.001") // creates tables A
    val small = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .count()
    q69(spark, "/root/testdata/sf0.01") // creates tables B (10× the rows)
    val itemsSeen = dfSmall.agg(org.apache.spark.sql.functions.sum("n_items"))
      .head().getLong(0)
    assert(itemsSeen === small,
      s"sf0.001 plan read $itemsSeen items; expected $small — " +
        "its bucketed tables were overwritten by the sf0.01 run")
  }

  test("ConfigProvider falls back to environment and fails with the key name") {
    val env = Map("GRAFT_CONFIG_EU_WEST_1_FALLBACK" -> "from-env")
    assert(ConfigProvider.getPlain(spark, "fallback", Some("eu-west-1"), env)
      === "from-env")
    val e = intercept[NoSuchElementException] {
      ConfigProvider.getPlain(spark, "nope", None, Map.empty)
    }
    assert(e.getMessage.contains("nope"))
  }
}
