package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Scans, projections, filters (SURVEY.md §2b q01–q02).
  * Declarative DataFrame ops so Catalyst pushes predicates + prunes columns
  * down to the parquet scan — verified via explain() (PushedFilters /
  * ReadSchema). */
object ScanQueries {

  /** q178's TSV null codec, TOTAL over all string values: null encodes
    * as the classic `\N` marker, and any value that literally matches
    * the marker CLASS (one-or-more backslashes then `N` — `\N`, `\\N`,
    * …) gains one backslash on write and sheds it on read, so the
    * class shifts up injectively and nothing outside it is touched.
    * Numeric fields can never collide with the marker, so they skip
    * the escape. ScanSpec pins the round-trip law including the
    * look-alikes. */
  private[operators] val TsvNull = "\\N"
  private[operators] val TsvMarkClass = "^\\\\+N$"

  private[operators] def tsvEncStr(c: org.apache.spark.sql.Column) =
    coalesce(when(c.rlike(TsvMarkClass), concat(lit("\\"), c)).otherwise(c),
      lit(TsvNull))

  private[operators] def tsvEncNum(c: org.apache.spark.sql.Column) =
    coalesce(c.cast("string"), lit(TsvNull))

  private[operators] def tsvDecStr(c: org.apache.spark.sql.Column) =
    when(c === TsvNull, lit(null))
      .when(c.rlike(TsvMarkClass), c.substr(lit(2), length(c)))
      .otherwise(c)

  private[operators] def tsvDecNum(c: org.apache.spark.sql.Column) =
    when(c === TsvNull, lit(null)).otherwise(c)

  /** q200: session confs that route parquet reads through DataSource V2
    * with footer-stats aggregate pushdown on. V2 is opt-in per source
    * (empty `useV1SourceList`), and the pushdown conf only affects
    * unfiltered MIN/MAX/COUNT aggregates — both are swapped back after
    * the key materializes (the [[graft.Tables.withConfs]] discipline). */
  private[graft] val PushdownConfs = Seq(
    "spark.sql.sources.useV1SourceList" -> "",
    "spark.sql.parquet.aggregatePushdown" -> "true")

  /** q200 core: a stats-only aggregate — COUNT plus MIN/MAX over long
    * and double columns, no filter, no grouping — the exact shape the
    * V2 parquet reader answers from ROW-GROUP FOOTER METADATA with zero
    * data pages read. Must be planned AND executed inside
    * [[PushdownConfs]] to take the pushdown path (PlanSpec pins the
    * `PushedAggregation` scan); the values are identical either way,
    * which is what the oracle gate checks. */
  private[graft] def statsOnlyAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .agg(
        count(lit(1)).as("n_rows"),
        min("l_orderkey").as("min_okey"), max("l_orderkey").as("max_okey"),
        min("l_quantity").as("min_qty"), max("l_quantity").as("max_qty"),
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"))

  /** q202 core: MIN/MAX/COUNT grouped by the PARTITION column of a
    * hive-partitioned layout — with aggregate pushdown the V2 reader
    * answers per-group from each partition directory's footer stats
    * (`PushedGroupBy: [lang]` in the scan). Must be planned and
    * executed inside [[PushdownConfs]]. The schema is EXPLICIT: with
    * partition-column type inference on, `lang` round-trips as string
    * only while its values happen to look non-numeric — a numeric-
    * looking partition value would come back INT and silently diverge
    * from the oracle's VARCHAR grouping. Pinning the schema keeps the
    * staging round-trip lossless by construction. */
  private[graft] def partitionGroupAgg(s: SparkSession, stage: String): DataFrame =
    s.read.schema("doc_id BIGINT, n_chars BIGINT, lang STRING")
      .parquet(stage)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))

  /** q202: stage documents hive-partitioned by lang under tmpdir (the
    * q194 session-suffix discipline) and return the staged path. */
  private[graft] def q202Stage(s: SparkSession, dir: String): String = {
    val tmp = System.getProperty("java.io.tmpdir")
    graft.sources.Staging.vacuumStale(s, tmp, "graft_q202_")
    val stage = s"$tmp/graft_q202_" +
      graft.sources.Staging.sessionSuffix(s, dir)
    graft.sources.Staging.store(
      t(s, dir, "documents").select("doc_id", "lang", "n_chars"),
      stage, partitionBy = Seq("lang"))
    stage
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q200's pushdown extended to GROUPED stats: over a lake laid out
    // hive-partitioned by the grouping key (the layout a 100 TB corpus
    // already has for its source/lang dimensions), per-group
    // MIN/MAX/COUNT comes from partition-local footer stats — the scan
    // carries PushedAggregation AND PushedGroupBy, and reads zero data
    // pages. The write prices the layout; the point is the read shape.
    "q202_groupby_pushdown" -> { (s, dir) =>
      val stage = q202Stage(s, dir)
      graft.Tables.withConfs(s, PushdownConfs: _*) {
        val df = partitionGroupAgg(s, stage)
        val rows = java.util.Arrays.asList(df.collect(): _*)
        s.createDataFrame(rows, df.schema).orderBy("lang")
      }
    },

    // METADATA-ONLY AGGREGATION — the 100 TB shape where the right
    // answer costs zero data reads: parquet already stores per-row-group
    // min/max/count in its footers, and Spark's V2 reader can answer an
    // unfiltered MIN/MAX/COUNT aggregate wholly from those stats
    // (explain shows `PushedAggregation`; a scan that reads 100 TB to
    // compute a 7-value summary is wrong). The key materializes its one
    // row inside the conf swap (lazy plans evaluate under restored
    // confs — the withConfs contract) and returns it as a local frame.
    "q200_agg_pushdown" -> { (s, dir) =>
      graft.Tables.withConfs(s, PushdownConfs: _*) {
        val df = statsOnlyAgg(s, dir)
        val rows = java.util.Arrays.asList(df.collect(): _*)
        s.createDataFrame(rows, df.schema)
      }
    },

    "q01_scan_project" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          (dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast(D)
            .cast("double").as("revenue"))
        // TOTAL order: (l_orderkey, l_linenumber) is NOT unique in the
        // fixtures (118k duplicate pairs at sf0.1) — engines agreed on
        // the tie order by luck until the sf1 scale point flipped it.
        // Ordering by every output column leaves only fully-identical
        // rows tied, which no row-by-row compare can distinguish.
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice",
          "l_quantity", "l_discount")
    },

    "q02_filter" -> { (s, dir) =>
      t(s, dir, "orders")
        .filter(
          col("o_orderstatus").isin("O", "F") &&
          col("o_orderdate").between(
            lit("1996-01-01 00:00:00").cast("timestamp"),
            lit("1998-12-31 00:00:00").cast("timestamp")) &&
          (col("o_orderpriority").like("1-%") ||
            !(col("o_totalprice") < 50000.0)) &&
          col("o_custkey").isNotNull)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .orderBy("o_orderkey")
    },

    // Staging.compact under the oracle gate: fragment a staged copy of
    // `documents` into ~48 small files (the shape per-batch streaming
    // sinks leave behind), compact it to the target size, require the
    // file count actually dropped, and return the compacted content —
    // the DuckDB twin reads the ORIGINAL table, so the hash match proves
    // the rewrite is content-lossless. At 100 TB the file count, not the
    // byte count, kills scan planning; compaction is the remedy this key
    // keeps honest.
    "q80_compact_staging" -> { (s, dir) =>
      val tmp = System.getProperty("java.io.tmpdir")
      graft.sources.Staging.vacuumStale(s, tmp, "graft_q80_")
      val stage = s"$tmp/graft_q80_" +
        graft.sources.Staging.sessionSuffix(s, dir)
      // fragment fresh on every invocation (vacuum first) so the
      // file-count assertion below is meaningful on re-runs too
      graft.sources.Staging.vacuum(s, stage)
      graft.sources.Staging.store(
        t(s, dir, "documents").repartition(48), stage)
      val before = graft.sources.Staging.keysList(s, stage)
        .count(_.endsWith(".parquet"))
      graft.sources.Staging.compact(s, stage)
      val after = graft.sources.Staging.keysList(s, stage)
        .count(_.endsWith(".parquet"))
      require(after < before,
        s"compaction must shrink the file count ($before -> $after)")
      s.read.parquet(stage)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    },

    // CSV as a SOURCE FORMAT under the gate: stage `documents` as
    // RFC-4180 CSV (quoteAll + doubled-quote escaping, header), read it
    // back with an EXPLICIT schema (schema-on-read — never inference in
    // a pipeline: one malformed row would silently re-type a column)
    // and multiLine (embedded newlines live inside quotes), then
    // checksum-aggregate. The DuckDB twin reads the ORIGINAL parquet
    // table, so the hash match proves the CSV round trip is lossless
    // character-for-character (the per-lang poly-hash sum pins every
    // text byte; id/char sums pin the numeric columns). Note the CSV
    // reader's default nullValue="" turns an empty quoted text into
    // NULL — poly_hash(NULL) drops out of the sum exactly like the
    // empty string's hash 0, so the checksum stays oracle-identical.
    "q140_csv_roundtrip" -> { (s, dir) =>
      import graft.plans.GraftExpressions.poly_hash
      val tmp = System.getProperty("java.io.tmpdir")
      graft.sources.Staging.vacuumStale(s, tmp, "graft_q140_")
      val stage = s"$tmp/graft_q140_" +
        graft.sources.Staging.sessionSuffix(s, dir)
      graft.sources.Staging.vacuum(s, stage)
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          col("text"))
        .write.option("header", "true").option("quoteAll", "true")
        .option("escape", "\"").csv(stage)
      s.read
        .schema("doc_id BIGINT, lang STRING, source STRING, " +
          "n_chars BIGINT, text STRING")
        .option("header", "true").option("multiLine", "true")
        .option("escape", "\"").csv(stage)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"),
          sum(poly_hash(col("text"))).cast("long").as("text_checksum"),
          sum("doc_id").cast("long").as("id_sum"))
        .orderBy("lang")
    },

    // JSON-lines as a SOURCE FORMAT under the gate: same discipline as
    // q140 (write → explicit-schema read-back → checksum agg vs the
    // original table). Spark's json writer emits one object per line
    // and DROPS null fields; the schema'd reader restores them as
    // NULL, which the checksum treats identically to q140's CSV case.
    "q141_jsonl_roundtrip" -> { (s, dir) =>
      import graft.plans.GraftExpressions.poly_hash
      val tmp = System.getProperty("java.io.tmpdir")
      graft.sources.Staging.vacuumStale(s, tmp, "graft_q141_")
      val stage = s"$tmp/graft_q141_" +
        graft.sources.Staging.sessionSuffix(s, dir)
      graft.sources.Staging.vacuum(s, stage)
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          col("text"))
        .write.json(stage)
      s.read
        .schema("doc_id BIGINT, lang STRING, source STRING, " +
          "n_chars BIGINT, text STRING")
        .json(stage)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"),
          sum(poly_hash(col("text"))).cast("long").as("text_checksum"),
          sum("doc_id").cast("long").as("id_sum"))
        .orderBy("lang")
    },

    // ORC as a SOURCE FORMAT under the gate: the third staging format a
    // lake actually serves (columnar like parquet — typed, splittable,
    // predicate-pushdown-capable — unlike the q140/q141 text formats).
    // Spark's native ORC reader/writer (spark.sql.orc.impl=native is the
    // default) needs no extra jars; types and NULLs round-trip exactly,
    // so unlike CSV/JSON no empty-vs-NULL asymmetry exists to document.
    // Same discipline as q140: write → read back → checksum-aggregate,
    // with the DuckDB twin on the ORIGINAL parquet table proving the
    // conversion lossless.
    "q142_orc_roundtrip" -> { (s, dir) =>
      import graft.plans.GraftExpressions.poly_hash
      val tmp = System.getProperty("java.io.tmpdir")
      graft.sources.Staging.vacuumStale(s, tmp, "graft_q142_")
      val stage = s"$tmp/graft_q142_" +
        graft.sources.Staging.sessionSuffix(s, dir)
      graft.sources.Staging.vacuum(s, stage)
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          col("text"))
        .write.orc(stage)
      s.read.orc(stage)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"),
          sum(poly_hash(col("text"))).cast("long").as("text_checksum"),
          sum("doc_id").cast("long").as("id_sum"))
        .orderBy("lang")
    },

    // LINE-DELIMITED TEXT as the fourth SOURCE FORMAT under the gate —
    // the classic LM-corpus shape (one record per line, TAB-separated
    // metadata prefix): q140/q141/q142's discipline applied to
    // `spark.read/write.text`, the format every "just give me the raw
    // corpus" export uses. Schema-on-read is an EXPLICIT limit-5 split
    // (the text field is the unsplit tail, so a free-text field with
    // tabs would corrupt only itself — and the checksum gate would
    // catch it; the fixtures' space-separated ASCII words make the
    // delimiter contract safe, asserted BY the hash match). NULLs get
    // an explicit "\N" sentinel on both sides: concat_ws SKIPS null
    // arguments, so an unsentineled null lang/source/n_chars would
    // silently shift every later field left (misaligning doc_id..text)
    // instead of round-tripping. String fields that literally MATCH
    // the sentinel class (`\N`, `\\N`, … — r13, was the one partiality
    // hole) gain one backslash on write and shed it on read, so the
    // serialization contract is TOTAL — injective on every value
    // including the sentinel look-alikes (fixtures are null-free and
    // sentinel-free, so the gated output is unchanged; this pins the
    // contract, not the fixture; the round-trip law incl. look-alikes
    // is ScanSpec's). Everything else is the shared roundtrip recipe:
    // write → schema'd read-back → per-lang checksum agg against the
    // ORIGINAL parquet table.
    "q178_text_roundtrip" -> { (s, dir) =>
      import graft.plans.GraftExpressions.poly_hash
      val tmp = System.getProperty("java.io.tmpdir")
      graft.sources.Staging.vacuumStale(s, tmp, "graft_q178_")
      val stage = s"$tmp/graft_q178_" +
        graft.sources.Staging.sessionSuffix(s, dir)
      graft.sources.Staging.vacuum(s, stage)
      t(s, dir, "documents")
        .select(concat_ws("\t", tsvEncNum(col("doc_id")),
          tsvEncStr(col("lang")), tsvEncStr(col("source")),
          tsvEncNum(col("n_chars")), tsvEncStr(col("text")))
          .as("value"))
        .write.text(stage)
      val p = split(col("value"), "\t", 5)
      s.read.text(stage)
        .select(
          tsvDecNum(element_at(p, 1)).cast("long").as("doc_id"),
          tsvDecStr(element_at(p, 2)).as("lang"),
          tsvDecStr(element_at(p, 3)).as("source"),
          tsvDecNum(element_at(p, 4)).cast("long").as("n_chars"),
          tsvDecStr(element_at(p, 5)).as("text"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"),
          sum(poly_hash(col("text"))).cast("long").as("text_checksum"),
          sum("doc_id").cast("long").as("id_sum"))
        .orderBy("lang")
    },

    // SCHEMA EVOLUTION under the gate — the lake-management fact every
    // long-lived corpus hits: files written before a column existed
    // must read alongside files written after. Epoch v1 stages
    // (doc_id, lang, text); epoch v2 adds a `quality` column (q51's
    // 6-dp score); the mergeSchema read unifies them with NULLs for
    // the legacy rows, and the gated agg pins BOTH populations — the
    // legacy count per lang and the exact integer-micro sum of the
    // evolved column (quantize-then-sum, the q172 discipline, so no
    // FP accumulation order can differ). A reader that dropped or
    // misaligned either epoch's column layout hash-fails.
    "q179_schema_evolution" -> { (s, dir) =>
      import graft.plans.GraftExpressions.poly_hash
      val tmp = System.getProperty("java.io.tmpdir")
      graft.sources.Staging.vacuumStale(s, tmp, "graft_q179_")
      val stage = s"$tmp/graft_q179_" +
        graft.sources.Staging.sessionSuffix(s, dir)
      graft.sources.Staging.vacuum(s, stage)
      val docs = t(s, dir, "documents")
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"), col("text"))
        .write.parquet(s"$stage/v1")
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"), col("text"),
          graft.functions.TextOps.qualityScore(col("text")).as("quality"))
        .write.parquet(s"$stage/v2")
      s.read.option("mergeSchema", "true")
        .parquet(s"$stage/v1", s"$stage/v2")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("quality").isNull, 1L).otherwise(0L))
            .cast("long").as("n_legacy"),
          sum(when(col("quality").isNotNull,
            floor(col("quality") * 1e6 + 0.5).cast("long")).otherwise(0L))
            .cast("long").as("quality_micro_sum"),
          sum(poly_hash(col("text"))).cast("long").as("text_checksum"),
          sum("doc_id").cast("long").as("id_sum"))
        .orderBy("lang")
    },

    // AVRO as the sixth SOURCE FORMAT under the gate, completing the
    // mainstream family (parquet native, CSV q140, JSONL q141, ORC
    // q142, text q178). The `spark-avro` DATASOURCE is absent from
    // this offline classpath, but Avro CORE ships in Spark's own jars,
    // so the round-trip drives the real container codec
    // (`DataFileWriter`/`DataFileReader`) through [[graft.sources
    // .AvroStage]] — one container file per partition on write, one
    // streamed task per container on read, nullable fields as Avro
    // UNIONs (the q178 total-contract lesson at the schema level).
    // Same discipline as q140: write → read-back → checksum agg, with
    // the DuckDB twin on the ORIGINAL parquet table proving the
    // conversion lossless.
    "q191_avro_roundtrip" -> { (s, dir) =>
      import graft.plans.GraftExpressions.poly_hash
      val tmp = System.getProperty("java.io.tmpdir")
      graft.sources.Staging.vacuumStale(s, tmp, "graft_q191_")
      val stage = s"$tmp/graft_q191_" +
        graft.sources.Staging.sessionSuffix(s, dir)
      graft.sources.Staging.vacuum(s, stage)
      graft.sources.AvroStage.write(
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("source"),
            col("n_chars"), col("text")), stage)
      graft.sources.AvroStage.read(s, stage)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"),
          sum(poly_hash(col("text"))).cast("long").as("text_checksum"),
          sum("doc_id").cast("long").as("id_sum"))
        .orderBy("lang")
    },
    // XML as the seventh SOURCE FORMAT under the gate, completing the
    // built-in family (parquet native, CSV q140, JSONL q141, ORC q142,
    // text q178, Avro q191): Spark 4 ships the former spark-xml as a
    // first-class `format("xml")` datasource, so the feed shape every
    // enterprise export/sitemap/RSS ingest still uses needs no extra
    // jars. Write: one <doc> row element per record under a <docs>
    // root, the writer entity-escaping &/</> in values. Read:
    // EXPLICIT schema (q140's schema-on-read rule) + rowTag. XML has
    // no NULL-vs-empty distinction for absent elements (absent element
    // → NULL, like JSONL's dropped fields) and the reader trims
    // surrounding whitespace by default — both invisible to the
    // fixtures (null-free, single-space-separated ASCII) and both
    // CAUGHT by the per-char poly-hash checksum if they ever bite.
    // Same discipline as q140: write → schema'd read-back → per-lang
    // checksum agg, DuckDB twin on the ORIGINAL parquet table proving
    // the conversion lossless.
    "q194_xml_roundtrip" -> { (s, dir) =>
      import graft.plans.GraftExpressions.poly_hash
      val tmp = System.getProperty("java.io.tmpdir")
      graft.sources.Staging.vacuumStale(s, tmp, "graft_q194_")
      val stage = s"$tmp/graft_q194_" +
        graft.sources.Staging.sessionSuffix(s, dir)
      graft.sources.Staging.vacuum(s, stage)
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          col("text"))
        .write.format("xml")
        .option("rootTag", "docs").option("rowTag", "doc")
        .save(stage)
      s.read.format("xml")
        .schema("doc_id BIGINT, lang STRING, source STRING, " +
          "n_chars BIGINT, text STRING")
        .option("rowTag", "doc")
        .load(stage)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"),
          sum(poly_hash(col("text"))).cast("long").as("text_checksum"),
          sum("doc_id").cast("long").as("id_sum"))
        .orderBy("lang")
    },
  )

  def oracle: Map[String, String] = Map(
    // q202: per-lang stats by value — the staged partitioned layout is
    // lossless, so the twin runs on the original table
    "q202_groupby_pushdown" ->
      """SELECT lang, count(*) AS n_docs,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // q200: the values are plain unfiltered MIN/MAX/COUNT — the key's
    // substance is WHERE they come from (footer stats, plan-pinned in
    // PlanSpec), which an SQL twin checks by value equality
    "q200_agg_pushdown" ->
      """SELECT count(*) AS n_rows,
        |  min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price
        |FROM lineitem""".stripMargin,

    "q01_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
        | CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity,
        |  l_discount""".stripMargin,

    "q02_filter" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus IN ('O','F')
        |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1998-12-31 00:00:00'
        |  AND (o_orderpriority LIKE '1-%' OR NOT (o_totalprice < 50000.0))
        |  AND o_custkey IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,

    // reads the ORIGINAL documents table: equality proves the
    // fragment -> compact round trip lost nothing
    "q80_compact_staging" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // both roundtrip twins read the ORIGINAL parquet table: equality
    // proves the staged format conversion lost nothing (the poly-hash
    // fold is the q81 per-char replay; '' folds to 0 on both engines,
    // matching the CSV/JSON NULL-for-empty read-back)
    "q140_csv_roundtrip" -> formatRoundtripSql,
    "q141_jsonl_roundtrip" -> formatRoundtripSql,
    "q142_orc_roundtrip" -> formatRoundtripSql,
    "q178_text_roundtrip" -> formatRoundtripSql,
    "q191_avro_roundtrip" -> formatRoundtripSql,
    "q194_xml_roundtrip" -> formatRoundtripSql,

    // q179: membership replayed by parity; the evolved column exists
    // only for odd ids (q51's quality expression verbatim),
    // quantize-then-sum in exact integers
    "q179_schema_evolution" ->
      """WITH d AS (SELECT doc_id, lang, text,
        |    string_split(text, ' ') AS toks FROM documents),
        |q AS (SELECT doc_id, lang, text,
        |    CASE WHEN doc_id % 2 = 1 THEN
        |      round((len(list_distinct(toks))::DOUBLE / len(toks)) * 0.4
        |        + (len(list_filter(toks, t -> list_contains(['the','and','of','to','is','in','a','it','that','for'], t)))::DOUBLE / len(toks)) * 0.3
        |        + least(1.0, len(toks) / 50.0) * 0.3, 6)
        |    END AS quality
        |  FROM d)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN quality IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_legacy,
        |  CAST(sum(CASE WHEN quality IS NOT NULL
        |    THEN CAST(floor(quality * 1000000 + 0.5) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS quality_micro_sum,
        |  CAST(sum(list_reduce(list_prepend(0::BIGINT,
        |    list_transform(string_split(text,''), ch -> ascii(ch)::BIGINT)),
        |    (a,b) -> (a*131 + b) % 2147483647)) AS BIGINT) AS text_checksum,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM q GROUP BY lang ORDER BY lang""".stripMargin,
  )

  private val formatRoundtripSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(sum(list_reduce(list_prepend(0::BIGINT,
      |    list_transform(string_split(text,''), ch -> ascii(ch)::BIGINT)),
      |    (a,b) -> (a*131 + b) % 2147483647)) AS BIGINT) AS text_checksum,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
}
