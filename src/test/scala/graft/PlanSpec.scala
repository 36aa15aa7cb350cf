package graft

/** Physical-plan regression guards: the optimizer properties the 100 TB
  * story depends on, pinned as assertions so refactors can't silently
  * lose pushdown, pruning, or join strategy. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q02 pushes compound predicates into the parquet scan") {
    val p = plan("q02_filter")
    assert(p.contains("PushedFilters:") && p.contains("In(o_orderstatus"))
  }

  test("q01 prunes the scan to the projected columns") {
    val p = plan("q01_scan_project")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_shipdate"), "unused column must not be read")
  }

  test("q12 forces broadcast-hash joins on the dimension chain") {
    assert("BroadcastHashJoin".r.findAllIn(plan("q12_join_broadcast")).size >= 2)
  }

  test("q26 compiles to TakeOrderedAndProject (top-k, no full sort)") {
    assert(plan("q26_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("q10 theta join uses broadcast nested loop (non-equi)") {
    assert(plan("q10_join_theta").contains("BroadcastNestedLoopJoin"))
  }

  test("q69 bucketed fact-fact join needs no exchange and no sort") {
    // the query itself never shuffles for the join (at fixture scale
    // Catalyst rightly broadcasts the small side — also exchange-free)
    val p = plan("q69_join_bucketed")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"only the final agg may shuffle:\n$p")
    // pin the at-scale shape: when neither side is broadcastable the join
    // must be a sort-merge over co-located buckets — no Exchange, and no
    // Sort once the scan is allowed to report bucket order (SPARK-28595
    // turned scan output ordering off by default because buckets MAY span
    // multiple files; storeBucketed writes exactly one file per bucket, so
    // opting back in is sound and proves the layout)
    import org.apache.spark.sql.functions.col
    val orderingConf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(orderingConf, "true")
    // table names are suffixed per (sf-dir, session) — resolve the
    // pair the q69 run above just created
    val sfx = graft.sources.Staging.sessionSuffix(spark, dir)
    try {
      val smj = spark.table(s"graft_lineitem_bkt_$sfx")
        .join(spark.table(s"graft_orders_bkt_$sfx").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
      val sp = smj.queryExecution.executedPlan.toString
      assert(sp.contains("SortMergeJoin"), s"expected sort-merge join:\n$sp")
      assert(!sp.contains("Exchange"), s"bucketed join must not shuffle:\n$sp")
      assert(!sp.contains("Sort ["), s"bucketed join must not re-sort:\n$sp")
    } finally spark.conf.unset(orderingConf)
  }

  test("q76 band join is an equi (hash) join, not a nested loop") {
    val p = plan("q76_join_band_bucketed")
    assert(!p.contains("NestedLoop"),
      s"bucketized band join must not plan a compare matrix:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected an equi-join on the band bucket:\n$p")
  }

  test("q193 one-side-scaled band join: bounded dim side broadcasts, " +
      "fact side never shuffles") {
    // the stream×dimension shape at 100 TB: the ×3 band explode lands
    // on the 51-row dim side, which must broadcast — the full fact
    // (customer) side joins shuffle-free; any nested-loop or
    // fact-side exchange before the join breaks the linear-in-facts
    // scaling the key exists to pin
    val p = plan("q193_join_band_oneside")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"band join must stay an equi-join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the bounded dim side must broadcast:\n$p")
    // the only exchange below the join may sit on the broadcast side;
    // the fact scan must feed the join directly (no hashpartitioning
    // of customer before the join)
    val joinIdx = p.indexOf("BroadcastHashJoin")
    val custScan = p.indexOf("customer.parquet")
    assert(custScan > 0, s"expected a customer scan in:\n$p")
    assert(!p.substring(joinIdx, math.max(joinIdx, p.length))
      .split("\n").exists(l => l.contains("Exchange hashpartitioning")
        && l.contains("c_custkey")),
      s"fact side must not pre-shuffle for the band join:\n$p")
  }

  test("q195 fusion arms are distributed top-50s — every rank window " +
      "sits over a TakeOrderedAndProject, never over the unbounded frame") {
    // the scale contract: each retrieval arm cuts to 50 rows via a
    // distributed TakeOrderedAndProject BEFORE the (single-partition)
    // row_number attaches ranks; a Window directly over the corpus
    // would funnel the whole table through one partition at 100 TB
    val p = plan("q195_rrf_fusion")
    val lines = p.split("\n")
    val winIdx = lines.zipWithIndex
      .collect { case (l, i) if l.contains("Window [row_number") => i }
    assert(winIdx.length == 2, s"expected exactly two rank windows:\n$p")
    winIdx.foreach { i =>
      assert(lines.slice(i + 1, i + 4)
        .exists(_.contains("TakeOrderedAndProject(limit=50")),
        s"rank window at line $i must sit over the 50-row cut:\n$p")
    }
    assert(p.contains("TakeOrderedAndProject(limit=20"),
      s"final fusion board must be a distributed top-20:\n$p")
  }

  test("q75 pushes the partition predicate into PartitionFilters") {
    val p = plan("q75_partition_prune")
    assert(p.contains("PartitionFilters") && p.contains("o_orderstatus"),
      s"expected a partition-pruned scan:\n$p")
    assert("PartitionFilters: \\[[^\\]]*o_orderstatus#\\d+ = F".r
      .findFirstIn(p).isDefined,
      s"the status predicate must prune directories, not filter rows:\n$p")
  }

  test("q44 probes the persisted pair frame with a pushed filter, no join") {
    // since the r11 refactor q44 (with six sibling consumers) PROBES the
    // build-once nearDupPairs parquet: its own plan must be a
    // filter-pushed scan of the pair frame — zero joins, zero shingle
    // work. (The r3 one-join + codegen-verify shape is pinned on the
    // BUILD plan in the next test.)
    val p = plan("q44_dedup_near")
    val joins = "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|BroadcastNestedLoopJoin)"
      .r.findAllIn(p).size
    assert(joins === 0, s"probe must not join, found $joins:\n$p")
    assert(p.contains("graft_neardup_pairs_"),
      s"probe must read the persisted pair frame:\n$p")
    assert(p.contains("GreaterThanOrEqual(match_cnt,26)"),
      s"threshold must push into the pair scan:\n$p")
  }

  test("q136 probes the grown pair frame with a pushed filter, no join") {
    // same probe contract as q44, against the epoch-grown frame: the
    // growth work lives in the build; the gated key is a scan
    val p = plan("q136_pair_grow_reprobe")
    val joins = "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|BroadcastNestedLoopJoin)"
      .r.findAllIn(p).size
    assert(joins === 0, s"probe must not join, found $joins:\n$p")
    assert(p.contains("graft_grown_pairs_"),
      s"probe must read the grown pair frame:\n$p")
    assert(p.contains("GreaterThanOrEqual(match_cnt,26)"),
      s"threshold must push into the pair scan:\n$p")
  }

  test("pair-frame BUILD has exactly one join (signatures ride the band join) and a codegen verify") {
    // regression guard for the r3 rewrite, now pinned where the work
    // lives: the old shape had three joins (band candidates + two
    // signature re-joins) and an interpreted zip_with verify; the build
    // carries signatures through the single band join and verifies with
    // the codegen zip_equal kernel
    val p = graft.operators.LlmQueries
      .minhashPairs(Tables.tWide(spark, dir, "documents"))
      .queryExecution.executedPlan.toString
    val joins = "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|BroadcastNestedLoopJoin)"
      .r.findAllIn(p).size
    assert(joins === 1, s"expected exactly the band join, found $joins:\n$p")
    assert(p.contains("graft_zip_equal"),
      s"signature verify must be the codegen kernel:\n$p")
    assert(!p.contains("zip_with"), s"interpreted lambda crept back in:\n$p")
  }

  test("q49 generates with the native WordBigrams Generator, no UDF in-plan") {
    // round-11 close of the last "UDF where an Expression fits": the
    // Generate node runs graft_bigrams directly — no ScalaUDF, no
    // intermediate array explode
    val p = plan("q49_udtf_bigrams")
    assert(p.contains("graft_bigrams"),
      s"expected the native Generator in-plan:\n$p")
    assert(!p.contains("UDF") && !p.toLowerCase.contains("scalaudf"),
      s"no UDF may remain in the q49 plan:\n$p")
    assert(!p.contains("explode"),
      s"the generator must emit rows directly, not via array+explode:\n$p")
  }

  test("q106 incremental dedup reads corpus bands pre-bucketed, shuffles only the batch") {
    // the 100 TB story: the corpus band index is written once, bucketed
    // on the band key; the daily probe must never re-shuffle it. At
    // fixture scale the batch side broadcasts (NO exchange on either
    // side of the join — only the post-verify distinct may shuffle).
    val p = plan("q106_dedup_incremental")
    assert(p.contains("BroadcastHashJoin"),
      s"small-batch probe must broadcast the batch bands:\n$p")
    assert(p.contains("Bucketed: true"),
      s"corpus bands must come from the bucketed table scan:\n$p")
    // exactly two hash exchanges, BOTH batch-proportional: the batch's
    // own signature aggregation (doc_id groupBy — inherent to MinHash)
    // and the pair distinct; the corpus side contributes none
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2,
      s"corpus side must not shuffle — only batch sig-agg + pair distinct:\n$p")
    // at-scale shape: a batch too big to broadcast falls back to a
    // sort-merge join over the bucketed corpus scan, exchanging ONLY the
    // batch side (q69's discipline, same conf opt-in for bucket order)
    import org.apache.spark.sql.functions.col
    val orderingConf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(orderingConf, "true")
    val sfx = graft.sources.Staging.sessionSuffix(spark, dir)
    try {
      val docs = Tables.tWide(spark, dir, "documents")
      val batch = graft.operators.LlmQueries.bandKeys(
          graft.operators.LlmQueries.minhashSignatures(
            docs.filter(col("doc_id") % 10 === 7)))
        .toDF("batch_doc", "sig_b", "bk_b")
      val smj = spark.table(s"graft_corpus_bands_$sfx")
        .join(batch.hint("merge"), col("bk") === col("bk_b"))
      val sp = smj.queryExecution.executedPlan.toString
      assert(sp.contains("SortMergeJoin"), s"expected sort-merge join:\n$sp")
      assert(sp.contains("Bucketed: true"),
        s"corpus side must scan the bucketed layout:\n$sp")
      // two exchanges, both on the BATCH side: its signature agg and its
      // re-cluster into the corpus's bucket layout; corpus adds none
      assert("Exchange hashpartitioning".r.findAllIn(sp).size === 2,
        s"only the batch side may shuffle into the corpus buckets:\n$sp")
    } finally spark.conf.unset(orderingConf)
  }

  test("q113 post-append probe scans the GROWN index bucketed, zero index-side exchange") {
    // the growth lifecycle's whole point: after appendBucketed the probe
    // must look exactly like q106's — bucketed corpus scan, broadcast
    // batch, only batch-proportional exchanges. A layout-breaking append
    // would surface here as an Exchange over the corpus side.
    val p = plan("q113_dedup_append_reprobe")
    assert(p.contains("BroadcastHashJoin"),
      s"small-batch probe must broadcast the batch bands:\n$p")
    assert(p.contains("Bucketed: true"),
      s"the grown index must still scan as bucketed:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2,
      s"only batch sig-agg + pair distinct may shuffle:\n$p")
    // SMJ fallback: a too-big batch sorts-merges against the grown
    // table — corpus side still contributes NO exchange (appends add
    // files per bucket, never re-hash rows; a Sort on the corpus side
    // is expected here since multi-file buckets can't claim scan order)
    import org.apache.spark.sql.functions.col
    val sfx = graft.sources.Staging.sessionSuffix(spark, dir)
    val docs = Tables.tWide(spark, dir, "documents")
    val batch = graft.operators.LlmQueries.bandKeys(
        graft.operators.LlmQueries.minhashSignatures(
          docs.filter(col("doc_id") % 10 === 7)))
      .toDF("batch_doc", "sig_b", "bk_b")
    val smj = spark.table(s"graft_grown_bands_$sfx")
      .join(batch.hint("merge"), col("bk") === col("bk_b"))
    val sp = smj.queryExecution.executedPlan.toString
    assert(sp.contains("SortMergeJoin"), s"expected sort-merge join:\n$sp")
    assert(sp.contains("Bucketed: true"),
      s"grown corpus side must scan the bucketed layout:\n$sp")
    assert("Exchange hashpartitioning".r.findAllIn(sp).size === 2,
      s"only the batch side may shuffle into the corpus buckets:\n$sp")
    // COMPACTION closes the lifecycle: back to one file per bucket, the
    // probe answer is bit-identical, and the SMJ becomes sort-free
    // again (one-file-per-bucket scan order, q69's conf opt-in)
    val before = SparkEntry.queries("q113_dedup_append_reprobe")(spark, dir)
      .collect()
    val nFiles = graft.sources.Staging.compactBucketed(
      spark, s"graft_grown_bands_$sfx", Seq("bk"), 8)
    assert(nFiles === 8, s"expected one file per bucket, got $nFiles")
    val after = SparkEntry.queries("q113_dedup_append_reprobe")(spark, dir)
      .collect()
    assert(after.toSeq === before.toSeq,
      "compaction must not change the probe answer")
    val orderingConf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(orderingConf, "true")
    try {
      val sp2 = spark.table(s"graft_grown_bands_$sfx")
        .join(batch.hint("merge"), col("bk") === col("bk_b"))
        .queryExecution.executedPlan.toString
      assert(sp2.contains("SortMergeJoin") && sp2.contains("Bucketed: true"),
        s"compacted index must still merge bucketed:\n$sp2")
      assert(!"Sort \\[bk#\\d+".r.findFirstIn(sp2).isDefined,
        s"compaction must restore the sort-free index-side scan:\n$sp2")
    } finally spark.conf.unset(orderingConf)
  }

  test("q109 embedding probe broadcasts the batch against the bucketed LSH index") {
    // the vector twin of q106's pin: corpus band index scans bucketed,
    // batch side broadcasts, and the only hash exchanges are
    // batch-proportional (the pair distinct; sign-LSH coding is a
    // narrow map, so unlike q106 there is no batch-side agg exchange)
    val p = plan("q109_embed_dedup_incremental")
    assert(p.contains("BroadcastHashJoin"),
      s"batch bands must broadcast into the probe:\n$p")
    assert(p.contains("Bucketed: true"),
      s"corpus vectors must come from the bucketed band index:\n$p")
    assert(p.contains("graft_sign_lsh"),
      s"batch coding must use the one-pass kernel:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"only the pair distinct may shuffle:\n$p")
  }

  test("q111/q112 pack on the COMPOSITE (source, shard) window key") {
    // the 100× skew guard: the running-sum window must partition on
    // (source, shard), never on source alone — a per-source window puts
    // one source's entire token stream on a single reducer. q112 (the
    // shard detail) costs exactly the one composite exchange (window +
    // per-shard agg share it); q111's per-source roll-up adds ONE more,
    // carrying only shard-summary rows (sources × shards of them).
    val p112 = plan("q112_pack_shards")
    assert("hashpartitioning\\(source#\\d+, shard#\\d+".r
      .findFirstIn(p112).isDefined,
      s"window key must be the composite (source, shard):\n$p112")
    assert("Exchange hashpartitioning".r.findAllIn(p112).size === 1,
      s"window and shard agg must share the composite exchange:\n$p112")
    val p = plan("q111_pack_sequences")
    assert("hashpartitioning\\(source#\\d+, shard#\\d+".r
      .findFirstIn(p).isDefined,
      s"q111 must pack sharded, not per-source:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2,
      s"composite window exchange + summary-row roll-up only:\n$p")
  }

  test("q57 probes a partition-PRUNED read of the persisted IVF index") {
    // the ANN serving shape: the index is written hive-partitioned by
    // centroid; the member scan must carry the query centroids as
    // PartitionFilters (directory pruning), never a row filter over the
    // whole index — and the bounded query side must broadcast
    val p = plan("q57_ann_ivf")
    assert("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(p).isDefined,
      s"member scan must prune index buckets by query centroid:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the bounded query side must broadcast into the probe:\n$p")
    // the broadcast side must be ABSOLUTELY bounded (|Q| <= 100), not
    // just modulo-sampled — the r9 verdict's one flagged scale-killer
    assert(p.contains("LessThan(vec_id,5000)"),
      s"q57's query-set cap must reach the index scan as a pushed filter:\n$p")
  }

  test("q131 novelty join-back is a shuffled hash join, never a sort-merge") {
    // a cliché shingle appearing in 10^9 docs makes its hash key hot;
    // SMJ would sort that key's rows on one reducer, the hash join
    // streams them (the q118/q121 de-skew discipline)
    val p = plan("q131_ngram_novelty")
    assert(p.contains("ShuffledHashJoin"),
      s"occurrence counts must hash-join back to the shingle stream:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no sort-merge on the potentially hot shingle-hash key:\n$p")
  }

  test("q133 stats ride a broadcast back onto the hourly counts") {
    // the |types|-row stats frame must broadcast — a shuffled join on
    // event_type would move the hourly counts a second time for a
    // metadata-sized right side
    val p = plan("q133_rate_anomaly")
    assert(p.contains("BroadcastHashJoin"),
      s"per-type stats must broadcast onto hourly counts:\n$p")
  }

  test("q83 quantization runs the one-pass codegen kernel, not HOF lambdas") {
    // regression guard for the r4 lift: the r3 shape evaluated four
    // interpreted lambdas per vector (two transform+aggregate chains);
    // the kernel computes both statistics in one generated loop
    val p = plan("q83_quantize")
    assert(p.contains("graft_quantize_stats"),
      s"expected the QuantizeInt8Stats kernel in the plan:\n$p")
    // anchor the negative check to the lambda marker itself: every
    // interpreted HOF (aggregate/transform/zip_with/filter) renders its
    // lambda as `lambdafunction(...)` in the plan, while the old bare
    // contains("aggregate(")/contains("transform(") would also fire on
    // any future node/expression whose rendering contains those tokens —
    // a false failure with no real HOF regression
    assert(!p.contains("lambdafunction"),
      s"interpreted HOF lambdas crept back into q83:\n$p")
  }

  test("q73 codes all 16 LSH planes in one kernel pass") {
    // regression guard for the r5 lift: the r4 shape projected 16
    // separate when(seq_dot(emb, CreateArray(64 literals))) columns —
    // an expression tree whose bulk (doubled by the band self-join)
    // dominated q73's runtime; the kernel packs all plane signs in one
    // generated loop per vector
    val p = plan("q73_embed_lsh")
    assert(p.contains("graft_sign_lsh"),
      s"expected the SignLshBands kernel in the plan:\n$p")
    // the verify stage legitimately keeps graft_seq_dot (pair dot + norm
    // precompute); the old CODING stage is pinned out by its exact shape:
    // when(seq_dot(...) > 0, 1) renders as `CASE WHEN (graft_seq_dot(`
    assert(!"CASE WHEN \\(graft_seq_dot".r.findFirstIn(p).isDefined,
      s"per-plane seq_dot bit columns crept back into q73's coding stage:\n$p")
  }

  test("q192 exact side broadcasts the bounded Q; candidates are an equi-join " +
      "over the cached coded frame") {
    // the evaluation key must itself obey the disciplines it measures:
    // the exact-cosine side is a broadcast of the bounded query set
    // against one linear scan (never an unbounded cross), and band
    // candidates come from the same cached codedBands self-probe as
    // q73 (hash-joinable, no compare matrix)
    val p = plan("q192_lsh_recall")
    assert(p.contains("graft_sign_lsh"),
      s"expected the SignLshBands kernel in the plan:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"the bounded query set must broadcast:\n$p")
    // the exact side's broadcast-bounded != join IS a BNLJ by design
    // (the q45 rule: bounded |Q| x one linear scan); what must never
    // appear is an unbounded cross, and the CANDIDATE side must be a
    // hash-partitionable equi-join on the band key
    assert(!p.contains("CartesianProduct"),
      s"no unbounded compare matrix:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
        || p.contains("ShuffledHashJoin"),
      s"band candidates must come from an equi-join:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"both candidate sides must reuse the cached coded frame:\n$p")
  }

  test("q149 interval join is a binned EQUI-join, never a nested-loop compare matrix") {
    // a raw ts-BETWEEN join plans as BroadcastNestedLoop — O(n·m) at
    // any scale; the bin explode turns it into a hash-joinable shape
    // with the range predicate as a residual filter inside the match
    val p = plan("q149_join_interval_binned")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      s"the interval join must key on the time bin:\n$p")
  }

  test("q143 semdedup candidates come from an equi-join, never all-pairs") {
    // the scale contract: within-cluster dedup must NOT be the paper's
    // all-pairs scan (unbounded once MaxCentroids caps k and clusters
    // grow with the corpus) — candidates join on (band key, cluster id),
    // a hash-partitionable equi-join, with the coded frame cached once
    // for both sides
    val p = plan("q143_semdedup")
    assert(p.contains("graft_sign_lsh"),
      s"expected the SignLshBands kernel in the plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"semdedup candidate generation must never be all-pairs:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"both self-join sides must reuse the cached coded frame:\n$p")
  }

  test("q81 decontaminates with a BROADCAST semi-join on the gram stream") {
    // the 100 TB shape: the eval set's distinct gram hashes broadcast,
    // so the (billion-doc) corpus side stays a linear scan — a shuffled
    // semi-join here would move the whole corpus gram stream
    val p = plan("q81_decontaminate")
    assert("BroadcastHashJoin .*LeftSemi".r.findFirstIn(p).isDefined,
      s"expected a broadcast left-semi join on gram hashes:\n$p")
  }

  test("q90 quantized search broadcasts queries and dots with the codegen kernel") {
    val p = plan("q90_sim_quantized")
    assert(p.contains("graft_seq_dot_long"),
      s"pairwise dot must be the codegen integer kernel:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the bounded query side must broadcast:\n$p")
  }

  test("q14 aggregates map-side (partial + final HashAggregate)") {
    assert("HashAggregate".r.findAllIn(plan("q14_agg_group")).size >= 2,
      "two-phase aggregation is the map-side-combine guarantee")
  }

  test("q61 native as-of join plans AsOfJoinExec with two exchanges") {
    val p = plan("q61_asof_native")
    assert(p.contains("AsOfJoin"))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2,
      s"expected exactly the two key-cluster exchanges:\n$p")
  }

  test("q104 point-in-time lookup runs on the native as-of node, dim exchange reused") {
    // the second real workload through AsOfJoinPlan: the SCD2 dimension
    // side must SHARE q94's user_id build exchange (its windows, groupBy
    // and the as-of's ClusteredDistribution all key on user_id), so the
    // whole lookup costs two exchanges — events clustering + dim build —
    // plus nothing for the final scalar agg's single-partition collapse
    val p = plan("q104_scd2_lookup")
    assert(p.contains("AsOfJoin"),
      s"lookup must plan the native as-of node, not a range-residual SMJ:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2,
      s"dim side must reuse the SCD2 build exchange:\n$p")
  }

  test("q91 chunking is shuffle-free (narrow generate, no hash exchange)") {
    // chunking 100 TB must be embarrassingly parallel: only the tWide
    // round-robin and the presentation sort's range exchange may appear
    val p = plan("q91_chunk_docs")
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunking must not shuffle on any key:\n$p")
    assert(p.contains("Generate explode"), s"windows come from explode:\n$p")
  }

  test("q92 filters to broadcast MG candidates BEFORE the recount exchange") {
    val p = plan("q92_heavy_hitters")
    assert(p.contains("graft_misra_gries"),
      s"pass 1 must be the MG summary aggregate:\n$p")
    // the candidate filter must fuse into the broadcast join (upstream
    // of the recount exchange), so only candidate rows ever shuffle.
    // Tree prints parents first, so "below the recount exchange" ==
    // "after its first occurrence in the rendered plan"
    val joinIdx = p.indexOf("BroadcastNestedLoopJoin")
    val filterIdx = p.indexOf("array_contains")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    assert(joinIdx >= 0 && filterIdx >= 0 && exchangeIdx >= 0,
      s"expected recount exchange over broadcast join with array_contains:\n$p")
    assert(exchangeIdx < joinIdx && joinIdx <= filterIdx,
      s"candidate filter must sit at the join BELOW the recount exchange:\n$p")
  }

  test("q94 SCD2 serves both windows and the segment agg from ONE exchange") {
    val p = plan("q94_scd2")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"lag/sum windows, groupBy and lead must all reuse the user_id exchange:\n$p")
  }

  test("q95 histogram is a two-phase agg on the bucket key, one exchange") {
    val p = plan("q95_histogram")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"bucket counts must combine map-side:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"only the bucket-key exchange may shuffle:\n$p")
  }

  test("q110 fingerprints the corpus ONCE: single generate, two digest exchanges") {
    // the window-over-h form: one scan+md5 evaluation (the agg-then-
    // self-join shape ran the fingerprint pipeline twice), one exchange
    // onto h for the corpus-wide count, one back onto doc_id
    val p = plan("q110_segment_dedup")
    assert("Generate explode".r.findAllIn(p).size === 1,
      s"segment fingerprinting must run exactly once:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2,
      s"h window + doc_id agg only:\n$p")
  }

  test("q96 paged inverted index: hash-join summary, no per-token sort") {
    // df/tf_total must come from a groupBy("tok") summary hash-JOINED
    // back onto the page rows. The r7 window-over-tok gathered every
    // page of a token onto ONE reducer and sorted them — O(corpus/16)
    // rows through a single task for a stopword at 100 TB. Pins: no
    // Window; no Sort keyed on tok alone (the output Sort is the
    // composite (tok, page)); the join is hash, not sort-merge; the
    // posting build keys on (tok, page) so buffers stay bounded.
    val p = plan("q96_inverted_index")
    assert(!p.contains("Window"),
      s"token summary must be a groupBy agg, never a window:\n$p")
    assert("Sort \\[tok#\\d+[^,\\]]*\\]".r.findFirstIn(p).isEmpty,
      s"no sort may key on tok alone (single-reducer stopword sort):\n$p")
    assert(p.contains("ShuffledHashJoin") && !p.contains("SortMergeJoin"),
      s"summary join-back must be hash — sort-merge would re-sort on tok:\n$p")
    // the derived page key renders as _groupingexpression in the agg
    assert("hashpartitioning\\(tok#\\d+, (page|_groupingexpression)#\\d+".r
      .findFirstIn(p).isDefined,
      s"the posting build must key on (tok, page) — bounded buffers:\n$p")
  }

  test("q97 salted agg adds exactly one extra exchange over a plain groupBy") {
    // (key, salt) partial stage + final key stage — the hot-key spread
    // costs one bounded-size shuffle, never a third
    val p = plan("q97_agg_salted")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2,
      s"expected the salted partial + final exchanges:\n$p")
  }

  test("q98 probes the Bloom sketch BEFORE the exact semi-join") {
    val p = plan("q98_decontaminate_bloom")
    assert(p.contains("might_contain"),
      s"corpus gram stream must be Bloom-prefiltered:\n$p")
    assert("BroadcastHashJoin .*LeftSemi".r.findFirstIn(p).isDefined,
      s"exact verification must stay a broadcast semi-join:\n$p")
    // the probe must sit below the join: survivors only
    val probeIdx = p.indexOf("might_contain")
    val joinIdx = p.indexOf("BroadcastHashJoin")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      s"might_contain must filter the stream feeding the semi-join:\n$p")
  }

  test("q100 zorder audit: morton kernel in-plan, pruned scan, one exchange") {
    val p = plan("q100_zorder_layout")
    assert(p.contains("graft_morton"), s"expected the MortonCode kernel:\n$p")
    assert(!p.contains("l_extendedprice"),
      s"scan must prune to the two key columns:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"only the bucket agg may shuffle:\n$p")
  }

  test("q115 dHash candidate join is band-keyed — never all-pairs") {
    // the LSH point: candidates come from an EQUI-join on (band,
    // band-key), which hash-partitions; the id_a < id_b ordering and
    // the hamming bound ride as post-join filters. A cartesian or
    // broadcast-nested-loop here would be the quadratic all-pairs
    // image comparison the banding exists to avoid.
    val p = graft.operators.MultimodalQueries.dHashPairs(
        graft.operators.MultimodalQueries.syntheticImageHashes(spark, dir))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"band candidates must come from an equi-join, not all-pairs:\n$p")
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)".r
      .findFirstIn(p).isDefined,
      s"expected an equi-join on the band key:\n$p")
    assert(p.contains("bit_count"),
      s"the hamming bound must gate candidates in-plan:\n$p")
  }

  test("q118 substring dedup: hash join-back, cached span stream, no window") {
    // the q96 de-skew shape applied to span digests: the corpus-wide
    // occurrence count is a groupBy (map-side combined — a boilerplate
    // span repeated 10^9 times costs one partial per upstream task)
    // hash-JOINED back to span rows; a window over h would gather a hot
    // digest's rows onto one reducer, a sort-merge join would sort
    // them. The explode+md5 span pass is cached so every consumer
    // (count agg, join-back, both per-doc aggs) reads ONE
    // materialization — uncached it ran four times.
    val p = plan("q118_substring_dedup")
    assert(!p.contains("Window"),
      s"span occurrence counts must be a groupBy agg, never a window:\n$p")
    assert(p.contains("ShuffledHashJoin") && !p.contains("SortMergeJoin"),
      s"count join-back must be hash — sort-merge would sort hot digests:\n$p")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 4,
      s"span stream and marked rows must be cached (one corpus pass):\n$p")
  }

  test("q119 BPE pairs explode the VOCABULARY, never the raw token stream") {
    // two-level shape: corpus -> word frequencies (map-side combined,
    // vocabulary-sized) -> pair explosion over word TYPES. Exploding
    // pairs from the raw token stream would generate word_len rows per
    // corpus TOKEN instead of per distinct word.
    val p = plan("q119_bpe_pairs")
    assert("FileScan parquet".r.findAllIn(p).size === 1,
      s"one corpus scan:\n$p")
    val gi = p.indexOf("Generate explode(CASE WHEN (length(word")
    val wi = p.indexOf("HashAggregate(keys=[word")
    assert(gi >= 0 && wi > gi,
      s"pair explosion must consume the word-frequency agg:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be a bounded heap, not a full sort:\n$p")
  }

  test("q122 recall eval broadcasts the bounded query set to both sides") {
    // the IVF side is the q57 pruned probe; the exact side is ONE
    // linear scan of the index frame against the ≤100-query broadcast.
    // A CartesianProduct would mean the query bound stopped reaching
    // the join; a shuffled exact side would repartition the corpus to
    // meet 100 rows.
    val p = plan("q122_ann_recall")
    assert(!p.contains("CartesianProduct"),
      s"all joins must be bounded-broadcast or equi:\n$p")
    assert("Broadcast(Hash|NestedLoop)Join".r.findAllIn(p).size >= 2,
      s"queries must broadcast onto the probe AND exact scans:\n$p")
  }

  test("q120 vocab coverage: heap top-K vocab, broadcast join-back") {
    // the vocabulary is derived from the cached (lang, word) counts —
    // never a corpus re-scan — cut with a bounded heap, and broadcast
    // back (K rows); a shuffled join here would repartition the counts
    // frame just to meet a K-row table
    val p = plan("q120_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-K vocab must be a heap, not a full sort:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"the K-row vocab must broadcast onto the counts:\n$p")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
      s"(lang, word) counts must be cached — one corpus token pass:\n$p")
  }

  test("q121 CDC chunking is narrow; only digests shuffle") {
    // boundary detection, starts/ends, and chunk digests are array ops
    // inside one projection (the q91 discipline); the dedup roll-up is
    // the q118 shape — groupBy counts hash-joined back, never a window
    val p = plan("q121_cdc_chunks")
    assert(!p.contains("Window"),
      s"chunk occurrence counts must be a groupBy agg, never a window:\n$p")
    assert(p.contains("ShuffledHashJoin") && !p.contains("SortMergeJoin"),
      s"count join-back must be hash:\n$p")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
      s"the chunk stream must be cached (one chunking pass):\n$p")
    assert(p.contains("graft_poly_hash"),
      s"boundary hashing must run the codegen PolyHash kernel in-plan:\n$p")
  }

  test("q124 PII redaction is one narrow scan — no join, no aggregate") {
    // synth + count + redact + digest are all per-row projection work;
    // the only exchange allowed is the presentation sort's range
    // partitioning. A join or aggregate here would mean the redaction
    // stopped being embarrassingly parallel.
    val p = plan("q124_pii_redact")
    assert(!p.contains("Join") && !p.contains("HashAggregate"),
      s"redaction must be pure per-row work:\n$p")
    assert("Scan parquet".r.findAllIn(p).size === 1,
      s"exactly one corpus scan:\n$p")
  }

  test("q126 histogram path: bounded-key aggs, broadcast scalars, one exact sort pass") {
    // the min/max row and the 3-row quantile list broadcast; the
    // histogram agg keys on (event_type, bucket) <= 5x64. The ONLY
    // per-row sort in the plan belongs to the exact-percentile side —
    // the thing being calibrated, deliberately present.
    val p = plan("q126_quantile_hist_error")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size >= 2,
      s"scalar min/max and q_pct rows must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"scalar joins must broadcast, not cartesian:\n$p")
  }

  test("q128 split leakage computes splits inline — no assignment join") {
    // split_a/split_b are arithmetic on the pair endpoints, so beyond
    // the band self-join inside minhashPairs there is no further join;
    // the matrix agg keys on <= 9 combinations
    val p = plan("q128_split_leakage")
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).size <= 1,
      s"only the band self-join may shuffle-join:\n$p")
  }

  test("q99 top-k per group aggregates heaps — no Window, no row sort") {
    // the whole point vs q25: partial heaps combine map-side, so the
    // shuffle carries <= k pairs per (partition, group), never the rows
    val p = plan("q99_topk_agg")
    assert(!p.contains("Window"), s"top-k agg must not plan a window:\n$p")
    assert(p.contains("graft_topk"), s"expected the TopKAgg kernel:\n$p")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"partial + final heap aggregation is the map-side-combine guarantee:\n$p")
  }

  test("q163 kNN ranking is a bounded heap over the candidate stream — " +
      "no Window, one band join") {
    // the 200k-vector probe abort class: a distinct + row_number window
    // over O(candidates) rows disk-sorts the stream twice; the
    // distinctIds heap consumes it as the band join emits it and ships
    // <= 5 (sim, dst) pairs per (partition, vertex). The old two-branch
    // union also re-executed the band join per direction — the
    // generator form must keep it to ONE join. Pinned on the LAZY plan
    // (knnGraphPlan): the registered key materializes it inside a
    // scoped object-agg fallback raise (r19) and returns a ≤ 6-row
    // local frame, so the key's own plan is a LocalTableScan.
    val p = graft.operators.CorpusQueries
      .knnGraphPlan(spark, dir).queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"kNN rank must not plan a window:\n$p")
    assert(p.contains("graft_topk"), s"expected the TopKAgg kernel:\n$p")
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).size <= 1,
      s"exactly one band self-join may shuffle-join:\n$p")
    // and the key itself must hand back the pre-materialized frame
    // (execution under RESTORED confs would re-run the heavy plan
    // under the 128-key fallback — the withConfs contract)
    val keyPlan = plan("q163_knn_graph")
    assert(keyPlan.contains("LocalTableScan") && !keyPlan.contains("graft_topk"),
      s"q163 key must return the frame materialized inside the conf swap:\n$keyPlan")
  }

  test("q158 sessionization reuses ONE user_id exchange for both windows and the agg") {
    // lag, the running-sum session counter and the per-session groupBy
    // all partition on user_id — the scd2 exchange-reuse shape
    val p = plan("q158_sessionize")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size === 1,
      s"one user_id exchange must serve the whole chain:\n$p")
  }

  test("q160 A-ES weighted sample fuses to TakeOrderedAndProject") {
    assert(plan("q160_sample_weighted").contains("TakeOrderedAndProject"))
  }

  test("q162 snapshot diff shuffles digests, never text") {
    // both sides project to (doc_id, source, md5) BEFORE the full-outer
    // join, so the exchanges carry 32-char digests
    val p = plan("q162_snapshot_diff")
    assert("SortMergeJoin.*FullOuter".r.findFirstIn(p).isDefined ||
      "ShuffledHashJoin.*FullOuter".r.findFirstIn(p).isDefined,
      s"expected a shuffled full-outer join:\n$p")
    // the md5 Project sits BELOW every exchange: text appears only in
    // scan/filter/project lines, never in an Exchange's output
    assert(!"Exchange[^\\n]*text#".r.findFirstIn(p).isDefined,
      s"raw text must never reach an exchange:\n$p")
  }

  test("q164 containment join is prefix-driven — no cartesian anywhere") {
    val p = plan("q164_containment")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the candidate join must be an equi-join on shingle hashes:\n$p")
    assert(p.contains("graft_sorted_intersect_min"),
      s"verification must run the early-exit kernel in-plan:\n$p")
  }

  test("q166/q159 marginal joins broadcast — vocab-bounded sides never shuffle-join") {
    for (q <- Seq("q166_keyness", "q159_pmi_collocations")) {
      val p = plan(q)
      assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
        s"$q: unigram/source marginals must attach by broadcast:\n$p")
    }
  }

  test("q173 threshold curve never rebuilds the pair pipeline") {
    // probe-priced: the curve reads the persisted pair frame, so the
    // MinHash kernel and the shingle pipeline's window must be absent
    // (the endpoint explode IS a Generate — tiny and expected)
    val p = plan("q173_dedup_curve")
    assert(!p.contains("graft_minhash") && !p.contains("Window"),
      s"the curve must probe the persisted frame, not recompute it:\n$p")
  }

  test("q164 probe joins the ranked index bucket-aligned: zero exchange " +
      "on the shingle candidate join") {
    // both candidate sides (A-prefix filtered, B full) scan the SAME
    // h-bucketed table, so the equi-join needs no exchange at all —
    // the first sf1 cut stored plain parquet and paid two 14M-row
    // shuffles per probe (17.6 s at sf1)
    import org.apache.spark.sql.functions.{ceil, col}
    import graft.operators.SimilarityQueries
    val (_, tab) = SimilarityQueries.containmentIndex(spark, dir)
    val ranked = spark.table(tab)
    val pa = ranked
      .filter(col("rn") <= col("n") - ceil(col("n") * 0.8) + 1)
      .toDF("doc_a", "h", "rn_a", "n_a")
    val pb = ranked.toDF("doc_b", "h2", "rn_b", "n_b")
    val sp = pa.hint("merge").join(pb, col("h") === col("h2"))
      .queryExecution.executedPlan.toString
    assert(sp.contains("SortMergeJoin"), s"expected sort-merge:\n$sp")
    assert(sp.contains("Bucketed: true"),
      s"the ranked index must scan its bucketed layout:\n$sp")
    assert("Exchange hashpartitioning".r.findAllIn(sp).size === 0,
      s"bucket-aligned candidate join must not exchange either side:\n$sp")
  }

  test("q190 admission probes scan persisted bucketed membership indexes, " +
      "no corpus re-shuffle in the batch path") {
    // the serving-path discipline: the per-micro-batch membership joins
    // (canonical URL seen-before + md5 exact-dup) must read the
    // PERSISTED bucketed index tables — through r11 these sets were
    // rebuilt inline per run (distinct().cache() over the corpus),
    // which at 100 TB is corpus-sized session state paid on every
    // restart. This replays one micro-batch's join shape in batch mode.
    import org.apache.spark.sql.functions.{col, md5}
    import graft.operators.CurationQueries
    val cTab = CurationQueries.admissionUrlIndex(spark, dir)
    val mTab = CurationQueries.admissionMd5Index(spark, dir)
    val batch = Tables.t(spark, dir, "documents")
      .filter(col("doc_id") % 20 === 7)
      .select(col("doc_id"),
        CurationQueries.canonicalUrl(CurationQueries.rawUrl(
          col("doc_id"), col("lang"), col("source"))).as("canonical"),
        md5(col("text")).as("m"))
    // at-scale shape (batch too big to broadcast, the q106 SMJ
    // discipline): each membership probe sort-merges against the
    // bucketed index scan, exchanging ONLY the batch side — the
    // index contributes no Exchange and no InMemoryTableScan
    for ((tab, key) <- Seq((cTab, "canonical"), (mTab, "m"))) {
      val smj = spark.table(tab).join(batch.hint("merge"), Seq(key))
      val sp = smj.queryExecution.executedPlan.toString
      assert(sp.contains("SortMergeJoin"), s"expected sort-merge:\n$sp")
      assert(sp.contains("Bucketed: true"),
        s"$tab must scan its bucketed layout:\n$sp")
      assert("Exchange hashpartitioning".r.findAllIn(sp).size === 1,
        s"only the batch side may shuffle into $tab's buckets:\n$sp")
      assert(!sp.toLowerCase.contains("inmemorytablescan"),
        s"no cached corpus-sized frames in the probe path:\n$sp")
    }
  }

  test("q200 answers MIN/MAX/COUNT from parquet footer stats (PushedAggregation)") {
    import graft.operators.ScanQueries
    graft.Tables.withConfs(spark, ScanQueries.PushdownConfs: _*) {
      val p = ScanQueries.statsOnlyAgg(spark, dir)
        .queryExecution.executedPlan.toString
      assert(p.contains("PushedAggregation: [COUNT(*)"),
        s"the aggregate must reach the V2 parquet scan:\n$p")
      // the plan string truncates long lists — pin the leading entries
      assert(p.contains("MIN(l_orderkey)") && p.contains("MAX(l_quantity)"),
        s"min/max must be pushed alongside count:\n$p")
      // a pushed scan exposes only the aggregate columns — the row-level
      // schema must NOT be read
      assert(!p.contains("l_returnflag"),
        s"stats-only scan must not read data columns:\n$p")
    }
  }

  test("q45/q196/q201 brute-force cross joins build the BOUNDED query side") {
    // the contract bounds |Q| ≤ 100 absolutely; the corpus side is the
    // 100 TB side. The autobroadcast estimator can't see through the
    // modulo filter, so the broadcast must be EXPLICIT and the BNLJ
    // build side must be the query side (BuildLeft — q is the left
    // operand of every crossJoin here). A BuildRight BNLJ here means
    // the full corpus is being collected to the driver at scale.
    for (k <- Seq("q45_sim_topk", "q196_hard_negatives", "q201_mmr_diversify")) {
      val p = plan(k)
      assert(p.contains("BroadcastNestedLoopJoin BuildLeft"),
        s"$k must broadcast the bounded query side:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin BuildRight"),
        s"$k must never build the corpus side:\n$p")
    }
  }

  test("q55/q214: doc-array and label-frame broadcasts are EXPLICIT " +
      "(survive a disabled estimator)") {
    // the r13 q164 lesson generalized in r17: past the 10 MB threshold
    // (~sf1) the estimator flips these joins to SMJ and SORTS the n²
    // candidate stream — the 10×-docs probe measured q55 aborting a
    // 73 GB-free box on spill. Pinned with the estimator OFF, so only
    // explicit broadcast() calls survive: q55's two verify joins must
    // stay BHJ (the candidate h-join legitimately shuffles), and
    // q214's corpus-side label attach must stay a broadcast LeftOuter
    // (labels surface from a localCheckpoint with unknown stats — the
    // estimator alone would sort the whole corpus against a ≤5k frame).
    graft.Tables.withConfs(spark,
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // q55's verify-join ladder (r17): ABOVE the docs cutover the
      // broadcasts must be explicit (inject cutover 0 to force that
      // branch at fixture scale); AT fixture scale the default branch
      // leaves the joins to the planner — pin that no explicit
      // broadcast sneaks back in (the unconditional form cost the sf1
      // bench-of-record 4.8 -> 21.5 s).
      import org.apache.spark.sql.functions.col
      val docs = graft.Tables.tWide(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val pBig = graft.operators.SimilarityQueries
        .ngramJaccardPairs(docs, broadcastVerifyOver = 0L)
        .queryExecution.executedPlan.toString
      assert("BroadcastHashJoin".r.findAllIn(pBig).size >= 2,
        s"q55's past-cutover verify joins must broadcast the doc-array side:\n$pBig")
      val p55 = plan("q55_ngram_jaccard")
      assert(!p55.contains("BroadcastHashJoin"),
        s"q55's below-cutover verify joins must stay planner-chosen " +
          s"(no explicit broadcast with the estimator off):\n$p55")
      val p214 = plan("q214_simhash_survivors")
      assert("BroadcastHashJoin .*LeftOuter".r.findFirstIn(p214).nonEmpty,
        s"q214's label attach must broadcast the fp-graph labels:\n$p214")
      spark.catalog.clearCache()
    }
  }

  test("q215: label attach broadcasts the sig-graph labels; no window over the pair stream") {
    // the q214 discipline carried to the MinHash composition (VERDICT
    // r17 item 3): labels surface from a localCheckpoint with unknown
    // stats, so only an EXPLICIT broadcast survives a disabled
    // estimator — and ranking/dedup must never be a Window over the
    // candidate stream (the q163 lesson).
    graft.Tables.withConfs(spark,
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p = plan("q215_minhash_survivors")
      assert("BroadcastHashJoin .*LeftOuter".r.findFirstIn(p).nonEmpty,
        s"q215's label attach must broadcast the sig-graph labels:\n$p")
      assert(!p.contains("Window"),
        s"q215 must not window over the pair stream:\n$p")
      spark.catalog.clearCache()
    }
  }

  test("q206 Lloyd round: broadcast centroids, map-combined sums, no SMJ") {
    import org.apache.spark.sql.functions._
    val s = spark
    val idx = s.read.parquet(
      graft.operators.SimilarityQueries.ivfIndex(s, dir))
      .select(col("vec_id"),
        transform(col("embedding"),
          v => floor(v.cast("double") * lit(1048576.0)).cast("long"))
          .as("vq"),
        col("cid").cast("long").as("cid"))
      .select(col("vec_id"), col("vq"), col("cid"), col("cid").as("pcid"))
    val p = graft.operators.SimilarityQueries.kmeansReassign(idx)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"),
      s"a Lloyd round must never sort-merge:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"),
      s"the k-row centroid table must be the explicit broadcast side:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"(cid,pos) sums and centroid folds must combine map-side:\n$p")
    // the scale property of reassignment: the rank<=1 cut must push
    // into a WindowGroupLimit BEFORE the vec_id exchange, so the n×k
    // score rows reduce to ≤1 per (vec_id, partition) map-side — the
    // full pair stream never shuffles
    assert(p.contains("WindowGroupLimit"),
      s"the top-1 cut must run map-side as a WindowGroupLimit:\n$p")
  }

  test("q199/q212 refine: every index-side join broadcasts the bounded frame, no SMJ") {
    import org.apache.spark.sql.functions._
    val s = spark
    val idx = s.read.parquet(
      graft.operators.SimilarityQueries.ivfIndex(s, dir))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("cid").cast("long").as("cid"))
    val p = graft.operators.SimilarityQueries.kmeansRefine(idx)
      .queryExecution.executedPlan.toString
    // the drift measurement's joins are all k-row bounded (centroids,
    // per-centroid stats, per-centroid folds) against the linear index
    // scans — every one must broadcast; a sort-merge join here would
    // shuffle the corpus for a k-row lookup
    assert(!p.contains("SortMergeJoin"),
      s"refine must never sort-merge a k-row frame:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      s"cent/stats/folds joins must all broadcast:\n$p")
    // (cid,pos) partial sums combine map-side before the shuffle
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"cohesion and per-dim sums must combine map-side:\n$p")
  }

  test("q202 pushes grouped MIN/MAX/COUNT down to the partitioned layout") {
    import graft.operators.ScanQueries
    val stage = ScanQueries.q202Stage(spark, dir)
    graft.Tables.withConfs(spark, ScanQueries.PushdownConfs: _*) {
      val p = ScanQueries.partitionGroupAgg(spark, stage)
        .queryExecution.executedPlan.toString
      assert(p.contains("PushedAggregation: [COUNT(*)"),
        s"the grouped aggregate must reach the V2 parquet scan:\n$p")
      assert(p.contains("PushedGroupBy: [lang]"),
        s"grouping by the partition column must push down:\n$p")
    }
  }
}
