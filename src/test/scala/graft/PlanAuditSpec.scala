package graft

import graft.embed.HashingEmbedder
import graft.index.IndexBuild
import graft.operators.{Knn, Relational}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan audits: the properties that make these operators hold
  * at 100 TB are asserted here so a regression (a filter that stops
  * pushing, a dim join that stops broadcasting, a scan that reads all
  * columns) fails CI rather than shipping.
  */
class PlanAuditSpec extends SparkSuite {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  test("range predicates reach the parquet scan as pushed filters") {
    val p = plan(Relational.p3Range(spark, sf0001))
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThan(l_quantity"), "quantity range must push down")
    assert(p.contains("l_shipdate"), "date range must push down")
  }

  test("projection prunes the parquet read schema") {
    val p = plan(Relational.p1Eq(spark, sf0001))
    // scan must not read l_extendedprice etc. for a 3-column projection
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_extendedprice"), readSchema)
    assert(readSchema.contains("l_orderkey"), readSchema)
  }

  test("dimension joins broadcast; no shuffle of the fact side for star dims") {
    val p = plan(Relational.joinMultiStar(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    val p2 = plan(Relational.joinInnerAgg(spark, sf0001))
    assert(p2.contains("BroadcastHashJoin"), p2)
  }

  test("top-k compiles to TakeOrderedAndProject (no global sort)") {
    val q = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") === Knn.QueryId).select("embedding").head().getSeq[Float](0)
    val p = plan(Knn.fullScanKnn(spark, sf0001, typedlit(q), 10))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("aggregation uses partial (map-side) aggregation and codegen") {
    val q = Relational.q1Agg(spark, sf0001)
    assert(plan(q).contains("HashAggregate"), plan(q))
    val codegen = q.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains("WholeStageCodegen"), "agg pipeline must stay in codegen")
  }

  test("anti-join plans as a real anti join") {
    val p = plan(Relational.j2Anti(spark, sf0001))
    assert(p.contains("LeftAnti"), p)
  }

  test("percentiles: no whole-group window; survivor v-range reaches the scan") {
    // r21 (RankSelect): the old pin here asserted the ONE shared hash
    // exchange of the Window.partitionBy(flag) formulation — the very
    // |groups|-task whole-group sort the rewrite removes. The scale
    // properties of the replacement: any remaining Window partitions
    // on (group, __b) — the bounded survivor histogram — and the
    // redundant global v-range conjunct reaches the parquet scan as a
    // pushed filter (row-group pruning at 100 TB).
    // force the bucket route: sf0.001's groups sit under the
    // small-group floor and would legitimately take the window form
    spark.conf.set("spark.graft.rankselect.smallGroupRows", "0")
    val df =
      try graft.operators.Advanced.aggPercentiles(spark, sf0001)
      finally spark.conf.unset("spark.graft.rankselect.smallGroupRows")
    // collect() executes df's OWN QueryExecution (a write would build a
    // new one — the Util.rowsScanned trap), finalizing the AQE plan
    df.collect()
    val full = plan(df)
    assert(full.contains("isFinalPlan=true"), "audit must inspect the finalized AQE plan")
    // the AQE printout appends the initial plan after the final one —
    // only the final section is the executed shape
    val p = full.split("== Initial Plan ==").head
    val winSpecs = p.split("windowspecdefinition\\(").toSeq.drop(1)
      .map(_.takeWhile(_ != ')'))
    assert(winSpecs.nonEmpty, s"expected the survivor-histogram window:\n$p")
    winSpecs.foreach { spec =>
      assert(spec.contains("__b#"),
        s"every window must partition on (group, __b), got: $spec") }
    assert(p.contains("GreaterThanOrEqual(l_extendedprice"),
      s"v-range lower bound must push down to the survivor scan:\n$p")
    // the toString PushedFilters list is width-truncated, so match the
    // un-truncatable prefix of the upper bound
    assert(p.contains("LessThan(l_e"),
      "v-range upper bound must push down to the survivor scan")
    // the returned plan holds only the survivor pass (the two summary
    // passes ran eagerly at construction): ONE scan, and its raw rows
    // are never shuffled or whole-group sorted
    assert("FileScan parquet".r.findAllIn(p).size === 1,
      "one survivor scan in the returned plan")
  }

  test("bloom-pruned join: sketch prefilter sits at the scan, join stays exact") {
    val df = graft.operators.Advanced.bloomJoin(spark, sf0001)
    val p = plan(df)
    assert(p.contains("bloom_might_contain"), "prefilter must be in the plan")
    assert(p.contains("Join") || p.contains("BroadcastHashJoin"), p)
    // the prefilter must execute BEFORE the join (below it in the tree)
    val filterIdx = p.indexOf("bloom_might_contain")
    val joinIdx = p.indexOf("HashJoin")
    assert(joinIdx >= 0, s"expected a hash join in the plan:\n$p")
    assert(filterIdx > joinIdx, "filter below (after in text) the join node")
  }

  test("top-k aggregate runs map-side partials (k rows/group/partition to shuffle)") {
    val p = plan(Relational.a2TopkAgg(spark, sf0001))
    // TypedImperativeAggregate plans as ObjectHashAggregate/SortAggregate
    // with a partial mode below the exchange — the property that keeps
    // the shuffle at k rows per group per partition
    assert(p.contains("partial_topk_rows"), s"expected partial topk_rows:\n$p")
    // the r7 TopKRows consumers inherit the same property: only k rows
    // per group per partition reach the shuffle
    val p16 = plan(graft.operators.TextAnalysis.t16QuotaSample(spark, sf0001))
    assert(p16.contains("partial_topk_rows"),
      s"t16 quota must partial-aggregate per cell:\n${p16.take(2000)}")
    val p15 = plan(graft.operators.Knn.v15RecallEval(spark, sf0001))
    assert(p15.contains("partial_topk_rows"),
      s"v15 eval must partial-aggregate per query:\n${p15.take(2000)}")
  }

  test("q_v9 oracle query itself: partition pruning + dist0 stats pushdown") {
    // the ORACLE-CHECKED serving query (not just the searchIndexed
    // helper) must carry the pruned plan — this is the plan that runs
    // at 100x (VERDICT r2 item 1)
    val p = plan(graft.operators.Indexed.v9IndexedRange(spark, sf0001))
    assert("PartitionFilters: \\[[^\\]]*cluster".r.findFirstIn(p).isDefined,
      s"expected cluster partition filter:\n${p.take(3000)}")
    assert(p.contains("GreaterThan(dist0"), s"expected dist0 pushdown:\n${p.take(3000)}")
    assert(p.contains("LessThan(dist0"), s"expected dist0 upper bound pushdown:\n${p.take(3000)}")
  }

  test("no dedup/corpus plan contains a cartesian product or nested-loop pair join") {
    // the whole point of the LSH/band/inverted-index formulations is
    // that candidate generation is an equi-join on a bucket key; a
    // CartesianProduct (or a non-broadcast nested loop) in any of these
    // plans means a formulation regressed to all-pairs
    val deduped = Seq("q_d1_dedup_exact", "q_d2_dedup_minhash_lsh",
      "q_d5_dedup_embedding", "q_d6_simhash_pairs", "q_d7_dedup_clusters",
      "q_d8_decontaminate", "q_t11_tfidf", "q_t12_pack")
    for (name <- deduped) {
      val p = plan(SparkEntry.queries(name)(spark, sf0001))
      assert(!p.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n${p.take(2000)}")
    }
  }

  test("v10/v12/v13 serve from stored code tables: embedding read only by the re-rank") {
    // the r4/r5 verdict's scale defect: these plans used to re-encode the
    // full float corpus per query. Now the candidate scan must read ONLY
    // the stored integer codes — exactly one scan in each plan may read
    // the embedding column (the TopN re-rank / final distance).
    def embeddingScans(p: String): Int =
      p.linesIterator.filter(_.contains("ReadSchema")).count(_.contains("embedding"))
    val p10 = plan(graft.operators.Indexed.v10IvfKmeans(spark, sf0001))
    assert(embeddingScans(p10) === 1, s"v10 must not re-assign floats per query:\n${p10.take(3000)}")
    assert(p10.contains("In(cluster"), s"probe filter must push to the assignment scan:\n${p10.take(3000)}")
    val p12 = plan(graft.operators.Indexed.v12PqAdc(spark, sf0001))
    assert(embeddingScans(p12) === 1, s"v12 must not re-encode floats per query:\n${p12.take(3000)}")
    assert(p12.linesIterator.exists(l => l.contains("ReadSchema") && l.contains("code0")),
      s"v12 candidate scan must read the stored codes:\n${p12.take(3000)}")
    val p13 = plan(graft.operators.Indexed.v13Sq8(spark, sf0001))
    assert(embeddingScans(p13) === 1, s"v13 must not re-quantize floats per query:\n${p13.take(3000)}")
    assert(p13.linesIterator.exists(l => l.contains("ReadSchema") && l.contains("codes")),
      s"v13 candidate scan must read the stored codes:\n${p13.take(3000)}")
    // v14 composes both structures: the probe filter pushes to the
    // assignment scan, the ADC reads stored codes, and the float corpus
    // appears only in the TopN re-rank
    val p14 = plan(graft.operators.Indexed.v14IvfPq(spark, sf0001))
    assert(embeddingScans(p14) === 1, s"v14 must touch floats only at re-rank:\n${p14.take(3000)}")
    assert(p14.contains("In(cluster"), s"v14 probe filter must push to the assignment scan:\n${p14.take(3000)}")
    assert(p14.linesIterator.exists(l => l.contains("ReadSchema") && l.contains("code0")),
      s"v14 candidate scan must read the stored codes:\n${p14.take(3000)}")
    // v16 adds the metadata predicate: the allowed-id side must be a
    // column-pruned (vec_id, label) scan with the IN pushed to parquet —
    // the float column (embedding:array) still read by the re-rank only
    def floatScans(p: String): Int =
      p.linesIterator.filter(_.contains("ReadSchema")).count(_.contains("embedding:array"))
    val p16 = plan(graft.operators.Indexed.v16FilteredIvf(spark, sf0001))
    assert(floatScans(p16) === 1, s"v16 must touch floats only at re-rank:\n${p16.take(3000)}")
    assert(p16.contains("In(label"), s"v16 label predicate must push to the scan:\n${p16.take(3000)}")
    assert(p16.contains("In(cluster"), s"v16 probe filter must push to the assignment scan:\n${p16.take(3000)}")
    assert(p16.linesIterator.exists(l => l.contains("ReadSchema") &&
        l.contains("struct<vec_id:bigint,label:int>")),
      s"v16 allowed-id scan must be pruned to (vec_id, label):\n${p16.take(3000)}")
    // v17 batch: ONE scan of the codes table and ONE float scan no
    // matter how many queries are in the batch — the whole point of
    // batch serving (per-query plans would scan |Q| times)
    val p17 = plan(graft.operators.Indexed.v17BatchIvfPq(spark, sf0001))
    assert(floatScans(p17) === 1, s"v17 must touch floats only at re-rank:\n${p17.take(3000)}")
    assert(p17.linesIterator.count(l => l.contains("ReadSchema") && l.contains("code0")) === 1,
      s"v17 must scan the codes table ONCE for the whole batch:\n${p17.take(3000)}")
    assert(p17.contains("In(cluster"),
      s"v17 union probe filter must push to the assignment scan:\n${p17.take(3000)}")
    // v18 residual IVFADC: codes carry their cluster — the probe
    // filter must prune the RESIDUAL-codes scan itself, and no
    // assignment-table scan may appear anywhere in the plan
    val p18 = plan(graft.operators.Indexed.v18IvfAdcResidual(spark, sf0001))
    assert(floatScans(p18) === 1, s"v18 must touch floats only at re-rank:\n${p18.take(3000)}")
    assert(p18.contains("In(cluster"),
      s"v18 probe filter must push to the residual-codes scan:\n${p18.take(3000)}")
    assert(p18.linesIterator.exists(l => l.contains("ReadSchema") && l.contains("rcode0")),
      s"v18 candidate scan must read the stored residual codes:\n${p18.take(3000)}")
    assert(!p18.contains("graft_v10_assign"),
      s"v18 must not join the assignment table (cluster rides the codes):\n${p18.take(3000)}")
  }

  test("t17 shard manifest: one hash shuffle, no extra pass for offsets") {
    val p = plan(graft.operators.TextAnalysis.t17ShardManifest(spark, sf0001))
    // pos and byte_offset share the window partition — a second
    // hashpartitioning Exchange would mean the offset pays its own pass
    val hashEx = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(hashEx === 1, s"t17 must compute pos+offset in ONE shard shuffle:\n${p.take(3000)}")
  }

  test("t18 chunking: pure per-row fan-out — no shuffle before the final sort") {
    val p = plan(graft.operators.TextAnalysis.t18Chunk(spark, sf0001))
    assert(p.contains("Generate explode"),
      s"chunk fan-out must plan as a Generate (codegen explode):\n${p.take(3000)}")
    // one Exchange total: the rangepartitioning for the output ORDER BY;
    // any hashpartitioning would mean the chunker itself shuffles
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunking must not hash-shuffle document data:\n${p.take(3000)}")
  }

  test("t15 repetition: fused kernel — single scan, no shuffle before the final sort") {
    val p = plan(graft.operators.Corpus.t15Repetition(spark, sf0001))
    assert(p.contains("repetition_stats"),
      s"t15 must evaluate the fused RepetitionStats kernel:\n${p.take(3000)}")
    // one Exchange total: the rangepartitioning for the output ORDER BY;
    // the old formulation paid four doc_id hash shuffles (window + three
    // sibling aggregations) and ran the tokenizer three times per row
    assert(!p.contains("Exchange hashpartitioning"),
      s"t15 must not hash-shuffle token data:\n${p.take(3000)}")
  }

  test("m2 frame sampling: per-row fan-out, media bytes never hash-shuffle") {
    val p = plan(graft.operators.Advanced.m2FrameSample(spark, sf0001))
    assert(p.contains("Generate explode"),
      s"frame fan-out must plan as a Generate (codegen explode):\n${p.take(3000)}")
    // only the output ORDER BY's rangepartitioning may move rows; a
    // hashpartitioning would mean the sampler shuffles payload bytes
    assert(!p.contains("Exchange hashpartitioning"),
      s"frame sampling must not hash-shuffle asset data:\n${p.take(3000)}")
  }

  test("m3/m4/m5 real codec: one narrow map over the id scan, media bytes in no shuffle") {
    for ((name, q) <- Seq(
      "m3" -> graft.operators.Advanced.m3CodecMeta,
      "m4" -> graft.operators.Advanced.m4Resize,
      "m5" -> graft.operators.Advanced.m5ResampleAudio)) {
      val p = plan(q(spark, sf0001))
      // generate+decode(+resize/resample) fuse into the row mapper —
      // the only Exchange is the output ORDER BY's rangepartitioning
      assert(!p.contains("Exchange hashpartitioning"),
        s"$name must not hash-shuffle media bytes:\n${p.take(3000)}")
    }
  }

  test("t19 temperature mix: map-side heap partials, broadcast targets, tiny scalar window") {
    val p = plan(graft.operators.TextAnalysis.t19TemperatureMix(spark, sf0001))
    assert(p.contains("partial_topk"),
      s"t19 winners must come from map-side bounded-heap partials:\n${p.take(3000)}")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"per-source targets must broadcast onto the winners:\n${p.take(3000)}")
    // documents must flow through the heap aggregate only: a
    // row_number() ranking window (the oracle's formulation) would
    // sort every source's documents inside the shuffle — rn comes from
    // the heap's posexplode instead. (The one Window in the plan is
    // the scalar w_total over the per-source AGGREGATE, cardinality =
    // #sources.)
    assert(!p.contains("row_number()"),
      s"no ranking window over documents may appear:\n${p.take(3000)}")
  }

  test("v20/v21 maintenance queries: pushed probe filters, real anti joins, no cartesian") {
    // v21: each width's candidate scan must push its cluster IN filter
    // to the stored assignment parquet (the scan cost the curve
    // measures IS the pruned scan), and nothing may plan a cartesian
    val p21 = plan(graft.operators.Indexed.v21NprobeCurve(spark, sf0001))
    assert(p21.contains("In(cluster"),
      s"v21 probe filters must push to the assignment scans:\n${p21.take(3000)}")
    assert(!p21.contains("CartesianProduct"),
      s"v21 must not plan a cartesian over data:\n${p21.take(3000)}")
    // (the 1-row metric crossJoins legitimately plan as broadcast
    // nested-loop over single-row aggregates — only cartesians over
    // DATA are forbidden)
    val p20 = plan(graft.operators.Indexed.v20IndexCoverage(spark, sf0001))
    assert(p20.contains("LeftAnti"),
      s"v20 missing/orphan counts must plan as real anti joins:\n${p20.take(3000)}")
  }

  test("hybrid retrieval: bounded heaps, 1-row broadcast stats, no doc shuffle") {
    // h1: the scoring pass is a pure map feeding a TakeOrderedAndProject
    // heap; the corpus stats re-enter as a 1-row IdentityBroadcastMode
    // BNLJ (NOT a shuffle). r21: perDoc deliberately fans the
    // single-row-group scan out once (REPARTITION_BY_NUM on doc_id, the
    // d2 idiom — see TextAnalysis.parDocs); beyond that explicit
    // fan-out, no document row may hash-shuffle (ENSURE_REQUIREMENTS
    // would mark a planner-inserted data shuffle).
    val p1 = plan(graft.operators.Hybrid.h1Bm25Topk(spark, sf0001))
    assert(p1.contains("TakeOrderedAndProject"),
      s"BM25 top-k must be a bounded heap, not a global sort:\n${p1.take(3000)}")
    assert(p1.contains("IdentityBroadcastMode"),
      s"corpus stats must broadcast as the 1-row BNLJ side:\n${p1.take(3000)}")
    val hashEx = "Exchange hashpartitioning[^\n]*".r.findAllIn(p1).toSeq
    assert(hashEx.forall(_.contains("REPARTITION_BY_NUM")),
      s"only the explicit perDoc fan-out may hash-shuffle in the BM25 plan:\n$hashEx")
    // h2: BOTH legs truncate through their own heap before the rank
    // windows ever run, so the single-partition windows see ≤ RrfLegK
    // rows — the WindowExec single-partition warning is bounded by
    // construction, not by data.
    val p2 = plan(graft.operators.Hybrid.h2HybridRrf(spark, sf0001))
    val heaps = "TakeOrderedAndProject".r.findAllIn(p2).length
    assert(heaps >= 3, // lex leg + vec leg + final fused top-k
      s"both fusion legs and the final k must be bounded heaps (got $heaps):\n${p2.take(3000)}")
    assert(!p2.contains("CartesianProduct"),
      s"fusion must not plan a cartesian over data:\n${p2.take(3000)}")
    // h4: the returned (re-scoring) plan touches only the In()-pruned
    // candidate scan — the candidate ids must reach the parquet scan as
    // a pushed In filter, stats broadcast as in h1, and nothing
    // hash-partitions.
    val p4 = plan(graft.operators.Hybrid.h4PrfExpand(spark, sf0001))
    assert(p4.contains("PushedFilters: [In(doc_id"),
      s"candidate re-scan must prune via a pushed In filter:\n${p4.take(3000)}")
    val hashEx4 = "Exchange hashpartitioning[^\n]*".r.findAllIn(p4).toSeq
    assert(p4.contains("IdentityBroadcastMode") &&
      hashEx4.forall(_.contains("REPARTITION_BY_NUM")),
      s"re-score must broadcast stats; only the stats pass's explicit " +
        s"fan-out may hash-shuffle:\n$hashEx4")
    // h5: index SERVING never scans the corpus — the postings reads
    // prune whole bucket directories (PartitionFilters) and row groups
    // (pushed In(term)); the one data shuffle is the per-doc pivot of
    // MATCHED postings, with map-side partials.
    val p5 = plan(graft.operators.Hybrid.h5Bm25Indexed(spark, sf0001))
    assert(!p5.contains("documents.parquet"),
      s"indexed serving must not scan the corpus:\n${p5.take(3000)}")
    assert(p5.contains("PartitionFilters: [bucket") &&
      p5.contains("PushedFilters: [In(term"),
      s"postings reads must prune buckets and terms:\n${p5.take(3000)}")
    assert(p5.contains("partial_max(dl"),
      s"per-doc pivot must run map-side partials:\n${p5.take(3000)}")
  }

  test("IVF layout: cluster partition pruning + dist0 stats pushdown") {
    val out = tmpDir("plan-audit-ivf") + "/vectors"
    val e = HashingEmbedder(dims = 16)
    val pivots = Seq(e.embedOne("p one").toSeq, e.embedOne("p two").toSeq)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id").cast("string").as("id"), col("text")).limit(100)
    IndexBuild.buildFromDocuments(docs, "id", "text", e, pivots, out)
    val t = spark.read.parquet(out)
    // partition pruning on cluster
    val pp = plan(t.filter(col("cluster") === 0))
    assert(pp.contains("PartitionFilters: [isnotnull(cluster"), pp)
    // row-group stats pruning on dist0 (sorted within partitions)
    val rp = plan(t.filter(col("dist0") > 1.0 && col("dist0") < 1.2))
    assert(rp.contains("PushedFilters: [IsNotNull(dist0), GreaterThan(dist0"), rp)
  }

  test("t20 heavy hitters: sketch runs map-side partials; recount shuffles only candidates") {
    import graft.operators.TextAnalysis
    // pass 1 (built inline — t20 consumes it via a 1-row head()): the
    // Misra-Gries aggregate must plan PARTIAL mode below the exchange,
    // so each partition ships m counters, never its token multiset.
    val toks = TextAnalysis.tokens(col("text"))
    val n1 = greatest(size(toks) - 1, lit(0))
    val bg = zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    val p1 = plan(spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(bg).as("term"))
      .agg(graft.functions.MisraGries.sketch(col("term"), TextAnalysis.HHSketchM)))
    assert(p1.contains("partial_misra_gries"),
      s"sketch must aggregate map-side before the gather:\n${p1.take(3000)}")
    // pass 2 (the returned plan): candidate membership is a pushed-down
    // set filter under a partial count — the exchange carries at most
    // one partial count per candidate per partition, never raw tokens —
    // and the top-k is a bounded heap.
    val p2 = plan(TextAnalysis.t20HeavyHitters(spark, sf0001))
    assert(p2.contains("partial_count"),
      s"recount must run map-side partials:\n${p2.take(3000)}")
    assert(p2.contains("TakeOrderedAndProject"),
      s"top-k must be a bounded heap, not a global sort:\n${p2.take(3000)}")
    assert(!p2.contains("misra_gries"),
      s"the served plan must be sketch-free (exact recount only):\n${p2.take(3000)}")
    assert(!p2.contains("CartesianProduct"), p2.take(3000))
  }
}
