package graft.operators

import graft.core.Tables._
import graft.functions.VectorFunctions.cosine
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Hybrid retrieval: lexical (BM25) ranking, lexical+vector fusion
  * (reciprocal-rank fusion), and MMR diversification — the retrieval
  * stack a vector-database user layers on top of pure ANN (the
  * reference serves only the vector leg, `src/search.ts:10-45`; RAG
  * deployments of it invariably bolt a lexical index next to it and
  * fuse — this module is that missing half, Spark-native).
  *
  * Determinism contract (house style): every ranking signal that crosses
  * the oracle boundary is integer arithmetic.
  *  - BM25 is evaluated in exact rational form: with k1 = 1.2 and
  *    b = 0.75, tf-part = tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/A)
  *    multiplied through by 20·A gives 44·A·tf / (20·A·tf + 6·A + 18·dl)
  *    — all-integer once A (integer-truncated average doc length) is
  *    fixed. Scaled ×1000 and floored (`div`), it is bit-identical in
  *    Spark and DuckDB.
  *  - idf uses the integer-quantized surrogate
  *    1000·(N − df + 1) div (df + 1): strictly monotone decreasing in
  *    df like ln((N−df+0.5)/(df+0.5)), which is all BM25's ordering
  *    semantics need, without cross-engine `ln` ULP drift.
  *  - RRF is quantized the same way: 10^6 div (C + rank).
  *
  * Scale notes (100 TB): BM25 is two scans by nature — one map-side-
  * combined aggregate producing a single corpus-stats row (N, ΣdL, df
  * per query term; in production maintained incrementally as corpus
  * metadata, not recomputed per query), then a pure per-row scoring map
  * over the tokenized docs feeding a TakeOrderedAndProject heap. The
  * stats row re-enters the plan as a broadcast (1-row
  * BroadcastNestedLoopJoin, not a shuffle). Nothing in the scoring pass
  * shuffles; per-doc cost is O(dl) independent of corpus size. The A,
  * dl, tf factors are per-document bounded, so the integer forms cannot
  * overflow at any corpus size (no term multiplies two corpus-sized
  * quantities).
  */
object Hybrid {

  /** Fixed lexical query. "dup" is the one rare vocabulary term in the
    * synthetic corpus (df ≈ 5%) — high idf; the other two are common
    * (df ≈ 77%) so the query exercises both idf regimes.
    */
  val QueryTerms: Seq[String] = Seq("dup", "spark", "vector")

  val Bm25TopK  = 15
  /** Depth of each fused leg (lexical / vector) in h2. */
  val RrfLegK   = 20
  /** Classic RRF constant (Cormack et al. 2009). */
  val RrfC      = 60
  val RrfScale  = 1000000L
  val RrfTopK   = 10
  /** MMR: candidate pool, picks, and λ (relevance weight) in milli. */
  val MmrCand        = 12
  val MmrSelect      = 5
  val MmrLambdaMilli = 700L

  // ----------------------------------------------------------- lexical

  /** Per-doc term stats: doc_id, dl, tf_<term>. The token array is
    * materialized once in an intermediate projection (the t2 lesson:
    * HOFs are codegen-fallback islands, so an inlined `tokens(text)`
    * re-splits the full text per consuming expression).
    */
  private def perDoc(s: SparkSession, d: String): DataFrame = {
    // Opt r21: the per-row tokenize work is embarrassingly parallel →
    // explicit repartition so a single-file parquet scan doesn't
    // serialize it (the d2/d8 idiom — a one-row-group documents file
    // is ONE scan task however small maxPartitionBytes is; h4's probe
    // showed 0.5-0.6 s single-task tokenize jobs inside every bm25
    // pass). At 100 TB the scan is naturally parallel and the
    // repartition moves text bytes once — same trade the d-family
    // already accepts for its kernels.
    val t = documents(s, d)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val tfs = QueryTerms.map(q =>
      size(filter(col("toks"), x => x === q)).cast("long").as(s"tf_$q"))
    t.select(col("doc_id") +: size(col("toks")).cast("long").as("dl") +: tfs: _*)
  }

  /** Docs scored by integer-exact BM25 (see object scaladoc for the
    * rational derivation). Two scans of `documents`: the stats aggregate
    * and the scoring map — inherent to BM25 (global stats precede
    * scoring); deliberately NOT cached (the tokens-wide blow-up costs
    * more to materialize than the second tokenize, measured on t15).
    */
  /** The summed integer-rational BM25 contribution over `QueryTerms` —
    * expects `n_docs`, `df_<q>`, `adl`, `tf_<q>`, `dl` columns in
    * scope. Shared by the scan path (h1/h2/h4) and the stored-index
    * serving path (h5) so the two can never drift.
    */
  private def bm25Contrib: Column = QueryTerms.map(q => expr(
    s"""((1000 * (n_docs - df_$q + 1)) div (df_$q + 1))
       | * ((44000 * adl * tf_$q) div (20 * adl * tf_$q + 6 * adl + 18 * dl))"""
      .stripMargin.replaceAll("\n", " "))).reduce(_ + _)

  private[graft] def bm25Scored(s: SparkSession, d: String): DataFrame = {
    val pd = perDoc(s, d)
    val dfAggs = QueryTerms.map(q =>
      sum(when(col(s"tf_$q") > 0, 1L).otherwise(0L)).as(s"df_$q"))
    val stats = pd.agg(count(lit(1)).as("n_docs"),
      (sum("dl").as("t_tokens") +: dfAggs): _*)
    pd.crossJoin(broadcast(stats)) // 1-row stats side: BNLJ, no shuffle
      .withColumn("adl", expr("t_tokens div n_docs"))
      .withColumn("bm25_scaled", bm25Contrib)
  }

  /** H1: BM25 top-k lexical search over `documents`.
    * Output: doc_id, n_tokens, tf_<term>…, bm25_scaled (integer).
    */
  val h1Bm25Topk: Relational.Q = (s, d) =>
    bm25Scored(s, d)
      .filter(col("bm25_scaled") > 0)
      .orderBy(col("bm25_scaled").desc, col("doc_id").asc)
      .limit(Bm25TopK)
      .select(col("doc_id") +: col("dl").as("n_tokens") +:
        QueryTerms.map(q => col(s"tf_$q")) :+ col("bm25_scaled"): _*)

  // ---------------------------------------------------- lexical index

  /** Postings partition-bucket count. At 100 TB this scales with
    * vocabulary/corpus size (target file-size-bound buckets); the plan
    * shape — partition prune on bucket, row-group stats prune on term —
    * is unchanged.
    */
  val LexBuckets = 8
  // l2: postings gained the positions array (phrase serving). The tag
  // names the layout — bumping it publishes fresh artifact dirs instead
  // of corrupting l1 readers (warehouse artifacts persist across runs).
  private val LexTag = s"l2b$LexBuckets"

  /** Build-once inverted lexical index in the versioned warehouse (the
    * [[Indexed.ensureIndex]] discipline): `postings/` holds one row per
    * (term, doc) — (term, doc_id, tf, dl), dl DENORMALIZED so serving
    * never joins a doc-stats table — laid out as `bucket =
    * pmod(xxhash64(term), B)` directory partitions sorted by term
    * within, so a query's terms prune whole directories AND row groups.
    * `meta/` holds the 1-row corpus stats (n_docs, t_tokens) captured
    * at build time. The build's one shuffle is the map-side-combined
    * groupBy((term, doc_id)) of the exploded tokens — inherent to
    * inverted-index construction and linear in corpus tokens.
    */
  /** (doc_id, toks, dl) for an arbitrary documents-shaped frame. */
  private def docTokens(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))

  /** Postings rows for a tokenized batch, in the index layout.
    * `positions` are the 1-based token indexes of the term in the doc
    * (the POSITIONAL half of the index: phrase/adjacency queries
    * intersect them with zero corpus access); `tf` stays denormalized
    * so frequency serving (h5) never touches the arrays.
    */
  private def postingsOf(pd: DataFrame): DataFrame = pd
    .select(col("doc_id"), col("dl"), posexplode(col("toks")).as(Seq("p0", "term")))
    .filter(length(col("term")) > 0)
    .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"),
      sort_array(collect_list(col("p0") + 1)).as("positions"))
    .withColumn("bucket",
      pmod(xxhash64(col("term")), lit(LexBuckets.toLong)).cast("int"))

  private def writePostings(p: DataFrame, dir: String, mode: String): Unit = p
    .repartition(col("bucket"))
    .sortWithinPartitions("bucket", "term", "doc_id")
    .write.partitionBy("bucket").mode(mode).parquet(dir)

  /** Engine-hash bucket id of a term, evaluated DRIVER-SIDE via the
    * same Catalyst expression (`xxhash64`, seed 42) the stored layout
    * is written with — so build and probe still cannot drift, but a
    * serve no longer pays a one-row Spark job just to hash a handful
    * of query-term literals (one scheduler round-trip per query in the
    * hot serving path). Equivalence with the in-plan hash is asserted
    * in HybridSpec.
    */
  private[graft] def termBucket(t: String): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal(t)), 42L)
      .eval(null).asInstanceOf[Long]
    java.lang.Math.floorMod(h, LexBuckets.toLong).toInt
  }

  def ensureLexIndex(s: SparkSession, d: String): String = synchronized {
    graft.core.ArtifactStore.ensure(
      graft.core.ArtifactStore.artifactDir("lex_postings", d, LexTag)) { target =>
      val pd = docTokens(documents(s, d))
      writePostings(postingsOf(pd), s"$target/postings", "overwrite")
      pd.agg(count(lit(1)).cast("long").as("n_docs"),
          sum("dl").cast("long").as("t_tokens"))
        .coalesce(1).write.mode("overwrite").parquet(s"$target/meta")
    }
  }

  /** Total postings data files across the bucket dirs — the
    * append-fragmentation measure that triggers auto-compaction.
    */
  private def lexFileCount(postingsDir: String): Int =
    Option(new java.io.File(postingsDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(b => Option(b.listFiles()).getOrElse(Array.empty)
        .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith(".")))
      .sum

  /** Auto-compaction threshold (files across all buckets). */
  val LexCompactFiles: Int = 4 * LexBuckets

  /** Incremental index maintenance: append the postings of a batch of
    * NEW documents (caller contract, as for the ANN appends: the batch's
    * doc_ids are not already indexed — the upsert path's anti-join
    * guarantees it upstream). The append is a PUBLISH
    * ([[graft.core.ArtifactStore.appendVersion]]): live postings carry
    * forward as hard links, the delta's bucket files land beside them,
    * and the 1-row stats are REPLACED with (old + delta) counters — a
    * reader resolves the old or the new index, never a mix, and the
    * delta shuffles only the BATCH's tokens, never re-touching the
    * indexed corpus. Each delta file is term-sorted so row-group
    * pruning stays sharp; repeated appends fragment the bucket dirs and
    * auto-compact past [[LexCompactFiles]] files (the Indexed-family
    * ingest discipline).
    */
  def appendLexIndex(s: SparkSession, d: String, newDocs: DataFrame): String = synchronized {
    ensureLexIndex(s, d)
    val adir = graft.core.ArtifactStore.artifactDir("lex_postings", d, LexTag)
    graft.core.ArtifactStore.withMaintenanceLock(adir) {
      val live = graft.core.ArtifactStore.current(adir).get
      val pd = docTokens(newDocs)
      val old = s.read.parquet(s"$live/meta").head()
      val add = pd.agg(count(lit(1)).cast("long"), sum("dl").cast("long")).head()
      // BOTH sides need the sum-over-zero-rows null guard: an index
      // built over an EMPTY corpus stores t_tokens = NULL (sum of no
      // dl), so the first delta append onto it must coalesce the BASE
      // row exactly as it already coalesces the delta row.
      val nDocs = old.getLong(0) + add.getLong(0)
      val tToks = (if (old.isNullAt(1)) 0L else old.getLong(1)) +
        (if (add.isNullAt(1)) 0L else add.getLong(1))
      graft.core.ArtifactStore.appendVersion(adir) { target =>
        writePostings(postingsOf(pd), s"$target/postings", "append")
        import s.implicits._
        Seq((nDocs, tToks)).toDF("n_docs", "t_tokens")
          .coalesce(1).write.mode("overwrite").parquet(s"$target/meta")
      }
    }
    val live = graft.core.ArtifactStore.current(adir).get
    // The threshold probe runs OUTSIDE the maintenance lock (the OS
    // file lock is not reentrant), so two appending processes can both
    // observe an over-threshold count; onlyIfFragmented re-checks the
    // LIVE count inside compaction's own lock, so the loser no-ops
    // instead of re-compacting an already-compacted index.
    if (lexFileCount(s"$live/postings") > LexCompactFiles)
      compactLexIndex(s, d, onlyIfFragmented = true)
    else live
  }

  /** Rewrite the postings back to one term-sorted file run per bucket
    * and reclaim superseded versions past the reader-retention window
    * (the compactTable discipline; separate lock scope — the OS file
    * lock is not reentrant). With `onlyIfFragmented` (the auto-compact
    * path) the live file count is RE-CHECKED under the lock and the
    * compaction no-ops if a concurrent process already collapsed it.
    */
  def compactLexIndex(s: SparkSession, d: String,
      onlyIfFragmented: Boolean = false): String = synchronized {
    val adir = graft.core.ArtifactStore.artifactDir("lex_postings", d, LexTag)
    val compacted = graft.core.ArtifactStore.withMaintenanceLock(adir) {
      val cur = graft.core.ArtifactStore.current(adir).getOrElse(
        throw new IllegalStateException(s"nothing to compact: lex_postings for $d"))
      if (onlyIfFragmented && lexFileCount(s"$cur/postings") <= LexCompactFiles) cur
      else {
        val posts = s.read.parquet(s"$cur/postings")
        val meta = s.read.parquet(s"$cur/meta")
        graft.core.ArtifactStore.publish(adir) { target =>
          writePostings(posts, s"$target/postings", "overwrite")
          meta.coalesce(1).write.mode("overwrite").parquet(s"$target/meta")
        }
      }
    }
    graft.core.ArtifactStore.gcVersions(adir)
    compacted
  }

  /** H5: BM25 top-k SERVED from the stored inverted index — output
    * identical to [[h1Bm25Topk]] (the oracle recomputes from raw
    * documents, so index build + serving are both under the hash
    * check). This is the 100 TB path for lexical search: the corpus is
    * never scanned at query time — the pruned postings read touches
    * only Σ df(q) rows (partition prune on the term buckets + pushed
    * In(term) row-group prune, both asserted in PlanAuditSpec), the
    * per-term df re-derives from the pruned read itself (≤ |q| rows,
    * broadcast back), and the one hash shuffle is the per-doc pivot of
    * MATCHED postings only, map-side combined.
    */
  val h5Bm25Indexed: Relational.Q = (s, d) => {
    val root = ensureLexIndex(s, d)
    // bucket ids for the query terms, driver-evaluated with the
    // engine's own hash expression ([[termBucket]]) — no per-serve job
    val buckets = QueryTerms.map(termBucket).distinct
    val pruned = s.read.parquet(s"$root/postings")
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(QueryTerms: _*))
    // per-term df from the pruned read (postings are unique per
    // (term, doc) so count = df), pivoted to the 1-row stats shape
    val dfCols = QueryTerms.map(q =>
      coalesce(sum(when(col("term") === q, col("dfv"))), lit(0L)).as(s"df_$q"))
    val dfs = pruned.groupBy("term").agg(count(lit(1)).as("dfv"))
      .agg(dfCols.head, dfCols.tail: _*)
    val stats = s.read.parquet(s"$root/meta").crossJoin(dfs)
    val tfCols = QueryTerms.map(q =>
      coalesce(sum(when(col("term") === q, col("tf"))), lit(0L)).as(s"tf_$q"))
    val perDocTf = pruned.groupBy("doc_id")
      .agg(max("dl").as("dl"), tfCols: _*)
    perDocTf.crossJoin(broadcast(stats)) // 1-row stats: BNLJ, no shuffle
      .withColumn("adl", expr("t_tokens div n_docs"))
      .withColumn("bm25_scaled", bm25Contrib)
      .filter(col("bm25_scaled") > 0)
      .orderBy(col("bm25_scaled").desc, col("doc_id").asc)
      .limit(Bm25TopK)
      .select(col("doc_id") +: col("dl").as("n_tokens") +:
        QueryTerms.map(q => col(s"tf_$q")) :+ col("bm25_scaled"): _*)
  }

  // ------------------------------------------------- phrase serving

  /** H6 phrase and result size. A fixed 2-term phrase from the corpus
    * vocabulary; the chain below handles any length.
    */
  val PhraseTerms: Seq[String] = Seq("big", "data")
  val PhraseTopK = 10

  /** H6: exact phrase search SERVED from the positional index — zero
    * corpus access. The phrase's terms prune the postings read (bucket
    * PartitionFilters + pushed In(term), as h5); the per-doc pivot of
    * the ≤|phrase| matched postings is the one hash shuffle; adjacency
    * is a fold of `array_intersect(transform(acc, +1), positions(tᵢ))`
    * — after step i the array holds the positions of tᵢ completing a
    * t₁..tᵢ run, so the final size is the exact occurrence count and
    * `min − (p−1)` the first start. Output: top-k docs by
    * (n_occ DESC, doc_id ASC) with the 1-based first start position.
    *
    * 100 TB: work is Σ df(phrase terms) postings rows — independent of
    * corpus size for selective phrases — and the arrays stay inside the
    * per-doc row (never re-exploded). The DuckDB oracle recomputes from
    * RAW text (a sliding-window scan), so tokenizer, position encoding,
    * delta appends, and the intersect chain are all under one hash.
    */
  val h6PhraseIndexed: Relational.Q = (s, d) => {
    val root = ensureLexIndex(s, d)
    // engine-hash bucket ids for the phrase terms (h5's discipline):
    // driver-evaluated via [[termBucket]], no per-serve job
    val buckets = PhraseTerms.map(termBucket).distinct
    val pruned = s.read.parquet(s"$root/postings")
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(PhraseTerms: _*))
    val pivots = PhraseTerms.zipWithIndex.map { case (t, i) =>
      first(when(col("term") === t, col("positions")), ignoreNulls = true).as(s"p_$i") }
    val perDoc = pruned.groupBy("doc_id").agg(pivots.head, pivots.tail: _*)
    val present = PhraseTerms.indices.map(i => col(s"p_$i").isNotNull).reduce(_ && _)
    val chain = PhraseTerms.indices.tail.foldLeft(col("p_0")) { (acc, i) =>
      array_intersect(transform(acc, _ + 1), col(s"p_$i")) }
    perDoc.filter(present)
      .withColumn("hits", chain)
      .filter(size(col("hits")) > 0)
      .select(col("doc_id"),
        size(col("hits")).cast("long").as("n_occ"),
        (array_min(col("hits")) - (PhraseTerms.size - 1)).cast("long").as("first_pos"))
      .orderBy(col("n_occ").desc, col("doc_id").asc)
      .limit(PhraseTopK)
  }

  // --------------------------------------------- PRF query expansion

  /** H4 geometry: candidate pool, feedback docs, expansion terms. */
  val PrfCand   = 50
  val PrfDocs   = 10
  val PrfExpand = 3

  /** H4: pseudo-relevance-feedback query expansion (RM3-shaped —
    * Abdul-Jaleel et al., UMass TREC 2004): retrieve, mine the top
    * `PrfDocs` feedback docs for the `PrfExpand` highest-Σtf terms not
    * already in the query, then re-score the top-`PrfCand` candidate
    * pool with base + half-weight expansion contributions (per-term
    * `div 2` — kept per-term so the oracle mirrors the truncation
    * exactly).
    *
    * Scale notes (100 TB): the two driver collects are plan-bounded,
    * not data-bounded — ≤ PrfCand ids from a TakeOrderedAndProject
    * heap and ≤ PrfExpand terms from the feedback-doc vocabulary; both
    * re-enter the plan as literals, and the candidate/feedback
    * re-scans PRUNE via pushed In() filters (asserted in
    * PlanAuditSpec). The one extra full-corpus scan computes the
    * expansion terms' df — the idf of a data-dependent term needs its
    * corpus frequency; a production deployment serves this from the
    * same incrementally-maintained corpus-stats metadata as BM25's
    * N/ΣdL, so the scan is the honest cold-start cost, not a per-query
    * one. Re-scoring touches ONLY the In()-pruned candidates.
    */
  val h4PrfExpand: Relational.Q = (s, d) => {
    // pass 1 — candidate ids. Bounded collect rationale: ≤ PrfCand = 50
    // rows BY CONSTRUCTION (the limit is in the plan); ordered, so the
    // feedback set is the prefix.
    val candIds = bm25Scored(s, d).filter(col("bm25_scaled") > 0)
      .orderBy(col("bm25_scaled").desc, col("doc_id").asc).limit(PrfCand)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val prfIds = candIds.take(PrfDocs)
    // expansion terms from the feedback docs (In()-pruned scan; the
    // sort input is the ≤ PrfDocs-doc vocabulary). Bounded collect
    // rationale: ≤ PrfExpand = 3 terms by the limit in the plan.
    val expTerms = documents(s, d).filter(col("doc_id").isin(prfIds: _*))
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
      .filter(length(col("term")) > 0 && !col("term").isin(QueryTerms: _*))
      .groupBy("term").agg(count(lit(1)).as("tfsum"))
      .orderBy(col("tfsum").desc, col("term").asc).limit(PrfExpand)
      .collect().map(_.getString(0)).toSeq
    val all = QueryTerms ++ expTerms
    // per-doc dl + tf per term, indexed columns (expansion terms are
    // data and make unsafe column names)
    def pdIdx(src: DataFrame): DataFrame = {
      val t = src.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      val tfs = all.zipWithIndex.map { case (q, i) =>
        size(filter(col("toks"), x => x === q)).cast("long").as(s"tf_$i") }
      t.select(col("doc_id") +: size(col("toks")).cast("long").as("dl") +: tfs: _*)
    }
    // full-corpus df scan: repartition for the same single-row-group
    // reason as [[perDoc]]; the In()-pruned candidate scan below stays
    // un-shuffled (≤ PrfCand rows)
    val stats = pdIdx(documents(s, d)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id")))
      .agg(count(lit(1)).as("n_docs"),
      (sum("dl").as("t_tokens") +:
        all.indices.map(i => sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))): _*)
    def contrib(i: Int, den: Long): Column = expr(
      s"(((1000 * (n_docs - df_$i + 1)) div (df_$i + 1))" +
        s" * ((44000 * adl * tf_$i) div (20 * adl * tf_$i + 6 * adl + 18 * dl))) div $den")
    val baseCol = QueryTerms.indices.map(contrib(_, 1L)).reduce(_ + _)
    val boostCol =
      if (expTerms.isEmpty) lit(0L)
      else (QueryTerms.size until all.size).map(contrib(_, 2L)).reduce(_ + _)
    pdIdx(documents(s, d).filter(col("doc_id").isin(candIds: _*)))
      .crossJoin(broadcast(stats)) // 1-row stats: BNLJ, no shuffle
      .withColumn("adl", expr("t_tokens div n_docs"))
      .withColumn("base_scaled", baseCol)
      .withColumn("boost_scaled", boostCol)
      .withColumn("bm25x_scaled", col("base_scaled") + col("boost_scaled"))
      .orderBy(col("bm25x_scaled").desc, col("doc_id").asc).limit(Bm25TopK)
      .select("doc_id", "base_scaled", "boost_scaled", "bm25x_scaled")
  }

  // ------------------------------------------------------------ fusion

  /** H2: hybrid search — BM25 leg and cosine-kNN leg (same query
    * document: terms above / embedding of `Knn.QueryId`), each ranked to
    * depth `RrfLegK`, fused by quantized reciprocal-rank fusion
    * `Σ 10^6 div (60 + rank)`. A doc found by only one leg scores with
    * the legs it has (rank NULL on the other — the classic RRF
    * semantics).
    *
    * Plan shape: each leg is a TakeOrderedAndProject (bounded heap, no
    * global sort); the fusion is a union + hash-agg over ≤ 2·RrfLegK
    * rows. The single-partition rank windows run AFTER the legs' top-k
    * truncation, so they see ≤ RrfLegK rows — not a scale hazard.
    */
  val h2HybridRrf: Relational.Q = (s, d) => {
    val lexW = Window.orderBy(col("bm25_scaled").desc, col("doc_id").asc)
    val lex = bm25Scored(s, d)
      .filter(col("bm25_scaled") > 0)
      .orderBy(col("bm25_scaled").desc, col("doc_id").asc).limit(RrfLegK)
      .withColumn("lex_rank", row_number().over(lexW).cast("long"))
      .select(col("doc_id").as("id"), col("lex_rank"),
        lit(null).cast("long").as("vec_rank"))
    val q = Knn.embeddingLit(s, d, Knn.QueryId)
    val vecW = Window.orderBy(col("sim").desc, col("vec_id").asc)
    val vec = embeddings(s, d)
      .filter(col("vec_id") =!= Knn.QueryId)
      .withColumn("sim", cosine(col("embedding"), q))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(RrfLegK)
      .withColumn("vec_rank", row_number().over(vecW).cast("long"))
      .select(col("vec_id").as("id"), lit(null).cast("long").as("lex_rank"),
        col("vec_rank"))
    lex.unionByName(vec)
      .groupBy("id")
      .agg(max("lex_rank").as("lex_rank"), max("vec_rank").as("vec_rank"))
      .withColumn("rrf_scaled",
        coalesce(expr(s"$RrfScale div ($RrfC + lex_rank)"), lit(0L)) +
          coalesce(expr(s"$RrfScale div ($RrfC + vec_rank)"), lit(0L)))
      .orderBy(col("rrf_scaled").desc, col("id").asc)
      .limit(RrfTopK)
      .select(col("id").as("doc_id"), col("lex_rank"), col("vec_rank"),
        col("rrf_scaled"))
  }

  // ------------------------------------------------------------- MMR

  /** H3: maximal-marginal-relevance rerank (Carbonell & Goldstein 1998)
    * of the top-`MmrCand` cosine candidates: greedily pick
    * `MmrSelect` docs maximizing λ·rel − (1−λ)·max-sim-to-selected,
    * λ = 0.7, all signals quantized to milli integers
    * (round(sim·1000) — same cross-engine double contract as the
    * v-family's round(sim, 3) outputs).
    *
    * The candidate generation (corpus-wide cosine top-k) and the
    * pairwise candidate-similarity matrix are distributed;
    * the greedy selection itself runs on the driver over the collected
    * candidates. Bounded collect rationale: |cand| ≤ MmrCand = 12 and
    * |pairs| ≤ MmrCand·(MmrCand−1) = 132 BY CONSTRUCTION (the limits
    * are in the plan, not the data), and MMR is inherently sequential —
    * each pick conditions the next via the max-sim term, so there is no
    * distributed formulation that is not a k-round driver loop anyway.
    * At 100 TB nothing changes: the rerank always runs on the final
    * top-C of a search, and C stays human-sized while the corpus grows.
    */
  val h3MmrRerank: Relational.Q = (s, d) => {
    val q = Knn.embeddingLit(s, d, Knn.QueryId)
    // persisted: the MmrCand-row candidate frame is consumed THREE
    // times — the rel collect plus both self-join sides of `pairs` —
    // and each uncached consumer would re-run the corpus-wide cosine
    // top-k scan that dominates the query (the d2 cache discipline;
    // everything after the two collects is driver-side, so the cache
    // is released before returning)
    val cand = embeddings(s, d)
      .filter(col("vec_id") =!= Knn.QueryId)
      .withColumn("sim", cosine(col("embedding"), q))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(MmrCand)
      .select(col("vec_id").as("id"),
        round(col("sim") * 1000, 0).cast("long").as("rel_m"),
        col("embedding"))
      .persist()
    val a = cand.select(col("id").as("a"), col("embedding").as("ea"))
    val b = cand.select(col("id").as("b"), col("embedding").as("eb"))
    val pairs = a.join(broadcast(b), col("a") =!= col("b"))
      .select(col("a"), col("b"),
        round(cosine(col("ea"), col("eb")) * 1000, 0).cast("long").as("s_m"))
    val cs = cand.select("id", "rel_m").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sim = pairs.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    cand.unpersist()
    var selected = Vector.empty[(Int, Long, Long)] // (rank, id, rel_m)
    var remaining = cs.toList
    for (k <- 1 to MmrSelect) {
      val pick = remaining.map { case (id, rel) =>
        val pen =
          if (selected.isEmpty) 0L
          else selected.map { case (_, sid, _) => sim((id, sid)) }.max
        (id, rel, MmrLambdaMilli * rel - (1000 - MmrLambdaMilli) * pen)
      }.minBy { case (id, _, score) => (-score, id) }
      selected :+= ((k, pick._1, pick._2))
      remaining = remaining.filterNot(_._1 == pick._1)
    }
    import s.implicits._
    selected.toDF("mmr_rank", "doc_id", "rel_milli")
      .select(col("mmr_rank").cast("long"), col("doc_id"), col("rel_milli"))
      .orderBy("mmr_rank")
  }

  // ---------------------------------------------------------- registry

  val queries: Map[String, Relational.Q] = Map(
    "q_h1_bm25_topk" -> h1Bm25Topk,
    "q_h2_hybrid_rrf" -> h2HybridRrf,
    "q_h3_mmr_rerank" -> h3MmrRerank,
    "q_h4_prf_expand" -> h4PrfExpand,
    "q_h5_bm25_indexed" -> h5Bm25Indexed,
    "q_h6_phrase_indexed" -> h6PhraseIndexed,
  )

  val oracleSql: Map[String, String] = {
    val pdCte =
      s"""WITH tok AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
         |            FROM documents),
         |pd AS (SELECT doc_id, len(toks)::BIGINT AS dl,
         |${QueryTerms.map(q => s"  len(list_filter(toks, t -> t = '$q'))::BIGINT AS tf_$q").mkString(",\n")}
         |       FROM tok),
         |st AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS t_tokens,
         |${QueryTerms.map(q => s"  sum(CASE WHEN tf_$q > 0 THEN 1 ELSE 0 END)::BIGINT AS df_$q").mkString(",\n")}
         |       FROM pd),
         |sc AS (SELECT doc_id, dl, ${QueryTerms.map(q => s"tf_$q").mkString(", ")},
         |${QueryTerms.map(q =>
            s"""  (((1000 * (n_docs - df_$q + 1)) // (df_$q + 1))
               |   * ((44000 * adl * tf_$q) // (20 * adl * tf_$q + 6 * adl + 18 * dl)))"""
              .stripMargin).mkString(" +\n")}
         |         AS bm25_scaled
         |       FROM pd CROSS JOIN (SELECT *, t_tokens // n_docs AS adl FROM st))"""
        .stripMargin
    val simCte =
      s"""qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = ${Knn.QueryId}),
         |sim AS (SELECT vec_id, sum(a*b) / (sqrt(sum(a*a)) * sqrt(sum(b*b))) AS sim
         |        FROM (SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS a,
         |                     unnest(qv.qe)::DOUBLE AS b
         |              FROM embeddings e CROSS JOIN qv
         |              WHERE e.vec_id <> ${Knn.QueryId}) z
         |        GROUP BY vec_id)""".stripMargin
    // MMR oracle: the greedy loop unrolled as MmrSelect CTE steps (pure
    // SQL, no recursion) over the candidate + pairwise-sim tables.
    val mmrSteps = (2 to MmrSelect).map { k =>
      s"""p$k AS (SELECT c.id, c.rel_m,
         |        ${MmrLambdaMilli} * c.rel_m - ${1000 - MmrLambdaMilli} *
         |          (SELECT max(p.s_m) FROM ps p
         |           JOIN sel${k - 1} v ON p.a = c.id AND p.b = v.id) AS score
         |        FROM cand c
         |        WHERE c.id NOT IN (SELECT id FROM sel${k - 1})
         |        ORDER BY score DESC, c.id ASC LIMIT 1),
         |sel$k AS (SELECT id, rel_m, pick FROM sel${k - 1}
         |          UNION ALL SELECT id, rel_m, $k AS pick FROM p$k)"""
        .stripMargin
    }.mkString(",\n")
    // h4's expansion pipeline in SQL: candidate pool → feedback-doc
    // term mining → corpus df of the mined terms → half-weight
    // contributions, all in the same integer-rational arithmetic.
    val prfSql =
      s"""$pdCte,
         |cand AS (SELECT doc_id, bm25_scaled FROM sc WHERE bm25_scaled > 0
         |         ORDER BY bm25_scaled DESC, doc_id ASC LIMIT $PrfCand),
         |prf AS (SELECT doc_id FROM cand
         |        ORDER BY bm25_scaled DESC, doc_id ASC LIMIT $PrfDocs),
         |pt AS (SELECT unnest(t.toks) AS term FROM tok t
         |       JOIN prf p ON t.doc_id = p.doc_id),
         |expt AS (SELECT term FROM pt
         |         WHERE len(term) > 0
         |           AND term NOT IN (${QueryTerms.map(t => s"'$t'").mkString(", ")})
         |         GROUP BY term ORDER BY count(*) DESC, term ASC LIMIT $PrfExpand),
         |ct AS (SELECT z.doc_id, z.term, count(*)::BIGINT AS tf
         |       FROM (SELECT t.doc_id, unnest(t.toks) AS term FROM tok t
         |             JOIN cand c ON t.doc_id = c.doc_id) z
         |       JOIN expt e ON e.term = z.term GROUP BY z.doc_id, z.term),
         |dfe AS (SELECT e.term, count(DISTINCT z.doc_id)::BIGINT AS dfv
         |        FROM (SELECT t.doc_id, unnest(t.toks) AS term FROM tok t) z
         |        JOIN expt e ON e.term = z.term GROUP BY e.term),
         |boost AS (SELECT ct.doc_id,
         |            sum((((1000 * (st.n_docs - dfe.dfv + 1)) // (dfe.dfv + 1))
         |                 * ((44000 * a.adl * ct.tf)
         |                    // (20 * a.adl * ct.tf + 6 * a.adl + 18 * pd.dl))) // 2
         |            )::BIGINT AS boost_scaled
         |          FROM ct JOIN dfe ON dfe.term = ct.term
         |               JOIN pd ON pd.doc_id = ct.doc_id
         |               CROSS JOIN st
         |               CROSS JOIN (SELECT t_tokens // n_docs AS adl FROM st) a
         |          GROUP BY ct.doc_id)
         |SELECT c.doc_id, c.bm25_scaled AS base_scaled,
         |       coalesce(b.boost_scaled, 0)::BIGINT AS boost_scaled,
         |       (c.bm25_scaled + coalesce(b.boost_scaled, 0))::BIGINT AS bm25x_scaled
         |FROM cand c LEFT JOIN boost b ON b.doc_id = c.doc_id
         |ORDER BY bm25x_scaled DESC, c.doc_id ASC LIMIT $Bm25TopK""".stripMargin
    // h1 and h5 share one oracle: h5 must reproduce the scan-path
    // result exactly from the stored index, so the raw-docs recompute
    // checks build AND serving.
    val bm25Sql =
      s"""$pdCte
         |SELECT doc_id, dl AS n_tokens, ${QueryTerms.map(q => s"tf_$q").mkString(", ")}, bm25_scaled
         |FROM sc WHERE bm25_scaled > 0
         |ORDER BY bm25_scaled DESC, doc_id ASC LIMIT $Bm25TopK""".stripMargin
    // h6: the oracle slides a window over the RAW token sequence (it
    // never sees postings or positions), so the positional index's
    // build, appends, and intersect chain are all under the hash
    val phraseSql = {
      val p = PhraseTerms.size
      val conds = PhraseTerms.zipWithIndex
        .map { case (t, i) => s"t[i + $i] = '$t'" }.mkString(" AND ")
      s"""WITH tok AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
         |             FROM documents),
         |m AS (SELECT doc_id,
         |             list_filter(range(1, len(t) - ${p - 2}), i -> $conds) AS starts
         |      FROM tok)
         |SELECT doc_id, len(starts)::BIGINT AS n_occ, starts[1]::BIGINT AS first_pos
         |FROM m WHERE len(starts) > 0
         |ORDER BY n_occ DESC, doc_id ASC LIMIT $PhraseTopK""".stripMargin
    }
    Map(
      "q_h4_prf_expand" -> prfSql,
      "q_h1_bm25_topk" -> bm25Sql,
      "q_h5_bm25_indexed" -> bm25Sql,
      "q_h6_phrase_indexed" -> phraseSql,
      "q_h2_hybrid_rrf" ->
        s"""$pdCte,
           |lex AS (SELECT doc_id AS id,
           |               row_number() OVER (ORDER BY bm25_scaled DESC, doc_id ASC) AS lex_rank
           |        FROM sc WHERE bm25_scaled > 0
           |        ORDER BY bm25_scaled DESC, doc_id ASC LIMIT $RrfLegK),
           |$simCte,
           |vec AS (SELECT vec_id AS id,
           |               row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS vec_rank
           |        FROM sim ORDER BY sim DESC, vec_id ASC LIMIT $RrfLegK),
           |f AS (SELECT coalesce(lex.id, vec.id) AS doc_id,
           |             lex_rank::BIGINT AS lex_rank, vec_rank::BIGINT AS vec_rank,
           |             coalesce($RrfScale // ($RrfC + lex_rank), 0)
           |               + coalesce($RrfScale // ($RrfC + vec_rank), 0) AS rrf_scaled
           |      FROM lex FULL OUTER JOIN vec ON lex.id = vec.id)
           |SELECT doc_id, lex_rank, vec_rank, rrf_scaled FROM f
           |ORDER BY rrf_scaled DESC, doc_id ASC LIMIT $RrfTopK""".stripMargin,
      "q_h3_mmr_rerank" ->
        s"""WITH $simCte,
           |cand AS (SELECT vec_id AS id, round(sim * 1000)::BIGINT AS rel_m, sim
           |         FROM sim ORDER BY sim DESC, vec_id ASC LIMIT $MmrCand),
           |ce AS (SELECT e.vec_id, e.embedding FROM embeddings e
           |       JOIN cand c ON e.vec_id = c.id),
           |ps AS (SELECT a, b,
           |              round(sum(p*r) / (sqrt(sum(p*p)) * sqrt(sum(r*r))) * 1000)::BIGINT AS s_m
           |       FROM (SELECT x.vec_id AS a, y.vec_id AS b,
           |                    unnest(x.embedding)::DOUBLE AS p,
           |                    unnest(y.embedding)::DOUBLE AS r
           |             FROM ce x JOIN ce y ON x.vec_id <> y.vec_id) z
           |       GROUP BY a, b),
           |p1 AS (SELECT id, rel_m FROM cand ORDER BY rel_m DESC, id ASC LIMIT 1),
           |sel1 AS (SELECT id, rel_m, 1 AS pick FROM p1),
           |$mmrSteps
           |SELECT pick::BIGINT AS mmr_rank, id AS doc_id, rel_m AS rel_milli
           |FROM sel$MmrSelect ORDER BY pick""".stripMargin,
    )
  }
}
