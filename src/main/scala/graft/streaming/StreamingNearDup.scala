package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming corpus ingestion with near-dup rejection — the d16 probe
  * and the signature-index lifecycle driven from Structured Streaming.
  * Each micro-batch of (doc_id, text) documents is:
  *
  *  1. id-anti-joined against BOTH the ACCEPTED STORE (the S4
  *     idempotence ledger — a re-delivered batch is a no-op) and the
  *     index's own doc-id MANIFEST (a base-split doc replayed
  *     upstream, or an id collision, must not self-quarantine or
  *     re-append its bands — the [[StreamingGraphIngest]] two-gate
  *     discipline);
  *  2. near-dup-probed against the LIVE band-signature index
  *     ([[Dedup.probeSigIndex]]: batch-only signature compute, the
  *     corpus is never scanned);
  *  3. checked against ITSELF ([[Dedup.intraBatchMatches]]: a
  *     batch-sized band self-join) so a same-batch burst of duplicates
  *     — a crawler re-fetch landing in one micro-batch — admits only
  *     the smallest-id representative of each near-dup cluster;
  *  4. split — verified matches land in the QUARANTINE log with the
  *     doc they duplicate (a corpus doc, or the same-batch winner) and
  *     the verified Jaccard; survivors append to the accepted store
  *     and delta-publish their signatures into the index
  *     ([[Dedup.appendSigIndex]]), so the NEXT batch is checked
  *     against them too.
  *
  * Consistency contract across the three effects (none of which share
  * a transaction):
  *  - accepted store: exactly-once — it IS the ledger the anti-join
  *    reads, so a retry cannot re-append. The batch's acceptance
  *    DECISION is frozen durably (written to a staging dir and read
  *    back) BEFORE the ledger mutates: the decision's lineage
  *    anti-joins the pre-append ledger, so a cache-loss recompute
  *    after the append (executor loss on a real cluster) must not be
  *    able to re-derive it against the just-mutated ledger and
  *    silently empty the frame mid-effect-chain.
  *  - signature index: eventually exactly-once — the crash window
  *    between store-append and index-publish is closed by a per-batch
  *    RECONCILE against the index version's doc-id MANIFEST
  *    ([[Dedup.sigIndexManifest]]): ledger docs missing from the
  *    manifest are re-appended before the new batch probes. The
  *    manifest records every INDEXED doc — including shingle-less
  *    docs (under 3 tokens), which produce zero band rows but are
  *    known — so membership is a first-class fact rather than a
  *    distinct-projection of the band rows, and a shingle-less doc
  *    heals exactly once instead of either churning no-op index
  *    versions forever or needing a band-derived special case.
  *  - quarantine log: at-least-once — a crash between quarantine-
  *    append and store-append replays the batch and can duplicate
  *    quarantine rows; the log is keyed (batch_id, corpus_id), so
  *    readers dedup on read. Rejection evidence is an audit trail,
  *    not a ledger (an intra-batch loser's recorded winner may itself
  *    have lost to a smaller doc — the pair is the evidence).
  */
object StreamingNearDup {

  /** Wire a file-source stream of document parquet into
    * [[ingestBatch]]. The caller owns trigger/termination.
    */
  def start(spark: SparkSession, datasetDir: String, srcDir: String,
      acceptedDir: String, rejectedDir: String, checkpointDir: String,
      schema: StructType): StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(spark, datasetDir, acceptedDir, rejectedDir, batch)
      }
      .start()

  /** One ingest step (also the crash-recovery unit — the spec drives
    * it directly to simulate failure windows).
    */
  def ingestBatch(s: SparkSession, d: String, acceptedDir: String,
      rejectedDir: String, batchRaw: DataFrame): Unit = {
    // reclaim any decision-staging dir a crashed previous run stranded
    // (single-ingester contract: nothing live can own one at batch start)
    graft.core.Util.sweepStagingDirs(acceptedDir)
    val ledger = graft.core.Util.readParquetIfExists(s, acceptedDir)
    // reconcile FIRST: heal any accepted docs whose index publish was
    // lost to a crash, so this batch probes against a complete index.
    // Membership comes from the index's doc-id manifest, so a
    // shingle-less doc (zero band rows by construction) heals once
    // and then counts as indexed.
    ledger.foreach { acc =>
      val unindexed = acc.join(Dedup.sigIndexManifest(s, d).select("doc_id"),
        Seq("doc_id"), "left_anti")
      if (!unindexed.isEmpty) Dedup.appendSigIndex(s, d, unindexed)
    }
    // S4 idempotence, TWO gates (the [[StreamingGraphIngest]]
    // discipline). The ledger gate alone is not enough: a batch id
    // already present in the INDEX but not the ledger — a base-split
    // doc replayed upstream, or an id collision — would pass the
    // ledger anti-join and (if shingled) quarantine as a duplicate of
    // ITSELF, or (if shingle-less) be accepted and re-appended to the
    // index, double-counting the merge-maintained capped-view `bsz`
    // and duplicating its text in the corpusText hydration frame. So
    // the batch is also anti-joined against the index's own doc-id
    // MANIFEST — re-resolved AFTER the reconcile above so a
    // just-healed id counts as present. An indexed id is dropped
    // entirely (not ledgered: ledgering a base-split id would
    // duplicate its text in the corpusText union and produce
    // duplicate verify rows in every later probe's hydration join).
    // After the reconcile, ledger ⊆ manifest, so this gate subsumes
    // the ledger one — both stay: the ledger anti-join documents the
    // S4 contract and shrinks the frame the manifest join sees.
    val indexed = Dedup.sigIndexManifest(s, d).select("doc_id")
    val fresh = (ledger match {
      case Some(acc) =>
        batchRaw.join(acc.select("doc_id"), Seq("doc_id"), "left_anti")
      case None => batchRaw
    }).join(indexed, Seq("doc_id"), "left_anti").persist()
    try {
      if (fresh.isEmpty) return
      // hydration text = base corpus split + everything accepted so far
      val baseText = graft.core.Tables.documents(s, d)
        .filter(Dedup.baseHash(col("doc_id").cast("string")) % 10 < 8)
        .select(col("doc_id"), col("text"))
      val corpusText = ledger match {
        case Some(acc) => baseText.unionByName(acc.select("doc_id", "text"))
        case None => baseText
      }
      val matches = Dedup
        .probeSigIndex(s, d, fresh.select("doc_id", "text"), corpusText)
        .persist()
      val dupIds = matches.select(col("batch_id").as("doc_id")).distinct()
      val corpusSurvivors = fresh.join(dupIds, Seq("doc_id"), "left_anti")
      // intra-batch pass over the corpus survivors: same-batch
      // near-dup clusters keep their smallest doc_id only
      val intra = Dedup
        .intraBatchMatches(corpusSurvivors.select("doc_id", "text"))
        .persist()
      val accepted = corpusSurvivors
        .join(intra.select(col("batch_id").as("doc_id")), Seq("doc_id"), "left_anti")
        .persist()
      // effect order carries the consistency contract (object doc):
      // quarantine (at-least-once) → durable decision staging →
      // ledger (exactly-once) → index (healed by the next batch's
      // reconcile if we die before it)
      // guard like the accepted branch below: an unconditional append
      // would commit an empty file set per CLEAN batch — unbounded
      // _SUCCESS/empty-part churn in the quarantine log over a
      // long-running stream of mostly-unique docs
      val quarantine = matches.unionByName(intra)
      if (!quarantine.isEmpty)
        quarantine.write.mode(SaveMode.Append).parquet(rejectedDir)
      if (!accepted.isEmpty) {
        // freeze the decision durably BEFORE the ledger append: the
        // re-read staging frame's lineage is the staged files alone,
        // so a post-append recompute cannot anti-join the mutated
        // ledger (cache retention is an optimization, not a crutch)
        val staging = acceptedDir + ".staging-" + java.util.UUID.randomUUID()
        try {
          accepted.write.mode(SaveMode.Overwrite).parquet(staging)
          val frozen = s.read.parquet(staging)
          frozen.write.mode(SaveMode.Append).parquet(acceptedDir)
          Dedup.appendSigIndex(s, d, frozen)
        } finally graft.core.Util.deleteRecursively(staging)
      }
      matches.unpersist()
      intra.unpersist()
      accepted.unpersist()
    } finally {
      fresh.unpersist()
      Dedup.releaseSlots()
    }
  }
}
