package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{AnalysisException, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming corpus ingestion with near-dup rejection — the d16 probe
  * and the signature-index lifecycle driven from Structured Streaming.
  * Each micro-batch of (doc_id, text) documents is:
  *
  *  1. id-anti-joined against the ACCEPTED STORE (the S4 idempotence
  *     ledger — a re-delivered batch is a no-op);
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

  private def readIfExists(s: SparkSession, dir: String): Option[DataFrame] =
    try Some(s.read.parquet(dir))
    catch {
      case e: AnalysisException
          if Option(e.getCondition).contains("PATH_NOT_FOUND") => None
    }

  private def rmDir(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(path))
  }

  /** One ingest step (also the crash-recovery unit — the spec drives
    * it directly to simulate failure windows).
    */
  def ingestBatch(s: SparkSession, d: String, acceptedDir: String,
      rejectedDir: String, batchRaw: DataFrame): Unit = {
    val ledger = readIfExists(s, acceptedDir)
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
    // S4 idempotence: drop docs the ledger already holds. Persisted —
    // consumed by the probe, the accepted anti-join, and both writes.
    val fresh = (ledger match {
      case Some(acc) =>
        batchRaw.join(acc.select("doc_id"), Seq("doc_id"), "left_anti")
      case None => batchRaw
    }).persist()
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
      matches.unionByName(intra).write.mode(SaveMode.Append).parquet(rejectedDir)
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
        } finally rmDir(staging)
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
