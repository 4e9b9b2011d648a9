package graft

import graft.operators.Dedup
import graft.streaming.StreamingNearDup
import org.apache.spark.sql.functions._

/** Streaming ingestion with near-dup rejection: corpus dups are
  * quarantined, survivors grow the index (so later waves are checked
  * against earlier accepted docs), re-delivery is a no-op, and the
  * store-appended-but-index-lost crash window self-heals.
  */
class StreamingNearDupSpec extends SparkSuite {
  import spark.implicits._

  /** Fixture: a dataset dir whose corpus split (md5 bucket < 8) seeds
    * the index; returns (datasetDir, a corpus doc's (id, text)).
    */
  private def freshDataset(): (String, (Long, String)) = {
    val d = tmpDir("snd")
    val docs = graft.core.Tables.documents(spark, sf0001)
      .filter(Dedup.baseHash(col("doc_id").cast("string")) % 10 < 8)
      .limit(200)
    docs.write.parquet(s"$d/documents.parquet")
    val seed = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").head()
    (d, (seed.getLong(0), seed.getString(1)))
  }

  private def ids(dir: String, idCol: String = "doc_id"): Set[Long] =
    try spark.read.parquet(dir).select(idCol).collect().map(_.getLong(0)).toSet
    catch { case _: org.apache.spark.sql.AnalysisException => Set.empty }

  test("end-to-end stream: dup quarantined, novel accepted, index grows across waves, re-delivery no-ops") {
    val (d, (dupId, dupText)) = freshDataset()
    val (src, acc, rej, chk) =
      (tmpDir("snd-src"), tmpDir("snd-acc") + "/a", tmpDir("snd-rej") + "/r", tmpDir("snd-chk"))
    val novel1 = "graft streaming ingest wave one has plainly novel vocabulary " +
      "no shingle of this sentence occurs in the synthetic corpus at all " +
      "because zebras quietly juggle amethyst typewriters under moonlight"
    val novel2 = "completely different second wave text where flamingos " +
      "architect porcelain submarines beneath turquoise glaciers daily " +
      "while narwhals compose binary sonnets about forgotten umbrellas"
    val schema = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text")).schema

    // wave 1: one near-dup of a corpus doc (id shifted), one novel doc
    Seq((900001L, dupText), (900002L, novel1)).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    val q = StreamingNearDup.start(spark, d, src, acc, rej, chk, schema)
    q.processAllAvailable()

    assert(ids(acc) === Set(900002L), "novel doc accepted, dup rejected")
    val rej1 = spark.read.parquet(rej)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rej1.map(_._1).toSet === Set(900001L))
    // the exact copy must be matched at jac 1.0; further rows are the
    // corpus doc's own pre-existing near-dups — legitimate matches
    assert(rej1.contains((900001L, dupId, 1.0)),
      s"quarantine must name the duplicated corpus doc: ${rej1.toSeq}")
    assert(rej1.forall(_._3 >= Dedup.JaccardThreshold))

    // wave 2: a near-dup of WAVE 1's accepted doc (proves the index
    // grew mid-stream) plus another novel doc
    Seq((900003L, novel1), (900004L, novel2)).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    assert(ids(acc) === Set(900002L, 900004L),
      "wave-2 dup of a wave-1 accepted doc must be rejected")
    assert(ids(rej, "batch_id").contains(900003L))

    // re-delivery (fresh checkpoint, same source): ledger no-ops it
    val q2 = StreamingNearDup.start(spark, d, src, acc, rej, chk + "2", schema)
    q2.processAllAvailable()
    q2.stop()
    assert(ids(acc) === Set(900002L, 900004L), "re-delivery must not re-append")
    assert(spark.read.parquet(acc).count() === 2L, "no duplicate ledger rows")
  }

  test("intra-batch near-dup burst admits only the smallest-id doc") {
    val (d, _) = freshDataset()
    val (acc, rej) = (tmpDir("snd-intra-acc") + "/a", tmpDir("snd-intra-rej") + "/r")
    val novel = "intra batch burst text with thoroughly invented vocabulary " +
      "wherein obsidian metronomes rehearse citrus algebra at dawn " +
      "and velvet lighthouses negotiate with punctual avalanches"
    // one micro-batch containing its own near-dup pair (exact copy)
    // plus an unrelated novel doc — both copies pass the corpus probe,
    // so without the intra-batch pass both would land
    val novel2 = "unrelated survivor doc where chrome origami referees " +
      "adjudicate disputes between marzipan satellites and dew"
    StreamingNearDup.ingestBatch(spark, d, acc, rej,
      Seq((930002L, novel), (930001L, novel), (930005L, novel2))
        .toDF("doc_id", "text"))
    assert(ids(acc) === Set(930001L, 930005L),
      "smallest-id copy and the unrelated doc accepted, the other copy rejected")
    val rejRows = spark.read.parquet(rej)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rejRows.toSet === Set((930002L, 930001L, 1.0)),
      s"loser quarantined with the same-batch winner's id: ${rejRows.toSeq}")
    // the accepted copy is in the index: a later delivery of the same
    // text is now a corpus-style dup
    StreamingNearDup.ingestBatch(spark, d, acc, rej,
      Seq((930003L, novel)).toDF("doc_id", "text"))
    assert(!ids(acc).contains(930003L))
  }

  test("reconcile converges: a shingle-less accepted doc does not churn index versions") {
    val (d, _) = freshDataset()
    val (acc, rej) = (tmpDir("snd-conv-acc") + "/a", tmpDir("snd-conv-rej") + "/r")
    // under 3 tokens → zero shingles: accepted into the ledger but by
    // construction can never appear in the band index
    StreamingNearDup.ingestBatch(spark, d, acc, rej,
      Seq((920001L, "tiny doc")).toDF("doc_id", "text"))
    assert(ids(acc) === Set(920001L), "shingle-less doc is accepted")
    val adir = Option(new java.io.File(graft.core.ArtifactStore.root).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory &&
        f.getName.startsWith("minhash_bands_" + new java.io.File(d).getName))
      .map(_.getPath).head
    val v0 = graft.core.ArtifactStore.current(adir)
    // two re-delivered (no-op) batches: the reconcile must NOT treat
    // the shingle-less ledger doc as unindexed and re-publish forever
    StreamingNearDup.ingestBatch(spark, d, acc, rej,
      Seq((920001L, "tiny doc")).toDF("doc_id", "text"))
    val v1 = graft.core.ArtifactStore.current(adir)
    StreamingNearDup.ingestBatch(spark, d, acc, rej,
      Seq((920001L, "tiny doc")).toDF("doc_id", "text"))
    val v2 = graft.core.ArtifactStore.current(adir)
    assert(v1 === v0 && v2 === v0,
      s"index version must be stable across no-op batches: $v0 / $v1 / $v2")
    // crash window on a SHINGLE-LESS doc: it reaches the ledger but its
    // index publish is lost. The manifest-based reconcile heals it in
    // exactly ONE append (no band-derived special case needed — the
    // manifest records it even though it contributes zero band rows),
    // then converges: later batches leave the version alone.
    Seq((920002L, "another tiny")).toDF("doc_id", "text")
      .write.mode("append").parquet(acc)
    StreamingNearDup.ingestBatch(spark, d, acc, rej,
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
    val v3 = graft.core.ArtifactStore.current(adir)
    assert(v3 !== v0, "the healing reconcile publishes one new version")
    assert(ids(s"${v3.get}/docs", "doc_id").contains(920002L),
      "healed shingle-less doc lands in the manifest")
    StreamingNearDup.ingestBatch(spark, d, acc, rej,
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
    assert(graft.core.ArtifactStore.current(adir) === v3,
      "post-heal batches must not churn further versions")
  }

  test("manifest gate: a replayed base-split doc id is dropped, not self-quarantined or re-indexed") {
    val (d, (corpusId, corpusText)) = freshDataset()
    val (acc, rej) = (tmpDir("snd-gate-acc") + "/a", tmpDir("snd-gate-rej") + "/r")
    graft.operators.Dedup.ensureSigIndex(spark, d)
    val adir = Option(new java.io.File(graft.core.ArtifactStore.root).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory &&
        f.getName.startsWith("minhash_bands_" + new java.io.File(d).getName))
      .map(_.getPath).head
    val v0 = graft.core.ArtifactStore.current(adir)
    // upstream replays a doc the INDEX already holds (base split, so
    // it is in the manifest but NOT the ledger): the ledger gate alone
    // would pass it through and quarantine it as a duplicate of ITSELF
    // (batch_id = corpus_id), polluting the audit log — the manifest
    // gate drops it before the probe
    StreamingNearDup.ingestBatch(spark, d, acc, rej,
      Seq((corpusId, corpusText)).toDF("doc_id", "text"))
    assert(ids(acc).isEmpty, "a replayed indexed doc must not be accepted")
    assert(ids(rej, "batch_id").isEmpty,
      "a replayed indexed doc must not self-quarantine")
    assert(graft.core.ArtifactStore.current(adir) === v0,
      "nothing to append: the index version must not churn")
  }

  test("orphaned staging dir is reclaimed at batch start; a clean batch writes no quarantine files") {
    val (d, _) = freshDataset()
    val (acc, rej) = (tmpDir("snd-stage-acc") + "/a", tmpDir("snd-stage-rej") + "/r")
    // a crashed previous run stranded its decision-staging dir (the
    // crash window between the staging write and the finally-delete);
    // nothing else ever deletes it — the batch-start sweep must
    val orphan = acc + ".staging-00000000-dead-beef-0000-000000000000"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(orphan))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(orphan, "part-00000.parquet"), "junk")
    val novel = "staging sweep wave text with wholly invented vocabulary " +
      "wherein copper metronomes audit the siestas of polite comets " +
      "and origami lighthouses subpoena the morning fog"
    StreamingNearDup.ingestBatch(spark, d, acc, rej,
      Seq((940001L, novel)).toDF("doc_id", "text"))
    assert(!new java.io.File(orphan).exists(),
      "orphaned staging dir must be swept at batch start")
    assert(ids(acc) === Set(940001L))
    // the batch was CLEAN (no corpus or intra-batch matches): the
    // quarantine append is guarded, so the log dir is never created —
    // an unconditional append would commit an empty file set per clean
    // batch, unbounded churn over a long-running stream
    assert(!new java.io.File(rej).exists(),
      "a clean batch must not create/append to the quarantine log")
  }

  test("crash window between ledger append and index publish self-heals on the next batch") {
    val (d, _) = freshDataset()
    val (acc, rej) = (tmpDir("snd-heal-acc") + "/a", tmpDir("snd-heal-rej") + "/r")
    val novel = "heal window text with its own unmistakable vocabulary " +
      "wherein cartographers laminate recursive daydreams onto fog " +
      "and librarians alphabetize thunder by its apology letters"

    // simulate the crash: the doc reaches the LEDGER but its index
    // publish was lost (written directly, bypassing ingestBatch)
    Dedup.ensureSigIndex(spark, d)
    Seq((910001L, novel)).toDF("doc_id", "text")
      .write.mode("append").parquet(acc)

    // next batch: a near-dup of the ledger-only doc. Without the
    // reconcile it would be ACCEPTED (its dup's signatures are not in
    // the index); the reconcile re-publishes them first.
    StreamingNearDup.ingestBatch(spark, d, acc, rej,
      Seq((910002L, novel)).toDF("doc_id", "text"))
    assert(ids(acc) === Set(910001L), "near-dup of healed doc must be rejected")
    assert(ids(rej, "batch_id") === Set(910002L))
  }
}
