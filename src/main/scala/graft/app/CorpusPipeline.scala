package graft.app

import graft.core.Tables._
import graft.operators.{Corpus, Dedup, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end training-corpus preparation — the composition every
  * operator in this library exists to serve, as ONE documented batch
  * job:
  *
  *   0. bench exclusion   — the held-out benchmark set (doc_id <
  *                          BenchIdMax) never enters the training
  *                          stream; it is only used as the
  *                          decontamination reference
  *   1. quality gate      — drop too-short / too-repetitive docs
  *                          (q_t10 verdict logic, integer-exact)
  *   2. exact dedup       — keep each fingerprint's min-id canonical
  *                          (q_d1 canonical assignment)
  *   3. near-dup clusters — MinHash-LSH pairs → connected components;
  *                          keep each cluster's min-id representative
  *                          (q_d2 + q_d7)
  *   4. decontamination   — drop training docs sharing >= N shingles
  *                          with the benchmark set (q_d8)
  *   5. mixture quota     — cap each (source, lang) cell at a fixed
  *                          doc count, chosen by the deterministic
  *                          keep-hash (q_t16 semantics, bounded-heap
  *                          top-k — no per-cell sort)
  *   6. shard packing     — token-budget shards per source (q_t12)
  *   7. export manifest   — per-(source, shard) position + byte
  *                          offset index beside the corpus (q_t17)
  *
  * Every stage is a DataFrame transform over the previous one: the
  * composition runs as a single Spark job graph (the intermediate
  * stage-count columns exist only for reporting). Per-stage retention
  * is returned for pipeline observability.
  */
object CorpusPipeline {

  final case class Report(
      input: Long, afterQuality: Long, afterExact: Long,
      afterNearDup: Long, afterDecontam: Long, afterQuota: Long, shards: Long)

  /** Per-(source, lang) cell cap for the pipeline's mixture stage —
    * sized so it binds only on over-represented cells (the t16 demo
    * quota of 5 would gut a real corpus).
    */
  val PipelineQuota = 50

  /** Run the full preparation over `sfDir`'s documents; write the
    * packed corpus to `outPath` (parquet, partitioned by shard) and
    * return the retention report.
    */
  def run(spark: SparkSession, sfDir: String, outPath: String): Report =
    runTimed(spark, sfDir, outPath)._1

  /** [[run]], additionally returning per-stage wall times (stage name →
    * seconds, in execution order). Each stage's time covers the action
    * that materializes it (count / write), so the attribution follows
    * the persist boundaries: a stage pays for its own lineage segment,
    * not for re-running upstream stages. `Bench` records these in the
    * round artifact so an end-to-end pipeline regression — the thing a
    * real 100 TB corpus build runs nightly — is visible round-over-round
    * instead of hiding behind per-query timings.
    */
  def runTimed(spark: SparkSession, sfDir: String,
      outPath: String): (Report, Seq[(String, Double)]) = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val times = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      times += name -> (System.nanoTime() - t0) / 1e9
      r
    }
    val docs = documents(spark, sfDir)
    val input = timed("scan")(docs.count())

    // A training corpus must not contain the held-out benchmark set at
    // all: bench docs are excluded from the candidate stream up front
    // (decontamination below additionally removes train docs that
    // OVERLAP the bench set's content).
    val train = docs.filter(col("doc_id") >= Corpus.BenchIdMax)

    // 1. quality gate (q_t10 semantics, integer-exact). Persisted: the
    // count and every downstream stage read it; without the persist
    // each stage re-runs the scan+gate lineage.
    val toks = TextAnalysis.tokens(col("text"))
    val n = size(toks).cast("long")
    val nd = size(array_distinct(toks)).cast("long")
    val gated = train.filter(n >= 20 && nd * 2 > n).persist(MEMORY_AND_DISK)
    val afterQuality = timed("quality_gate")(gated.count())

    // 2. exact dedup: canonical = min doc_id per normalized fingerprint
    val wFp = Window.partitionBy("fp")
    val exact = gated
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withColumn("canonical", min("doc_id").over(wFp))
      .filter(col("doc_id") === col("canonical"))
      .drop("fp", "canonical")
      .persist(MEMORY_AND_DISK)
    val afterExact = timed("exact_dedup")(exact.count())

    // 3. near-dup clusters on the survivors: drop non-representatives
    val pairs = Dedup.d2MinhashLshOn(exact).select("doc_a", "doc_b")
    val clusters = Corpus.connectedComponents(pairs, "doc_a", "doc_b")
    val nonReps = clusters.filter(col("doc_id") =!= col("cluster")).select("doc_id")
    val nearDeduped = exact.join(nonReps, Seq("doc_id"), "left_anti")
      .persist(MEMORY_AND_DISK)
    val afterNearDup = timed("neardup_cc")(nearDeduped.count())

    // 4. decontamination: drop train docs overlapping the bench set.
    // The bench side comes from the FULL documents table — a bench doc
    // that failed the quality gate still contaminates a train doc that
    // copies its content.
    val trainSh = nearDeduped
      .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("g"))
    val benchSh = docs.filter(col("doc_id") < Corpus.BenchIdMax)
      .select(col("doc_id").as("bench_id"), explode(Dedup.shingles(col("text"))).as("g"))
    // df cap over the union of both sides' postings (same hot-shingle
    // guard as q_d8)
    val keep = trainSh.select("g").union(benchSh.select("g"))
      .groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") <= Corpus.MaxShingleDf).select("g")
    val contaminated = trainSh.join(keep, "g").join(benchSh.join(keep, "g"), "g")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= Corpus.ContamMinShared)
      .select("doc_id").distinct()
    val clean = nearDeduped.join(contaminated, Seq("doc_id"), "left_anti")
      .persist(MEMORY_AND_DISK)
    val afterDecontam = timed("decontaminate")(clean.count())

    // 5. mixture quota (q_t16 semantics): each (source, lang) cell keeps
    // at most PipelineQuota docs, the ones with the lowest deterministic
    // keep-hash — reproducible across runs and cluster sizes
    val keyHash = Dedup.baseHash(
      concat(col("source"), lit(":"), col("doc_id").cast("string")))
    val quotaIds = clean
      .select(col("source"), col("lang"), col("doc_id"),
        (-keyHash).cast("double").as("nkh"))
      .groupBy("source", "lang")
      .agg(graft.functions.TopKRows.topK(
        col("nkh"), col("doc_id"), lit(0), PipelineQuota).as("tops"))
      .select(explode(col("tops.id1")).as("doc_id"))
    val sampled = clean.join(quotaIds, Seq("doc_id"), "left_semi")
      .persist(MEMORY_AND_DISK)
    val afterQuota = timed("mixture_quota")(sampled.count())

    // 6. token-budget shard packing per source
    val wp = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val packed = sampled
      .withColumn("n_tokens", size(TextAnalysis.tokens(col("text"))).cast("long"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(wp), lit(0L)))
      .withColumn("shard", expr(s"cum_before div ${Corpus.PackBudget}"))
      .drop("cum_before")
    timed("pack_write")(
      packed.write.mode("overwrite").partitionBy("source", "shard").parquet(outPath))

    // 7. export manifest (q_t17 semantics over the PACKED shards): the
    // dataloader index — per (source, shard), each doc's position and
    // the cumulative UTF-8 byte offset where its payload starts, so a
    // reader seeks without parsing (octet_length, not the n_chars char
    // count — char offsets land mid-character on non-ASCII corpora).
    // Built by READING BACK the materialized shards: the manifest job
    // scans the final files a reader will open, instead of re-running
    // the packing lineage — whose upstream caches may have been evicted
    // by the time this stage runs, silently turning "no second pass"
    // into a full recompute. The read back PINS the writer's schema:
    // without it the partition columns come back INFERRED from
    // directory names — `shard` as int (drifting the manifest from the
    // long the q_t17 manifest schema declares), and a numeric-looking
    // `source` ("007") parsed as a number and re-rendered lossily
    // ("7"), silently merging distinct sources. A cast after an
    // inferred read cannot undo that parse; schema-on-read prevents it.
    val shards = spark.read.schema(packed.schema).parquet(outPath)
    val wm = Window.partitionBy("source", "shard").orderBy("doc_id")
    timed("manifest")(shards
      .withColumn("n_bytes", octet_length(col("text")).cast("long"))
      .withColumn("pos", row_number().over(wm).cast("long"))
      .withColumn("byte_offset", coalesce(
        sum("n_bytes").over(wm.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("source", "shard", "pos", "doc_id", "n_tokens", "n_chars", "n_bytes",
        "byte_offset")
      .write.mode("overwrite").parquet(outPath + "_manifest"))
    Seq(gated, exact, nearDeduped, clean, sampled).foreach(_.unpersist())

    val out = spark.read.schema(packed.schema).parquet(outPath)
    val report = Report(input, afterQuality, afterExact, afterNearDup, afterDecontam,
      afterQuota, out.select("source", "shard").distinct().count())
    (report, times.toSeq)
  }
}
