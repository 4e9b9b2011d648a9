package graft.tools

import graft.core.Tables
import graft.embed.HashingEmbedder
import graft.functions.VectorFunctions._
import graft.index.{IndexBuild, Pivots}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Scale-behavior probe (dev tool): replicate the sf0.1 corpus N× with
  * remapped ids, run the heavy operators, report rows/s at each scale.
  * Linear (or better) rows/s across scales = the operator's cost is
  * per-row/per-candidate, not quadratic — the property the 100 TB
  * design claims. Results recorded in ARCHITECTURE.md.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scales = Seq(1, 4, 10, 20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // SPARK_GRAFT_PROBE_OPS=d14,minhash probes a subset (skipped ops
    // report 0.0s in the summary line — dev tool, not an artifact)
    val only = sys.env.get("SPARK_GRAFT_PROBE_OPS").filter(_.trim.nonEmpty)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def timeIf(name: String)(f: => Unit): Double =
      if (only.forall(_.contains(name))) time(f) else 0.0

    def replicate(df: DataFrame, idCol: String, n: Int): DataFrame =
      df.crossJoin(spark.range(n).select(col("id").as("__rep")))
        .withColumn(idCol, col(idCol) * n + col("__rep")).drop("__rep")

    val work = java.nio.file.Files.createTempDirectory("scaleprobe").toString
    val docs0 = Tables.documents(spark, d)
    val emb0 = Tables.embeddings(spark, d)

    for (n <- scales) {
      // sf-dir-shaped so the oracle-registered queries (which read
      // `<dir>/documents.parquet`) run unmodified over the replica
      val sfLike = s"$work/sfx$n"
      val docsPath = s"$sfLike/documents.parquet"
      val embPath = s"$sfLike/embeddings.parquet"
      replicate(docs0, "doc_id", n).write.mode(SaveMode.Overwrite).parquet(docsPath)
      replicate(emb0, "vec_id", n).write.mode(SaveMode.Overwrite).parquet(embPath)
      val docs = spark.read.parquet(docsPath)
      val emb = spark.read.parquet(embPath)
      val nDocs = docs.count(); val nVec = emb.count()

      // 1. minhash LSH dedup (candidate-driven, must stay near-linear)
      val tMinhash = timeIf("minhash") {
        graft.operators.Dedup.d2MinhashLshOn(docs)
          .write.format("noop").mode("overwrite").save()
      }
      // 2. simhash signatures (pure map)
      val tSimhash = timeIf("simhash") {
        graft.operators.Dedup.d3SimhashOn(docs)
          .write.format("noop").mode("overwrite").save()
      }
      // 3. brute-force kNN (linear scan, TakeOrderedAndProject)
      val q = emb0.limit(1).select("embedding").head().getSeq[Float](0)
      val tKnn = timeIf("knn") {
        emb.withColumn("dist", euclidean(col("embedding"), typedlit(q)))
          .orderBy(col("dist").asc).limit(10)
          .write.format("noop").mode("overwrite").save()
      }
      // 4. index build (embed + pivot distances + partitioned write)
      val embedder = HashingEmbedder(dims = 64)
      val pivots = Pivots.fromSample(emb0, "vec_id", "embedding", 5)
      val tIndex = timeIf("index") {
        IndexBuild.buildFromDocuments(
          docs.select(col("doc_id").cast("string").as("id"), col("text")),
          "id", "text", embedder, pivots, s"$work/idx_x$n")
      }
      // 5. simhash prefix-band pairs (r3 shape: band join, no payload block)
      val tSimPairs = timeIf("simpairs") {
        // cached, as production d6 does (and capByLowestIds now
        // requires): the cap's branches + self-join sides must not
        // re-run the simhash kernel per pass
        val sigs = graft.operators.Dedup.cacheSlot("scaleprobe-simhash-sigs",
          graft.operators.Dedup.d3SimhashOn(docs))
        // r19: the probe caps exactly as production does (id-ordered
        // representative admission), so the measured candidate bound
        // is the real one
        val bands = graft.operators.Dedup.capByLowestIds(
          sigs.select(col("doc_id"), col("simhash"),
            posexplode(array((0 until graft.operators.Dedup.SimBands).map(b =>
              shiftright(col("simhash"), b * graft.operators.Dedup.SimBandBits)
                .bitwiseAND(lit(255L))): _*)).as(Seq("band", "bh"))),
          Seq("band", "bh"), "doc_id")
        bands.as("a").join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("a.simhash").as("sim_a"),
            col("b.doc_id").as("doc_b"), col("b.simhash").as("sim_b"))
          .distinct()
          .filter(bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) <= graft.operators.Dedup.SimHamMax)
          .write.format("noop").mode("overwrite").save()
      }
      // 6-8: the r4 operators (r5 verdict item 6) — the whole registered
      // query runs over the replica dir, so caps/windows are the real ones
      val tD10 = timeIf("d10") {
        graft.operators.Corpus.d10PassageDedup(spark, sfLike)
          .write.format("noop").mode("overwrite").save()
      }
      val tD11 = timeIf("d11") {
        graft.operators.Corpus.d11FuzzyEdit(spark, sfLike)
          .write.format("noop").mode("overwrite").save()
      }
      val tT15 = timeIf("t15") {
        graft.operators.Corpus.t15Repetition(spark, sfLike)
          .write.format("noop").mode("overwrite").save()
      }
      // 9-10: the r7 operators — registered queries over the replica
      val tD13 = timeIf("d13") {
        graft.operators.Corpus.d13Leakage(spark, sfLike)
          .write.format("noop").mode("overwrite").save()
      }
      val tT16 = timeIf("t16") {
        graft.operators.TextAnalysis.t16QuotaSample(spark, sfLike)
          .write.format("noop").mode("overwrite").save()
      }
      // 10b: t17 export manifest — the fixture's 16 shards cap window
      // parallelism, so the probe watches for the per-shard sort
      // becoming the bottleneck as rows/shard grows (production uses
      // O(10k) shards, same plan shape)
      val tT17 = timeIf("t17") {
        graft.operators.TextAnalysis.t17ShardManifest(spark, sfLike)
          .write.format("noop").mode("overwrite").save()
      }
      // 11: SemDedup at its stated operating point — k ∝ √N centroids
      // (the registered q_d12 serves the fixture's stored k=8 table; the
      // SCALE claim is that cluster count grows with the corpus so
      // within-cluster pair work stays O(Σ|c|²) ≈ O(N^1.5)). Assignment
      // here is the broadcast-centroids × corpus equi-shape (N·k
      // distances, one groupBy argmin), not a k-wide literal expression.
      val tD12 = timeIf("d12") {
        import spark.implicits._
        val kk = math.max(8, math.sqrt(nVec.toDouble).toInt)
        val cents = Pivots.learnKMeans(emb, "embedding", kk)
        val centDf = cents.zipWithIndex.map { case (c, i) => (i, c) }
          .toDF("cid", "centroid")
        val assign = emb.crossJoin(broadcast(centDf))
          .withColumn("cd", euclidean(col("embedding"), col("centroid")))
          .groupBy("vec_id").agg(min(struct(col("cd"), col("cid"))).as("m"))
          .select(col("vec_id"), col("m.cid").as("cluster"))
        val v = emb.select("vec_id", "embedding").join(assign, "vec_id")
        v.as("x").join(v.as("y"),
            col("x.cluster") === col("y.cluster") && col("x.vec_id") < col("y.vec_id"))
          .select(cosine(col("x.embedding"), col("y.embedding")).as("sim"))
          .filter(col("sim") >= graft.operators.Indexed.SemTau)
          .write.format("noop").mode("overwrite").save()
      }
      // 12-13: the r9 text operators — registered queries over the
      // replica (t18 is a pure per-row fan-out, t19 a heap aggregate +
      // broadcast targets; both should show RISING docs/s with scale)
      val tT18 = timeIf("t18") {
        graft.operators.TextAnalysis.t18Chunk(spark, sfLike)
          .write.format("noop").mode("overwrite").save()
      }
      val tT19 = timeIf("t19") {
        graft.operators.TextAnalysis.t19TemperatureMix(spark, sfLike)
          .write.format("noop").mode("overwrite").save()
      }
      // 15: d14 containment over a replica with UNIQUE text per copy
      // (every token suffixed with the replica nr, so shingles differ
      // across copies): identical-copy replication would synthesize the
      // exact-duplicate explosion that the upstream d1 stage removes in
      // the pipeline (n copies of one doc = C(n,2) containment-1.0
      // pairs per doc — a fixture property, not an operator cost; on an
      // UN-deduped duplicate-heavy corpus the df cap bounds the blowup
      // to Σ_g C(min(df_g, cap), 2), the d2 MaxBucket reasoning). What
      // this measures is postings + window df + equi-join growth on
      // n×-unique content — the 100 TB claim.
      val tD14 = timeIf("d14") {
        val uniqText = docs
          .withColumn("__rep", (col("doc_id") % n).cast("string"))
          .withColumn("text",
            regexp_replace(col("text"), lit("(\\S+)"), concat(lit("$1"), col("__rep"))))
          .drop("__rep")
        graft.operators.Dedup.d14ContainmentOn(uniqText)
          .write.format("noop").mode("overwrite").save()
      }
      // 16: the connected-components fixpoint loops (d7 label-prop, d9
      // star) over a synthetic pair graph ~2 edges/doc: families of 50
      // plus an intra-family lattice (diameter ≤ ~4, so label-prop's
      // round count stays constant across scales and the probe
      // measures PER-ROUND parallelism — the loopPartsFor claim —
      // rather than round-count growth)
      def ccGraph(nd: Long) = {
        val base = spark.range(nd)
        base.select(col("id").as("a"), (col("id") - col("id") % 50).as("b"))
          .union(base.select(col("id").as("a"),
            (col("id") - col("id") % 50 + col("id") % 7).as("b")))
          .filter(col("a") =!= col("b"))
      }
      val tCc = timeIf("cc") {
        graft.operators.Corpus.connectedComponents(ccGraph(nDocs), "a", "b")
          .write.format("noop").mode("overwrite").save()
      }
      val tCcStar = timeIf("ccstar") {
        graft.operators.Corpus.connectedComponentsStar(ccGraph(nDocs), "a", "b")
          .write.format("noop").mode("overwrite").save()
      }
      // 17: d16 sig-index probe — a FIXED batch (the base corpus's
      // b=9 split, constant across scales) probed against a GROWING
      // stored index. The bands_capped claim (r20): the corpus-sized
      // cap window runs at BUILD time (sigb should grow ~linearly);
      // the PROBE partition-prunes the materialized capped view and
      // shuffles batch-proportional data only, so sigp should stay
      // FLAT as the stored corpus grows n×.
      val (tSigBuild, tSigProbe, tSigAppend) =
        if (only.forall(_.contains("sigprobe"))) {
          val tb = time { graft.operators.Dedup.ensureSigIndex(spark, sfLike) }
          val batch = docs0.filter(
            graft.operators.Dedup.baseHash(col("doc_id").cast("string")) % 10 === 9)
          val tp = time {
            graft.operators.Dedup.probeSigIndex(spark, sfLike, batch, docs)
              .write.format("noop").mode("overwrite").save()
          }
          // append a FIXED batch onto the grown index: the capped-view
          // refresh rewrites the touched dir-buckets whole, so at the
          // fixture's SigBuckets=8 this cost tracks corpus/8 per bucket
          // — the honest number; the production knob is SigBuckets
          // (file-size-bound, so per-bucket rewrite cost stays flat as
          // the corpus grows). Runs last: it mutates the artifact.
          val ta = time {
            graft.operators.Dedup.appendSigIndex(spark, sfLike,
              batch.withColumn("doc_id", col("doc_id") + 100000000L))
          }
          (tb, tp, ta)
        } else (0.0, 0.0, 0.0)
      graft.operators.Dedup.releaseSlots()
      println(f"[scale] x$n%-3d docs=$nDocs%-8d vecs=$nVec%-8d " +
        f"minhash=$tMinhash%6.1fs (${nDocs / tMinhash}%8.0f docs/s)  " +
        f"simhash=$tSimhash%5.1fs (${nDocs / tSimhash}%8.0f docs/s)  " +
        f"knn=$tKnn%5.1fs (${nVec / tKnn}%9.0f vec/s)  " +
        f"index=$tIndex%5.1fs (${nDocs / tIndex}%8.0f docs/s)  " +
        f"simpairs=$tSimPairs%5.1fs (${nDocs / tSimPairs}%8.0f docs/s)  " +
        f"d10=$tD10%5.1fs (${nDocs / tD10}%8.0f docs/s)  " +
        f"d11=$tD11%6.1fs (${nDocs / tD11}%8.0f docs/s)  " +
        f"t15=$tT15%5.1fs (${nDocs / tT15}%8.0f docs/s)  " +
        f"d13=$tD13%5.1fs (${nDocs / tD13}%8.0f docs/s)  " +
        f"t16=$tT16%5.1fs (${nDocs / tT16}%8.0f docs/s)  " +
        f"t17=$tT17%5.1fs (${nDocs / tT17}%8.0f docs/s)  " +
        f"d12=$tD12%6.1fs (${nVec / tD12}%8.0f vec/s)  " +
        f"t18=$tT18%5.1fs (${nDocs / tT18}%8.0f docs/s)  " +
        f"t19=$tT19%5.1fs (${nDocs / tT19}%8.0f docs/s)  " +
        f"d14=$tD14%6.1fs (${nDocs / tD14}%8.0f docs/s)  " +
        f"cc=$tCc%5.1fs (${nDocs / tCc}%8.0f docs/s)  " +
        f"ccstar=$tCcStar%5.1fs (${nDocs / tCcStar}%8.0f docs/s)  " +
        f"sigb=$tSigBuild%5.1fs  sigp=$tSigProbe%5.1fs  siga=$tSigAppend%5.1fs")
    }
    spark.stop()
  }
}
