package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks of the containment operator against
  * brute-force ground truth on scalacheck-generated corpora (fixed
  * seed — deterministic in CI).
  *
  * The small-vocabulary generator is deliberate: 10 words → heavy
  * shingle collisions → dense candidate sets, the regime where a
  * candidate-generation bug (a dropped posting, an off-by-one in the
  * min-shared prune) actually changes the answer. And at 30 docs the
  * df cap provably cannot bind (df ≤ 30 < ContainDfCap), so the banded
  * pipeline must agree with all-pairs brute force EXACTLY — not
  * approximately.
  */
class DedupPropertySpec extends SparkSuite {

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  private val genDoc: Gen[String] = for {
    n <- Gen.choose(3, 40)
    toks <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield toks.mkString(" ")

  private def corpus(seed: Long, n: Int = 30) = {
    import spark.implicits._
    val docs = Gen.listOfN(n, genDoc)
      .apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"generator exhausted at seed $seed"))
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  /** All-pairs shingle-set measures — the O(n²) oracle. */
  private def brute(df: org.apache.spark.sql.DataFrame) = {
    val sh = df.select(col("doc_id"), Dedup.shingles(col("text")).as("gs"))
      .filter(size(col("gs")) > 0)
    sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        size(array_intersect(col("a.gs"), col("b.gs"))).as("inter"),
        size(col("a.gs")).as("sz_a"), size(col("b.gs")).as("sz_b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))
  }

  test("containment dominates Jaccard and both live in [0,1] (3 seeded corpora)") {
    for (seed <- Seq(42L, 1337L, 20260813L)) {
      val rows = brute(corpus(seed))
      assert(rows.nonEmpty, s"seed $seed generated a degenerate corpus")
      rows.foreach { case (a, b, inter, szA, szB) =>
        val c = inter.toDouble / math.min(szA, szB)
        val j = inter.toDouble / (szA + szB - inter)
        assert(c >= 0 && c <= 1, s"seed $seed ($a,$b): containment $c out of range")
        assert(j <= c + 1e-15, s"seed $seed ($a,$b): jaccard $j above containment $c")
      }
    }
  }

  test("d14 pipeline == brute force exactly when the df cap cannot bind") {
    for (seed <- Seq(42L, 1337L)) {
      val df = corpus(seed)
      val expected = brute(df).collect {
        case (a, b, inter, szA, szB)
            if inter >= Dedup.ContainMinShared &&
              inter.toDouble / math.min(szA, szB) >= Dedup.ContainTau =>
          val (cont, container) = if (szA <= szB) (a, b) else (b, a)
          (cont, container,
            BigDecimal(inter.toDouble / math.min(szA, szB))
              .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSet
      val got = Dedup.d14ContainmentOn(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected,
        s"seed $seed: pipeline ${got.size} pairs vs brute ${expected.size}\n" +
          s"missing=${expected -- got}\nspurious=${got -- expected}")
    }
  }

  test("a token-subset doc is contained at exactly 1.0") {
    import spark.implicits._
    val seeds = Gen.listOfN(8, Gen.choose(0L, Long.MaxValue))
      .apply(Gen.Parameters.default, Seed(7L)).get
    for (s <- seeds) {
      val big = Gen.listOfN(40, Gen.oneOf(vocab))
        .apply(Gen.Parameters.default, Seed(s)).get
      val small = big.take(12) // contiguous prefix: every 3-shingle of it is in big
      val df = Seq((1L, small.mkString(" ")), (2L, big.mkString(" ")))
        .toDF("doc_id", "text")
      val out = Dedup.d14ContainmentOn(df).collect()
      assert(out.length == 1 && out.head.getDouble(2) == 1.0,
        s"seed $s: prefix-subset doc must be contained at 1.0, got ${out.toSeq}")
    }
  }

  // ---- r20: bands_capped invariants on random corpora ----

  /** Docs of 1-40 tokens: sub-3-token docs yield NO shingles (and so
    * no band rows) — the empty-delta edge the append path must absorb.
    */
  private val genDocAnyLen: Gen[String] = for {
    n <- Gen.choose(1, 40)
    toks <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield toks.mkString(" ")

  private def anyLenCorpus(seed: Long, n: Int) = {
    import spark.implicits._
    Gen.listOfN(n, genDocAnyLen)
      .apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"generator exhausted at seed $seed"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def cappedRows(dir: String) =
    spark.read.parquet(s"$dir/bands_capped")
      .select("doc_id", "band", "bh", "bucket", "bsz", "bmin")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))

  test("bands_capped invariants + random-split append parity (3 seeded corpora)") {
    for (seed <- Seq(11L, 2718L, 31415L)) {
      val docs = anyLenCorpus(seed, 40)
      // split point from the seed: exercises carry-forward + dynamic
      // partition overwrite at arbitrary boundaries, including deltas
      // that are entirely shingle-less (zero band rows -> the touched
      // set is empty and the capped view must carry forward intact)
      val cut = (seed % 37 + 2).toInt
      // ensureSigIndex indexes the CORPUS SPLIT (baseHash % 10 < 8) of
      // its dir's documents; an appended increment is indexed as given
      // — so the grown path must append the same split's remainder, as
      // a real ingester does (StreamingNearDup appends its accepted
      // corpus docs)
      val split = Dedup.baseHash(col("doc_id").cast("string")) % 10 < 8
      val oneShot = tmpDir(s"capprop-one-$seed")
      docs.write.parquet(s"$oneShot/documents.parquet")
      val v1 = Dedup.ensureSigIndex(spark, oneShot)
      val grown = tmpDir(s"capprop-grow-$seed")
      docs.filter(col("doc_id") < cut).write.parquet(s"$grown/documents.parquet")
      Dedup.ensureSigIndex(spark, grown)
      val v2 = Dedup.appendSigIndex(spark, grown,
        docs.filter(col("doc_id") >= cut && split))
      // 1. append-path independence, full row content incl. evidence
      assert(cappedRows(v2).toSet === cappedRows(v1).toSet,
        s"seed $seed cut $cut: grown capped view != one-shot")
      // 2. per-bucket evidence invariants against the raw bands table
      val bands = spark.read.parquet(s"$v1/bands")
        .select("doc_id", "band", "bh", "bucket").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      val byKey = bands.groupBy(r => (r._2, r._3))
      val capped = cappedRows(v1)
      assert(capped.nonEmpty, s"seed $seed: degenerate corpus (no bands)")
      for ((k, rows) <- capped.groupBy(r => (r._2, r._3))) {
        val raw = byKey(k)
        // under the cap (40 docs << MaxBucket): every raw row admitted
        assert(rows.map(_._1).sorted.toSeq === raw.map(_._1).sorted.toSeq)
        assert(rows.forall(_._5 == raw.length.toLong), s"$k: bsz wrong")
        assert(rows.forall(_._6 == raw.map(_._1).min), s"$k: bmin wrong")
        // dir-bucket column consistent with the layout hash
        assert(rows.map(_._4).distinct.length == 1 &&
          raw.map(_._4).distinct.length == 1 &&
          rows.head._4 == raw.head._4, s"$k: bucket drift")
      }
      // 3. the docs manifest counts every INDEXED doc (the corpus
      // split), shingle-less included
      assert(Dedup.sigIndexManifest(spark, grown).count() ===
        docs.filter(split).count())
    }
  }
}
