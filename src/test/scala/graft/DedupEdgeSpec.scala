package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Edge semantics of the text/dedup primitives: degenerate documents
  * (empty, whitespace-only, under-3-token), unicode, duplicate rows —
  * the rows a 100 TB corpus always contains a few million of.
  */
class DedupEdgeSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta"),
    (2L, ""),
    (3L, "   "),
    (4L, "one two"), // under 3 tokens → no shingles
    (5L, "alpha beta gamma delta"), // exact dup of 1
    (6L, "naïve café über żółć 中文 分词"), // unicode
    (7L, "x y z")
  ).toDF("doc_id", "text")

  test("shingles: degenerate docs yield empty sets, no crashes") {
    val out = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("gs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) === Seq("alpha beta gamma", "beta gamma delta"))
    assert(out(2L).isEmpty)
    assert(out(3L).isEmpty)
    assert(out(4L).isEmpty)
    assert(out(6L).size === 4)
    assert(out(7L) === Seq("x y z"))
  }

  test("fingerprint: whitespace normalization collapses, unicode stable") {
    val fps = Seq((1L, "a  b\tc"), (2L, " a b c "), (3L, "a b d"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) === fps(2L), "whitespace runs must normalize identically")
    assert(fps(1L) !== fps(3L))
  }

  test("minhash signatures: identical docs identical sigs; sig similarity tracks jaccard") {
    val sh = docs.filter(size(Dedup.shingles(col("text"))) > 0)
      .select(col("doc_id"), Dedup.shingles(col("text")).as("gs"))
      .select(col("doc_id"), transform(col("gs"), g => Dedup.baseHash(g)).as("hs"))
    val sigs = sh.select(
      (col("doc_id") +: Dedup.minhashSig(col("hs")).zipWithIndex.map { case (c, i) => c.as(s"s$i") }): _*)
      .collect().map(r => r.getLong(0) -> (1 until r.length).map(r.getLong)).toMap
    assert(sigs(1L) === sigs(5L), "identical text ⇒ identical minhash signature")
    assert(sigs(1L) !== sigs(7L))
  }

  test("d6 prefix bands are EXACT for ham <= Bands-1 (pigeonhole)") {
    // banded formulation vs brute-force all-pairs over the real corpus
    val banded = Dedup.d6SimhashPairs(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sigs = Dedup.d3SimhashOn(
      spark.read.parquet(s"$sf0001/documents.parquet"))
    val brute = sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("ham",
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long"))
      .filter(col("ham") <= Dedup.SimHamMax)
      .select(col("a.doc_id"), col("b.doc_id"), col("ham"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded === brute,
      s"banded=${banded.size} brute=${brute.size}: band bucketing must lose nothing at ham<=${Dedup.SimHamMax}")
    assert(banded.nonEmpty)
    // the pigeonhole exactness only holds while no band bucket is
    // capped — verify the precondition instead of assuming it
    val maxBucket = Dedup.d6Bands(sigs)
      .groupBy("band", "bh").count()
      .agg(max("count")).head().getLong(0)
    info(s"d6 max band-bucket size on sf0.001: $maxBucket (cap ${Dedup.MaxBucket})")
    assert(maxBucket <= Dedup.MaxBucket,
      s"max band bucket $maxBucket exceeds MaxBucket=${Dedup.MaxBucket}: " +
        "the 'EXACT at ham<=3' contract no longer holds on this corpus")
  }

  test("d5 SRP-LSH: every reported pair passes the exact cosine verify; subset of all-pairs truth") {
    val got = Dedup.d5EmbedNearDup(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty, "tuned SRP params must surface pairs on this corpus")
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
    val truth = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", graft.functions.VectorFunctions.cosine(col("a.embedding"), col("b.embedding")))
      .filter(col("sim") >= Dedup.CosineThreshold)
      .select(col("a.vec_id"), col("b.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(truth), "LSH candidates that pass verify must be true pairs")
    info(s"SRP recall on sf0.001: ${got.size}/${truth.size}")
  }

  // ---- r19: >MaxBucket duplicate families keep representatives ------
  // The GraphSpec 1050-copy fixture ported to the TEXT generators: under
  // the pre-r19 drop-whole-bucket rule a family whose every band bucket
  // exceeds MaxBucket contributed ZERO pairs (an edgeless island —
  // invisible to production dedup in exactly the duplicate-heavy regime
  // dedup exists for); under id-ordered representative admission its
  // MaxBucket lowest ids stay pair-connected, and the tail beyond the
  // cap-th smallest id stays outside candidacy (the bounded-|bucket|²
  // contract).

  private val FamLo = 100L
  private val FamN = Dedup.MaxBucket + 50 // 1050 copies — every bucket over cap
  private val FamHi = FamLo + Dedup.MaxBucket // first NON-representative id
  private val FamText = "the quick brown fox jumps over the lazy dog repeatedly"
  // outsiders sit ABOVE the family id range: even if one lands in a
  // family band bucket, the bucket's 1000 lowest ids — the admitted
  // representatives — are still exactly FamLo until FamHi
  private def familyDocs = (
    (FamLo until FamLo + FamN).map(id => (id, FamText)) ++
      Seq((5000L, "completely unrelated first outsider document text"),
        (5001L, "another disjoint outsider phrase with different words"))
  ).toDF("doc_id", "text")

  private def inFamilyOverflow(c: org.apache.spark.sql.Column) =
    c >= FamHi && c < FamLo + FamN

  test("d2 minhash-LSH: 1050-copy family is FULLY connected — quadratic reps + linear tail links") {
    val pairs = Dedup.d2MinhashLshOn(familyDocs)
    val fam = pairs.filter(col("doc_a") >= FamLo && col("doc_b") < FamHi)
    val r = fam.agg(count(lit(1)), min("doc_a"), max("doc_b"), min("jac")).head()
    val reps = Dedup.MaxBucket.toLong
    // all C(1000,2) representative pairs verify at jac = 1 (identical text)
    assert(r.getLong(0) === reps * (reps - 1) / 2,
      s"expected the full representative pair set, got ${r.getLong(0)} (old rule: 0)")
    assert(r.getLong(1) === FamLo && r.getLong(2) === FamHi - 1)
    assert(r.getDouble(3) === 1.0)
    // every overflow id (beyond the cap-th smallest) appears in EXACTLY
    // one pair — the tail link to the family's canonical min id — so
    // the whole family clusters, at |tail| linear extra pairs
    val tail = pairs.filter(
        inFamilyOverflow(col("doc_a")) || inFamilyOverflow(col("doc_b")))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(tail.length === FamN - Dedup.MaxBucket,
      s"expected one tail link per overflow id, got ${tail.length}")
    assert(tail.forall(_._1 == FamLo), "tail links anchor at the family min id")
    assert(tail.map(_._2).sorted.toSeq === (FamHi until FamLo + FamN).toSeq)
    assert(tail.forall(_._3 == 1.0))
    Dedup.releaseSlots()
  }

  test("d6 simhash pairs: 1050-copy family keeps its 1000 lowest ids pair-connected") {
    val dir = tmpDir("d6fam")
    familyDocs.write.parquet(s"$dir/documents.parquet")
    val pairs = Dedup.d6SimhashPairs(spark, dir)
    val fam = pairs.filter(col("doc_a") >= FamLo && col("doc_b") < FamHi)
    val fr = fam.agg(count(lit(1)), max("doc_b"), max("ham")).head()
    val reps = Dedup.MaxBucket.toLong
    assert(fr.getLong(0) === reps * (reps - 1) / 2,
      s"family representatives must pair (old rule: 0), got ${fr.getLong(0)}")
    assert(fr.getLong(1) === FamHi - 1)
    assert(fr.getLong(2) === 0L, "identical text ⇒ ham 0 on every family pair")
    assert(pairs.filter(
        inFamilyOverflow(col("doc_a")) || inFamilyOverflow(col("doc_b")))
      .count() === 0L,
      "non-representative family members must stay outside pair candidacy")
    Dedup.releaseSlots()
  }

  test("intra-batch matches: a >cap same-text burst quarantines EVERY copy beyond the first") {
    val m = Dedup.intraBatchMatches(familyDocs)
      .filter(col("batch_id") >= FamLo && col("batch_id") < FamLo + FamN)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // losers = the whole family minus the min id: representatives pair
    // quadratically, overflow ids arrive via their linear tail link to
    // the family min — so a duplicate burst cannot leak copies past
    // the quarantine through the cap
    assert(m.map(_._1).sorted.toSeq === ((FamLo + 1) until (FamLo + FamN)).toSeq)
    assert(m.forall(_._2 == FamLo), "every loser's winner must be the family min id")
    assert(m.forall(_._3 == 1.0))
  }

  test("cap helpers reject input whose re-evaluation re-runs a kernel (r20 contract)") {
    // the r19 +31% CPU regression shape: a fused kernel in the cap
    // input's UNCACHED lineage runs once per cap branch and once per
    // downstream join side — 4 passes. The helpers now refuse it.
    val sigs = Dedup.d3SimhashOn(docs) // simhash kernel in lineage
    val bandsOf = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("doc_id"), col("simhash").as("bh"))
    val e = intercept[IllegalArgumentException] {
      Dedup.capByLowestIds(bandsOf(sigs), Seq("bh"), "doc_id")
    }
    assert(e.getMessage.contains("re-evaluates a graft kernel"))
    // a persisted kernel frame passes: re-evaluation reads the cache
    val cached = Dedup.cacheSlot("spec-cap-contract", sigs)
    assert(Dedup.capByLowestIds(bandsOf(cached), Seq("bh"), "doc_id")
      .count() > 0)
    // a file-backed kernel frame passes: re-evaluation is a parquet
    // scan, the kernel ran once at write time
    val p = tmpDir("cap-contract")
    sigs.write.parquet(s"$p/sigs.parquet")
    assert(Dedup.capByLowestIds(
        bandsOf(spark.read.parquet(s"$p/sigs.parquet")), Seq("bh"), "doc_id")
      .count() > 0)
    Dedup.releaseSlots()
  }

  test("quality/token queries never divide by zero on empty docs") {
    val q = docs.select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // split of "" yields [""] — size >= 1 always, so ratios are safe
    assert(q.values.forall(_ >= 1))
  }
}
