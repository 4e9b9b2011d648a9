package graft

import graft.functions.TextHashKernels
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** The single-pass hash kernels must be bit-identical to the HOF
  * formulations they replace (whose DuckDB parity the r1 oracle gate
  * already established): same md5-derived base hashes, same affine
  * minima, same band digests, same simhash bits — over the real
  * documents corpus, not synthetic strings.
  */
class TextHashKernelsSpec extends SparkSuite {

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("SimHash32 kernel == HOF simhashExpr over the corpus") {
    val toks = TextAnalysis.tokens(col("text"))
    val hof = docs
      .select(col("doc_id"),
        transform(toks, t => conv(substring(md5(t.cast("binary")), 1, 8), 16, 10)
          .cast("long")).as("hs"))
      .select(col("doc_id"), Dedup.simhashExpr.as("simhash"))
    val kernel = docs.select(col("doc_id"), TextHashKernels.simhash32(toks).as("simhash"))
    val diff = kernel.join(hof, "doc_id")
      .filter(kernel("simhash") =!= hof("simhash")).count()
    assert(diff === 0L)
    assert(kernel.count() === docs.count())
  }

  test("MinHashSig kernel == per-seed array_min HOF over corpus shingles") {
    val sh = docs
      .select(col("doc_id"), Dedup.shingles(col("text")).as("gs"))
      .filter(size(col("gs")) > 0)
      .withColumn("hs", transform(col("gs"), g => Dedup.baseHash(g)))
    val hof = sh.select(
      (col("doc_id") +: Dedup.minhashSig(col("hs")).zipWithIndex.map {
        case (c, i) => c.as(s"sig$i")
      }): _*)
    val kernel = sh.select(col("doc_id"),
      TextHashKernels.minhashSig(col("gs"), Dedup.HashCoeffs, Dedup.HashPrime).as("sig"))
    val joined = kernel.join(hof, "doc_id")
    val mismatches = (0 until Dedup.NumHashes).map { i =>
      joined.filter(element_at(col("sig"), i + 1) =!= col(s"sig$i")).count()
    }
    assert(mismatches.forall(_ === 0L), s"per-seed mismatches: $mismatches")
    assert(kernel.count() > 0)
  }

  test("MinHashBands kernel == md5(concat_ws) over MinHashSig values") {
    val sh = docs
      .select(col("doc_id"), Dedup.shingles(col("text")).as("gs"))
      .filter(size(col("gs")) > 0)
    val sig = TextHashKernels.minhashSig(col("gs"), Dedup.HashCoeffs, Dedup.HashPrime)
    val expected = (0 until Dedup.Bands).map { b =>
      val parts = (0 until Dedup.RowsPerBand)
        .map(r => element_at(sig, b * Dedup.RowsPerBand + r + 1).cast("string"))
      md5(concat_ws(",", parts: _*).cast("binary")).as(s"e$b")
    }
    val bands = TextHashKernels.minhashBands(
      col("gs"), Dedup.HashCoeffs, Dedup.HashPrime, Dedup.RowsPerBand)
    val both = sh.select((col("doc_id") +: bands.as("bands") +: expected): _*)
    val bad = (0 until Dedup.Bands).map { b =>
      both.filter(element_at(col("bands"), b + 1) =!= col(s"e$b")).count()
    }
    assert(bad.forall(_ === 0L), s"band mismatches: $bad")
  }

  test("SimHash32 matches HOF on arrays CONTAINING null elements") {
    import spark.implicits._
    // a null token hashes to a null h; the HOF CASE then yields -1 on
    // every bit (not a skip) — the kernel must do the same
    val df = Seq(
      (1, Seq[String]("alpha", null, "beta")),
      (2, Seq[String](null)),
      (3, Seq[String]("alpha", "beta", "gamma"))).toDF("id", "toks")
    val both = df.select(col("id"),
      TextHashKernels.simhash32(col("toks")).as("kernel"),
      transform(col("toks"), t =>
        conv(substring(md5(t.cast("binary")), 1, 8), 16, 10).cast("long")).as("hs"))
      .select(col("id"), col("kernel"), Dedup.simhashExpr.as("hof"))
      .orderBy("id").collect()
    both.foreach(r => assert(r.getLong(1) === r.getLong(2), s"id=${r.getInt(0)}"))
  }

  test("kernels handle empty and null-element arrays") {
    import spark.implicits._
    val df = Seq(
      (1, Seq.empty[String]),
      (2, Seq("a", "b", "c"))).toDF("id", "toks")
    val r = df.select(col("id"),
      TextHashKernels.simhash32(col("toks")).as("sh"),
      TextHashKernels.minhashSig(col("toks"), Dedup.HashCoeffs, Dedup.HashPrime).as("sig"),
      TextHashKernels.minhashBands(col("toks"), Dedup.HashCoeffs, Dedup.HashPrime,
        Dedup.RowsPerBand).as("bands"))
      .orderBy("id").collect()
    assert(r(0).isNullAt(2) && r(0).isNullAt(3)) // empty -> null sig/bands
    assert(!r(1).isNullAt(1) && r(1).getSeq[Long](2).length === Dedup.NumHashes)
  }
}
