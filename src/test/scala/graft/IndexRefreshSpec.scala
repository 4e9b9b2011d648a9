package graft

import graft.operators.Indexed
import org.apache.spark.sql.functions._

/** Incremental index maintenance: appending a delta encoded with the
  * FROZEN structures must leave the stored tables identical (as sets)
  * to an all-at-once encode of the full corpus with those same
  * structures — so every serve-many plan reading the grown tables
  * (v10/v12/v14/v16) behaves as if the index had been built from the
  * full corpus in one shot.
  */
class IndexRefreshSpec extends SparkSuite {

  test("delta append with frozen centroids/codebook == all-at-once encode") {
    val base = tmpDir("idxrefresh")
    val full = spark.read.parquet(s"$sf0001/embeddings.parquet")
    // base corpus = ids < 400; the rest arrives later as a delta batch
    full.filter(col("vec_id") < 400)
      .write.parquet(s"$base/embeddings.parquet")

    val cents = Indexed.ensureCentroids(spark, base)
    val cb = Indexed.ensureCodebook(spark, base)
    val assignPath = Indexed.ensureAssignments(spark, base)
    val codesPath = Indexed.ensurePqCodes(spark, base)
    val baseRows = spark.read.parquet(assignPath).count()

    val delta = full.filter(col("vec_id") >= 400)
    val deltaRows = delta.count()
    assert(deltaRows > 0 && baseRows > 0, "fixture must split into base + delta")
    Indexed.appendAssignments(spark, base, delta)
    Indexed.appendPqCodes(spark, base, delta)

    // the grown tables == encoding the FULL corpus with the SAME frozen
    // structures (centroids/codebook learned from the base corpus only)
    // appends PUBLISH: the pre-append snapshot dirs must be untouched,
    // and the re-resolved live dirs carry base + delta
    assert(spark.read.parquet(assignPath).count() === baseRows,
      "pre-append snapshot must be immutable")
    val gotAssign = spark.read.parquet(Indexed.assignPath(base))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val expAssign = full.select(col("vec_id"), Indexed.assignExpr(cents).as("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(gotAssign.size === baseRows + deltaRows, "append must not drop or dup ids")
    assert(gotAssign === expAssign)

    val gotCodes = spark.read.parquet(Indexed.pqCodesPath(base))
      .select("vec_id", "code0", "code1", "code2", "code3")
      .collect().map(_.toSeq).toSet
    val expCodes = full.select(col("vec_id") +: Indexed.pqCodeCols(cb): _*)
      .collect().map(_.toSeq).toSet
    assert(gotCodes === expCodes)

    // SQ8: delta quantized with the base corpus's stored bounds
    val (mn, mx) = Indexed.ensureSq8Bounds(spark, base)
    val sq8Path = Indexed.ensureSq8Codes(spark, base)
    Indexed.appendSq8Codes(spark, base, delta)
    val gotSq8 = spark.read.parquet(Indexed.sq8CodesPath(base))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toSet
    val expSq8 = full.select(col("vec_id"), Indexed.sq8CodeExpr(mn, mx).as("codes"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toSet
    assert(gotSq8 === expSq8)

    // residual IVFADC: delta coarse-assigned + residual-encoded with
    // the frozen centroids/residual codebook
    val rcb = Indexed.ensureResidCodebook(spark, base)
    val rPath = Indexed.ensureResidCodes(spark, base)
    Indexed.appendResidCodes(spark, base, delta)
    val gotR = spark.read.parquet(Indexed.residCodesPath(base))
      .select("vec_id", "cluster", "rcode0", "rcode1", "rcode2", "rcode3")
      .collect().map(_.toSeq).toSet
    val expR = full
      .withColumn("cluster", Indexed.assignExpr(cents))
      .withColumn("resid", zip_with(col("embedding"),
        element_at(typedlit(cents), col("cluster") + 1),
        (x, c) => x - c))
      .select(col("vec_id") +: col("cluster") +: Indexed.residCodeCols(rcb): _*)
      .collect().map(_.toSeq).toSet
    assert(gotR === expR)
  }
}
