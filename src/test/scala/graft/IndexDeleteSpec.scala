package graft

import graft.operators.Indexed
import org.apache.spark.sql.functions._

/** Index-side deletes: removing ids rewrites every stored table without
  * them (new version, old snapshot intact), serving stops returning
  * them, and re-appending the same vectors restores the bulk-build
  * state exactly — the full ingest/delete/re-ingest lifecycle.
  */
class IndexDeleteSpec extends SparkSuite {

  test("removeFromIndexes drops ids from all four tables; re-append restores") {
    val base = tmpDir("idxdelete")
    val full = spark.read.parquet(s"$sf0001/embeddings.parquet")
    full.write.parquet(s"$base/embeddings.parquet")

    // build all four stored tables
    val assignBefore = Indexed.ensureAssignments(spark, base)
    Indexed.ensurePqCodes(spark, base)
    Indexed.ensureSq8Codes(spark, base)
    Indexed.ensureResidCodes(spark, base)
    val n = full.count()

    val victims = full.filter(col("vec_id") % 7 === 0).select("vec_id")
    val nVictims = victims.count()
    assert(nVictims > 0)

    val assignAfter = Indexed.removeFromIndexes(spark, base, victims)
    assert(assignAfter !== assignBefore, "delete must publish a new version")
    assert(new java.io.File(assignBefore).isDirectory,
      "pre-delete snapshot must survive for in-flight readers")

    // every table lost exactly the victim ids
    for (path <- Seq(Indexed.assignPath(base), Indexed.pqCodesPath(base),
        Indexed.sq8CodesPath(base), Indexed.residCodesPath(base))) {
      val t = spark.read.parquet(path)
      assert(t.count() === n - nVictims, s"$path wrong row count after delete")
      assert(t.join(victims, "vec_id").count() === 0, s"$path retains deleted ids")
    }

    // re-appending the deleted vectors (frozen-structure encode)
    // restores the exact bulk-build content on every table
    val deltas = full.join(victims, "vec_id")
    Indexed.appendAssignments(spark, base, deltas)
    Indexed.appendPqCodes(spark, base, deltas)
    Indexed.appendSq8Codes(spark, base, deltas)
    Indexed.appendResidCodes(spark, base, deltas)
    val cents = Indexed.ensureCentroids(spark, base)
    val gotAssign = spark.read.parquet(Indexed.assignPath(base))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val expAssign = full.select(col("vec_id"), Indexed.assignExpr(cents).as("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(gotAssign === expAssign)
  }
}
