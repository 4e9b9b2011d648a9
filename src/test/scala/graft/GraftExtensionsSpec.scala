package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface registration: the custom kernels must be callable from
  * plain SQL in a session built with GraftExtensions.
  */
class GraftExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite {

  lazy val sparkExt: SparkSession = {
    // other suites may have installed an active session without our
    // extensions — getOrCreate would silently return it
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
    .master("local[2]")
    .appName("graft-ext")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()
  }

  test("custom kernels callable from spark.sql") {
    sparkExt.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    val r = sparkExt.sql(
      """SELECT euclidean_distance(a.embedding, b.embedding) AS d,
        |       cosine_similarity(a.embedding, b.embedding) AS c,
        |       dot_product(a.embedding, a.embedding) AS s
        |FROM emb a JOIN emb b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin).head()
    assert(r.getDouble(0) > 0)
    assert(math.abs(r.getDouble(1)) <= 1.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-5) // unit-normalized embeddings
    // type misuse yields an analysis error, not a runtime crash
    val err = intercept[Exception] {
      sparkExt.sql("SELECT euclidean_distance(1, 2)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }

  test("kmv_sketch aggregate callable from spark.sql") {
    sparkExt.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb2")
    val got = sparkExt.sql(
      "SELECT kmv_sketch(vec_id, 8) AS sk FROM emb2").head().getSeq[Long](0)
    assert(got === (0L until 8L))
    val err = intercept[Exception] {
      sparkExt.sql("SELECT kmv_sketch(vec_id, vec_id) FROM emb2").collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
    // wrong arity fails with a clear message, not IndexOutOfBounds
    val arity = intercept[Exception] {
      sparkExt.sql("SELECT kmv_sketch(vec_id) FROM emb2").collect()
    }
    assert(arity.getMessage.contains("2 arguments"), arity.getMessage)
    // non-positive k fails loudly at construction from BOTH entry
    // points (SQL builder and direct Scala API), not with a
    // NoSuchElementException on the first row
    val kz = intercept[Exception] {
      sparkExt.sql("SELECT kmv_sketch(vec_id, 0) FROM emb2").collect()
    }
    assert(kz.getMessage.toLowerCase.contains("positive"), kz.getMessage)
    val kzApi = intercept[IllegalArgumentException] {
      graft.functions.KmvSketch.kmv(
        org.apache.spark.sql.functions.col("vec_id"), 0)
    }
    assert(kzApi.getMessage.toLowerCase.contains("positive"), kzApi.getMessage)
  }
}
