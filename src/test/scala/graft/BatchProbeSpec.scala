package graft

import graft.operators.Indexed
import org.apache.spark.sql.functions._

/** The v17 large-|Q| fallback: when a query batch exceeds the driver
  * ceiling, probe selection and ADC-table construction run as a
  * distributed job (queries ⋈ broadcast frozen structures) instead of
  * driver arithmetic — and because both paths run the same scalar
  * kernels with the same accumulation order, they must produce
  * IDENTICAL results through the identical serving plan.
  */
class BatchProbeSpec extends SparkSuite {

  test("distributed probe fallback == driver probe path, same serving plan") {
    val d = sf0001
    val driver = Indexed.v17BatchIvfPq(spark, d)
    val dist = Indexed.v17BatchIvfPqDistributed(spark, d, Indexed.BatchQids)

    val a = driver.collect().map(_.toSeq)
    val b = dist.collect().map(_.toSeq)
    assert(a.nonEmpty)
    assert(a.toSeq === b.toSeq,
      "fallback must be bit-identical to the driver path (same kernels, same order)")

    // the serving plan is unchanged: the union probe prune is still a
    // PUSHED parquet filter on the assignment scan (bounded by the
    // centroid count, not |Q|), and nothing degenerates to a cartesian
    val plan = dist.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("cluster"),
      "probe prune must stay pushed to the assignment scan")
    assert(!plan.contains("CartesianProduct"),
      "fallback must not introduce a cartesian join")
  }

  test("distributed probe tables themselves match driver arithmetic") {
    val d = sf0001
    val cents = Indexed.ensureCentroids(spark, d)
    val cb = Indexed.ensureCodebook(spark, d)
    val queries = spark.read.parquet(s"$d/embeddings.parquet")
      .filter(col("vec_id") < 50).select("vec_id", "embedding")
    val (probes, qtabs) = Indexed.batchProbeTablesDistributed(spark, queries, cents, cb)
    // every query probes exactly NProbe cells, and the table rows are
    // (PqM x PqK) doubles — the shapes the serving plan broadcasts
    val perQ = probes.groupBy("qid").count().select("count").distinct().collect()
    assert(perQ.map(_.getLong(0)).toSeq === Seq(Indexed.NProbe.toLong))
    val tab = qtabs.limit(1).collect()(0).getSeq[scala.collection.Seq[Double]](1)
    assert(tab.size === Indexed.PqM)
    assert(tab.forall(_.size === Indexed.PqK))
  }
}
