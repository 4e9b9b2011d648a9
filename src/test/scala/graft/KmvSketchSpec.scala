package graft

import graft.functions.KmvSketch.kmv
import org.apache.spark.sql.functions._

/** The KMV bottom-k-distinct sketch aggregate: content must equal the
  * k smallest DISTINCT values (the property the DuckDB oracle relies
  * on), independent of duplication, row order, partitioning, and the
  * partial/merge tree.
  */
class KmvSketchSpec extends SparkSuite {
  import spark.implicits._

  test("sketch == k smallest distinct values, under duplication and repartitioning") {
    val rnd = new scala.util.Random(7)
    // heavy duplication: 5000 rows over ~600 distinct values
    val vals = Seq.fill(5000)(rnd.nextInt(600).toLong * 7919L)
    val expected = vals.distinct.sorted.take(64)
    for (parts <- Seq(1, 4, 13)) {
      val got = vals.toDF("h").repartition(parts)
        .agg(kmv(col("h"), 64).as("sk"))
        .head().getSeq[Long](0)
      assert(got === expected, s"parts=$parts")
    }
  }

  test("k above the distinct count returns the whole set, sorted") {
    val got = Seq(5L, 3L, 5L, 9L, 3L, 1L).toDF("h")
      .agg(kmv(col("h"), 100).as("sk")).head().getSeq[Long](0)
    assert(got === Seq(1L, 3L, 5L, 9L))
  }

  test("nulls are ignored; empty input yields an empty sketch") {
    val got = Seq[Option[Long]](None, Some(2L), None, Some(8L)).toDF("h")
      .agg(kmv(col("h"), 4).as("sk")).head().getSeq[Long](0)
    assert(got === Seq(2L, 8L))
    val empty = Seq.empty[Long].toDF("h")
      .agg(kmv(col("h"), 4).as("sk")).head().getSeq[Long](0)
    assert(empty === Seq.empty[Long])
  }

  test("partial aggregation: the plan carries ObjectHashAggregate partials, not a raw-value shuffle") {
    val df = (1L to 1000L).toDF("h").repartition(8)
      .groupBy(lit(1).as("g")).agg(kmv(col("h"), 16).as("sk"))
    val plan = df.queryExecution.executedPlan.toString
    // TypedImperativeAggregate runs partial_kmv_sketch before the
    // exchange — each map task ships one ≤k-long buffer per group
    assert(plan.contains("partial_kmv_sketch"), plan)
  }

  test("q_d15's sketch path carries partial aggregation in the real plan") {
    val plan = graft.operators.Corpus.d15OverlapKmv(spark, sf0001)
      .queryExecution.executedPlan.toString
    graft.operators.Dedup.releaseSlots()
    assert(plan.contains("partial_kmv_sketch"),
      s"d15 must partial-aggregate the sketch map-side:\n${plan.take(1500)}")
  }

  test("KMV Jaccard estimator is exact once the union fits in k") {
    // |A∪B| = 30 ≤ k = 64 → τ is the whole union and the estimator
    // degenerates to exact Jaccard: |A∩B| / |A∪B| = 10/30
    val a = (0L until 20L).map(_ * 31L)
    val b = (10L until 30L).map(_ * 31L)
    val ska = a.toDF("h").agg(kmv(col("h"), 64)).head().getSeq[Long](0).toSet
    val skb = b.toDF("h").agg(kmv(col("h"), 64)).head().getSeq[Long](0).toSet
    val tau = (ska ++ skb).toSeq.sorted.take(64)
    val nBoth = tau.count(x => ska(x) && skb(x))
    assert(tau.size === 30 && nBoth === 10)
  }
}
