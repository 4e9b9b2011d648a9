package graft

import org.apache.spark.sql.functions._

/** Pins the r21 d15 exact-path rewrite: the one-shuffle per-hash
  * side-count aggregation (ns = hasA + hasB via two max()) must equal
  * the distinct() + groupBy(h).count() form it replaced, on data with
  * heavy duplicate (side, hash) pairs and single-side hashes.
  */
class KmvExactPathSpec extends SparkSuite {
  import spark.implicits._

  test("max-sum side count equals distinct+count on duplicate-heavy pairs") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 20000).map { _ =>
      (rnd.nextBoolean(), rnd.nextInt(500).toLong) }
    val ex = rows.toDF("is_a", "h")

    val sides = ex.groupBy("h").agg(
      (max(when(col("is_a"), 1L).otherwise(0L)) +
        max(when(!col("is_a"), 1L).otherwise(0L))).as("ns"))
    val got = sides.agg(
      count(lit(1)).as("n_union"),
      sum(when(col("ns") === 2, 1L).otherwise(0L)).as("n_inter"))
      .head()

    val ref = ex.distinct().groupBy("h").agg(count(lit(1)).as("ns"))
      .agg(count(lit(1)).as("n_union"),
        sum(when(col("ns") === 2, 1L).otherwise(0L)).as("n_inter"))
      .head()

    assert(got.getLong(0) == ref.getLong(0), "n_union")
    assert(got.getLong(1) == ref.getLong(1), "n_inter")
  }

  test("single-side and empty-side groups count correctly") {
    val ex = Seq((true, 1L), (true, 1L), (false, 2L), (true, 3L), (false, 3L))
      .toDF("is_a", "h")
    val sides = ex.groupBy("h").agg(
      (max(when(col("is_a"), 1L).otherwise(0L)) +
        max(when(!col("is_a"), 1L).otherwise(0L))).as("ns"))
    val m = sides.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }
}
