package graft

import graft.functions.MisraGries
import graft.operators.TextAnalysis
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The Misra-Gries frequent-items aggregate and the exact two-pass
  * heavy-hitters query built on it (t20).
  *
  * The correctness contract is the SURVIVAL INVARIANT, not the counter
  * values (those are stream-order dependent): after any mix of updates
  * and merges over a stream of n items with m counters,
  *   - every term with true count > n/(m+1) is present, and
  *   - every surviving weight w(t) satisfies
  *     trueCount(t) − n/(m+1) ≤ w(t) ≤ trueCount(t).
  */
class MisraGriesSpec extends SparkSuite {

  /** Summary rows -> (term -> weight). */
  private def summary(df: org.apache.spark.sql.DataFrame, m: Int): Map[String, Long] =
    df.agg(MisraGries.sketch(col("term"), m).as("s")).head()
      .getAs[scala.collection.Seq[Row]]("s")
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("survival invariant on an adversarial stream, vocab >> m, across partition merges") {
    import spark.implicits._
    // zipf-ish: term i appears ~ N/i times; vocab 2000, m 64 — the
    // sketch overflows constantly and every partial merges into the
    // final buffer (8 shuffle partitions at local[4]).
    val rows = (1 to 2000).flatMap(i => Seq.fill(3000 / i)(s"t$i"))
    val n = rows.size.toLong
    val m = 64
    val truth = rows.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val df = spark.createDataset(scala.util.Random.shuffle(rows.toVector))
      .repartition(8).toDF("term")
    val s = summary(df, m)
    assert(s.size <= m)
    val eps = n / (m + 1) // integer floor is fine: bound is real-valued n/(m+1)
    val mustSurvive = truth.filter(_._2 > n.toDouble / (m + 1)).keySet
    assert(mustSurvive.nonEmpty, "fixture must have true heavy hitters")
    assert(mustSurvive.subsetOf(s.keySet),
      s"lost heavy hitters: ${mustSurvive -- s.keySet}")
    s.foreach { case (t, w) =>
      val tc = truth(t)
      assert(w <= tc, s"$t overcounted: $w > $tc")
      assert(w >= tc - eps - 1, s"$t undercounted past the bound: $w < $tc - $eps")
    }
  }

  test("no overflow: sketch with m >= vocab is the exact multiset count") {
    import spark.implicits._
    val rows = Seq("a", "b", "a", "c", "a", "b")
    val s = summary(spark.createDataset(rows).toDF("term"), 8)
    assert(s === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("t20 equals the exact top-k and attests exactness on the real corpus") {
    val got = TextAnalysis.t20HeavyHitters(spark, sf0001).collect()
    assert(got.length === TextAnalysis.HHTopK)
    assert(got.forall(_.getBoolean(4)), "fixture must be provably exact")
    // independent exact recompute (full groupBy, no sketch anywhere)
    val toks = TextAnalysis.tokens(col("text"))
    val n1 = greatest(size(toks) - 1, lit(0))
    val bg = zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    val exact = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(bg).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc).limit(TextAnalysis.HHTopK)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(r => (r.getString(1), r.getLong(2))).toSeq === exact.toSeq)
    // and the bound actually bites: the corpus vocab exceeds the sketch
    val vocab = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(bg).as("term")).distinct().count()
    assert(vocab > TextAnalysis.HHSketchM,
      "fixture term space must overflow the sketch or the test is vacuous")
  }
}
