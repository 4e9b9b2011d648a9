package graft

import graft.operators.RankSelect
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the r21 distributed rank selection against the window
  * formulation it replaced (row_number/count over
  * Window.partitionBy(group)) — the equivalence the percentile-family
  * rewrites (q_agg_approx_percentile / q_agg_percentiles /
  * q_agg_median) rest on.
  */
class RankSelectSpec extends SparkSuite {
  import spark.implicits._

  /** Reference: value at 1-based rank r(n) per group via the old
    * whole-group window (any deterministic tiebreak — the value at a
    * rank is tie-invariant, which is the property under test).
    */
  private def windowRef(df: DataFrame,
      ranks: Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)])
      : DataFrame = {
    val w = Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)
    val r = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
    val aggs = ranks.map { case (name, rf) =>
      max(when(col("rn") === rf(col("n")), col("v"))).as(name) }
    r.groupBy("g").agg(max("n").as("n"), aggs: _*)
  }

  private def assertSame(df: DataFrame,
      ranks: Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)])
      : Unit = {
    val want = windowRef(df, ranks)
      .orderBy("g").collect().map(_.toSeq).toSeq
    // both routes must agree with the reference: the bucket search
    // (forced by a zero small-group floor) and the small-group window
    // (every test group is far below the default floor)
    for (floor <- Seq("0", RankSelect.SmallGroupRows.toString)) {
      spark.conf.set("spark.graft.rankselect.smallGroupRows", floor)
      try {
        val got = RankSelect.selectAtRanks(df.select("g", "v"), Seq("g"), "v", ranks)
          .orderBy("g").collect().map(_.toSeq).toSeq
        assert(got == want, s"smallGroupRows=$floor diverged")
      } finally spark.conf.unset("spark.graft.rankselect.smallGroupRows")
    }
  }

  private val medianRanks = Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)](
    "r1" -> (n => floor((n + 1) / 2.0).cast("long")),
    "r2" -> (n => floor((n + 2) / 2.0).cast("long")))
  private val bandRanks = Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)](
    "p40" -> (n => ceil(n * 0.4)),
    "p99" -> (n => ceil(n * 0.99)),
    "first" -> (n => lit(1L)),
    "last" -> (n => n),
    "past" -> (n => n + 1)) // beyond-n rank must yield null

  test("randomized data with heavy duplicates matches the window form") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map { i =>
      (s"g${rnd.nextInt(4)}", (rnd.nextInt(40) / 4.0) - 3.0, i.toLong) }
    val df = rows.toDF("g", "v", "id")
    assertSame(df, medianRanks)
    assertSame(df, bandRanks)
  }

  test("edge groups: 1-row, 2-row, all-equal values") {
    val df = Seq(
      ("one", 7.5, 1L),
      ("two", 3.0, 2L), ("two", -1.0, 3L),
      ("flat", 2.0, 4L), ("flat", 2.0, 5L), ("flat", 2.0, 6L))
      .toDF("g", "v", "id")
    assertSame(df, medianRanks)
    assertSame(df, bandRanks)
  }

  test("values spanning the full double range bucket correctly") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map { i =>
      ("g", math.exp(rnd.nextGaussian() * 8) * (if (rnd.nextBoolean()) 1 else -1), i.toLong) }
    assertSame(rows.toDF("g", "v", "id"), medianRanks ++ bandRanks)
  }

  test("ties straddling bucket boundaries still select the tied value") {
    // every value duplicated many times: tie runs certainly cross the
    // width_bucket edges for some B; the selected value must be the
    // tied v regardless
    val rows = for (i <- 1 to 1000; r <- 1 to 5)
      yield ("g", (i % 11).toDouble, (i * 5 + r).toLong)
    assertSame(rows.toDF("g", "v", "id"), medianRanks ++ bandRanks)
  }

  test("null values order first, matching ASC NULLS FIRST") {
    val rows: Seq[(String, java.lang.Double, Long)] = Seq(
      ("g", null, 1L), ("g", null, 2L), ("g", 1.0, 3L),
      ("g", 2.0, 4L), ("g", 3.0, 5L))
    val df = rows.toDF("g", "v", "id")
    assertSame(df, medianRanks)
    assertSame(df, Seq(
      "first" -> (n => lit(1L)),
      "third" -> (n => lit(3L)),
      "last" -> (n => n)))
  }

  test("bucket-count conf is honored and B-independent") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 3000).map(i => (s"g${i % 3}", rnd.nextDouble() * 100, i.toLong))
    val df = rows.toDF("g", "v", "id")
    // force the bucket route (the small-group floor would route these
    // tiny test groups to the window form and never touch B)
    spark.conf.set("spark.graft.rankselect.smallGroupRows", "0")
    try {
      val base = RankSelect.selectAtRanks(df.select("g", "v"), Seq("g"), "v", bandRanks)
        .orderBy("g").collect().map(_.toSeq).toSeq
      for (b <- Seq("1", "7", "4096")) {
        spark.conf.set("spark.graft.rankselect.buckets", b)
        try {
          val got = RankSelect.selectAtRanks(df.select("g", "v"), Seq("g"), "v", bandRanks)
            .orderBy("g").collect().map(_.toSeq).toSeq
          assert(got == base, s"buckets=$b diverged")
        } finally spark.conf.unset("spark.graft.rankselect.buckets")
      }
    } finally spark.conf.unset("spark.graft.rankselect.smallGroupRows")
  }
}
