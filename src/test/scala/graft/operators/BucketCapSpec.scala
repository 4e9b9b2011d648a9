package graft.operators

import graft.SparkSuite

/** The r18 two-regime bucket cap pinned against the rank form the
  * DuckDB oracles state — lives in this package for access to the
  * private[operators] helper.
  */
class BucketCapSpec extends SparkSuite {

  test("capByLowestIds ≡ rank-by-id ≤ MaxBucket on random bucket tables straddling the cap (property)") {
    // the r18 two-regime plan (broadcast sizes, under-cap rows pass
    // unsorted, over-cap rows ranked) must emit EXACTLY the set the
    // oracles state as `row_number() OVER (PARTITION BY key ORDER BY
    // vec_id) <= MaxBucket` — including buckets at cap−1/cap/cap+1,
    // duplicate-free, across several random shapes
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 3) {
      // 6 buckets with sizes straddling MaxBucket = 1000
      val sizes = Seq(
        rnd.nextInt(50) + 1, Dedup.MaxBucket - 1, Dedup.MaxBucket,
        Dedup.MaxBucket + 1, Dedup.MaxBucket + rnd.nextInt(400) + 2, 0)
      var nextId = 0L
      val rows = for {
        (sz, b) <- sizes.zipWithIndex
        _ <- 0 until sz
      } yield {
        nextId += 1 + rnd.nextInt(3) // non-contiguous, strictly increasing
        (nextId, b / 3, b % 3) // keys: (tbl in {0,1}, bkt in {0,1,2})
      }
      val shuffled = rnd.shuffle(rows)
      val df = shuffled.toDF("vec_id", "tbl", "bkt")
        .repartition(7) // arbitrary physical layout
      val got = Dedup.capByLowestIds(df, Seq("tbl", "bkt"))
        .select("vec_id", "tbl", "bkt").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      assert(got.length == got.distinct.length, s"trial $trial: duplicates emitted")
      val want = rows.groupBy { case (_, t, b) => (t, b) }.flatMap {
        case (_, members) =>
          members.map(_._1).sorted.take(Dedup.MaxBucket)
            .map(id => (id, members.head._2, members.head._3))
      }.toSet
      assert(got.toSet === want,
        s"trial $trial: two-regime cap diverged from the rank form " +
          s"(missing ${(want -- got.toSet).take(3)}, extra ${(got.toSet -- want).take(3)})")
    }
  }
}
