package graft

import graft.operators.Temporal

/** as-of join edge semantics on hand-built frames: latest-at-or-before
  * match, inclusive equality, null when no prior right row, multiple
  * keys isolated.
  */
class AsofSpec extends SparkSuite {
  import spark.implicits._

  test("asof picks latest right row at-or-before left time, per key") {
    val left = Seq(
      (1L, 100L, 10L), // key 1, t=10
      (2L, 100L, 25L),
      (3L, 200L, 15L),
      (4L, 200L, 5L) // before any right row for key 200
    ).toDF("lid", "key", "t")
    val right = Seq(
      (901L, 100L, 5L),
      (902L, 100L, 10L), // equal time as lid=1 → inclusive match
      (903L, 100L, 20L),
      (904L, 200L, 10L)
    ).toDF("rid", "key", "t")

    val out = Temporal.asofJoin(left, right, Seq("key"), "t", "t",
      Seq("rid" -> "matched_rid"))
      .select("lid", "matched_rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap

    assert(out(1L) === Some(902L), "equal timestamp is inclusive")
    assert(out(2L) === Some(903L), "latest at-or-before wins")
    assert(out(3L) === Some(904L))
    assert(out(4L) === None, "no prior right row → null")
  }
}
