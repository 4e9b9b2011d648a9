package graft

import graft.streaming.StreamJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Event-time stream-stream join: matches land within the interval
  * bound, out-of-window effects never join, and a row arriving behind
  * both watermarks is dropped by state eviction rather than buffered
  * forever (the property that bounds join state at 100 TB).
  */
class StreamJoinSpec extends SparkSuite {
  import spark.implicits._

  private def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("interval-bounded attribution join with watermark eviction") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamJoin.within(
      imps.toDF().toDF("imp_id", "imp_ts"),
      clicks.toDF().toDF("imp_id", "click_ts"),
      key = "imp_id", leftTs = "imp_ts", rightTs = "click_ts",
      delayThreshold = "5 minutes", maxDelay = "10 minutes")

    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attrib_out").start()
    try {
      imps.addData((1L, t(0)), (2L, t(1)), (3L, t(2)))
      // click on imp 1 inside the 10-minute window; imp 2's click 19
      // minutes later is outside it; imp 3 never clicks
      clicks.addData((1L, t(4)), (2L, t(20)))
      q.processAllAvailable()
      // advance both watermarks far past t(0)..t(20) + delays
      imps.addData((99L, t(50)))
      clicks.addData((98L, t(50)))
      q.processAllAvailable()
      // behind both watermarks: this matching pair must be evicted
      // state's ghost — late data dropped, no new output row
      imps.addData((4L, t(3)))
      clicks.addData((4L, t(5)))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("attrib_out")
      .select("imp_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L),
      s"expected only imp 1 attributed; got ${out.toSeq}")
  }

  test("left-outer: unmatched impressions emit null-click rows at eviction") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamJoin.leftOuterWithin(
      imps.toDF().toDF("imp_id", "imp_ts"),
      clicks.toDF().toDF("imp_id", "click_ts"),
      key = "imp_id", leftTs = "imp_ts", rightTs = "click_ts",
      delayThreshold = "5 minutes", maxDelay = "10 minutes")

    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attrib_outer").start()
    try {
      imps.addData((1L, t(0)), (2L, t(1)), (3L, t(2)))
      // imp 1 clicked in-window; imp 2's click is 19 min late (outside
      // the window); imp 3 never clicks at all
      clicks.addData((1L, t(4)), (2L, t(20)))
      q.processAllAvailable()
      // push both watermarks far enough that imps 2 and 3 are provably
      // unmatchable — the point where Spark may emit their null rows
      imps.addData((99L, t(50)))
      clicks.addData((98L, t(50)))
      q.processAllAvailable()
      imps.addData((97L, t(80)))
      clicks.addData((96L, t(80)))
      q.processAllAvailable()
      // late click behind both watermarks: state already evicted, must
      // not retro-match imp 3 or emit anything new for it
      clicks.addData((3L, t(6)))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("attrib_outer")
      .select("imp_id", "click_ts").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).isDefined)).toMap
    assert(rows.get(1L) === Some(true), "in-window click must attribute")
    assert(rows.get(2L) === Some(false),
      "out-of-window click must surface as an unmatched impression")
    assert(rows.get(3L) === Some(false),
      "never-clicked impression must surface with null click columns")
  }

  test("full-outer: unmatched rows surface from BOTH sides at eviction; late data on either side stays dropped") {
    implicit val sqlCtx = spark.sqlContext
    val sent = MemoryStream[(Long, java.sql.Timestamp)]
    val acked = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamJoin.fullOuterWithin(
      sent.toDF().toDF("msg_id", "sent_ts"),
      acked.toDF().toDF("msg_id", "ack_ts"),
      key = "msg_id", leftTs = "sent_ts", rightTs = "ack_ts",
      delayThreshold = "5 minutes", maxDelay = "10 minutes")

    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("reconcile_out").start()
    try {
      // 1 = matched; 2 = sent but never acked (lone LEFT);
      // 5 = ack with no send (lone RIGHT — the reconciliation shape
      // the one-sided variants cannot surface)
      sent.addData((1L, t(0)), (2L, t(1)))
      acked.addData((1L, t(4)), (5L, t(2)))
      q.processAllAvailable()
      // push both watermarks past every event + delay so both lone
      // rows are provably unmatchable and must emit
      sent.addData((99L, t(50)))
      acked.addData((98L, t(50)))
      q.processAllAvailable()
      sent.addData((97L, t(80)))
      acked.addData((96L, t(80)))
      q.processAllAvailable()
      // late data on EACH side, behind both watermarks: state is
      // evicted — no new rows, no retro-match of msg 2
      sent.addData((6L, t(3)))
      acked.addData((2L, t(5)))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("reconcile_out")
      .filter("msg_id < 90") // watermark-filler rows are not under test
      .select("msg_id", "sent_ts", "ack_ts").collect()
      .map(r => r.getLong(0) -> (!r.isNullAt(1), !r.isNullAt(2))).toMap
    assert(rows.get(1L) === Some((true, true)), "in-window ack must match")
    assert(rows.get(2L) === Some((true, false)),
      "never-acked send must surface with null ack columns")
    assert(rows.get(5L) === Some((false, true)),
      "ack without a send must surface with null send columns — and keep its key")
    assert(!rows.contains(6L), "late left row behind both watermarks is dropped")
    assert(rows.size === 3, s"each row exactly once; got $rows")
  }

  test("streams sharing column names (both 'ts', common payload) join unambiguously") {
    implicit val sqlCtx = spark.sqlContext
    val reqs = MemoryStream[(Long, java.sql.Timestamp, String)]
    val resps = MemoryStream[(Long, java.sql.Timestamp, String)]
    // identical schemas on both sides: key, ts, v — the shape that made
    // the un-suffixed condition ambiguous (or silently one-sided)
    val joined = StreamJoin.within(
      reqs.toDF().toDF("k", "ts", "v"),
      resps.toDF().toDF("k", "ts", "v"),
      key = "k", leftTs = "ts", rightTs = "ts",
      delayThreshold = "5 minutes", maxDelay = "10 minutes")
    assert(joined.columns.toSeq === Seq("k", "ts", "v", "ts_r", "v_r"),
      s"colliding right columns must stay suffixed; got ${joined.columns.toSeq}")

    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("shared_names_out").start()
    try {
      reqs.addData((1L, t(0), "req"))
      resps.addData((1L, t(4), "resp"))
      q.processAllAvailable()
    } finally q.stop()
    val row = spark.table("shared_names_out")
      .select("k", "v", "v_r").collect().map(_.toSeq)
    assert(row.toSeq === Seq(Seq(1L, "req", "resp")),
      "payloads must come from their own sides")
  }
}
