package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Event-time streaming: tumbling-window aggregation with watermark and
  * late-data drop (SURVEY §2.9 notes the reference has no event-time
  * semantics — these are the north-star streaming extensions Spark
  * supplies; this spec pins their behavior in our session config).
  */
class StreamingWindowSpec extends SparkSuite {
  import spark.implicits._

  test("tumbling window agg with watermark drops too-late events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "kind", "value")

    val agg = events
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"kind")
      .agg(count(lit(1)).as("n"), sum($"value").as("total"))

    val q = agg.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("win_out").start()

    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

    input.addData((t(0), "a", 1.0), (t(1), "a", 2.0), (t(6), "b", 5.0))
    q.processAllAvailable()
    // advance watermark far past the first window
    input.addData((t(40), "a", 1.0))
    q.processAllAvailable()
    // this event is 40 min late — behind the watermark — must be dropped
    input.addData((t(0), "a", 100.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("win_out")
      .select(col("window.start").cast("string").as("ws"), col("kind"), col("n"), col("total"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))

    // the 10:00 window for kind=a saw exactly the two on-time events
    val firstWindowA = out.filter(x => x._1.startsWith("2024-01-01 10:00") && x._2 == "a")
    assert(firstWindowA.nonEmpty)
    assert(firstWindowA.map(_._3).max === 2L, s"late event must not inflate count: ${out.toSeq}")
    assert(firstWindowA.map(_._4).max === 3.0)
  }

  test("mapGroupsWithState: custom per-key running state across micro-batches") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]

    def update(key: String, rows: Iterator[(String, Double)],
        state: GroupState[(Long, Double)]): (String, Long, Double) = {
      val (n0, sum0) = state.getOption.getOrElse((0L, 0.0))
      val batch = rows.toSeq
      val next = (n0 + batch.size, sum0 + batch.map(_._2).sum)
      state.update(next)
      (key, next._1, next._2)
    }

    val q = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
      .toDF("user", "n", "total")
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("state_out").start()

    input.addData(("u1", 1.0), ("u1", 2.0), ("u2", 5.0))
    q.processAllAvailable()
    input.addData(("u1", 3.0)) // state must carry across batches
    q.processAllAvailable()
    q.stop()

    val last = spark.table("state_out")
      .groupBy("user").agg(max("n").as("n"), max("total").as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(last("u1") === ((3L, 6.0)), "state accumulates across micro-batches")
    assert(last("u2") === ((1L, 5.0)))
  }

  test("session_window groups by activity gaps") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    def t(min: Int, sec: Int = 0) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")
    val q = input.toDF().toDF("ts", "user")
      .withWatermark("ts", "1 minute")
      .groupBy(session_window($"ts", "2 minutes"), $"user")
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("sess_out").start()
    // two bursts separated by > 2 minutes → two sessions
    input.addData((t(0), "u"), (t(1), "u"), (t(10), "u"), (t(11), "u"))
    q.processAllAvailable()
    q.stop()
    val n = spark.table("sess_out").count()
    assert(n === 2, "gap > session timeout must split sessions")
  }

  test("stream-stream interval join with watermarks joins in-window, state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(java.sql.Timestamp, String)]
    val buys = MemoryStream[(java.sql.Timestamp, String)]

    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

    // event-time interval join: a purchase joins the user's click at
    // most 10 minutes earlier; both sides watermarked so join state is
    // evicted (the 100 TB stream posture — unbounded state is the
    // failure mode, the watermark+interval condition is what bounds it)
    val c = clicks.toDF().toDF("cts", "cuser").withWatermark("cts", "20 minutes")
    val b = buys.toDF().toDF("bts", "buser").withWatermark("bts", "20 minutes")
    val joined = c.join(b,
      expr("cuser = buser AND bts >= cts AND bts <= cts + interval 10 minutes"))

    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ssj_out").start()

    clicks.addData((t(0), "u1"), (t(2), "u2"))
    buys.addData((t(5), "u1"))   // 5 min after u1's click -> joins
    q.processAllAvailable()
    buys.addData((t(30), "u2"))  // 28 min after u2's click -> outside window
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ssj_out")
      .select(col("cuser"), col("bts").cast("string")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq === Seq(("u1", "2024-01-01 10:05:00")),
      s"only the in-window pair joins: ${rows.toSeq}")
  }
}
