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
}
