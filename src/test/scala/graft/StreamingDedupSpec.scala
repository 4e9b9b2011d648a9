package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** Per-row exactly-once ingest: re-delivered event ids must be dropped
  * across micro-batches, with the dedup state bounded by the watermark
  * (the at-least-once transport case of SURVEY §2.9).
  */
class StreamingDedupSpec extends SparkSuite {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("re-delivered ids dropped across micro-batches; state is the dedup operator") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val q = StreamingDedup.dedupByKey(
      input.toDF().toDF("event_id", "ts", "value"),
      "event_id", "ts", "10 minutes", "dedup_sink")

    // wave 1: three fresh rows
    input.addData((1L, ts(0), 1.0), (2L, ts(1), 2.0), (3L, ts(2), 3.0))
    q.processAllAvailable()
    // wave 2: producer retry re-sends 2 and 3 (same ids, same payload)
    // alongside a fresh 4
    input.addData((2L, ts(1), 2.0), (3L, ts(2), 3.0), (4L, ts(3), 4.0))
    q.processAllAvailable()
    // wave 3: a late retry of 1, plus fresh 5
    input.addData((1L, ts(0), 1.0), (5L, ts(4), 5.0))
    q.processAllAvailable()

    val got = spark.table("dedup_sink")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq
    assert(got === Seq(1L -> 1.0, 2L -> 2.0, 3L -> 3.0, 4L -> 4.0, 5L -> 5.0),
      "each id must be delivered exactly once despite re-sends")

    // stateful dedup, not a rescan: the state store remembers ids still
    // inside the watermark window
    val state = q.lastProgress.stateOperators
    assert(state.nonEmpty && state.head.numRowsTotal > 0,
      "expected dedup state rows within the watermark window")
    q.stop()
  }
}
