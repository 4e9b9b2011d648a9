package graft

import graft.streaming.LiveQuery
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** T8 event-reduce analogue: a live grouped aggregation maintained
  * incrementally across micro-batches must equal a from-scratch batch
  * recompute after EVERY wave (`[map]rxdb/dist/esm/rx-query.js:452-460`
  * semantics: results updated from change events, never by re-running
  * the query).
  */
class LiveQuerySpec extends SparkSuite {
  import spark.implicits._

  test("live aggregation == batch recompute after every wave; state is incremental") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val q = LiveQuery.liveGroupAgg(input.toDF().toDF("k", "v"), "k", "v", "live_t8")

    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val waves = Seq(
      Seq("a" -> 1L, "a" -> 2L, "b" -> 10L),
      Seq("b" -> 5L, "c" -> 7L),
      Seq("a" -> 100L, "c" -> 1L, "c" -> 2L))

    for (wave <- waves) {
      input.addData(wave: _*)
      q.processAllAvailable()
      seen ++= wave
      val live = spark.table("live_t8")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val batch = seen.toSeq.toDF("k", "v")
        .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("total"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(live === batch, s"live result diverged from batch recompute after ${seen.size} events")
    }

    // the maintenance must be STATEFUL (incremental fold into the state
    // store), not a per-batch rescan — the progress carries a stateful
    // operator with persisted rows
    val state = q.lastProgress.stateOperators
    assert(state.nonEmpty && state.head.numRowsTotal === 3,
      "expected a stateful aggregation carrying one state row per group")
    q.stop()
  }
}
