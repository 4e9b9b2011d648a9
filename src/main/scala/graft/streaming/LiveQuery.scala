package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** T8: reactive live queries — the last SURVEY §2.9 row.
  *
  * The reference maintains registered query results incrementally via
  * event-reduce (`[map]rxdb/dist/esm/rx-query.js:452-460`): when a
  * change event arrives, the cached result set is UPDATED from the
  * event alone — the query is not re-run against the store.
  *
  * The Spark-native analogue is a Structured Streaming stateful
  * aggregation: each micro-batch folds only its new rows into the
  * aggregation state store (partial aggregation against persisted
  * state), and the sink always exposes the current full result. No
  * micro-batch ever rescans history — the same asymptotics as
  * event-reduce, with the state store playing the role of the cached
  * result set. `LiveQuerySpec` asserts the maintained result equals a
  * from-scratch batch recompute after every wave, and that the plan
  * carries stateful-operator progress (proof it is incremental).
  */
object LiveQuery {

  /** Maintain `count(*) + sum(valueCol) GROUP BY keyCol` incrementally
    * over an append stream; the full current result is readable at any
    * time from the in-memory table `sinkTable` (at scale: a Delta/
    * parquet sink in Update mode keyed by `keyCol`, same plan).
    */
  def liveGroupAgg(events: DataFrame, keyCol: String, valueCol: String,
      sinkTable: String): StreamingQuery =
    events.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(sinkTable)
      .start()
}
