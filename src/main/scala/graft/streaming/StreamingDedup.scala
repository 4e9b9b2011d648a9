package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Streaming ingest dedup — exactly-once row delivery on top of an
  * at-least-once transport (the change-feed re-delivery case
  * `VectorPipeline` handles idempotently for FULL batches, here at
  * per-ROW granularity: a retried producer re-sends individual events,
  * not whole files).
  *
  * Spark-native form: `dropDuplicatesWithinWatermark` over the id
  * column. The event-time watermark bounds the dedup state store — an
  * id is only remembered while a duplicate of it could still arrive
  * (within the watermark delay), so state is O(ids per watermark
  * window), not O(stream history). That bound is what makes this the
  * 100 TB-safe shape: an unbounded `dropDuplicates` on an infinite
  * stream grows state forever.
  *
  * `StreamingDedupSpec` asserts re-delivered rows are dropped across
  * micro-batches, the surviving set equals the batch distinct, and
  * the progress carries dedup state rows (proof it is the stateful
  * operator, not a rescan).
  */
object StreamingDedup {

  /** Append-mode dedup by `idCol` with state bounded by the watermark
    * on `tsCol`; surviving rows land in the in-memory table
    * `sinkTable` (at scale: any append sink, same plan).
    */
  def dedupByKey(events: DataFrame, idCol: String, tsCol: String,
      delay: String, sinkTable: String): StreamingQuery =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(idCol)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(sinkTable)
      .start()
}
