package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time stream-stream joins — the one north-star streaming hole
  * the r7 verdict left open. The reference has no event-time semantics
  * at all (its change feed is arrival-ordered, SURVEY §2.9); this is
  * the Spark-native extension a production pipeline needs the moment
  * two event streams must correlate: impressions ⋈ clicks, request ⋈
  * response, document-ingested ⋈ embedding-computed.
  *
  * The 100 TB-scale contract is entirely about STATE EVICTION: an
  * unbounded stream-stream join buffers both sides forever. Bounding it
  * needs (a) a watermark on EACH side and (b) a time-range join
  * condition, so Spark can prove when a buffered row can no longer
  * match and drop it (the standard watermark + interval-condition
  * eviction reasoning in Structured Streaming). Without (b), state
  * grows with the stream and the job dies by memory, not by logic.
  */
object StreamJoin {

  /** Inner event-time join of two keyed streams where the right event
    * must occur within `[0, maxDelay]` AFTER the matching left event —
    * the attribution shape (left = cause, right = effect).
    *
    * Inputs: `left(key, leftTs, ...)`, `right(key, rightTs, ...)`.
    * Both sides get `delayThreshold` watermarks; the join condition
    * carries the interval bound that lets the state store evict:
    * a left row is droppable once the right watermark passes
    * `leftTs + maxDelay`, a right row once the left watermark passes
    * its `rightTs`.
    */
  def within(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      delayThreshold: String, maxDelay: String): DataFrame = {
    val l = left.withWatermark(leftTs, delayThreshold)
    val r = right.withWatermark(rightTs, delayThreshold)
      .withColumnRenamed(key, s"${key}_r")
    l.join(r, expr(
      s"""$key = ${key}_r AND
         |$rightTs >= $leftTs AND
         |$rightTs <= $leftTs + interval $maxDelay""".stripMargin))
      .drop(s"${key}_r")
  }
}
