package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
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
  *
  * Column hygiene: EVERY right-side column is suffixed `_r` before the
  * join condition is built, so two streams that share names — both
  * calling their event time `ts`, or carrying common payload columns —
  * can never make the condition ambiguous (or silently resolve both
  * references to one side). After the join, right columns whose bare
  * name does not collide with a surviving left column get their
  * original name back, so the common disjoint-name case keeps its
  * natural output schema.
  */
object StreamJoin {

  /** Watermarked, suffix-disambiguated sides + the interval condition
    * shared by the inner and left-outer variants.
    */
  private def prepared(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      delayThreshold: String, maxDelay: String): (DataFrame, DataFrame, Column) = {
    // the suffix is reserved on BOTH sides: a left column ending in _r
    // would be indistinguishable from a suffixed right column in the
    // joined output (restore() would rename it — or collide it with a
    // genuinely suffixed right column of the same stripped name)
    require(!left.columns.exists(_.endsWith("_r")),
      "left-side columns may not end in _r (suffix reserved)")
    val l = left.withWatermark(leftTs, delayThreshold)
    val r0 = right.withWatermark(rightTs, delayThreshold)
    require(!r0.columns.exists(_.endsWith("_r")),
      "right-side columns may not already end in _r (suffix reserved)")
    val r = r0.columns.foldLeft(r0)((df, c) => df.withColumnRenamed(c, c + "_r"))
    val cond = col(key) === col(s"${key}_r") &&
      col(s"${rightTs}_r") >= col(leftTs) &&
      col(s"${rightTs}_r") <= col(leftTs) + expr(s"interval $maxDelay")
    (l, r, cond)
  }

  /** Restore right columns' bare names where they do not collide with a
    * left column (the joined key column is dropped outright: it equals
    * the left key on matches and is null on outer non-matches).
    */
  private def restore(joined: DataFrame, left: DataFrame, key: String): DataFrame = {
    val leftCols = left.columns.toSet
    val base = joined.drop(s"${key}_r")
    base.columns.foldLeft(base) {
      case (df, c) if c.endsWith("_r") && !leftCols.contains(c.stripSuffix("_r")) =>
        df.withColumnRenamed(c, c.stripSuffix("_r"))
      case (df, _) => df
    }
  }

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
    val (l, r, cond) = prepared(left, right, key, leftTs, rightTs,
      delayThreshold, maxDelay)
    restore(l.join(r, cond), left, key)
  }

  /** Left-outer variant of [[within]] — the "impression that never
    * clicked" shape: every left row is emitted exactly once, either
    * joined to its in-window right match or with null right columns
    * ONCE the watermark proves no match can still arrive (Spark emits
    * outer results only at state eviction time — the same bound that
    * keeps state finite also makes the null verdict safe to emit).
    * Same watermarks, same interval condition, same eviction
    * arithmetic as the inner form.
    */
  def leftOuterWithin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      delayThreshold: String, maxDelay: String): DataFrame = {
    val (l, r, cond) = prepared(left, right, key, leftTs, rightTs,
      delayThreshold, maxDelay)
    restore(l.join(r, cond, "left_outer"), left, key)
  }

  /** Full-outer variant of [[within]] — the reconciliation shape
    * (ledger ⋈ ledger, sent ⋈ acked): unmatched rows surface from BOTH
    * sides, each exactly once, with the other side's columns null,
    * once its own state eviction proves no in-window partner can still
    * arrive. The symmetric contract composes the two one-sided
    * guarantees: a lone left row emits when the right watermark passes
    * `leftTs + maxDelay`, a lone right row when the left watermark
    * passes its `rightTs`. Same watermarks, same interval condition —
    * state stays exactly as bounded as the inner form; only the
    * emit-at-eviction behavior is added, on both sides.
    */
  def fullOuterWithin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      delayThreshold: String, maxDelay: String): DataFrame = {
    val (l, r, cond) = prepared(left, right, key, leftTs, rightTs,
      delayThreshold, maxDelay)
    // unlike the one-sided variants, a right-only row carries its key
    // ONLY in the suffixed column — coalesce before restore() drops it
    val joined = l.join(r, cond, "full_outer")
      .withColumn(key, coalesce(col(key), col(s"${key}_r")))
    restore(joined, left, key)
  }
}
