package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Durable key-value state — the reference's RxState
  * (`/root/reference/src/database.ts:120-133`: a reactive
  * `{importDone: boolean}` record gating reads on import completion).
  *
  * Spark-native form: an append-only parquet log of
  * `(key, value, seq)` rows; the current value of a key is its
  * highest-seq row (last-write-wins). Appends are tiny single-row
  * files — state here is control-plane metadata (flags, watermarks,
  * import gates), not data-plane rows, so the log stays in the dozens
  * of rows and a read is one small scan + max-per-key.
  */
class RxState(spark: SparkSession, path: String) {

  /** Last-write-wins set. The seq is max(stored)+1, read from the log
    * itself — robust across JVM restarts and host reboots (a clock- or
    * nanoTime-derived seq can go backwards and make a newer write lose).
    * State is single-writer control-plane metadata (the pipeline owns
    * its own state table), so the read-increment-append needs no
    * cross-process lock.
    */
  def set(key: String, value: String): Unit = synchronized {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // only a MISSING log means "start at seq 0" — a genuine read failure
    // must propagate, or the fresh write would silently lose
    // last-write-wins to existing higher-seq rows
    val nextSeq = readLog() match {
      case Some(df) => df.agg(coalesce(max("seq"), lit(0L))).head().getLong(0) + 1L
      case None => 1L
    }
    Seq((key, value, nextSeq))
      .toDF("key", "value", "seq")
      .coalesce(1).write.mode(SaveMode.Append).parquet(path)
  }

  def setBoolean(key: String, value: Boolean): Unit = set(key, value.toString)

  /** The state log, or None when no state has ever been written
    * (PATH_NOT_FOUND). Any other read failure propagates.
    */
  private def readLog(): Option[DataFrame] =
    graft.core.Util.readParquetIfExists(spark, path)

  /** Current value of every key (latest seq wins). */
  def all(): Map[String, String] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = readLog().getOrElse(return Map.empty)
    df.withColumn("rn", row_number().over(
        Window.partitionBy("key").orderBy(col("seq").desc)))
      .filter(col("rn") === 1)
      .select("key", "value")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  def get(key: String): Option[String] = all().get(key)

  def getBoolean(key: String, default: Boolean = false): Boolean =
    get(key).map(_.toBoolean).getOrElse(default)
}
