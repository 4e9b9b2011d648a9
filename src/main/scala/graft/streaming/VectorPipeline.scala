package graft.streaming

import graft.embed.Embedder
import graft.index.IndexBuild
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental index maintenance — the Spark-native form of the
  * reference's RxDB pipeline plugin (SURVEY §2.9):
  *
  *  - T1 pipeline definition  → `readStream → foreachBatch`
  *  - T2 checkpointing        → `checkpointLocation` (offsets/commits)
  *  - T3 at-least-once + idempotent handler → anti-join-then-append
  *    (IndexBuild.appendNewDocuments) = effectively-once
  *  - T4 trigger loop         → micro-batch triggers
  *  - T5 awaitIdle            → `Trigger.AvailableNow` + awaitTermination
  *    (drain everything available, then stop)
  *  - T6 read barrier         → job sequencing: run() returns only after
  *    the drain completes, so downstream reads see all derived rows
  *  - T7 leader election      → dissolved: Spark enforces one writer per
  *    checkpoint dir
  *
  * Source is a JSON directory of `{id, body}` documents (the reference's
  * items.json shape); each micro-batch embeds and indexes only ids not
  * yet present in the destination.
  */
class VectorPipeline(
    spark: SparkSession,
    sourceDir: String,
    destPath: String,
    checkpointDir: String,
    embedder: Embedder,
    pivots: Seq[Seq[Float]],
    maxFilesPerTrigger: Int = 4) {

  import org.apache.spark.sql.types._
  val itemsSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("body", StringType, nullable = false)))

  /** Pipeline control-plane state — the reference's RxState record
    * (`src/database.ts:120-133`): `importDone` flips true after the
    * first successful drain, and consumers can gate reads on it
    * explicitly instead of relying on call ordering alone.
    */
  val state = new RxState(spark, destPath + "_state")

  /** True once at least one drain has completed (persisted; a new
    * pipeline instance over the same destination sees it).
    */
  def importDone: Boolean = state.getBoolean("importDone")

  /** Drain all currently-available source files through the incremental
    * index build, then return (awaitIdle semantics). Returns rows
    * appended across batches.
    */
  def runAvailableNow(): Long = {
    val appended = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream
      .schema(itemsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(sourceDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val n = IndexBuild.appendNewDocuments(
          spark, batch, "id", "body", embedder, pivots, destPath)
        appended.addAndGet(n)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    state.setBoolean("importDone", true)
    appended.get()
  }

  /** Current destination state (read-your-derived-writes is guaranteed
    * by calling this only after runAvailableNow returns).
    */
  def destination(): DataFrame = spark.read.parquet(destPath)

  /** Destination gated on the persisted importDone flag — the
    * reference's read-barrier usage of RxState.
    */
  def destinationWhenReady(): DataFrame = {
    require(importDone, s"importDone is false for $destPath — run the pipeline first")
    destination()
  }
}
