package graft

import graft.operators.Indexed
import org.apache.spark.sql.functions._

/** The v19 recall/cost grid is the tuning audit for the stored-index
  * family: every variant must clear a recall floor at its configured
  * NProbe/PqTopN, and its scan cost must actually be sub-corpus
  * (otherwise the "index" is a full scan in disguise).
  */
class RecallGridSpec extends SparkSuite {

  test("every stored-index variant clears the recall floor at sub-corpus cost") {
    val grid = Indexed.v19RecallGrid(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(grid.length === 6)
    val n = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    // Per-variant floors pinned AT the measured sf0.001 operating
    // points (the serving plans are deterministic, so these are exact
    // today): any downward recall drift fails CI instead of aging in a
    // doc. The larger-corpus operating points (sf0.01: 8-10/10) are
    // committed in ARCHITECTURE.md "Stored-index operating points".
    val floors = Map(
      "v10_ivf" -> 5L, "v12_pq_adc" -> 6L, "v13_sq8" -> 10L,
      "v14_ivfpq" -> 5L, "v16_filtered" -> 10L, "v18_ivfadc" -> 5L)
    for ((variant, codeReads, docReads, recall) <- grid) {
      assert(recall >= floors(variant),
        s"$variant recall@10 $recall below measured floor ${floors(variant)}")
      assert(docReads > 0 && docReads < n,
        s"$variant re-ranks $docReads of $n floats — not an index")
      assert(codeReads > 0, s"$variant scanned no stored codes")
    }
    // the exhaustive-scan variants (v12/v13) read every code row but
    // cap the float re-rank; the probed variants prune the code scan too
    val probed = grid.filter(g => Set("v10_ivf", "v14_ivfpq", "v16_filtered",
      "v18_ivfadc").contains(g._1))
    assert(probed.forall(_._2 < n),
      s"probed variants must scan fewer than all $n code rows")
  }

  test("timed mode: per-leg walls plus job/task split, same rows as untimed") {
    val untimed = Indexed.v19RecallGrid(spark, sf0001).collect().map(_.toString).sorted
    spark.conf.set("graft.v19.timings", "true")
    try {
      val timed = Indexed.v19RecallGrid(spark, sf0001).collect().map(_.toString).sorted
      assert(timed.toSeq === untimed.toSeq,
        "timed instrumentation must not change the query result")
      val walls = Indexed.lastV19Timings
      val legs = Seq("baseline", "v10_ivf", "v12_pq_adc", "v13_sq8",
        "v14_ivfpq", "v16_filtered", "v18_ivfadc")
      for (l <- legs) assert(walls.contains(l), s"missing wall for leg $l")
      // every leg runs at least one Spark job, so the job-group
      // listener must have attributed job wall AND task run time to it
      // (the queue-vs-run split the concurrent walls alone can't give)
      for (l <- legs) {
        assert(walls.contains(l + "_job"), s"missing _job split for $l")
        assert(walls.contains(l + "_task"), s"missing _task split for $l")
        assert(walls(l + "_task") >= 0.0)
      }
    } finally spark.conf.set("graft.v19.timings", "false")
  }
}
