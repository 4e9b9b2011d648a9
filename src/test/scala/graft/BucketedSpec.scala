package graft

import graft.core.Tables
import graft.operators.Bucketed
import org.apache.spark.sql.functions._

/** Bucketed co-located join: the layout is invisible to the logical
  * result AND the join plans with zero exchanges — both halves of the
  * bucketing contract.
  */
class BucketedSpec extends SparkSuite {

  test("co-located join: no exchange on either side, sort-merge on buckets") {
    // at sf0.001 Catalyst correctly broadcasts the small side instead —
    // disable broadcast to surface the plan both sides get at 100 TB,
    // where neither fact table fits an executor
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Bucketed.bucketedJoinRows(spark, sf0001)
      df.collect() // finalize the AQE plan before inspecting it
      val full = df.queryExecution.executedPlan.toString()
      val p = full.split("== Initial Plan ==").head
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$p")
      // both scans must actually select buckets, not fall back to a
      // plain file scan of the external path
      assert("SelectedBucketsCount".r.findAllIn(p).size === 2, p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed aggregate equals the same aggregate over raw parquet") {
    val bucketed = Bucketed.j6BucketedJoin(spark, sf0001).collect()
    val raw = Tables.orders(spark, sf0001)
      .join(Tables.lineitem(spark, sf0001),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        countDistinct("o_orderkey").as("n_orders"),
        round(sum("l_quantity"), 2).as("qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("o_orderpriority")
      .collect()
    assert(bucketed.toSeq === raw.toSeq)
    assert(bucketed.nonEmpty)
  }

  test("one file per bucket (the repartition-before-write layout holds)") {
    val (oT, _) = Bucketed.ensureBucketed(spark, sf0001)
    val loc = spark.sql(s"DESCRIBE FORMATTED $oT").collect()
      .find(_.getString(0) == "Location").get.getString(1)
    val dir = new java.io.File(new java.net.URI(loc))
    val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length === Bucketed.NBuckets,
      s"expected ${Bucketed.NBuckets} bucket files, got ${files.length}")
  }
}
