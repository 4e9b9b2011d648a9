package graft

import graft.operators.{Advanced, Relational}
import org.apache.spark.sql.functions._

/** Round-2 operator semantics that the DuckDB gate can't see:
  * HLL accuracy vs exact, bloom prefilter losslessness, salted-join ==
  * plain-join, and the exact-percentile formulation vs Spark's own
  * percentile() (same linear-interpolation definition).
  */
class AdvancedSpec extends SparkSuite {

  private val d = sf0001

  test("approx_count_distinct lands within 3x the configured 2% rsd") {
    // the serving-shape aggregate (approx-only, no exact bundled) —
    // measured against exact at 3× rsd, tighter than the oracle row's
    // 10% attestation band
    val joined = spark.read.parquet(s"$d/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select("approx_parts", "exact_parts").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
      assert(math.abs(approx - exact) / exact < 0.06,
        s"approx $approx vs exact $exact")
    }
    // and the oracle-checked attestation rows must all be true
    val attest = Relational.aggApproxDistinct(spark, d).collect()
    assert(attest.nonEmpty && attest.forall(_.getBoolean(2)),
      attest.mkString(", "))
  }

  test("bloom prefilter is lossless: bloom-pruned join == plain join") {
    val plain = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/orders.parquet")
        .filter(col("o_totalprice") > 400000).select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total"))
      .orderBy("l_returnflag")
    val bloomed = Advanced.bloomJoin(spark, d)
    assert(bloomed.collect().toSeq === plain.collect().toSeq)
  }

  test("salted skew join == plain join") {
    val ev = spark.read.parquet(s"$d/events.parquet")
    val dim = ev.groupBy("event_type").agg(count(lit(1)).as("type_total"))
    val plain = ev.join(dim, "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), max("type_total").as("type_total"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("event_type")
    assert(Advanced.skewSaltedJoin(spark, d).collect().toSeq === plain.collect().toSeq)
  }

  test("approx_percentile brackets the exact percentiles") {
    val exact = Advanced.aggPercentiles(spark, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap // p50, p95
    // the serving-shape sketch (approx-only), 5% of exact — tighter
    // than the oracle row's [p40,p60]/[p90,p99] attestation bands
    val approx = spark.read.parquet(s"$d/lineitem.parquet")
      .groupBy(col("l_returnflag").as("flag"))
      .agg(approx_percentile(col("l_extendedprice"), lit(0.5), lit(1000)).as("ap50"),
        approx_percentile(col("l_extendedprice"), lit(0.95), lit(1000)).as("ap95"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (k, (a50, a95)) =>
      val (e50, e95) = exact(k)
      assert(math.abs(a50 - e50) / e50 < 0.05, s"$k p50: $a50 vs $e50")
      assert(math.abs(a95 - e95) / e95 < 0.05, s"$k p95: $a95 vs $e95")
    }
    // and the oracle-checked attestation rows must all be true
    val attest = Advanced.aggApproxPercentile(spark, d).collect()
    assert(attest.nonEmpty && attest.forall(r => r.getBoolean(2) && r.getBoolean(3)),
      attest.mkString(", "))
  }

  test("exact percentile formulation matches Spark percentile()") {
    val ours = Advanced.aggPercentiles(spark, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val ref = spark.read.parquet(s"$d/lineitem.parquet")
      .groupBy(col("l_returnflag").as("flag"))
      .agg(percentile(col("l_extendedprice"), lit(0.25)).as("p25"),
        percentile(col("l_extendedprice"), lit(0.5)).as("p50"),
        percentile(col("l_extendedprice"), lit(0.95)).as("p95"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(ours.keySet === ref.keySet)
    ours.foreach { case (k, (a25, a50, a95)) =>
      val (b25, b50, b95) = ref(k)
      assert(math.abs(a25 - b25) < 1e-4, s"$k p25")
      assert(math.abs(a50 - b50) < 1e-4, s"$k p50")
      assert(math.abs(a95 - b95) < 1e-4, s"$k p95")
    }
  }
}
