package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the executed plan of one SparkEntry query (dev tool). */
object DebugExplain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_d2_dedup_minhash_lsh")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(s, d)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    println("=== scans: " + "FileScan parquet".r.findAllIn(p).size +
      "  exchanges: " + "Exchange ".r.findAllIn(p).size +
      "  reused: " + "ReusedExchange".r.findAllIn(p).size +
      "  aqeShuffleReads: " + "AQEShuffleRead".r.findAllIn(p).size)
    println(p.take(8000))
    s.stop()
  }
}
