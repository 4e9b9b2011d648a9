package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke the driver contract exactly as the driver does (dev tool). */
object DebugEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.SparkEntry.entry(spark).count()
    println(s"[entry] rows=$rows queries=${graft.SparkEntry.queries.size} oracles=${graft.SparkEntry.oracleSql.size}")
    spark.stop()
  }
}
