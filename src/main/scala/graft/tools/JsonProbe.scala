package graft.tools

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** JSON access-path probe (dev tool): get_json_object vs from_json
  * vs Spark 4 variant (parse_json + variant_get) on the events.props
  * column — which path should the JSON queries use at scale?
  */
object JsonProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = Tables.events(spark, d)
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      // warm once, then 3 timed runs
      mk.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-22s ${ts.min}%6.2f s (min of 3)")
    }

    time("get_json_object") {
      ev.select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
    }
    time("from_json struct") {
      ev.select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).getField("k").as("k"))
    }
    time("variant_get") {
      ev.select(col("event_id"),
        try_variant_get(parse_json(col("props")), "$.k", "bigint").as("k"))
    }
    spark.stop()
  }
}
