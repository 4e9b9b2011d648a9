package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** Scratch probe: the distributed triangle count's id-ordered 3-way
  * wedge join vs the degree-ordered orientation (Suri & Vassilvitskii
  * WWW'11) on a hub-skewed graph — a mid-id hub adjacent to half the
  * node set plus a ring for closures. The id-ordered plan enumerates
  * d⁻(hub)·d⁺(hub) wedge rows at the hub (the "last reducer"); the
  * degree-ordered plan orients every hub edge INTO the hub (max
  * degree), so the hub's out-degree is 0 and the wedge intermediate
  * collapses to the ring nodes' O(1) out-pairs.
  */
object TriOrientProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 40000L
    val hub = n / 2
    // ring 0-1-2-...-n, plus hub -> every 2nd node: canonical a<b
    val und = spark.range(n)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
      .union(spark.range(0, n + 1, 2)
        .select(least(col("id"), lit(hub)).as("a"),
          greatest(col("id"), lit(hub)).as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .cache()
    println("edges=" + und.count())
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"$tag: ${(System.nanoTime() - t0) / 1e9}s"); r }

    def idOrdered(): Long = und.as("e1")
      .join(und.as("e2"), col("e1.b") === col("e2.a"))
      .join(und.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .count()

    def degOrdered(): Long = {
      val degT = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("dg")).cache()
      val lt = col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b"))
      val dir = und
        .join(degT.select(col("v").as("a"), col("dg").as("da")), "a")
        .join(degT.select(col("v").as("b"), col("dg").as("db")), "b")
        .select(
          when(lt, col("a")).otherwise(col("b")).as("src"),
          when(lt, col("b")).otherwise(col("a")).as("dst"),
          when(lt, col("db")).otherwise(col("da")).as("dd"))
        .cache()
      val c = dir.select(col("src"), col("dst").as("v"), col("dd").as("dv"))
        .join(dir.select(col("src"), col("dst").as("w"), col("dd").as("dw")), "src")
        .filter(col("dv") < col("dw") ||
          (col("dv") === col("dw") && col("v") < col("w")))
        .join(dir.select(col("src").as("v"), col("dst").as("w")),
          Seq("v", "w"), "left_semi")
        .count()
      dir.unpersist(); degT.unpersist()
      c
    }

    val tNew = time("deg_ordered#1")(degOrdered())
    val tNew2 = time("deg_ordered#2")(degOrdered())
    val tOld = time("id_ordered#1")(idOrdered())
    val tOld2 = time("id_ordered#2")(idOrdered())
    println(s"triangles new=$tNew/$tNew2 old=$tOld/$tOld2 equal=${tNew == tOld}")
    spark.stop()
  }
}
