package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wall cost of successive PREFIXES of the production d2 pipeline
  * (dev tool, opt r20): each prefix is forced through the noop sink
  * min-of-3 after one warm rep, caches dropped between reps, so the
  * deltas attribute the steady-state wall to pipeline phases.
  */
object D2PrefixProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val par = s.sparkContext.defaultParallelism

    def docs = graft.core.Tables.documents(s, d)
    def shRaw = docs.repartition(par, col("doc_id"))
      .select(col("doc_id"), Dedup.shingles(col("text")).as("gs"))
      .filter(size(col("gs")) > 0)
    def shCached = Dedup.cacheSlot("p-sh", shRaw)
    def bandsOf(sh: DataFrame) = sh.select(col("doc_id"),
      posexplode(graft.functions.TextHashKernels.minhashBands(
        col("gs"), Dedup.HashCoeffs, Dedup.HashPrime, Dedup.RowsPerBand))
        .as(Seq("band", "bh")))

    def t(name: String)(mk: => DataFrame): Unit = {
      val times = (1 to 4).map { _ =>
        Dedup.releaseSlots()
        val df = mk
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[d2p] $name%-34s min=${times.tail.min}%.3f  all=${times.map(x => f"$x%.2f").mkString(",")}")
    }

    t("scan+repart")(docs.repartition(par, col("doc_id")))
    t("shingles(noop,uncached)")(shRaw)
    t("shingles cached")(shCached)
    t("bands over cached sh")({ val sh = shCached; bandsOf(sh) })
    t("bands cached")({ val sh = shCached
      Dedup.cacheSlot("p-bands", bandsOf(sh)) })
    t("capped (capByLowestIds)")({ val sh = shCached
      val ba = Dedup.cacheSlot("p-bands", bandsOf(sh))
      Dedup.cacheSlot("p-capped",
        Dedup.capByLowestIds(ba, Seq("band", "bh"), "doc_id")) })
    // decomposition of the cap helper's cost
    t("cap:overKeys agg only")({ val sh = shCached
      val ba = Dedup.cacheSlot("p-bands", bandsOf(sh))
      ba.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") > Dedup.MaxBucket) })
    t("cap:flagged join only")({ val sh = shCached
      val ba = Dedup.cacheSlot("p-bands", bandsOf(sh))
      val overKeys = ba.groupBy(col("band"), col("bh"))
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") > Dedup.MaxBucket)
        .select(col("band"), col("bh"), lit(true).as("__over"))
      ba.join(broadcast(overKeys), Seq("band", "bh"), "left") })
    t("cap uncached (no slot)")({ val sh = shCached
      val ba = Dedup.cacheSlot("p-bands", bandsOf(sh))
      Dedup.capByLowestIds(ba, Seq("band", "bh"), "doc_id") })
    // window-form cap experiment: one exchange+sort+rank instead of
    // agg+broadcast+join+union; output rows identical, and the cache
    // comes out hash-partitioned by the self-join key
    import org.apache.spark.sql.expressions.Window
    def capWindow(all: DataFrame): DataFrame = {
      val kc = Seq(col("band"), col("bh"))
      val wOrd = Window.partitionBy(kc: _*).orderBy(col("doc_id").asc)
      val wAll = Window.partitionBy(kc: _*)
      all
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("__bmin",
          when(col("rn") > Dedup.MaxBucket, min(col("doc_id")).over(wAll)))
        .drop("rn")
    }
    t("capWindow cached")({ val sh = shCached
      val ba = Dedup.cacheSlot("p-bands", bandsOf(sh))
      Dedup.cacheSlot("p-cappedw", capWindow(ba)) })
    t("capWindow + selfjoin")({ val sh = shCached
      val ba = Dedup.cacheSlot("p-bands", bandsOf(sh))
      val m = Dedup.cacheSlot("p-cappedw", capWindow(ba))
      val b = m.filter(col("__bmin").isNull).drop("__bmin")
      b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct() })
    t("capCurrent + selfjoin")({ val sh = shCached
      val ba = Dedup.cacheSlot("p-bands", bandsOf(sh))
      val m = Dedup.cacheSlot("p-capped",
        Dedup.capByLowestIds(ba, Seq("band", "bh"), "doc_id"))
      m.as("a").join(m.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct() })
    t("full d2")(Dedup.d2MinhashLsh(s, d))
    s.stop()
  }
}
