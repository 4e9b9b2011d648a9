package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: the bit-interleave kernel is exact, and the clustered
  * layout actually delivers the multi-column locality that makes footer
  * stats prune on either key.
  */
class LayoutSpec extends SparkSuite {

  /** Reference interleave in plain Scala. */
  private def zRef(x: Long, y: Long): Long =
    (0 until Layout.ZBits).map { i =>
      (((x >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue matches the reference bit interleave") {
    import spark.implicits._
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (20600L, 7L))
    val got = pts.toDF("x", "y")
      .withColumn("z", Layout.zValue(col("x"), col("y")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z === zRef(x, y), s"($x,$y)") }
    // interleave of all-ones is all-ones: the value range is dense
    assert(zRef(65535L, 65535L) === (1L << 32) - 1)
  }

  test("z-ordered files prune on BOTH dims; x-ordered only on x") {
    val zPath = tmpDir("zorder") + "/z"
    val xPath = tmpDir("zorder") + "/x"
    val ev = graft.core.Tables.events(spark, sf0001)
    Layout.writeZOrdered(ev, zPath, nFiles = 16)
    Layout.writeXOrdered(ev, xPath, nFiles = 16)
    // mean per-file min/max span on each dim — exactly what parquet
    // footer stats expose to the scan's file/row-group pruning
    def spans(path: String): (Double, Double) = {
      val rows = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("x") - min("x") + 1).as("sx"), (max("y") - min("y") + 1).as("sy"))
        .collect()
      (rows.map(_.getLong(1)).sum.toDouble / rows.length,
        rows.map(_.getLong(2)).sum.toDouble / rows.length)
    }
    val (zx, zy) = spans(zPath)
    val (xx, xy) = spans(xPath)
    val full = spark.read.parquet(zPath)
      .agg(max("x") - min("x") + 1, max("y") - min("y") + 1).head()
    val (fx, fy) = (full.getLong(0).toDouble, full.getLong(1).toDouble)
    info(f"per-file spans: z-order x=$zx%.1f y=$zy%.1f | x-order x=$xx%.1f y=$xy%.1f | full x=$fx%.0f y=$fy%.0f")
    // the x-ordered layout is blind on y: its files span ~the full y
    // range, so a y predicate reads everything. The z layout's boxes
    // must be at least 2x tighter on y AND still cover at most ~half
    // of x — pruning power on both dims is the whole point.
    assert(zy * 2 <= xy, s"zy=$zy xy=$xy")
    assert(zx * 2 <= fx, s"zx=$zx full x range=$fx")
  }

  test("q_z2 serves from the z-ordered copy; the box predicate prunes files on BOTH dims") {
    val df = Layout.z2ZorderServe(spark, sf0001)
    // both range predicates must reach the parquet scan — that's what
    // lets footer min/max stats skip files/row groups
    val p = df.queryExecution.executedPlan.toString()
    // (the PushedFilters printout truncates at ~100 chars, so the y upper
    // bound is asserted via the untruncated DataFilters values instead)
    assert(p.contains("GreaterThanOrEqual(x") && p.contains("LessThanOrEqual(x"), p.take(2000))
    assert(p.contains("GreaterThanOrEqual(y"), p.take(2000))
    assert(p.contains(s">= ${Layout.QyLo}") && p.contains(s"<= ${Layout.QyHi}"), p.take(2000))
    assert(df.count() > 0)
    // file-level prune power, computed from the exact stats parquet
    // footers expose: how many of the z-ordered files' (x, y) bounding
    // boxes intersect the query box at all?
    val boxes = spark.read.parquet(Layout.zPath(sf0001))
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
      .collect()
    val total = boxes.length
    val both = boxes.count(b => b.getLong(1) <= Layout.QxHi && b.getLong(2) >= Layout.QxLo &&
      b.getLong(3) <= Layout.QyHi && b.getLong(4) >= Layout.QyLo)
    val yOnly = boxes.count(b => b.getLong(3) <= Layout.QyHi && b.getLong(4) >= Layout.QyLo)
    info(s"files: $total total, $both intersect the (x,y) box, $yOnly intersect the y range")
    assert(both * 2 <= total, s"box must prune at least half the files: $both/$total")
    assert(yOnly < total, s"even the y range alone must prune some files: $yOnly/$total")
  }

  test("q_z1_zorder returns the curve head in order") {
    val got = Layout.z1Zorder(spark, sf0001).collect()
    assert(got.length === 100)
    val zs = got.map(_.getLong(3))
    assert(zs.toSeq === zs.sorted.toSeq)
  }
}
