package graft

import graft.functions.{TopKByScore, TopKRows}
import org.apache.spark.sql.functions._

/** The two custom top-k aggregates — typed Aggregator (encoder path)
  * and TypedImperativeAggregate (raw-row heap) — must produce identical
  * ranked results, including tie-breaks, on the real corpus.
  */
class TopKAggSpec extends SparkSuite {
  import spark.implicits._

  test("TypedImperativeAggregate topK == typed Aggregator top-k") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")

    val imperative = li.groupBy("l_returnflag")
      .agg(TopKRows.topK(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"), 7).as("tops"))
      .select(col("l_returnflag"), posexplode(col("tops")).as(Seq("pos", "t")))
      .select(col("l_returnflag"), col("t.score"), col("t.id1"), col("t.id2"), col("pos"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3), r.getInt(4)))
      .sortBy(x => (x._1, x._5))

    val topk = TopKByScore(7)
    val typed = li
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .as[(String, Long, Int, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._4, t._2, t._3))
      .agg(topk.toColumn)
      .collect()
      .flatMap { case (flag, tops) =>
        tops.zipWithIndex.map { case ((score, ok, ln), i) => (flag, score, ok, ln, i) }
      }
      .sortBy(x => (x._1, x._5))

    assert(imperative.toSeq === typed.toSeq)
  }

  test("heap keeps ties deterministic (score desc, id1 asc, id2 asc)") {
    val rows = Seq(
      ("g", 5.0, 3L, 1), ("g", 5.0, 1L, 2), ("g", 5.0, 1L, 1),
      ("g", 9.0, 9L, 9), ("g", 1.0, 0L, 0)).toDF("k", "s", "a", "b")
    val got = rows.groupBy("k")
      .agg(TopKRows.topK(col("s"), col("a"), col("b"), 3).as("tops"))
      .select(posexplode(col("tops")).as(Seq("pos", "t")))
      .select(col("t.score"), col("t.id1"), col("t.id2"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got === Seq((9.0, 9L, 9), (5.0, 1L, 1), (5.0, 1L, 2)))
  }
}
