package graft

import graft.operators.Mango
import org.apache.spark.sql.functions._

/** Mango selector translator vs equivalent direct DataFrame queries on
  * the sf0.001 tables — covers every registered operator of the
  * reference's dialect (SURVEY §2.2 P1-P12).
  */
class MangoSpec extends SparkSuite {

  private lazy val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  private def count(sel: Map[String, Any]): Long =
    li.filter(Mango.selectorToColumn(sel)).count()

  test("bare equality normalizes to $eq") {
    assert(count(Map("l_returnflag" -> "R")) ===
      li.filter(col("l_returnflag") === "R").count())
  }

  test("comparison operators") {
    assert(count(Map("l_quantity" -> Map("$gt" -> 45))) ===
      li.filter(col("l_quantity") > 45).count())
    assert(count(Map("l_quantity" -> Map("$gte" -> 45, "$lt" -> 48))) ===
      li.filter(col("l_quantity") >= 45 && col("l_quantity") < 48).count())
    assert(count(Map("l_linestatus" -> Map("$ne" -> "F"))) ===
      li.filter(col("l_linestatus") =!= "F").count())
  }

  test("$in / $nin / $mod / $regex") {
    assert(count(Map("l_returnflag" -> Map("$in" -> Seq("A", "N")))) ===
      li.filter(col("l_returnflag").isin("A", "N")).count())
    assert(count(Map("l_returnflag" -> Map("$nin" -> Seq("A", "N")))) ===
      li.filter(!col("l_returnflag").isin("A", "N")).count())
    assert(count(Map("l_orderkey" -> Map("$mod" -> Seq(7, 3)))) ===
      li.filter(col("l_orderkey") % 7 === 3).count())
    assert(count(Map("l_returnflag" -> Map("$regex" -> "^[AN]$"))) ===
      li.filter(col("l_returnflag").rlike("^[AN]$")).count())
  }

  test("boolean combinators $and/$or/$not/$nor") {
    val a = Map[String, Any]("l_returnflag" -> "R")
    val b = Map[String, Any]("l_quantity" -> Map("$gt" -> 40))
    assert(count(Map("$and" -> Seq(a, b))) ===
      li.filter(col("l_returnflag") === "R" && col("l_quantity") > 40).count())
    assert(count(Map("$or" -> Seq(a, b))) ===
      li.filter(col("l_returnflag") === "R" || col("l_quantity") > 40).count())
    assert(count(Map("$not" -> a)) ===
      li.filter(!(col("l_returnflag") === "R")).count())
    assert(count(Map("$nor" -> Seq(a, b))) ===
      li.filter(!(col("l_returnflag") === "R" || col("l_quantity") > 40)).count())
  }

  test("array operators $elemMatch / $size on embeddings") {
    val got = emb.filter(Mango.selectorToColumn(
      Map("embedding" -> Map("$elemMatch" -> Map("$gt" -> 0.28))))).count()
    assert(got === emb.filter(exists(col("embedding"), x => x > 0.28)).count())
    assert(got > 0)
    assert(emb.filter(Mango.selectorToColumn(
      Map("embedding" -> Map("$size" -> 64)))).count() === emb.count())
  }

  test("$exists") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    assert(ev.filter(Mango.selectorToColumn(
      Map("props" -> Map("$exists" -> true)))).count() === ev.count())
    assert(ev.filter(Mango.selectorToColumn(
      Map("props" -> Map("$exists" -> false)))).count() === 0L)
  }

  test("full query: sort + pk tie-break + skip + limit + projection") {
    val got = Mango.query(li,
      selector = Map("l_returnflag" -> "R"),
      sort = Seq("l_quantity" -> "desc"),
      primaryKey = "l_orderkey",
      skip = 5, limit = Some(10),
      fields = Seq("l_orderkey", "l_quantity"))
    val expect = li.filter(col("l_returnflag") === "R")
      .orderBy(col("l_quantity").desc, col("l_orderkey").asc)
      .offset(5).limit(10).select("l_orderkey", "l_quantity")
    assert(got.collect().toSeq === expect.collect().toSeq)
  }

  test("unknown operator raises") {
    intercept[IllegalArgumentException] {
      Mango.selectorToColumn(Map("x" -> Map("$bogus" -> 1)))
    }
  }

  test("$type checks the actual column type, not just non-nullness") {
    // matching type → all non-null rows; mismatched type → nothing
    assert(li.filter(Mango.selectorToColumn(
      Map("l_returnflag" -> Map("$type" -> "string")))).count() === li.count())
    assert(li.filter(Mango.selectorToColumn(
      Map("l_returnflag" -> Map("$type" -> "number")))).count() === 0L)
    assert(li.filter(Mango.selectorToColumn(
      Map("l_quantity" -> Map("$type" -> "number")))).count() === li.count())
    assert(emb.filter(Mango.selectorToColumn(
      Map("embedding" -> Map("$type" -> "array")))).count() === emb.count())
    // unsupported dynamic type names raise instead of silently matching
    intercept[IllegalArgumentException] {
      Mango.selectorToColumn(Map("x" -> Map("$type" -> "objectId")))
    }
  }
}
