package graft

import graft.api.GraftDb
import org.apache.spark.sql.functions._

/** The user-facing facade: a reference user's call sequence — create
  * database, bulk insert, Mango find, count, upsert (replace +
  * insert), findByIds, dump/restore — end to end on real parquet.
  */
class GraftDbSpec extends SparkSuite {
  import spark.implicits._

  test("reference-shaped lifecycle: insert, find, count, upsert, dump") {
    val db = GraftDb(spark, tmpDir("graftdb"))
    val items = db.collection("items")

    items.bulkInsert(Seq(
      ("1", "Title: Berlin Content: capital of germany", 10),
      ("2", "Title: Paris Content: capital of france", 20),
      ("3", "Title: Rome Content: capital of italy", 30)
    ).toDF("id", "body", "score"))

    assert(items.count() === 3)
    assert(items.count(Map("score" -> Map("$gte" -> 20))) === 2)

    val found = items.find(
      selector = Map("body" -> Map("$regex" -> "germany")),
      sort = Seq("score" -> "asc"), primaryKey = "id")
    assert(found.select("id").as[String].collect().toSeq === Seq("1"))

    // upsert: replace id=2, insert id=4 — last-writer-wins
    items.upsert(Seq(
      ("2", "Title: Paris Content: updated", 25),
      ("4", "Title: Madrid Content: capital of spain", 40)
    ).toDF("id", "body", "score"), "id")
    assert(items.count() === 4)
    assert(items.findByIds("id", Seq("2")).select("score").head().getInt(0) === 25)

    // upsert is idempotent (re-delivery changes nothing)
    items.upsert(Seq(("4", "Title: Madrid Content: capital of spain", 40))
      .toDF("id", "body", "score"), "id")
    assert(items.count() === 4)

    // dump / restore round-trip into a second collection
    val dump = tmpDir("dump") + "/items.json"
    items.exportJson(dump)
    val restored = GraftDb(spark, tmpDir("graftdb2")).collection("items")
    restored.importJson(dump)
    assert(restored.count() === 4)
    assert(restored.toDf.select("id").except(items.toDf.select("id")).count() === 0)
  }
}
