package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** RxDB Mango selector dialect → Catalyst `Column` translator.
  *
  * This is the reference's entire registered query surface (SURVEY §2.2;
  * registration at `[map]rxdb/dist/esm/rx-query-mingo.js:18-46`):
  * `$eq $ne $gt $gte $lt $lte $in $nin $and $or $not $nor $mod $regex
  * $elemMatch $size $exists $type`, plus bare-field equality
  * normalization, sort with primary-key tie-break (O2), skip and limit.
  *
  * Selectors are plain Scala maps mirroring the Mango JSON shape:
  * {{{
  * Mango.query(df,
  *   selector = Map("l_quantity" -> Map("$gt" -> 45),
  *                  "l_returnflag" -> "R"),
  *   sort = Seq("l_shipdate" -> "desc"),
  *   primaryKey = "l_orderkey", limit = Some(10))
  * }}}
  *
  * Because the output is an ordinary `Column` tree, every translated
  * query gets Catalyst's pushdown/pruning for free — the reference's
  * query-planner (index selection, `[map]query-planner.js:24-133`) has
  * no analogue here by design: parquet stats + partition pruning do the
  * same job without a planner of our own.
  */
object Mango {

  /** Translate a full Mango selector map to one boolean Column. */
  def selectorToColumn(selector: Map[String, Any]): Column =
    selector.map { case (k, v) => clause(k, v) }
      .reduceOption(_ && _).getOrElse(lit(true))

  private def clause(key: String, value: Any): Column = key match {
    // empty operand lists are match-all (Mango semantics), not a crash
    case "$and" => seqOfSelectors(value).map(selectorToColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    case "$or" => seqOfSelectors(value).map(selectorToColumn)
      .reduceOption(_ || _).getOrElse(lit(true))
    case "$nor" => !seqOfSelectors(value).map(selectorToColumn)
      .reduceOption(_ || _).getOrElse(lit(false))
    case "$not" => !selectorToColumn(asMap(value))
    case field => value match {
      case ops: Map[_, _] if ops.keys.forall(_.toString.startsWith("$")) =>
        fieldOps(col(field), asMap(ops)).reduceOption(_ && _).getOrElse(lit(true))
      case literal => col(field) === lit(literal) // bare eq normalization
    }
  }

  /** Operators applying to a single field (or array element). */
  private def fieldOps(c: Column, ops: Map[String, Any]): Seq[Column] =
    ops.toSeq.map {
      case ("$eq", v) => c === lit(v)
      case ("$ne", v) => c =!= lit(v)
      case ("$gt", v) => c > lit(v)
      case ("$gte", v) => c >= lit(v)
      case ("$lt", v) => c < lit(v)
      case ("$lte", v) => c <= lit(v)
      case ("$in", v) => c.isin(asSeq(v): _*)
      case ("$nin", v) => !c.isin(asSeq(v): _*)
      case ("$mod", v) =>
        val Seq(d, r) = asSeq(v).map(x => x.asInstanceOf[Number].longValue)
        c % d === r
      case ("$regex", v) => c.rlike(v.toString)
      case ("$size", v) => size(c) === lit(v.asInstanceOf[Number].intValue)
      case ("$elemMatch", v) =>
        exists(c, x => fieldOps(x, asMap(v)).reduceOption(_ && _).getOrElse(lit(true)))
      case ("$exists", v) =>
        if (v.asInstanceOf[Boolean]) c.isNotNull else c.isNull
      case ("$type", v) => typeCheck(c, v.toString)
      case (op, _) => throw new IllegalArgumentException(s"unsupported Mango operator $op")
    }

  /** `$type` against the column's actual Spark type via `typeof`
    * (a foldable expression — Catalyst constant-folds the comparison to
    * true/false, leaving only the null check). On a fixed schema this
    * IS the dynamic semantics: a non-null value's type is the column
    * type; a type mismatch matches nothing. Unknown type names throw
    * rather than silently matching isNotNull.
    */
  private def typeCheck(c: Column, t: String): Column = {
    val tof = call_function("typeof", c)
    t match {
      case "null" => c.isNull
      case "string" => c.isNotNull && tof === "string"
      case "boolean" => c.isNotNull && tof === "boolean"
      case "number" => c.isNotNull && (tof.isin(
        "tinyint", "smallint", "int", "bigint", "float", "double") ||
        tof.startsWith("decimal"))
      case "array" => c.isNotNull && tof.startsWith("array")
      case "object" => c.isNotNull && (tof.startsWith("struct") || tof.startsWith("map"))
      case other => throw new IllegalArgumentException(
        s"unsupported $$type name '$other' (supported: null, string, boolean, number, array, object)")
    }
  }

  /** Full query: selector + sort (+ pk tie-break, the engine invariant
    * adopted from RxDB's normalizeMangoQuery — O2) + skip + limit.
    */
  def query(df: DataFrame, selector: Map[String, Any],
      sort: Seq[(String, String)] = Nil, primaryKey: String = "",
      skip: Int = 0, limit: Option[Int] = None,
      fields: Seq[String] = Nil): DataFrame = {
    var out = df.filter(selectorToColumn(selector))
    val sortCols = sort.map { case (f, dir) =>
      if (dir.equalsIgnoreCase("desc")) col(f).desc else col(f).asc
    } ++ (if (primaryKey.nonEmpty && !sort.exists(_._1 == primaryKey))
      Seq(col(primaryKey).asc) else Nil)
    if (sortCols.nonEmpty) out = out.orderBy(sortCols: _*)
    if (skip > 0) out = out.offset(skip)
    limit.foreach(n => out = out.limit(n))
    if (fields.nonEmpty) out = out.select(fields.map(col): _*)
    out
  }

  private def asMap(v: Any): Map[String, Any] =
    v.asInstanceOf[Map[_, _]].map { case (k, x) => k.toString -> (x: Any) }
  private def seqOfSelectors(v: Any): Seq[Map[String, Any]] =
    asSeq(v).map(asMap)
  private def asSeq(v: Any): Seq[Any] = v match {
    case s: Seq[_] => s
    case a: Array[_] => a.toSeq
    case other => Seq(other)
  }
}
