package graft

import graft.functions.{CosineSimilarity, DotProduct, EuclideanDistance}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's Catalyst expressions as
  * SQL functions, so the surface is reachable from `spark.sql(...)` as
  * well as the Column API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  * spark.sql("SELECT euclidean_distance(a.embedding, b.embedding) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("euclidean_distance"),
      new ExpressionInfo(classOf[EuclideanDistance].getName, null, "euclidean_distance"),
      (args: Seq[Expression]) => EuclideanDistance(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, null, "cosine_similarity"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, null, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[graft.functions.SimHash32].getName, null, "simhash32"),
      (args: Seq[Expression]) => graft.functions.SimHash32(args(0))))
  }
}
