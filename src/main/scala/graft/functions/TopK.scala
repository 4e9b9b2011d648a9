package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Bounded per-group top-k as a typed `Aggregator` — the custom
  * aggregate sketched in SURVEY §2.4/§4.2: a window-function top-k
  * (`row_number() <= k`) must shuffle every row to its group's
  * partition; this aggregator keeps a k-bounded buffer per group on the
  * map side, so only k rows per key per partition reach the exchange.
  * At 100 TB that's the difference between shuffling the table and
  * shuffling k·|keys| rows.
  *
  * Ordering: score DESC, then (id1 ASC, id2 ASC) for deterministic
  * tie-breaks (the engine-wide O2 invariant).
  *
  * Input rows are (score, id1, id2) tuples; output is the sorted top-k
  * list. Buffers stay small (k elements), merge is k-way bounded.
  */
case class TopKByScore(k: Int)
    extends Aggregator[(Double, Long, Int), Seq[(Double, Long, Int)], Seq[(Double, Long, Int)]] {

  private val ord: Ordering[(Double, Long, Int)] =
    Ordering.by { case (score, id1, id2) => (-score, id1, id2) }

  override def zero: Seq[(Double, Long, Int)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long, Int)],
      row: (Double, Long, Int)): Seq[(Double, Long, Int)] = {
    if (buf.size < k) (buf :+ row).sorted(ord)
    else if (ord.lt(row, buf.last)) (buf.init :+ row).sorted(ord)
    else buf
  }

  override def merge(a: Seq[(Double, Long, Int)],
      b: Seq[(Double, Long, Int)]): Seq[(Double, Long, Int)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Double, Long, Int)]): Seq[(Double, Long, Int)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long, Int)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long, Int)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long, Int)]] = bufferEncoder
}
