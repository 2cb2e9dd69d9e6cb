package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed Aggregator — the custom-UDAF
  * extension point (SURVEY §2.11; the reference's Mapper/Reducer subclasses
  * are the moral ancestor). The buffer holds at most k values (ascending,
  * minimum first), so partial aggregation ships k longs per group per
  * partition instead of every row — the window row_number() formulation
  * this replaces shuffles ALL rows to rank them. reduce is O(k) per row
  * (k is small by construction), merge O(k²) per partition pair.
  */
case class TopKLongs(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Seq[Long] = Seq.empty

  // O(k) sorted insertion (one split + concat), not a fresh O(k log k)
  // sort per accepted row — the doc's per-row cost claim, kept honest
  private def insert(b: Seq[Long], a: Long): Seq[Long] =
    if (b.size >= k && a <= b.head) b
    else {
      val base = if (b.size < k) b else b.tail // evict the current minimum
      val (lo, hi) = base.span(_ < a)
      (lo :+ a) ++ hi
    }

  override def reduce(b: Seq[Long], a: Long): Seq[Long] = insert(b, a)

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = y.foldLeft(x)(insert)

  // largest first in the output — the shape a "top k" reader expects
  override def finish(b: Seq[Long]): Seq[Long] = b.sorted(Ordering[Long].reverse)

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
