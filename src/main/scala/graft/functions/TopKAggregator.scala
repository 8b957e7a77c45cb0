package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input pair for [[TopKAgg]]: rank on `v` desc, ties on `id` desc. */
case class KV(v: Long, id: Long)

/** Typed UDAF surface (the engine's `Aggregator[IN, BUF, OUT]` extension
  * point, SURVEY.md §2.8): exact per-group top-k as a BOUNDED buffer.
  *
  * Scale rationale: a window `row_number() <= k` needs every group fully
  * sorted (Spark's WindowGroupLimit prunes per partition, but the shuffle
  * still carries all surviving rows); this aggregator's partial buffers cap
  * at k entries on the MAP side, so the exchange moves at most
  * k × partitions rows per group no matter how large the group is — the
  * right trade when groups are huge and k is small. Buffer insert is
  * insertion-sort on a k-element list: O(k) per row, allocation-light.
  */
class TopKAgg(k: Int) extends Aggregator[KV, Seq[KV], Seq[KV]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Seq[KV] = Vector.empty

  private def gt(a: KV, b: KV): Boolean =
    a.v > b.v || (a.v == b.v && a.id > b.id)

  private def insert(buf: Seq[KV], a: KV): Seq[KV] =
    if (buf.size >= k && !gt(a, buf.last)) buf
    else {
      val i = buf.indexWhere(gt(a, _)) match {
        case -1 => buf.size
        case n => n
      }
      (buf.take(i) :+ a) ++ buf.drop(i).take(k - i - 1)
    }

  override def reduce(buf: Seq[KV], a: KV): Seq[KV] = insert(buf, a)

  override def merge(x: Seq[KV], y: Seq[KV]): Seq[KV] =
    y.foldLeft(x)(insert)

  override def finish(r: Seq[KV]): Seq[KV] = r

  override def bufferEncoder: Encoder[Seq[KV]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KV]]()

  override def outputEncoder: Encoder[Seq[KV]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KV]]()
}

object TopKAgg {
  /** Untyped column function: `topK(3)(col_v, col_id)` usable in any
    * DataFrame agg (and registrable for SQL via
    * `spark.udf.register("top_k3", udaf(...))`).
    */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k), Encoders.product[KV])
}
