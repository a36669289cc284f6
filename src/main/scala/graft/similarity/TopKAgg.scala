package graft.similarity

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored neighbor candidate. */
final case class Scored(cos: Double, id: Long)

/** A scored neighbor candidate carrying its class label. */
final case class ScoredLabel(cos: Double, id: Long, label: Long)

/** Shared ordering + bounded-insert for the top-k aggregators — ONE
  * implementation of the invariant both classes depend on, so an
  * ordering fix cannot silently miss one of them.
  */
private[similarity] object TopK {

  /** Total order matching both engines' `ORDER BY cos DESC, id` —
    * including NaN, which Spark AND DuckDB sort as GREATEST: a NaN
    * cosine (zero-norm embedding) ranks above every finite score, ties
    * among NaNs break id-ascending. Without the explicit NaN arm,
    * `>`/`==` are both false for NaN and the bounded insert becomes
    * arrival-order dependent (a NaN always prepended, evicting the true
    * best) — nondeterministic under repartitioning and divergent from
    * the window/oracle formulation. `-0.0 == 0.0` stays a tie (IEEE
    * equality, not bit order), matching both engines' comparisons.
    */
  def better(aCos: Double, aId: Long, bCos: Double, bId: Long): Boolean = {
    val an = aCos.isNaN
    val bn = bCos.isNaN
    if (an || bn) (an && !bn) || (an && bn && aId < bId)
    else aCos > bCos || (aCos == bCos && aId < bId)
  }

  /** Insert maintaining descending order, truncated to k. */
  def insert[T](buf: List[T], x: T, k: Int)(cos: T => Double,
      id: T => Long): List[T] = {
    def btr(a: T, b: T) = better(cos(a), id(a), cos(b), id(b))
    if (buf.sizeIs >= k && btr(buf.last, x)) buf
    else {
      val (pre, post) = buf.span(btr(_, x))
      (pre ::: x :: post).take(k)
    }
  }
}

/** Bounded top-k aggregation (SURVEY §2.10: custom `Aggregator` where
  * built-ins can't express the semantics). A window `row_number <= k`
  * shuffles EVERY scored row to the query's partition; this aggregator's
  * state is at most k pairs, so partial aggregation (map-side combine)
  * ships k rows per task per query — the difference between shuffling the
  * corpus and shuffling k·tasks rows at 100 TB.
  *
  * Ordering: cos descending, id ascending tiebreak, NaN greatest
  * ([[TopK.better]]) — identical to the window formulation, so results
  * are bit-for-bit interchangeable.
  */
final class TopKAgg(k: Int)
  extends Aggregator[Scored, List[Scored], Seq[Scored]] {

  override def zero: List[Scored] = Nil

  override def reduce(buf: List[Scored], x: Scored): List[Scored] =
    TopK.insert(buf, x, k)(_.cos, _.id)

  override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
    b.foldLeft(a)(TopK.insert(_, _, k)(_.cos, _.id))

  override def finish(r: List[Scored]): Seq[Scored] = r

  override def bufferEncoder: Encoder[List[Scored]] =
    ExpressionEncoder[List[Scored]]()

  override def outputEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
}

/** [[TopKAgg]] with a label payload riding along each candidate — lets
  * [[Ann.knnClassify]] vote directly from the top-k state instead of
  * joining the corpus a second time just to fetch neighbor labels (a
  * corpus-scale join saved at 100 TB). Same [[TopK]] order, same bounded
  * k-entry state per map task.
  */
final class TopKLabelAgg(k: Int)
  extends Aggregator[ScoredLabel, List[ScoredLabel], Seq[ScoredLabel]] {

  override def zero: List[ScoredLabel] = Nil

  override def reduce(buf: List[ScoredLabel], x: ScoredLabel): List[ScoredLabel] =
    TopK.insert(buf, x, k)(_.cos, _.id)

  override def merge(a: List[ScoredLabel], b: List[ScoredLabel]): List[ScoredLabel] =
    b.foldLeft(a)(TopK.insert(_, _, k)(_.cos, _.id))

  override def finish(r: List[ScoredLabel]): Seq[ScoredLabel] = r

  override def bufferEncoder: Encoder[List[ScoredLabel]] =
    ExpressionEncoder[List[ScoredLabel]]()

  override def outputEncoder: Encoder[Seq[ScoredLabel]] =
    ExpressionEncoder[Seq[ScoredLabel]]()
}
