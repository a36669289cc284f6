package graft.similarity

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored neighbor candidate. */
final case class Scored(cos: Double, id: Long)

/** Bounded top-k aggregation (SURVEY §2.10: custom `Aggregator` where
  * built-ins can't express the semantics). A window `row_number <= k`
  * shuffles EVERY scored row to the query's partition; this aggregator's
  * state is at most k pairs, so partial aggregation (map-side combine)
  * ships k rows per task per query — the difference between shuffling the
  * corpus and shuffling k·tasks rows at 100 TB.
  *
  * Ordering: cos descending, id ascending tiebreak — identical to the
  * window formulation, so results are bit-for-bit interchangeable.
  */
final class TopKAgg(k: Int)
  extends Aggregator[Scored, List[Scored], Seq[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.cos > b.cos || (a.cos == b.cos && a.id < b.id)

  override def zero: List[Scored] = Nil

  /** Insert maintaining descending order, truncated to k. */
  private def insert(buf: List[Scored], x: Scored): List[Scored] =
    if (buf.sizeIs >= k && better(buf.last, x)) buf
    else {
      val (pre, post) = buf.span(better(_, x))
      (pre ::: x :: post).take(k)
    }

  override def reduce(buf: List[Scored], x: Scored): List[Scored] =
    insert(buf, x)

  override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
    b.foldLeft(a)(insert)

  override def finish(r: List[Scored]): Seq[Scored] = r

  override def bufferEncoder: Encoder[List[Scored]] =
    ExpressionEncoder[List[Scored]]()

  override def outputEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
}

/** A scored neighbor candidate carrying its class label. */
final case class ScoredLabel(cos: Double, id: Long, label: Long)

/** [[TopKAgg]] with a label payload riding along each candidate — lets
  * [[Ann.knnClassify]] vote directly from the top-k state instead of
  * joining the corpus a second time just to fetch neighbor labels (a
  * corpus-scale join saved at 100 TB). Same (cos desc, id asc) order,
  * same bounded k-entry state per map task.
  */
final class TopKLabelAgg(k: Int)
  extends Aggregator[ScoredLabel, List[ScoredLabel], Seq[ScoredLabel]] {

  private def better(a: ScoredLabel, b: ScoredLabel): Boolean =
    a.cos > b.cos || (a.cos == b.cos && a.id < b.id)

  override def zero: List[ScoredLabel] = Nil

  private def insert(buf: List[ScoredLabel], x: ScoredLabel): List[ScoredLabel] =
    if (buf.sizeIs >= k && better(buf.last, x)) buf
    else {
      val (pre, post) = buf.span(better(_, x))
      (pre ::: x :: post).take(k)
    }

  override def reduce(buf: List[ScoredLabel], x: ScoredLabel): List[ScoredLabel] =
    insert(buf, x)

  override def merge(a: List[ScoredLabel], b: List[ScoredLabel]): List[ScoredLabel] =
    b.foldLeft(a)(insert)

  override def finish(r: List[ScoredLabel]): Seq[ScoredLabel] = r

  override def bufferEncoder: Encoder[List[ScoredLabel]] =
    ExpressionEncoder[List[ScoredLabel]]()

  override def outputEncoder: Encoder[Seq[ScoredLabel]] =
    ExpressionEncoder[Seq[ScoredLabel]]()
}
