package graft.text

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (document-frequency, shingle) candidate. */
final case class NgramDf(df: Long, sh: String)

/** Bounded top-k n-gram aggregation — the string-keyed analog of
  * [[graft.similarity.TopKAgg]] (SURVEY §2.10: custom `Aggregator` where
  * built-ins can't express the semantics). A per-source `row_number`
  * window would shuffle each source's ENTIRE shingle vocabulary — which
  * grows with the corpus, not with k — through one reducer per source;
  * this aggregator's state is at most k entries, so partial aggregation
  * (map-side combine) ships k rows per task per source.
  *
  * Ordering: df descending, shingle ascending tiebreak — identical to
  * the window formulation, so results are bit-for-bit interchangeable.
  */
final class TopNgramsAgg(k: Int)
  extends Aggregator[NgramDf, List[NgramDf], Seq[NgramDf]] {

  private def better(a: NgramDf, b: NgramDf): Boolean =
    a.df > b.df || (a.df == b.df && a.sh < b.sh)

  override def zero: List[NgramDf] = Nil

  /** Insert maintaining descending order, truncated to k. */
  private def insert(buf: List[NgramDf], x: NgramDf): List[NgramDf] =
    if (buf.sizeIs >= k && better(buf.last, x)) buf
    else {
      val (pre, post) = buf.span(better(_, x))
      (pre ::: x :: post).take(k)
    }

  override def reduce(buf: List[NgramDf], x: NgramDf): List[NgramDf] =
    insert(buf, x)

  override def merge(a: List[NgramDf], b: List[NgramDf]): List[NgramDf] =
    b.foldLeft(a)(insert)

  override def finish(r: List[NgramDf]): Seq[NgramDf] = r

  override def bufferEncoder: Encoder[List[NgramDf]] =
    ExpressionEncoder[List[NgramDf]]()

  override def outputEncoder: Encoder[Seq[NgramDf]] =
    ExpressionEncoder[Seq[NgramDf]]()
}
