package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.promql.{Compiler, EvalParams, Expr, Parser, PromSource,
  Selector, FuncCall, LabelCall, Subquery, Agg, BinOp}
import graft.tsdb.{Matcher, MatchEq, Matchers, MutableMapping, MutableProvider}

/** The reference's per-request wrapper chain (§3.1:
  * `Store.ContextFromRequest` builds filteringIndex → limitingIndex →
  * limitingReader around every query, `api/promql/queryable.go:122-249`)
  * re-expressed as a front-end phase over the PromQL compiler:
  *
  *  - tenant header → an equality matcher on the tenant label injected
  *    into EVERY selector of the AST (F11, `queryable.go:153-166`);
  *  - forced matcher header → same injection (F10, prepended so user
  *    matchers cannot shadow it, `filtering_index.go:31-80`);
  *  - mutable-label rewrite applied per selector BEFORE plan construction
  *    (M1), so Catalyst only ever sees real-column predicates;
  *  - series limit (F13) enforced lazily inside the plan: a global result
  *    count guard raising once the selected series exceed the cap — the
  *    analogue of `limiting_index.go:48-64`'s abort, with no extra action.
  *
  * Everything composes by AST rewrite + plan wrap; compilation still runs
  * zero Spark jobs.
  */
final case class RequestOptions(
    tenantLabel: Option[(String, String)] = None, // (label name, value)
    forced: Seq[Matcher] = Nil,
    mutable: Seq[MutableMapping] = Nil,
    maxSeries: Option[Long] = None)

object QueryService {

  def queryRange(promql: String, src: PromSource, p: EvalParams,
      opts: RequestOptions = RequestOptions()): DataFrame = {
    val ast = rewrite(Parser.parse(promql), opts)
    val df = Compiler.compile(ast, src, p)
    opts.maxSeries match {
      case Some(n) => withSeriesLimit(df, src.labelCols, n)
      case None => df
    }
  }

  /** Inject tenant + forced matchers into every selector and apply the
    * mutable-label rewrite — the whole wrapper chain is one AST pass.
    */
  def rewrite(e: Expr, opts: RequestOptions): Expr = {
    val injected: Seq[Matcher] =
      opts.tenantLabel.map { case (l, v) => MatchEq(l, v) }.toSeq ++
        opts.forced
    def go(e: Expr): Expr = e match {
      case s: Selector =>
        val rewritten = MutableProvider.rewriteAll(s.matchers, opts.mutable)
        s.copy(matchers = Matchers.withForced(rewritten, injected))
      case FuncCall(fn, a, ps) => FuncCall(fn, go(a), ps)
      case LabelCall(fn, a, ss) => LabelCall(fn, go(a), ss)
      case Subquery(b, r, st, off) => Subquery(go(b), r, st, off)
      case a: Agg => a.copy(body = go(a.body))
      case b: BinOp => b.copy(lhs = go(b.lhs), rhs = go(b.rhs))
      case other => other
    }
    go(e)
  }

  /** F13 as a lazy plan guard: count the distinct series of the result
    * (result-sized, not points-sized) and raise when over the cap. The
    * count is a scalar subquery-style cross join, evaluated once.
    */
  private def withSeriesLimit(df: DataFrame, labels: Seq[String],
      n: Long): DataFrame = {
    val present = labels.filter(df.columns.contains)
    if (present.isEmpty) return df
    val cnt = df.select(present.map(col): _*).distinct()
      .agg(count(lit(1)).as("__n_series"))
    df.crossJoin(broadcast(cnt))
      .withColumn("value",
        when(col("__n_series") > n, raise_error(concat(
          lit(s"query selected more than $n series ("),
          col("__n_series"), lit(")"))).cast("double"))
          .otherwise(col("value")))
      .drop("__n_series")
  }
}
