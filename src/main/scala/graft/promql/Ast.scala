package graft.promql

import graft.tsdb.Matcher

/** PromQL AST for the supported grammar subset (SURVEY §7.1 layer 6):
  *
  * {{{
  * expr     := binary
  * binary   := unary (op modifiers unary)*
  *             op ∈ + - * / == != > < >= <= and or unless
  *             (precedence: or < and/unless < comparisons < +- < * /)
  * modifiers:= [on(l,…) | ignoring(l,…)] [group_left]
  * unary    := number | '(' expr ')' | agg | func | selector
  * agg      := (sum|avg|min|max|count|topk|quantile)
  *             [by(l,…)|without(l,…)] '(' [param ','] expr ')'
  * func     := (rate|increase|delta|avg_over_time|min_over_time|
  *              max_over_time|sum_over_time|count_over_time|last_over_time)
  *             '(' selector '[' duration ']' ')'
  * selector := name? '{' matcher (',' matcher)* '}' ['[' duration ']']
  *             ['offset' duration]
  * matcher  := label (= | != | =~ | !~) quoted-string
  * }}}
  *
  * The reference gets this grammar from the embedded Prometheus engine
  * (`api/promql/engine.go:27`); this front-end re-expresses it so the
  * compiler can emit DataFrame plans.
  */
sealed trait Expr

final case class NumLit(v: Double) extends Expr

/** `name` compiles to a matcher on the reserved `__name__` label.
  * `atMs` is the `@` modifier: evaluation pinned to a fixed timestamp,
  * the result replicated across every output step (W5 sibling).
  */
final case class Selector(
    name: Option[String],
    matchers: Seq[Matcher],
    rangeMs: Option[Long],
    offsetMs: Long,
    atMs: Option[Long] = None) extends Expr

object Selector {
  /** Sentinels for `@ start()` / `@ end()` — resolved against the query
    * range at compile time (no real evaluation timestamp collides with
    * them).
    */
  val AtStart: Long = Long.MinValue
  val AtEnd: Long = Long.MaxValue
}

/** Range functions take a range selector (plus trailing scalar params for
  * predict_linear / holt_winters); math functions and `absent` take any
  * vector expression.
  */
final case class FuncCall(fn: String, arg: Expr,
    params: Seq[Double] = Nil) extends Expr

/** label_replace / label_join: string-typed arguments. */
final case class LabelCall(fn: String, arg: Expr,
    strArgs: Seq[String]) extends Expr

/** `info(v[, {data-label-selector}])` — Prometheus 3.x experimental:
  * decorate each sample of `v` with the data labels of the matching
  * `target_info` series (identifying labels: instance, job). The
  * optional selector restricts/retargets which info series match and
  * which data labels are copied. `dataNames` — the USER-written
  * non-__name__ matcher names, pinned at parse time so the per-request
  * wrapper chain can inject tenant/forced matchers into `sel` without
  * widening the copied-label set.
  */
final case class InfoCall(arg: Expr, sel: Option[Selector],
    dataNames: Seq[String] = Nil) extends Expr

/** `expr[range:step]` — the inner expression evaluated on its own step
  * grid, consumed by a range function as a derived series (W6). `offsetMs`
  * shifts the whole subquery window (`x[5m:10s] offset 5m`).
  */
final case class Subquery(body: Expr, rangeMs: Long, stepMs: Long,
    offsetMs: Long = 0L) extends Expr

/** `param` is the leading scalar of topk/bottomk/quantile; `strParam` the
  * leading string of count_values (the destination label name).
  */
final case class Agg(
    op: String,
    by: Seq[String],
    without: Boolean,
    body: Expr,
    param: Option[Double] = None,
    strParam: Option[String] = None) extends Expr

/** `groupLeft`/`groupRight` are the many-to-one / one-to-many match
  * modifiers; `groupLabels` the extra labels carried over from the "one"
  * side (`group_left(job)`).
  */
final case class BinOp(
    op: String,
    lhs: Expr,
    rhs: Expr,
    on: Seq[String],
    ignoring: Seq[String],
    groupLeft: Boolean,
    boolMode: Boolean = false,
    groupRight: Boolean = false,
    groupLabels: Seq[String] = Nil) extends Expr
