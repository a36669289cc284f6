package graft.api

import graft.promql._
import graft.tsdb._

/** `/api/v1/parse_query` — the upstream `translateAST` JSON the Grafana
  * query builder consumes (Prometheus 3.x `web/api/v1`): a typed tree of
  * `vectorSelector` / `matrixSelector` / `call` / `aggregation` /
  * `binaryExpr` / `subquery` / `numberLiteral` nodes, durations in
  * milliseconds, matchers as `{name, type, value}` with the metric name
  * ALSO materialized as a `__name__` matcher.
  *
  * Known divergences from upstream, both parse-layer artifacts: `pi()`
  * constant-folds to a numberLiteral (upstream keeps the call), and
  * paren/unary wrappers are already folded by this parser so no
  * `parenExpr`/`unaryExpr` nodes appear. The `func` object carries the
  * name only — this engine has no argType registry, and the builder
  * keys on `name`/`args`.
  */
object AstJson {

  private def q(s: String): String = "\"" + PromJson.escape(s) + "\""

  private def num(v: Double): String = q(
    if (v.isNaN) "NaN"
    else if (v == Double.PositiveInfinity) "+Inf"
    else if (v == Double.NegativeInfinity) "-Inf"
    else if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else v.toString)

  private def matcher(m: Matcher): Seq[String] = m match {
    case MatchEq(n, v) => Seq(obj("name" -> q(n), "type" -> q("="),
      "value" -> q(v)))
    case MatchNeq(n, v) => Seq(obj("name" -> q(n), "type" -> q("!="),
      "value" -> q(v)))
    case MatchRe(n, p) => Seq(obj("name" -> q(n), "type" -> q("=~"),
      "value" -> q(p)))
    case MatchNre(n, p) => Seq(obj("name" -> q(n), "type" -> q("!~"),
      "value" -> q(p)))
    // post-rewrite IN forms serialize as their regex equivalent
    case MatchIn(n, vs) => Seq(obj("name" -> q(n), "type" -> q("=~"),
      "value" -> q(vs.mkString("|"))))
    case MatchNotIn(n, vs) => Seq(obj("name" -> q(n), "type" -> q("!~"),
      "value" -> q(vs.mkString("|"))))
  }

  private def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")

  private def arr(xs: Seq[String]): String = xs.mkString("[", ",", "]")

  private def selectorFields(s: Selector): Seq[(String, String)] = {
    val ms = s.name.map(n => MatchEq("__name__", n)).toSeq ++ s.matchers
    Seq(
      "name" -> q(s.name.getOrElse("")),
      "matchers" -> arr(ms.flatMap(matcher)),
      "offset" -> s.offsetMs.toString) ++
      (s.atMs match {
        case Some(Selector.AtStart) => Seq("startOrEnd" -> q("start"))
        case Some(Selector.AtEnd) => Seq("startOrEnd" -> q("end"))
        case Some(t) => Seq("timestamp" -> t.toString)
        case None => Seq.empty
      })
  }

  private def call(name: String, args: Seq[String]): String =
    obj("type" -> q("call"), "func" -> obj("name" -> q(name)),
      "args" -> arr(args))

  def translate(e: Expr): String = e match {
    case NumLit(v) =>
      obj("type" -> q("numberLiteral"), "val" -> num(v))

    case s: Selector if s.rangeMs.isDefined =>
      obj((Seq("type" -> q("matrixSelector"),
        "range" -> s.rangeMs.get.toString) ++ selectorFields(s)): _*)

    case s: Selector =>
      obj((("type" -> q("vectorSelector")) +: selectorFields(s)): _*)

    case Subquery(body, r, st, off) =>
      obj("type" -> q("subquery"), "expr" -> translate(body),
        "range" -> r.toString, "step" -> st.toString,
        "offset" -> off.toString)

    case FuncCall("time", NumLit(_), _) => call("time", Seq.empty)

    case FuncCall(fn, arg, params)
      if fn == "histogram_quantile" || Parser.ParamFirstRangeFunctions(fn) =>
      // the scalar parameter comes FIRST in the user's argument order
      call(fn, params.map(p => translate(NumLit(p))) :+ translate(arg))

    case FuncCall(fn, arg, params) =>
      call(fn, translate(arg) +: params.map(p => translate(NumLit(p))))

    case LabelCall(fn, arg, strs) =>
      call(fn, translate(arg) +: strs.map(s =>
        obj("type" -> q("stringLiteral"), "val" -> q(s))))

    case InfoCall(arg, sel, _) =>
      call("info", translate(arg) +: sel.map(translate).toSeq)

    case Agg(op, by, without, body, param, strParam) =>
      val p = param.map(v => translate(NumLit(v)))
        .orElse(strParam.map(s =>
          obj("type" -> q("stringLiteral"), "val" -> q(s))))
        .getOrElse("null")
      obj("type" -> q("aggregation"), "op" -> q(op),
        "expr" -> translate(body), "param" -> p,
        "grouping" -> arr(by.map(q)),
        "without" -> without.toString)

    case BinOp(op, lhs, rhs, on, ignoring, groupLeft, boolMode,
        groupRight, groupLabels) =>
      val setOp = op == "and" || op == "or" || op == "unless"
      val card =
        if (groupLeft) "many-to-one"
        else if (groupRight) "one-to-many"
        else if (setOp) "many-to-many"
        else "one-to-one"
      val matching =
        if (on.isEmpty && ignoring.isEmpty && !groupLeft && !groupRight &&
          !setOp) "null"
        else obj("card" -> q(card),
          "labels" -> arr((if (on.nonEmpty) on else ignoring).map(q)),
          "on" -> on.nonEmpty.toString,
          "include" -> arr(groupLabels.map(q)))
      obj("type" -> q("binaryExpr"), "op" -> q(op),
        "lhs" -> translate(lhs), "rhs" -> translate(rhs),
        "matching" -> matching, "bool" -> boolMode.toString)
  }
}
