package graft.promql

import graft.tsdb._

/** Render an [[Expr]] back to PromQL text such that re-parsing yields the
  * same AST (`parse(print(parse(q))) == parse(q)` — asserted over the
  * whole compliance corpus). Useful for logging normalized queries and
  * for debugging front-end rewrites (QueryService injections become
  * visible as plain matchers).
  */
object Printer {

  def print(e: Expr): String = prec(e, 0)

  /** Operator precedence mirror of Parser.peekOp. */
  private def opPrec(op: String): Int = op match {
    case "or" => 1
    case "and" | "unless" => 2
    case "==" | "!=" | ">" | "<" | ">=" | "<=" => 3
    case "+" | "-" => 4
    case "*" | "/" | "%" | "atan2" => 5
    case "^" => 6
  }

  private def prec(e: Expr, min: Int): String = e match {
    case b: BinOp =>
      val p = opPrec(b.op)
      // ^ is right-associative: its LHS needs the tighter bound
      val lhs = prec(b.lhs, if (b.op == "^") p + 1 else p)
      val rhs = prec(b.rhs, if (b.op == "^") p else p + 1)
      val mods = new StringBuilder
      if (b.boolMode) mods.append(" bool")
      if (b.on.nonEmpty) mods.append(s" on(${b.on.mkString(", ")})")
      if (b.ignoring.nonEmpty)
        mods.append(s" ignoring(${b.ignoring.mkString(", ")})")
      if (b.groupLeft)
        mods.append(" group_left" +
          (if (b.groupLabels.nonEmpty) s"(${b.groupLabels.mkString(", ")})"
          else ""))
      if (b.groupRight)
        mods.append(" group_right" +
          (if (b.groupLabels.nonEmpty) s"(${b.groupLabels.mkString(", ")})"
          else ""))
      val s = s"$lhs ${b.op}${mods.result()} $rhs"
      if (p < min) s"($s)" else s
    case other => atom(other)
  }

  private def atom(e: Expr): String = e match {
    case NumLit(v) =>
      if (v.isNaN) "NaN"
      else if (v.isPosInfinity) "Inf"
      else if (v.isNegInfinity) "-Inf"
      else if (v == v.toLong && math.abs(v) < 1e15) v.toLong.toString
      else v.toString
    case s: Selector => selector(s)
    case Subquery(body, r, st, off) =>
      val o = if (off != 0) s" offset ${dur(off)}" else ""
      s"(${print(body)})[${dur(r)}:${dur(st)}]$o"
    case FuncCall("time", _, _) => "time()"
    case FuncCall(fn, arg, params)
      if Parser.ParamFirstRangeFunctions(fn) || fn == "histogram_quantile" =>
      s"$fn(${num(params.head)}, ${print(arg)})"
    case FuncCall(fn, arg, params) =>
      val ps = params.map(num)
      s"$fn(${(print(arg) +: ps).mkString(", ")})"
    case LabelCall(fn, arg, strArgs) =>
      s"$fn(${(print(arg) +: strArgs.map(q)).mkString(", ")})"
    case Agg(op, by, without, body, param, strParam) =>
      val grouping =
        if (without) s" without(${by.mkString(", ")})"
        else if (by.nonEmpty) s" by(${by.mkString(", ")})"
        else ""
      val lead = (strParam.map(q) ++ param.map(num)).toSeq
      s"$op$grouping(${(lead :+ print(body)).mkString(", ")})"
    case b: BinOp => prec(b, 0)
  }

  private def selector(s: Selector): String = {
    val ms = s.matchers.map {
      case MatchEq(l, v) => s"""$l=${q(v)}"""
      case MatchNeq(l, v) => s"""$l!=${q(v)}"""
      case MatchRe(l, v) => s"""$l=~${q(v)}"""
      case MatchNre(l, v) => s"""$l!~${q(v)}"""
      case MatchIn(l, vs) => s"""$l=~${q(vs.mkString("|"))}"""
      case MatchNotIn(l, vs) => s"""$l!~${q(vs.mkString("|"))}"""
    }
    val braces = if (ms.isEmpty) "" else ms.mkString("{", ", ", "}")
    val range = s.rangeMs.map(r => s"[${dur(r)}]").getOrElse("")
    val off =
      if (s.offsetMs != 0) s" offset ${dur(s.offsetMs)}" else ""
    val at = s.atMs match {
      case Some(Selector.AtStart) => " @ start()"
      case Some(Selector.AtEnd) => " @ end()"
      case Some(t) => s" @ ${t / 1000.0}"
      case None => ""
    }
    s"${s.name.getOrElse("")}$braces$range$off$at"
  }

  private def dur(ms0: Long): String = {
    if (ms0 < 0) return "-" + dur(-ms0)
    if (ms0 == 0) return "0s"
    var ms = ms0
    val sb = new StringBuilder
    for ((unit, name) <- Seq(604800000L -> "w", 86400000L -> "d",
      3600000L -> "h", 60000L -> "m", 1000L -> "s", 1L -> "ms")) {
      if (ms >= unit) { sb.append(s"${ms / unit}$name"); ms %= unit }
    }
    sb.result()
  }

  private def num(v: Double): String =
    if (v == v.toLong && math.abs(v) < 1e15) v.toLong.toString else v.toString

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case c => c.toString
    } + "\""
}
