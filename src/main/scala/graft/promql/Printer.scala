package graft.promql

import graft.tsdb._

/** PromQL pretty-printer: AST → canonical expression string, the engine
  * side of Prometheus' `/api/v1/format_query` (the upstream formatter is
  * `promql/parser/printer.go`). The invariant is ROUND-TRIP: for any
  * parseable query `q`, `parse(print(parse(q))) == parse(q)` — asserted
  * across the whole compliance corpus in PromqlSpec.
  *
  * Operands of binary operators and subquery bodies are always
  * parenthesized, so the printed form re-parses to the same tree without
  * re-deriving precedence.
  */
object Printer {

  def print(e: Expr): String = e match {
    case NumLit(v) => num(v)
    case s: Selector => selector(s)
    case Subquery(body, r, st, off) =>
      s"(${print(body)})[${dur(r)}:${dur(st)}]" +
        (if (off != 0) s" offset ${signedDur(off)}" else "")
    case FuncCall("time", NumLit(_), _) => "time()"
    case FuncCall(fn, arg, params)
      if fn == "histogram_quantile" || Parser.ParamFirstRangeFunctions(fn) =>
      s"$fn(${num(params.head)}, ${print(arg)})"
    case FuncCall(fn, FuncCall("time", NumLit(_), _), _)
      if Parser.DateFunctions(fn) => s"$fn()"
    case FuncCall(fn, arg, params) =>
      (s"$fn(${print(arg)}" +: params.map(num)).mkString(", ") + ")"
    case LabelCall(fn, arg, strs) =>
      (s"$fn(${print(arg)}" +: strs.map(q)).mkString(", ") + ")"
    case InfoCall(arg, sel, _) =>
      s"info(${print(arg)}${sel.map(s => ", " + print(s)).getOrElse("")})"
    case Agg(op, by, without, body, param, strParam) =>
      val grouping =
        if (without) s" without (${by.map(ln).mkString(", ")}) "
        else if (by.nonEmpty) s" by (${by.map(ln).mkString(", ")}) "
        else ""
      val lead = param.map(p => s"${num(p)}, ").getOrElse("") +
        strParam.map(s => s"${q(s)}, ").getOrElse("")
      s"$op$grouping($lead${print(body)})"
    case BinOp(op, lhs, rhs, on, ignoring, groupLeft, boolMode,
        groupRight, groupLabels) =>
      val mods = new StringBuilder
      if (boolMode) mods.append(" bool")
      if (on.nonEmpty) mods.append(s" on (${on.map(ln).mkString(", ")})")
      if (ignoring.nonEmpty)
        mods.append(s" ignoring (${ignoring.map(ln).mkString(", ")})")
      if (groupLeft) mods.append(s" group_left (${groupLabels.map(ln).mkString(", ")})")
      if (groupRight) mods.append(s" group_right (${groupLabels.map(ln).mkString(", ")})")
      s"(${print(lhs)}) $op${mods.result()} (${print(rhs)})"
  }

  private def selector(s: Selector): String = {
    val ms = s.matchers.map(matcher)
    val core = (s.name, ms) match {
      case (Some(n), Nil) => n
      case (Some(n), m) => s"$n{${m.mkString(", ")}}"
      case (None, m) => s"{${m.mkString(", ")}}"
    }
    core + s.rangeMs.map(r => s"[${dur(r)}]").getOrElse("") +
      (if (s.offsetMs != 0) s" offset ${signedDur(s.offsetMs)}" else "") +
      s.atMs.map {
        case Selector.AtStart => " @ start()"
        case Selector.AtEnd => " @ end()"
        case t => s" @ ${num(t / 1000.0)}"
      }.getOrElse("")
  }

  private def matcher(m: Matcher): String = m match {
    case MatchEq(n, v) => s"${ln(n)}=${q(v)}"
    case MatchNeq(n, v) => s"${ln(n)}!=${q(v)}"
    case MatchRe(n, p) => s"${ln(n)}=~${q(p)}"
    case MatchNre(n, p) => s"${ln(n)}!~${q(p)}"
    // post-rewrite forms (mutable labels / regex simplification): an
    // anchored alternation of quoted literals is semantically identical
    case MatchIn(n, vs) => s"${ln(n)}=~${q(vs.map(reQuote).mkString("|"))}"
    case MatchNotIn(n, vs) => s"${ln(n)}!~${q(vs.map(reQuote).mkString("|"))}"
  }

  /** Label NAME position: legacy-charset names print bare; UTF-8 names
    * (legal since the reference's `model.UTF8Validation`) print quoted —
    * the modern PromQL form the parser round-trips.
    */
  private def ln(n: String): String =
    if (n.matches("^[a-zA-Z_][a-zA-Z0-9_:]*$")) n else q(n)

  private def reQuote(v: String): String =
    v.flatMap(c =>
      if (c.isLetterOrDigit || c == '_' || c == ' ') c.toString
      else "\\" + c)

  /** Double-quoted string literal with PromQL escapes. */
  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case c => c.toString
    } + "\""

  private def num(v: Double): String =
    if (v.isNaN) "NaN"
    else if (v == Double.PositiveInfinity) "Inf"
    else if (v == Double.NegativeInfinity) "-Inf"
    else if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else v.toString.replace("E", "e") // parser accepts lowercase exponents

  private val Units = Seq(
    "w" -> 604800000L, "d" -> 86400000L, "h" -> 3600000L,
    "m" -> 60000L, "s" -> 1000L, "ms" -> 1L)

  /** Compact Go-style duration: 5400000 → "1h30m". */
  def dur(ms0: Long): String = {
    require(ms0 >= 0, s"negative duration $ms0")
    if (ms0 == 0) return "0s"
    val sb = new StringBuilder
    var ms = ms0
    Units.foreach { case (u, size) =>
      if (ms >= size) { sb.append(ms / size).append(u); ms %= size }
    }
    sb.result()
  }

  private def signedDur(ms: Long): String =
    if (ms < 0) "-" + dur(-ms) else dur(ms)
}
