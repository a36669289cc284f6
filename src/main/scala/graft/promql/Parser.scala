package graft.promql

import graft.tsdb._

/** Hand-written recursive-descent PromQL parser for the grammar in [[Expr]].
  * Throws [[ParseException]] with position info on malformed input.
  */
final class ParseException(msg: String, val pos: Int)
  extends RuntimeException(s"$msg at position $pos")

object Parser {

  val RangeFunctions: Set[String] = Set(
    "rate", "increase", "delta", "irate", "idelta", "resets", "changes",
    "avg_over_time", "min_over_time", "max_over_time",
    "sum_over_time", "count_over_time", "last_over_time",
    "stddev_over_time", "stdvar_over_time", "present_over_time",
    "absent_over_time", "deriv", "predict_linear", "holt_winters",
    // Prometheus 3.x: holt_winters renamed + the experimental
    // mad/ts_of family (promql/functions.go)
    "double_exponential_smoothing", "mad_over_time",
    "ts_of_min_over_time", "ts_of_max_over_time", "ts_of_last_over_time")

  /** Range functions whose scalar parameter PRECEDES the range argument
    * (`quantile_over_time(0.9, m[5m])`).
    */
  val ParamFirstRangeFunctions: Set[String] = Set("quantile_over_time")

  val AggOps: Set[String] = Set("sum", "avg", "min", "max", "count",
    "group", "stddev", "stdvar", "topk", "bottomk", "quantile",
    "count_values", "limitk", "limit_ratio")

  /** Per-sample math functions over any vector expression. */
  val MathFunctions: Set[String] = Set(
    "abs", "ceil", "floor", "exp", "ln", "log2", "log10", "sqrt", "sgn",
    "sin", "cos", "tan", "asin", "acos", "atan", "sinh", "cosh", "tanh",
    "asinh", "acosh", "atanh", "deg", "rad")

  /** Math functions taking trailing scalar parameters. */
  val ParamMathFunctions: Set[String] = Set(
    "clamp", "clamp_min", "clamp_max", "round")

  /** Aggregations taking a leading scalar parameter. */
  val ParamAggOps: Set[String] = Set("topk", "bottomk", "quantile",
    "limitk", "limit_ratio")

  /** Instant-vector functions over any vector expression. */
  val InstantFunctions: Set[String] = Set("timestamp", "sort", "sort_desc")

  /** Date-component functions over epoch-second sample values; zero-arg
    * form defaults to `time()` (`year()` == `year(vector(time()))`).
    */
  val DateFunctions: Set[String] = Set("minute", "hour", "day_of_week",
    "day_of_month", "day_of_year", "days_in_month", "month", "year")

  def parse(input: String): Expr = {
    val p = new Parser(input)
    val e = p.parseExpr(0)
    p.ws()
    if (!p.eof) throw new ParseException(s"trailing input '${p.rest}'", p.pos)
    e
  }
}

private final class Parser(input: String) {
  var pos = 0
  def eof: Boolean = pos >= input.length
  def rest: String = input.substring(pos)

  def ws(): Unit = while (!eof && input(pos).isWhitespace) pos += 1

  private def fail(msg: String) = throw new ParseException(msg, pos)

  private def peek: Char = if (eof) '\u0000' else input(pos)

  private def eat(c: Char): Unit = {
    ws()
    if (peek != c) fail(s"expected '$c'")
    pos += 1
  }

  private def tryEat(s: String): Boolean = {
    ws()
    if (input.startsWith(s, pos)) { pos += s.length; true } else false
  }

  private def ident(): String = {
    ws()
    val start = pos
    while (!eof && (input(pos).isLetterOrDigit || input(pos) == '_' ||
      input(pos) == ':')) pos += 1
    if (pos == start) fail("expected identifier")
    input.substring(start, pos)
  }

  private def quoted(): String = {
    ws()
    val q = peek
    if (q != '"' && q != '\'') fail("expected quoted string")
    pos += 1
    val sb = new StringBuilder
    while (!eof && input(pos) != q) {
      if (input(pos) == '\\' && pos + 1 < input.length) {
        pos += 1
        sb += (input(pos) match {
          case 'n' => '\n'; case 't' => '\t'; case c => c
        })
      } else sb += input(pos)
      pos += 1
    }
    if (eof) fail("unterminated string")
    pos += 1
    sb.toString
  }

  /** Decimal, scientific, or hex (`0x1f`) literal. */
  private def number(): Double = {
    ws()
    val start = pos
    if (peek == '-' || peek == '+') pos += 1
    if (input.startsWith("0x", pos) || input.startsWith("0X", pos)) {
      pos += 2
      val hs = pos
      while (!eof && (input(pos).isDigit ||
        ('a' <= input(pos).toLower && input(pos).toLower <= 'f'))) pos += 1
      if (pos == hs) fail("expected hex digits")
      val v = java.lang.Long.parseLong(input.substring(hs, pos), 16).toDouble
      return if (input(start) == '-') -v else v
    }
    while (!eof && (input(pos).isDigit || input(pos) == '.')) pos += 1
    if (!eof && (input(pos) == 'e' || input(pos) == 'E')) {
      pos += 1
      if (!eof && (input(pos) == '-' || input(pos) == '+')) pos += 1
      while (!eof && input(pos).isDigit) pos += 1
    }
    if (pos == start) fail("expected number")
    input.substring(start, pos).toDouble
  }

  /** Duration with optional leading '-' (negative offsets are allowed:
    * `offset -5m`, engine option EnableNegativeOffset).
    */
  private def signedDuration(): Long = {
    ws()
    if (peek == '-') { pos += 1; -duration() } else duration()
  }

  /** Duration EXPRESSION in a bracketed position (Prometheus 3.x
    * experimental `promql-duration-expr`): arithmetic over duration
    * literals and unitless numbers — both plain scalar SECONDS in the
    * upstream model, so `5m * 2` is 300·2 s and `[60]` is a minute —
    * with the usual precedence (`^` right-associative, then `* / %`,
    * then `+ -`), parens, and unary minus; evaluated at parse time.
    * Applied only inside `[...]` (range and subquery positions), where
    * `]`/`:` delimit the expression unambiguously — an `offset` keeps
    * the plain-literal grammar so `x offset 1h + y` still parses as a
    * binary op over vectors, exactly like upstream.
    */
  private def durationExpr(): Long = {
    val sec = durExpr(0)
    val ms = math.round(sec * 1000.0)
    if (ms <= 0) fail("duration expression must be positive")
    ms
  }

  private def durExpr(min: Int): Double = {
    var lhs = durAtom()
    var going = true
    while (going) {
      ws()
      val op = if (eof) ' ' else peek
      val prec = op match {
        case '+' | '-' => 1
        case '*' | '/' | '%' => 2
        case '^' => 3
        case _ => 0
      }
      if (prec == 0 || prec < min) going = false
      else {
        pos += 1
        val rhs = durExpr(if (op == '^') prec else prec + 1)
        lhs = op match {
          case '+' => lhs + rhs
          case '-' => lhs - rhs
          case '*' => lhs * rhs
          case '/' => lhs / rhs
          case '%' => lhs % rhs
          case '^' => math.pow(lhs, rhs)
        }
      }
    }
    lhs
  }

  private def durAtom(): Double = {
    ws()
    if (peek == '(') {
      pos += 1
      val v = durExpr(0)
      ws(); eat(')')
      v
    } else if (peek == '-') {
      pos += 1
      -durAtom()
    } else {
      // digits immediately followed by a unit → duration literal
      // (including 1h30m concatenation); anything else → bare number
      // of seconds
      var p = pos
      while (p < input.length && input(p).isDigit) p += 1
      val isDur = p > pos && p < input.length &&
        (input.startsWith("ms", p) || "smhdw".contains(input(p)))
      if (isDur) duration().toDouble / 1000.0 else number()
    }
  }

  /** `5m`, `90s`, `1h30m` (concatenation sums), units ms/s/m/h/d/w. */
  private def duration(): Long = {
    ws()
    var total = 0L
    var any = false
    while (!eof && input(pos).isDigit) {
      any = true
      val ns = pos
      while (!eof && input(pos).isDigit) pos += 1
      val n = input.substring(ns, pos).toLong
      val unit =
        if (input.startsWith("ms", pos)) { pos += 2; 1L }
        else if (!eof && input(pos) == 's') { pos += 1; 1000L }
        else if (!eof && input(pos) == 'm') { pos += 1; 60000L }
        else if (!eof && input(pos) == 'h') { pos += 1; 3600000L }
        else if (!eof && input(pos) == 'd') { pos += 1; 86400000L }
        else if (!eof && input(pos) == 'w') { pos += 1; 604800000L }
        else fail("expected duration unit")
      total += n * unit
    }
    if (!any) fail("expected duration")
    total
  }

  private def labelList(): Seq[String] = {
    eat('(')
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def entry(): String = {
      ws()
      // quoted UTF-8 label names are legal in grouping positions too
      // (modern PromQL under UTF8Validation)
      if (peek == '"' || peek == '\'') quoted() else ident()
    }
    ws()
    if (peek != ')') {
      out += entry()
      while (tryEat(",")) out += entry()
    }
    eat(')')
    out.toSeq
  }

  /** Keyword op at `pos` (not a prefix of a longer identifier). */
  private def keywordOp(s: String): Boolean = {
    ws()
    input.startsWith(s, pos) && {
      val after = pos + s.length
      after >= input.length ||
        !(input(after).isLetterOrDigit || input(after) == '_')
    }
  }

  /** Consume `s` only when it is a whole keyword — `a + online_users` must
    * not have its RHS eaten by the `on` modifier.
    */
  private def tryKeyword(s: String): Boolean =
    keywordOp(s) && { pos += s.length; true }

  /** PromQL precedence: or < and/unless < comparisons < +- < * / % < ^. */
  private def peekOp(): Option[(String, Int)] = {
    ws()
    if (keywordOp("or")) Some(("or", 1))
    else if (keywordOp("and")) Some(("and", 2))
    else if (keywordOp("unless")) Some(("unless", 2))
    else if (keywordOp("atan2")) Some(("atan2", 5))
    else if (input.startsWith("==", pos)) Some(("==", 3))
    else if (input.startsWith("!=", pos)) Some(("!=", 3))
    else if (input.startsWith(">=", pos)) Some((">=", 3))
    else if (input.startsWith("<=", pos)) Some(("<=", 3))
    else peek match {
      case '>' => Some((">", 3)); case '<' => Some(("<", 3))
      case '+' => Some(("+", 4)); case '-' => Some(("-", 4))
      case '*' => Some(("*", 5)); case '/' => Some(("/", 5))
      case '%' => Some(("%", 5)); case '^' => Some(("^", 6))
      case _ => None
    }
  }

  def parseExpr(minPrec: Int): Expr = {
    var lhs = parseUnary()
    var going = true
    while (going) {
      peekOp() match {
        case Some((op, prec)) if prec >= minPrec =>
          pos += op.length
          val boolMode = tryKeyword("bool")
          var on = Seq.empty[String]
          var ignoring = Seq.empty[String]
          var groupLeft = false
          var groupRight = false
          var groupLabels = Seq.empty[String]
          if (tryKeyword("on")) on = labelList()
          else if (tryKeyword("ignoring")) ignoring = labelList()
          if (tryKeyword("group_left")) {
            groupLeft = true
            ws()
            if (peek == '(') groupLabels = labelList()
          } else if (tryKeyword("group_right")) {
            groupRight = true
            ws()
            if (peek == '(') groupLabels = labelList()
          }
          // `^` is right-associative in PromQL: a^b^c == a^(b^c)
          val rhs = parseExpr(if (op == "^") prec else prec + 1)
          lhs = BinOp(op, lhs, rhs, on, ignoring, groupLeft, boolMode,
            groupRight, groupLabels)
        case _ => going = false
      }
    }
    lhs
  }

  /** `[range:step]` after any expression makes it a subquery. A plain
    * range selector's own `[range]` is consumed inside parseSelector
    * (which backs off when it sees ':').
    */
  private def withSubquerySuffix(e: Expr): Expr = {
    ws()
    val isRangeSel = e match {
      case s: Selector => s.rangeMs.isDefined
      case _ => false
    }
    if (peek == '[' && !isRangeSel) {
      pos += 1
      val r = durationExpr()
      eat(':')
      val st = durationExpr()
      eat(']')
      val off = if (keywordOp("offset")) { pos += 6; signedDuration() } else 0L
      Subquery(e, r, st, off)
    } else e
  }

  private def parseUnary(): Expr = withSubquerySuffix(parseUnary0())

  private def parseUnary0(): Expr = {
    ws()
    if (peek == '(') {
      eat('('); val e = parseExpr(0); eat(')'); e
    } else if (peek == '{') {
      parseSelector() // name-less selector: {label="v", ...}
    } else if (peek.isDigit || (peek == '.' && pos + 1 < input.length &&
      input(pos + 1).isDigit)) {
      NumLit(number())
    } else if (peek == '-') {
      // unary minus over an expression: `-2^2` is -(2^2) in PromQL since
      // unary binds looser than ^ — so the sign folds into the literal
      // only when the operand IS a bare literal; -0.0 semantics via * -1
      pos += 1
      parseExpr(6) match {
        case NumLit(v) => NumLit(-v)
        case e => BinOp("*", NumLit(-1.0), e, Nil, Nil, groupLeft = false)
      }
    } else if (peek == '+') {
      pos += 1
      parseExpr(6)
    } else {
      val save = pos
      val name = ident()
      ws()
      if (name == "Inf") NumLit(Double.PositiveInfinity)
      else if (name == "NaN") NumLit(Double.NaN)
      else if (Parser.AggOps(name) && (peek == '(' || keywordOp("by") ||
        keywordOp("without"))) {
        var by = Seq.empty[String]
        var without = false
        if (tryKeyword("by")) by = labelList()
        else if (tryKeyword("without")) { without = true; by = labelList() }
        eat('(')
        val param =
          if (Parser.ParamAggOps(name)) { val v = number(); eat(','); Some(v) }
          else None
        val strParam =
          if (name == "count_values") { val s = quoted(); eat(','); Some(s) }
          else None
        val body = parseExpr(0)
        eat(')')
        Agg(name, by, without, body, param, strParam)
      } else if (Parser.RangeFunctions(name) && peek == '(') {
        eat('(')
        val arg = parseExpr(0) match {
          case s: Selector if s.rangeMs.isDefined => s
          case sub: Subquery => sub
          case _ => fail(s"$name needs a range or subquery argument")
        }
        val params = scala.collection.mutable.ArrayBuffer.empty[Double]
        while (tryEat(",")) params += number()
        eat(')')
        FuncCall(name, arg, params.toSeq)
      } else if (Parser.ParamFirstRangeFunctions(name) && peek == '(') {
        eat('(')
        val q = number()
        eat(',')
        val arg = parseExpr(0) match {
          case s: Selector if s.rangeMs.isDefined => s
          case sub: Subquery => sub
          case _ => fail(s"$name needs a range or subquery argument")
        }
        eat(')')
        FuncCall(name, arg, Seq(q))
      } else if (name == "histogram_quantile" && peek == '(') {
        eat('(')
        val q = number()
        eat(',')
        val arg = parseExpr(0)
        eat(')')
        FuncCall(name, arg, Seq(q))
      } else if (Parser.DateFunctions(name) && peek == '(') {
        eat('(')
        ws()
        val arg =
          if (peek == ')') FuncCall("time", NumLit(0)) // year() == year(time())
          else parseExpr(0)
        eat(')')
        FuncCall(name, arg)
      } else if ((Parser.MathFunctions(name) ||
        Parser.ParamMathFunctions(name) || Parser.InstantFunctions(name) ||
        name == "absent") && peek == '(') {
        eat('(')
        val arg = parseExpr(0)
        val params = scala.collection.mutable.ArrayBuffer.empty[Double]
        while (tryEat(",")) params += number()
        eat(')')
        FuncCall(name, arg, params.toSeq)
      } else if (name == "time" && peek == '(') {
        eat('('); eat(')')
        FuncCall("time", NumLit(0))
      } else if (name == "pi" && peek == '(') {
        eat('('); eat(')')
        NumLit(math.Pi) // pi() is a scalar constant (promql/functions.go)
      } else if ((name == "vector" || name == "scalar") && peek == '(') {
        eat('(')
        val arg = parseExpr(0)
        eat(')')
        FuncCall(name, arg)
      } else if (name == "info" && peek == '(') {
        eat('(')
        val arg = parseExpr(0)
        val sel =
          if (tryEat(",")) {
            ws()
            parseSelector() match {
              case s if s.rangeMs.isDefined =>
                fail("info data-label selector cannot be a range selector")
              case s => Some(s)
            }
          } else None
        eat(')')
        InfoCall(arg, sel,
          sel.map(_.matchers.map(_.label).filter(_ != "__name__").distinct)
            .getOrElse(Nil))
      } else if ((name == "label_replace" || name == "label_join" ||
        name == "sort_by_label" || name == "sort_by_label_desc") &&
        peek == '(') {
        eat('(')
        val arg = parseExpr(0)
        val strs = scala.collection.mutable.ArrayBuffer.empty[String]
        while (tryEat(",")) strs += quoted()
        eat(')')
        LabelCall(name, arg, strs.toSeq)
      } else {
        pos = save
        parseSelector()
      }
    }
  }

  private def parseSelector(): Selector = {
    ws()
    val name = if (peek != '{') Some(ident()) else None
    val ms = scala.collection.mutable.ArrayBuffer.empty[Matcher]
    ws()
    if (peek == '{') {
      pos += 1
      ws()
      while (peek != '}') {
        // modern UTF-8 PromQL (the quoting the reference's embedded
        // engine enables via model.UTF8Validation): a quoted label name
        // before the operator — {"läbel.x"="v"} — or a bare quoted
        // string as metric-name shorthand — {"metric.name", ...}
        val wasQuoted = peek == '"' || peek == '\''
        val label = if (wasQuoted) quoted() else ident()
        ws()
        val m: Matcher =
          if (tryEat("=~")) MatchRe(label, quoted())
          else if (tryEat("!~")) MatchNre(label, quoted())
          else if (tryEat("!=")) MatchNeq(label, quoted())
          else if (tryEat("=")) MatchEq(label, quoted())
          else if (wasQuoted && (peek == ',' || peek == '}'))
            MatchEq("__name__", label)
          else fail("expected matcher operator")
        ms += m
        ws()
        if (peek == ',') pos += 1
        ws()
      }
      pos += 1
    }
    var range: Option[Long] = None
    ws()
    if (peek == '[') {
      val save = pos
      pos += 1
      val d = durationExpr()
      ws()
      if (peek == ':') pos = save // subquery — handled by the suffix rule
      else {
        eat(']')
        range = Some(d)
      }
    }
    var offset = 0L
    var at: Option[Long] = None
    var going = true
    while (going) {
      ws()
      if (keywordOp("offset")) { pos += 6; offset = signedDuration() }
      else if (peek == '@') {
        pos += 1
        ws()
        // @ start() / @ end() pin to the query range bounds (resolved at
        // compile time via the AtStart/AtEnd sentinels)
        if (tryKeyword("start")) { eat('('); eat(')'); at = Some(Selector.AtStart) }
        else if (tryKeyword("end")) { eat('('); eat(')'); at = Some(Selector.AtEnd) }
        else at = Some((number() * 1000.0).toLong) // unix seconds → ms
      } else going = false
    }
    Selector(name, ms.toSeq, range, offset, at)
  }
}
