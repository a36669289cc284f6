package graft.tsdb

/** Mutable labels: query-time rewrite of matchers on "virtual" labels into
  * matchers on real labels (reference: `cassandra/mutable/processor.go:
  * 55-98,125-189` — `group="mygroup"` becomes `instance=~"server1|server2"`).
  *
  * The mapping is a small dimension: (tenant, mutable name, mutable value) →
  * associated real-label values. The rewrite happens before plan
  * construction, so Catalyst sees only real-column predicates (and can push
  * them into the scan); the reference needs a regex-merge
  * (`processor.go:211-232`) because its index only understands matchers —
  * here the IN-list is the natural form.
  */
final case class MutableMapping(
    tenant: String,
    name: String, // mutable label name, e.g. "group"
    targetName: String, // real label it expands to, e.g. "event_type"
    values: Map[String, Seq[String]]) { // mutable value -> real values

  /** Rewrite matchers on the mutable label into real-label matchers.
    * Eq → IN-list (as MatchRe of literal alternates, mirroring the
    * reference's merged regex); Neq → negated list.
    */
  def rewrite(ms: Seq[Matcher]): Seq[Matcher] = ms.map {
    case MatchEq(n, v) if n == name =>
      MatchRe(targetName, values.getOrElse(v, Seq("__none__")).mkString("|"))
    case MatchNeq(n, v) if n == name =>
      MatchNre(targetName, values.getOrElse(v, Seq("__none__")).mkString("|"))
    case MatchRe(n, p) if n == name =>
      val re = ("^(?:" + p + ")$").r
      val expanded = values.collect {
        case (mv, real) if re.pattern.matcher(mv).matches() => real
      }.flatten.toSeq.distinct.sorted
      MatchRe(targetName, (if (expanded.isEmpty) Seq("__none__") else expanded).mkString("|"))
    case other => other
  }
}
