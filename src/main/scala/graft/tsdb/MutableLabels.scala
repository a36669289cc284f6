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
    * Eq → typed IN-list; Neq → negated IN-list; Re/Nre → IN-list of the
    * real values behind every mutable value the (anchored) regex matches —
    * mirroring `processMutableLabelRegex` and its MatchNotRegexp path
    * (`cassandra/mutable/processor.go:125-189`). The reference merges the
    * expansion into one regex with each value `regexp.QuoteMeta`-escaped
    * (`processor.go:210-232`); [[MatchIn]]/[[MatchNotIn]] carry the same
    * semantics with no escaping and no 10-alternate regex fallback, so
    * values containing regex metacharacters can never match wrong series.
    */
  def rewrite(ms: Seq[Matcher]): Seq[Matcher] = ms.map {
    case MatchEq(n, v) if n == name =>
      MatchIn(targetName, values.getOrElse(v, Seq.empty))
    case MatchNeq(n, v) if n == name =>
      MatchNotIn(targetName, values.getOrElse(v, Seq.empty))
    case MatchRe(n, p) if n == name =>
      MatchIn(targetName, expandRegex(p))
    case MatchNre(n, p) if n == name =>
      MatchNotIn(targetName, expandRegex(p))
    case other => other
  }

  /** Real values behind every mutable value matching the anchored regex. */
  private def expandRegex(p: String): Seq[String] = {
    val re = ("^(?:" + p + ")$").r
    values.collect {
      case (mv, real) if re.pattern.matcher(mv).matches() => real
    }.flatten.toSeq.distinct.sorted
  }
}

/** M4 — provider: mutable-label definitions kept as a small dimension
  * table `(tenant, name, target_name, value, associated_value)` (the Spark
  * analogue of `cassandra/mutable/provider.go`'s Cassandra tables, one row
  * per association). Collected to the driver once per query compilation —
  * the rewrite happens before plan construction, exactly like the
  * reference's cache-backed provider; the dimension is tenant-scoped and
  * tiny by construction.
  */
object MutableProvider {
  def mappings(dim: org.apache.spark.sql.DataFrame,
      tenant: String): Seq[MutableMapping] = {
    import org.apache.spark.sql.functions.col
    dim.where(col("tenant") === tenant)
      .select("name", "target_name", "value", "associated_value")
      .collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
      .map { case ((name, target), rows) =>
        MutableMapping(tenant, name, target,
          rows.groupBy(_.getString(2))
            .map { case (v, rs) => v -> rs.map(_.getString(3)).toSeq.sorted }
            .toMap)
      }.toSeq
  }

  /** Apply every mapping's rewrite in sequence (names are disjoint). */
  def rewriteAll(ms: Seq[Matcher],
      mappings: Seq[MutableMapping]): Seq[Matcher] =
    mappings.foldLeft(ms)((acc, m) => m.rewrite(acc))

  /** M3 — label-API override (reference `cassandra/mutable/index.go:
    * 127-185`): `/api/v1/labels` appends the tenant's mutable label names
    * to the physical ones, and `/api/v1/label/<n>/values` of a mutable
    * name lists its configured values instead of scanning series.
    * Set-oriented: a union with the (tiny) definition dimension.
    */
  def labelNamesWithMutable(physicalNames: org.apache.spark.sql.DataFrame,
      dim: org.apache.spark.sql.DataFrame,
      tenant: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    physicalNames.select(col("label_name"))
      .unionByName(dim.where(col("tenant") === tenant)
        .select(col("name").as("label_name")))
      .distinct()
  }

  /** Values of a mutable label name for a tenant (M3 value override). */
  def labelValuesOfMutable(dim: org.apache.spark.sql.DataFrame,
      tenant: String, name: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    dim.where(col("tenant") === tenant && col("name") === name)
      .select(col("value").as("label_value")).distinct()
  }
}
