package graft

import org.apache.spark.sql.functions._

import graft.tsdb._

/** Label-matcher semantics (reference `cassandra/index/index.go:3497-3814`):
  * full regex anchoring, the missing-label-matches-empty rule
  * (prometheus#3575), IN-rewrite of literal alternations, and the typed
  * IN matchers produced by the mutable-label rewrite.
  */
class MatchersSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("click", Some("gold")),
    ("clickbait", None),
    ("view", None),
    ("purchase", Some("silver"))).toDF("etype", "tier")

  private def keep(m: Matcher): Seq[String] = {
    val c = m.label match { case "etype" => col("etype"); case "tier" => col("tier") }
    df.where(Matchers.predicate(c, m)).select("etype")
      .collect().map(_.getString(0)).toSeq.sorted
  }

  test("regex matchers are fully anchored (Prometheus semantics)") {
    assert(keep(MatchRe("etype", "lick")) === Seq.empty) // substring must NOT match
    assert(keep(MatchRe("etype", "click")) === Seq("click")) // not clickbait
    assert(keep(MatchRe("etype", "click.*")) === Seq("click", "clickbait"))
  }

  test("literal alternation compiles to IN with identical semantics") {
    assert(Matchers.literalAlternates("click|view").isDefined)
    assert(Matchers.literalAlternates("click|v.ew").isEmpty) // metachar
    assert(Matchers.literalAlternates((1 to 11).map("v" + _).mkString("|")).isEmpty)
    assert(keep(MatchRe("etype", "click|view")) === Seq("click", "view"))
  }

  test("empty value matches missing label; negation flips it") {
    assert(keep(MatchEq("tier", "")) === Seq("clickbait", "view"))
    assert(keep(MatchNeq("tier", "")) === Seq("click", "purchase"))
    assert(keep(MatchNre("tier", "g.*")) === Seq("clickbait", "purchase", "view"))
  }

  test("typed IN matchers: empty list matches nothing (negated: all)") {
    assert(keep(MatchIn("etype", Seq("click", "view"))) === Seq("click", "view"))
    assert(keep(MatchIn("etype", Seq.empty)) === Seq.empty)
    assert(keep(MatchNotIn("etype", Seq.empty)).size === 4)
  }
}

/** Mutable-label rewrite (reference `cassandra/mutable/processor.go`):
  * values with regex metacharacters must stay literal, and MatchNre gets
  * the negated expansion path.
  */
class MutableLabelsSpec extends SparkSpec {
  import spark.implicits._

  private val mapping = MutableMapping("t1", "group", "etype", Map(
    "interactive" -> Seq("click", "view"),
    "weird" -> Seq("c+x("))) // regex metachars: must never be interpreted

  private val df = Seq("click", "view", "c+x(", "cxx", "purchase")
    .toDF("etype")

  private def keep(ms: Seq[Matcher]): Seq[String] =
    df.where(Matchers.all(_ => col("etype"), mapping.rewrite(ms)))
      .collect().map(_.getString(0)).toSeq.sorted

  test("Eq on mutable label expands to literal IN") {
    assert(keep(Seq(MatchEq("group", "interactive"))) === Seq("click", "view"))
  }

  test("metacharacter values stay literal (reference quotes via QuoteMeta)") {
    // 'c+x(' as a regex would be invalid/match 'cxx'; as a literal it
    // matches only the exact string.
    assert(keep(Seq(MatchEq("group", "weird"))) === Seq("c+x("))
  }

  test("unknown mutable value matches nothing; negated matches all") {
    assert(keep(Seq(MatchEq("group", "nope"))) === Seq.empty)
    assert(keep(Seq(MatchNeq("group", "nope"))).size === 5)
  }

  test("regex on mutable label expands across matching groups; Nre negates") {
    assert(keep(Seq(MatchRe("group", "inter.*|we.*"))) ===
      Seq("c+x(", "click", "view"))
    assert(keep(Seq(MatchNre("group", "inter.*"))) ===
      Seq("c+x(", "cxx", "purchase"))
  }

  test("matchers on other labels pass through untouched") {
    assert(mapping.rewrite(Seq(MatchEq("etype", "click"))) ===
      Seq(MatchEq("etype", "click")))
  }

  test("M4 provider builds tenant-scoped mappings from a dimension table") {
    import spark.implicits._
    val dim = Seq(
      ("t1", "group", "etype", "interactive", "view"),
      ("t1", "group", "etype", "interactive", "click"),
      ("t2", "group", "etype", "interactive", "error"))
      .toDF("tenant", "name", "target_name", "value", "associated_value")
    val ms = MutableProvider.mappings(dim, "t1")
    assert(ms.size === 1)
    assert(ms.head.values === Map("interactive" -> Seq("click", "view")))
    assert(MutableProvider.rewriteAll(
      Seq(MatchEq("group", "interactive")), ms) ===
      Seq(MatchIn("etype", Seq("click", "view"))))
  }
}
