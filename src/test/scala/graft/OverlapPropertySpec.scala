package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps

/** sourceOverlap: the bounded-pair-explosion implementation must agree
  * exactly with a naive Scala reference (per-source shingle sets →
  * pairwise intersections) over randomized corpora — including empty
  * intersections, sub-length docs, repeated shingles within and across
  * docs of one source, and sources whose every doc is sub-length
  * (present in the pair frame with n_sh absent ⇒ excluded by the size
  * join, same as the oracle's inner join).
  */
class OverlapPropertySpec extends SparkSpec {
  import spark.implicits._

  private def refShingles(text: String, n: Int): Set[String] = {
    val tk = text.split(" ", -1)
    if (tk.length < n) Set.empty
    else tk.sliding(n).map(_.mkString(" ")).toSet
  }

  test("sourceOverlap == naive per-source set reference (random corpora)") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    for (trial <- 0 until 20) {
      val nSrc = 2 + rnd.nextInt(4)
      val docs = (0 until 30).map { i =>
        val src = s"s${rnd.nextInt(nSrc)}"
        val len = rnd.nextInt(9) // 0..8 tokens: sub-length docs common
        (src, (0 until len).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      val bySrc = docs.groupBy(_._1).map { case (s, ds) =>
        s -> ds.flatMap(d => refShingles(d._2, 3)).toSet
      }
      // reference: every pair of sources that BOTH have ≥1 shingle (the
      // size join is inner — a shingle-less source has no n_sh row)
      val withSh = bySrc.filter(_._2.nonEmpty).keys.toSeq.sorted
      val expect = (for {
        i <- withSh.indices; j <- (i + 1) until withSh.size
      } yield {
        val (a, b) = (withSh(i), withSh(j))
        val inter = (bySrc(a) & bySrc(b)).size.toLong
        val union = bySrc(a).size + bySrc(b).size - inter
        val jac = BigDecimal(inter.toDouble / union)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (a, b) -> ((inter, union.toLong, jac))
      }).toMap
      val got = TextOps.sourceOverlap(docs.toDF("source", "text"), 3)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
      assert(got === expect, s"trial $trial: $got vs $expect")
    }
  }

  test("splitLeakage == reference filter over random verified pairs") {
    val rnd = new scala.util.Random(11)
    def splitOf(id: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 20 match {
        case 0 => "test"; case 1 => "val"; case _ => "train"
      }
    }
    val pairs = (0 until 300).map { _ =>
      (rnd.nextInt(500).toLong, rnd.nextInt(500).toLong,
        math.round(rnd.nextDouble() * 1e6) / 1e6)
    }
    val expect = pairs
      .filter(p => p._3 >= 0.5 && splitOf(p._1) != splitOf(p._2))
      .map(p => (p._1, p._2, splitOf(p._1), splitOf(p._2), p._3))
      .sorted
    val got = TextOps.splitLeakage(
        pairs.toDF("doc_a", "doc_b", "jaccard"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getDouble(4))).toSeq.sorted
    assert(got === expect)
  }
}
