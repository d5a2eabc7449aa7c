package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.UrlFunctions
import graft.operators.{BradleyTerry, Similarity}

/** Specs for the alignment/preference family: URL canonicalization rules,
  * Bradley-Terry fit invariants, IVF range search semantics. */
class AlignmentOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- URL canonicalization -----------------------------------------

  private def canon(url: String): String =
    Seq(Tuple1(url)).toDF("u")
      .select(UrlFunctions.canonicalUrl(col("u")).as("c"))
      .as[String].head()

  test("canonicalUrl lowercases host but never the path") {
    assert(canon("https://WWW.Example.COM/Docs/A") ===
      "https://www.example.com/Docs/A")
  }

  test("canonicalUrl strips fragment, trailing slash, and utm params") {
    assert(canon("https://a.com/x/?utm_source=f&lang=en#top") ===
      "https://a.com/x?lang=en")
    assert(canon("https://a.com/x?utm_campaign=c&lang=en") ===
      "https://a.com/x?lang=en")
    assert(canon("https://a.com/x?utm_a=1&utm_b=2") === "https://a.com/x")
    assert(canon("http://a.com/x#frag") === "http://a.com/x")
  }

  test("canonicalUrl keeps non-tracking params in original order") {
    assert(canon("https://a.com/x?b=2&utm_x=9&a=1") ===
      "https://a.com/x?b=2&a=1")
  }

  // ---- Bradley-Terry -------------------------------------------------

  test("BT: dominant player gets the top rating; ratings average to 1") {
    // A beats everyone 4-0; B and C split; D loses everything
    val games = Seq(
      ("A", "B", 4L, 4L), ("A", "C", 4L, 4L), ("A", "D", 4L, 4L),
      ("B", "C", 4L, 2L), ("B", "D", 4L, 3L), ("C", "D", 4L, 3L))
      .toDF("a", "b", "n", "wins_a")
    val r = BradleyTerry.fit(games, rounds = 8)
      .orderBy(desc("rating"))
      .as[(String, Long, Long, Double)].collect()
    assert(r.map(_._1).toSeq.head === "A")
    assert(r.map(_._1).toSeq.last === "D")
    val mean = r.map(_._4).sum / r.length
    assert(math.abs(mean - 1.0) < 1e-9, s"mean-1 rescale: $mean")
    // B and C are symmetric except B's extra win margin over D is equal;
    // B beat C 2-2 but B 3-1 D vs C 3-1 D — B and C should be close
    val byName = r.map(x => x._1 -> x._4).toMap
    assert(byName("B") > byName("D") && byName("C") > byName("D"))
  }

  test("BT: symmetric outcomes give equal ratings") {
    val games = Seq(("X", "Y", 10L, 5L)).toDF("a", "b", "n", "wins_a")
    val r = BradleyTerry.fit(games, rounds = 5)
      .as[(String, Long, Long, Double)].collect().map(x => x._1 -> x._4).toMap
    assert(math.abs(r("X") - r("Y")) < 1e-9)
  }

  // ---- IVF range search ----------------------------------------------

  test("range search: threshold respected, self excluded, radius exact") {
    def vec(a: Double, b: Double): Seq[Float] =
      (Seq(a, b) ++ Seq.fill(6)(0.0)).map(_.toFloat)
    // one cell centered on x-axis; members at decreasing similarity
    val vecs = Seq(
      (0L, vec(1.0, 0.0)),            // the query itself
      (1L, vec(1.0, 0.1)),            // cos ~0.995
      (2L, vec(1.0, 1.0)),            // cos ~0.707
      (3L, vec(0.1, 1.0)))            // cos ~0.0995 — below tau
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, vec(1.0, 0.0))).toDF("cell", "c_emb")
    val qs = Seq((0L, vec(1.0, 0.0))).toDF("query_id", "q_emb")
    val hits = Similarity.ivfRangeSearch(vecs, cents, qs,
        tau = 0.5, nProbe = 1)
      .orderBy("vec_id").as[(Long, Long, Long, Double)].collect()
    assert(hits.map(_._2).toSeq === Seq(1L, 2L),
      s"expect ids 1,2 (>= 0.5, no self): ${hits.toSeq}")
    assert(hits.forall(_._4 >= 0.5))
  }
}
