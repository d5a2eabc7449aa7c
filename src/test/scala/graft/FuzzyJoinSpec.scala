package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Binning, FuzzyJoin}
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def naivePairs(strs: Seq[String], d: Int): Set[(String, String, Int)] = {
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    val u = strs.distinct
    (for {
      a <- u; b <- u if a < b
      dist = lev(a, b) if dist <= d
    } yield (a, b, dist)).toSet
  }

  test("finds exactly the pairs within the threshold (lossless vs naive)") {
    val strs = Seq("red bolt", "red belt", "red bolts", "blue bolt",
      "small gizmo", "small gizmos", "smal gizmo", "hot gear", "hot bear",
      "unrelated widget", "red bolt") // duplicate collapses
    val out = FuzzyJoin.editDistancePairs(strs.toDF("s"), "s", maxDist = 2)
      .as[(String, String, Int)].collect().toSet
    assert(out == naivePairs(strs, 2))
    assert(out.contains(("red belt", "red bolt", 1)))
    assert(out.exists { case (a, b, _) => a == "hot bear" && b == "hot gear" })
  }

  test("short strings below the q-gram bound go through the fallback bucket") {
    // len < q*d + q = 6 at q=2,d=2: the gram prefix gives NO guarantee
    // ("ab" vs "cd" share zero bigrams at distance 2) — only the explicit
    // short×short cross can find these.
    val strs = Seq("ab", "cd", "abc", "axc", "x", "xy", "longer string", "longer strung")
    val out = FuzzyJoin.editDistancePairs(strs.toDF("s"), "s", maxDist = 2)
      .as[(String, String, Int)].collect().toSet
    assert(out == naivePairs(strs, 2))
    assert(out.contains(("ab", "cd", 2))) // zero shared grams, still found
  }

  test("threshold 1 on a vocabulary with duplicates-by-distance clusters") {
    val strs = Seq("kitten", "sitten", "sittin", "sitting", "mitten")
    val out = FuzzyJoin.editDistancePairs(strs.toDF("s"), "s", maxDist = 1)
      .as[(String, String, Int)].collect().toSet
    assert(out == naivePairs(strs, 1))
  }

  test("lookup: best match per probe, ties to smallest string, lossless") {
    val dict = Seq("red bolt", "red belt", "blue bolt", "small gizmo",
      "hot gear", "ab", "cd")
    val probes = Seq("red bol", "smal gizmo", "hot bear", "zzzz unrelated",
      "ac", "red belt")
    val out = FuzzyJoin.editDistanceLookup(
        probes.toDF("p"), dict.toDF("d"), "p", "d", maxDist = 2)
      .as[(String, String, Int)].collect()
      .map { case (p, m, dd) => p -> (m, dd) }.toMap
    // naive best-match
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    val expected = probes.distinct.flatMap { p =>
      val c = dict.map(m => (lev(p, m), m)).filter(_._1 <= 2)
      if (c.isEmpty) None else Some(p -> { val b = c.min; (b._2, b._1) })
    }.toMap
    assert(out == expected, s"got $out vs $expected")
    // "red bol" is dist 1 from "red bolt" (delete t) but 2 from "red belt"
    assert(out("red bol") == ("red bolt", 1))
    // exact dict member probes resolve to themselves at dist 0
    assert(out("red belt") == ("red belt", 0))
    // short probe "ac" only reachable through the short×short bucket
    assert(out("ac")._2 == 1)
    assert(!out.contains("zzzz unrelated"))
  }

  test("grouped binning: per-group edges equal the per-group naive ranks") {
    val rows = for {
      g <- Seq("a", "b", "c"); i <- 0 until (g(0) - 'a' + 1) * 40
    } yield (g, ((i * 7919) % 500) / 2.0 - 50.0) // negatives included
    val df = rows.toDF("g", "v")
    val k = 4
    val got = Binning.groupedEqualFrequencyEdges(df, "g", "v", k, 30.0)
      .as[(String, Int, Double)].collect().toSet
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val sorted = rs.map(_._2).sorted
      (1 until k).map(i =>
        (g, i, sorted(math.ceil(i.toDouble * sorted.size / k).toInt - 1)))
    }.toSet
    assert(got == expected, s"got $got")
  }

  test("binning: edges equal the naive sorted-rank edges; bins partition rows") {
    val vals = (0 until 997).map(i => ((i * 7919) % 1000) / 3.0)
    val df = vals.toDF("v")
    val k = 8
    val edges = Binning.equalFrequencyEdges(df, "v", k, bucketWidth = 50.0)
      .as[(Int, Double)].collect().sortBy(_._1)
    val sorted = vals.sorted
    val expected = (1 until k).map(i =>
      (i, sorted(math.ceil(i.toDouble * vals.size / k).toInt - 1)))
    assert(edges.toSeq == expected)
    val binned = Binning.assign(df, "v",
      Binning.equalFrequencyEdges(df, "v", k, 50.0), "bin")
    val counts = binned.groupBy("bin").count()
      .as[(Int, Long)].collect().toMap
    assert(counts.keySet == (0 until k).toSet)
    assert(counts.values.sum == vals.size)
    // near-distinct data: every bin within ±1 of n/k after tie runs
    assert(counts.values.forall(c => math.abs(c - vals.size / k) <= k))
  }
}
