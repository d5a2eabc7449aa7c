package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bloom

class BloomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def keys(ids: Range, prefix: String) =
    ids.map(i => s"$prefix-$i").toDF("k")

  test("no false negatives: every built key reports maybe_present") {
    val corpus = keys(0 until 2000, "in")
    val bloom = Bloom.build(corpus, "k", mBits = 65536, k = 5)
    val probed = Bloom.probe(corpus, bloom, "k", mBits = 65536, k = 5)
    assert(probed.filter(!col("maybe_present")).count() == 0)
  }

  test("false-positive rate on disjoint keys stays near the design rate") {
    val bloom = Bloom.build(keys(0 until 2000, "in"), "k", 65536, 5)
    val fp = Bloom.probe(keys(0 until 2000, "out"), bloom, "k", 65536, 5)
      .filter(col("maybe_present")).count()
    // theoretical rate (1 - e^(-kn/m))^k ≈ 2.6e-6 at n=2000, m=65536, k=5;
    // allow generous slack for family imperfection
    assert(fp <= 20, s"false positives: $fp / 2000")
  }

  test("OR-composability: merged incremental builds == monolithic build") {
    val a = Bloom.build(keys(0 until 1000, "in"), "k", 4096, 5)
    val b = Bloom.build(keys(1000 until 2000, "in"), "k", 4096, 5)
    val merged = a.unionByName(b).groupBy("word_idx")
      .agg(expr("bit_or(bits)").as("bits"))
    val mono = Bloom.build(keys(0 until 2000, "in"), "k", 4096, 5)
    val got = merged.as[(Long, Long)].collect().toMap
    val want = mono.as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("probe keeps batch multiplicity and other columns") {
    val batch = Seq((1L, "a"), (2L, "a"), (3L, "z")).toDF("id", "k")
    val bloom = Bloom.build(Seq("a").toDF("k"), "k", 4096, 5)
    val out = Bloom.probe(batch, bloom, "k", 4096, 5)
      .select("id", "maybe_present").as[(Long, Boolean)].collect().toMap
    assert(out(1L) && out(2L))
    assert(out.size == 3)
  }
}
