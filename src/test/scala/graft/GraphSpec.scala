package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("star graph: hub accumulates rank, leaves hold the base") {
    // 9 leaves all pointing at node 0; node 0 points at node 1
    val nodes = spark.range(10).select(col("id"))
    val edges = ((1L to 9L).map(i => (i, 0L)) :+ (0L, 1L)).toDF("src", "dst")
    val pr = Graph.pagerank(nodes, edges, "id", iterations = 5)
      .as[(Long, Double)].collect().toMap
    val hub = pr(0L)
    // every leaf (2..9) has no in-links: exactly the base rank
    val base = (1.0 - 0.85) / 10
    (2L to 9L).foreach(i => assert(math.abs(pr(i) - base) < 1e-9,
      s"leaf $i rank ${pr(i)} != base $base"))
    assert(hub > pr(1L) && pr(1L) > base + 1e-9,
      s"hub $hub > fed node ${pr(1L)} > base $base expected")
    assert(pr.values.forall(v => v > 0 && v < 1))
  }

  test("rank mass stays bounded by 1 and is deterministic across runs") {
    val nodes = spark.range(100).select(col("id"))
    val edges = spark.range(100).select(col("id").as("src"),
      ((col("id") * 7 + 3) % 100).as("dst"))
    def run() = Graph.pagerank(nodes, edges, "id", iterations = 4)
      .as[(Long, Double)].collect().toMap
    val a = run()
    val b = run()
    assert(a == b, "identical inputs must give bit-identical ranks")
    val mass = a.values.sum
    // simplified PR (no dangling redistribution): mass <= 1 + rounding slack
    assert(mass > 0.1 && mass <= 1.0 + 1e-6, s"mass $mass")
  }

  test("duplicate and self-loop edges are normalized away") {
    val nodes = spark.range(3).select(col("id"))
    val clean = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val noisy = Seq((0L, 1L), (0L, 1L), (0L, 0L), (1L, 2L), (2L, 2L))
      .toDF("src", "dst")
    val a = Graph.pagerank(nodes, clean, "id", 3).as[(Long, Double)]
      .collect().toMap
    val b = Graph.pagerank(nodes, noisy, "id", 3).as[(Long, Double)]
      .collect().toMap
    assert(a == b)
  }
}
