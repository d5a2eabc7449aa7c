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

  test("triangleCounts: K4 + pendant, direction/duplicate/self-loop noise") {
    // K4 on {0,1,2,3}: 4 triangles, every member sits in C(3,2)=3 of them.
    // Node 4 hangs off node 0 (pendant: zero triangles); node 5 isolated.
    val nodes = spark.range(6).select(col("id"))
    val k4 = for { i <- 0L to 3L; j <- 0L to 3L if i < j } yield (i, j)
    val edges = (k4 ++ Seq((4L, 0L), (0L, 4L), (1L, 0L), (2L, 2L)))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(nodes, edges, "id")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L,
      4L -> 0L, 5L -> 0L), s"got $got")
  }

  test("bfs: hop distances, depth bound, diamond reached once") {
    // chain 0→1→2→3 plus diamond 0→4, 0→5, 4→6, 5→6
    val nodes = spark.range(7).select(col("id"))
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 4L), (0L, 5L),
      (4L, 6L), (5L, 6L)).toDF("src", "dst")
    val got = Graph.bfs(nodes, edges, "id", col("id") === 0, rounds = 2)
      .as[(Long, Long)].collect().toMap
    // node 3 is 3 hops out: absent at rounds=2; node 6 has two 2-hop
    // paths but one distance
    assert(got === Map(0L -> 0L, 1L -> 1L, 4L -> 1L, 5L -> 1L,
      2L -> 2L, 6L -> 2L), s"got $got")
    val full = Graph.bfs(nodes, edges, "id", col("id") === 0, rounds = 5)
      .as[(Long, Long)].collect().toMap
    assert(full(3L) === 3L)
  }

  test("triangleCounts: triangle chain counts shared nodes once per triangle") {
    // 0-1-2 and 2-3-4 triangles sharing node 2
    val nodes = spark.range(5).select(col("id"))
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L),
      (4L, 2L)).toDF("src", "dst")
    val got = Graph.triangleCounts(nodes, edges, "id")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 1L),
      s"got $got")
  }

  test("kcore: peels the tail layer by layer, keeps the clique") {
    // 4-clique {0,1,2,3} + tail 3→4→5; duplicate + reversed edges mixed in
    val nodes = spark.range(6).select(col("id"))
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (3L, 2L), (3L, 4L), (4L, 5L), (4L, 4L))
      .toDF("src", "dst")
    // k=2: round 1 drops 5 (deg 1), round 2 drops 4; clique survives at
    // residual degree 3 — needs ≥ 2 rounds to converge
    val k2 = Graph.kcore(nodes, edges, "id", k = 2, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(k2 == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L), s"got $k2")
    // k=4: clique degree is only 3 — everything peels away
    val k4 = Graph.kcore(nodes, edges, "id", k = 4, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(k4.isEmpty, s"got $k4")
    // too few rounds: the tail's inner node is still present mid-peel
    val mid = Graph.kcore(nodes, edges, "id", k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(mid.keySet == Set(0L, 1L, 2L, 3L, 4L), s"got $mid")
  }

  test("commonNeighbors: counts wedges, excludes existing edges") {
    // square 0-1-2-3-0 plus chord 0-2: diagonals share neighbors
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L),
      (2L, 0L)) // duplicate reversed edge normalized away
      .toDF("src", "dst")
    val got = Graph.commonNeighbors(edges, topK = 10)
      .as[(Long, Long, Long)].collect().toSet
    // 1-3 share {0, 2} and are NOT adjacent → cn 2; every other sharing
    // pair is an existing edge and must be excluded
    assert(got == Set((1L, 3L, 2L)), s"got $got")
  }
}
