package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin
import java.sql.Timestamp

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of semantics: most recent <=, inclusive ties, null before first") {
    val quotes = Seq(
      (1L, ts("2020-01-01 10:00:00"), 100.0),
      (1L, ts("2020-01-01 12:00:00"), 110.0),
      (2L, ts("2020-01-01 11:00:00"), 50.0))
      .toDF("q_key", "q_ts", "price")
    val trades = Seq(
      (1L, 1L, ts("2020-01-01 09:00:00")), // before any quote → null
      (2L, 1L, ts("2020-01-01 10:00:00")), // exact tie → inclusive (100)
      (3L, 1L, ts("2020-01-01 11:59:59")), // between → 100
      (4L, 1L, ts("2020-01-01 13:00:00")), // after last → 110
      (5L, 2L, ts("2020-01-01 12:00:00")), // other key → 50
      (6L, 3L, ts("2020-01-01 12:00:00"))) // unknown key → null
      .toDF("trade_id", "t_key", "t_ts")
    val out = AsOfJoin.asof(trades, quotes,
        "t_key", "q_key", "t_ts", "q_ts", Seq("price"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(1L) === None)
    assert(out(2L) === Some(100.0))
    assert(out(3L) === Some(100.0))
    assert(out(4L) === Some(110.0))
    assert(out(5L) === Some(50.0))
    assert(out(6L) === None)
  }

  test("matched row's NULL payload stays NULL; multi-column payload moves as a unit") {
    // quote at 12:00 has price=NULL, size=7 — a trade after it must see
    // (NULL, 7), not the 10:00 row's price bleeding through per-column
    val quotes = Seq(
      (1L, ts("2020-01-01 10:00:00"), Option(100.0), Option(5L)),
      (1L, ts("2020-01-01 12:00:00"), None: Option[Double], Option(7L)))
      .toDF("q_key", "q_ts", "price", "size")
    val trades = Seq(
      (1L, 1L, ts("2020-01-01 11:00:00")),
      (2L, 1L, ts("2020-01-01 13:00:00")))
      .toDF("trade_id", "t_key", "t_ts")
    val out = AsOfJoin.asof(trades, quotes,
        "t_key", "q_key", "t_ts", "q_ts", Seq("price", "size"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(3)) None else Some(r.getDouble(3))),
         (if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(out(1L) === ((Some(100.0), Some(5L))))
    assert(out(2L) === ((None, Some(7L))))
  }

  test("duplicate right rows at the same (key, ts) resolve deterministically") {
    // two quotes at the identical instant: the greatest payload struct
    // (here the higher price) must be carried, on every run and under any
    // partitioning — never a partition-order-dependent pick
    val quotes = Seq(
      (1L, ts("2020-01-01 10:00:00"), 100.0),
      (1L, ts("2020-01-01 10:00:00"), 105.0),
      (1L, ts("2020-01-01 10:00:00"), 95.0))
      .toDF("q_key", "q_ts", "price")
    val trades = Seq((1L, 1L, ts("2020-01-01 11:00:00")))
      .toDF("trade_id", "t_key", "t_ts")
    (1 to 3).foreach { n =>
      val out = AsOfJoin.asof(trades, quotes.repartition(n),
          "t_key", "q_key", "t_ts", "q_ts", Seq("price"))
        .collect()
      assert(out.head.getDouble(3) === 105.0, s"repartition($n)")
    }
  }

  test("nearest: either direction, equal-distance → earlier, ties → min id") {
    // probes at t=100: backward cand at 90 (diff 10), forward at 110
    // (diff 10) → EARLIER (90) wins; probe at t=200 only forward; probe
    // key 3 has no candidates at all → NULLs preserved
    val probes = Seq((1L, 1L, 100L), (2L, 1L, 200L), (3L, 3L, 50L))
      .toDF("pid", "key", "pts")
    val cands = Seq(
      (10L, 1L, 90L, "b"),   // diff 10 backward from t=100
      (11L, 1L, 110L, "f"),  // diff 10 forward from t=100
      (12L, 1L, 110L, "g"),  // same ts as 11 → min id 11 wins that slot
      (13L, 1L, 260L, "x"))  // diff 60 forward from t=200
      .toDF("cid", "ckey", "cts", "tag")
    val out = AsOfJoin.nearest(probes, cands, "key", "ckey",
        "pts", "cts", "cid", Seq("cid", "tag"))
      .select("pid", "cid", "tag", "nearest_diff")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getString(2), r.getLong(3)))))
      .toMap
    assert(out(1L) === Some((10L, "b", 10L)), s"got ${out(1L)}")
    assert(out(2L) === Some((13L, "x", 60L)))
    assert(out(3L) === None)
    // exact-tie at the same forward ts resolves to the smallest id
    val probes2 = Seq((1L, 1L, 105L)).toDF("pid", "key", "pts")
    val out2 = AsOfJoin.nearest(probes2, cands, "key", "ckey",
        "pts", "cts", "cid", Seq("cid"))
      .select("cid").collect().head.getLong(0)
    assert(out2 === 11L, s"got $out2")
  }
}
