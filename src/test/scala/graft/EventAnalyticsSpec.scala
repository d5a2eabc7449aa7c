package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventAnalytics

class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel counts only strictly-ordered step sequences") {
    val events = Seq(
      // u1: view -> click -> purchase, fully ordered
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      // u2: purchase BEFORE the first view — converts through click only
      (2L, "purchase", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-01 11:00:00")),
      // u3: view only
      (3L, "view", ts("2024-01-01 10:00:00")),
      // u4: click without any view — never enters the funnel
      (4L, "click", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("step")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1L, "view", 3L, 1.0),
      (2L, "click", 2L, 0.6667),
      (3L, "purchase", 1L, 0.3333)))
  }

  test("funnel: simultaneous events do not advance a step (strict >)") {
    val events = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click"))
      .orderBy("step").as[(Long, String, Long, Double)].collect()
    assert(out(1)._3 === 0L, "same-instant click must not count")
  }

  test("funnel conversion window drops slow converters, keeps fast ones") {
    val events = Seq(
      // u1 clicks 1h after viewing — inside a 2h window
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00")),
      // u2 clicks 3h after viewing — outside it
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-01 13:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click"),
        maxGap = Some(org.apache.spark.sql.functions.expr("INTERVAL 2 HOUR")))
      .orderBy("step").as[(Long, String, Long, Double)].collect()
    assert(out(0)._3 === 2L && out(1)._3 === 1L)
  }

  test("olsTrend recovers an exact line and nulls degenerate groups") {
    val pts = Seq(
      // g1: y = 3x + 2 exactly
      ("g1", 0, 2L), ("g1", 1, 5L), ("g1", 2, 8L), ("g1", 3, 11L),
      // g2: single x value — degenerate
      ("g2", 4, 7L), ("g2", 4, 9L))
      .toDF("grp", "x", "y")
    val out = EventAnalytics.olsTrend(pts, "grp", "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out("g1") === ((4L, Some(3.0), Some(2.0))))
    assert(out("g2") === ((2L, None, None)))
  }

  test("retention cohorts: offsets, sizes, and fractions by hand") {
    // week of 2024-01-01 (Mon) and 2024-01-08 (Mon)
    val events = Seq(
      (1L, ts("2024-01-02 10:00:00")), // cohort w0
      (1L, ts("2024-01-10 10:00:00")), // active w0+1
      (2L, ts("2024-01-03 10:00:00")), // cohort w0, never returns
      (3L, ts("2024-01-09 10:00:00"))) // cohort w1
      .toDF("user_id", "ts")
    val out = EventAnalytics.retentionCohorts(events, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .as[(java.sql.Date, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (java.sql.Date.valueOf("2024-01-01"), 0L, 2L, 2L, 1.0),
      (java.sql.Date.valueOf("2024-01-01"), 1L, 1L, 2L, 0.5),
      (java.sql.Date.valueOf("2024-01-08"), 0L, 1L, 1L, 1.0)))
  }

  test("transition matrix: planted sequences count and row-normalize") {
    // user 1: a→b→a→b  (a→b ×2, b→a ×1); user 2: a→c (×1)
    // from a: b twice, c once → p = 2/3, 1/3; cross-user steps never pair
    val events = Seq(
      (1L, 1L, "a", ts("2024-01-01 10:00:00")),
      (1L, 2L, "b", ts("2024-01-01 11:00:00")),
      (1L, 3L, "a", ts("2024-01-01 12:00:00")),
      (1L, 4L, "b", ts("2024-01-01 13:00:00")),
      (2L, 5L, "a", ts("2024-01-01 10:30:00")),
      (2L, 6L, "c", ts("2024-01-01 10:45:00")))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = EventAnalytics.transitionMatrix(events,
        "user_id", "event_type", "ts", "event_id")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out === Map(
      ("a", "b") -> ((2L, 0.666667)),
      ("a", "c") -> ((1L, 0.333333)),
      ("b", "a") -> ((1L, 1.0))), s"got $out")
  }
}
