package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Scd2
import java.sql.Date

class Scd2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  // history: key 1 already has a closed v1 and an open v2; key 2 open; key 3 open
  private def current = Seq(
    (1L, "gold", d("2019-01-01"), Option(d("2020-01-01")), false),
    (1L, "platinum", d("2020-01-01"), None: Option[Date], true),
    (2L, "silver", d("2020-01-01"), None: Option[Date], true),
    (3L, "bronze", d("2020-01-01"), None: Option[Date], true))
    .toDF("cust_id", "tier", "valid_from", "valid_to", "is_current")

  // key 1 changes again, key 2 unchanged, key 3 absent, key 4 brand-new
  private def updates = Seq(
    (1L, "diamond"), (2L, "silver"), (4L, "basic"))
    .toDF("cust_id", "tier")

  test("scd2 merge closes changed rows, keeps history, inserts new keys") {
    val out = Scd2.merge(current, updates, "cust_id", Seq("tier"),
        lit("2021-06-01").cast("date"))
      .orderBy("cust_id", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString,
        Option(r.getDate(3)).map(_.toString), r.getBoolean(4)))
    assert(out.toSeq === Seq(
      (1L, "gold", "2019-01-01", Some("2020-01-01"), false),      // history untouched
      (1L, "platinum", "2020-01-01", Some("2021-06-01"), false),  // closed out
      (1L, "diamond", "2021-06-01", None, true),                  // new version
      (2L, "silver", "2020-01-01", None, true),                   // unchanged update
      (3L, "bronze", "2020-01-01", None, true),                   // no update
      (4L, "basic", "2021-06-01", None, true)))                   // brand-new key
  }

  test("merge is idempotent: re-applying the same snapshot changes nothing") {
    val once = Scd2.merge(current, updates, "cust_id", Seq("tier"),
      lit("2021-06-01").cast("date"))
    val twice = Scd2.merge(once, updates, "cust_id", Seq("tier"),
      lit("2021-07-01").cast("date"))
    assert(twice.count() === once.count())
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("duplicate keys in the update batch collapse deterministically") {
    val upd = Seq((1L, "diamond"), (1L, "silver"), (1L, "zinc"))
      .toDF("cust_id", "tier")
    (1 to 3).foreach { n =>
      val out = Scd2.merge(current, upd.repartition(n), "cust_id", Seq("tier"),
          lit("2021-06-01").cast("date"))
        .filter($"cust_id" === 1L && $"is_current")
        .collect()
      assert(out.length === 1, "exactly one open row per key")
      assert(out.head.getString(1) === "zinc", "greatest attrs tuple wins")
    }
  }

  test("NULL attr transitions count as changes (null-safe compare)") {
    val cur = Seq((1L, Option("gold"), d("2020-01-01"), None: Option[Date], true))
      .toDF("cust_id", "tier", "valid_from", "valid_to", "is_current")
    val upd = Seq((1L, None: Option[String])).toDF("cust_id", "tier")
    val out = Scd2.merge(cur, upd, "cust_id", Seq("tier"),
        lit("2021-06-01").cast("date"))
      .orderBy("valid_from").collect()
    assert(out.length === 2)
    assert(out(0).getBoolean(4) === false, "gold row closed")
    assert(out(1).isNullAt(1) && out(1).getBoolean(4), "open row carries NULL tier")
  }
}
