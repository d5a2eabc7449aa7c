package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.engine.SilverCovid

/** Semantic traps from SURVEY §7.4 as golden assertions on literal frames
  * (FIXTURES.md family A). */
class SilverCovidSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def covid(rows: (String, String, Double, Double, Double)*) =
    rows.toDF("country", "record_date", "confirmed", "deaths", "recovered")
      .withColumn("record_date",
        org.apache.spark.sql.functions.to_date($"record_date"))

  test("W1 diff: first row per country is 0, others are day deltas") {
    val out = SilverCovid.transform(covid(
      ("US", "2020-01-01", 10, 0, 0),
      ("US", "2020-01-02", 25, 0, 0),
      ("FR", "2020-01-01", 5, 0, 0)))
      .select("country", "record_date", "daily_new_cases")
      .collect().map(r => (r.getString(0), r.getDouble(2))).toSet
    assert(out === Set(("US", 0.0), ("US", 15.0), ("FR", 0.0)))
  }

  test("W1 quirk: provinces interleave within one country diff group") {
    // reference groups by country only (transform_silver.py:312-314);
    // dates sort within country, province not in the key
    val df = covid(
      ("CA", "2020-01-01", 10, 0, 0),
      ("CA", "2020-01-02", 30, 0, 0))
      .withColumn("province",
        org.apache.spark.sql.functions.lit("ON"))
    val out = SilverCovid.transform(df)
      .select("daily_new_cases").as[Double].collect().sorted
    assert(out === Array(0.0, 20.0))
  }

  test("W2 rolling mean shrinks at group start (min_periods=1)") {
    val out = SilverCovid.transform(covid(
      ("US", "2020-01-01", 0, 0, 0),
      ("US", "2020-01-02", 10, 0, 0),
      ("US", "2020-01-03", 20, 0, 0)))
      .orderBy("record_date")
      .select("weekly_avg_cases").as[Double].collect()
    // deltas: 0, 10, 10 → shrinking means: 0/1, 10/2, 20/3
    assert(out(0) === 0.0)
    assert(out(1) === 5.0)
    assert(out(2) === 6.67)
  }

  test("rates guard: confirmed=0 → 0, not null/error") {
    val out = SilverCovid.transform(covid(("US", "2020-01-01", 0, 5, 3)))
      .select("mortality_rate", "recovery_rate", "active").collect().head
    assert(out === Row(0.0, 0.0, 0.0)) // active clamped to >= 0
  }

  test("score penalties: deaths>confirmed −20, recovered>confirmed −20") {
    val out = SilverCovid.transform(covid(("US", "2020-01-01", 10, 15, 20)))
      .select("data_quality_score").as[Int].collect().head
    assert(out === 60)
  }

  test("outlier flag + −10 at configured thresholds") {
    val out = SilverCovid.transform(
      covid(("US", "2020-01-01", 100, 0, 0)),
      SilverCovid.Thresholds(outlierConfirmed = 50, outlierDaily = 1e9))
      .select("is_outlier", "data_quality_score").collect().head
    assert(out === Row(true, 90))
  }

  test("dedup keeps exactly one row per (date, country, province)") {
    val df = covid(
      ("US", "2020-01-01", 10, 0, 0),
      ("US", "2020-01-01", 99, 0, 0))
    assert(SilverCovid.transform(df).count() === 1)
  }
}
