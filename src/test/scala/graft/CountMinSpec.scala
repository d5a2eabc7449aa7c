package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CountMin

class CountMinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // skewed stream: key sqrt(id) — frequency of key k is ~2k+1
  private lazy val stream = spark.range(10000)
    .select(floor(sqrt(col("id"))).cast("long").as("k"))

  test("estimates never undercount, overshoot within the CM bound") {
    val sketch = CountMin.build(stream, "k", width = 256, depth = 4)
    val exact = stream.groupBy("k").agg(count(lit(1)).as("exact"))
      .withColumn("k", col("k").cast("string"))
    val joined = CountMin.estimate(exact, sketch, "k", 256, 4)
      .join(exact, Seq("k"))
      .select(col("est_count"), col("exact")).as[(Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (est, ex) =>
      assert(est >= ex, s"undercount: est $est < exact $ex")
    }
    // e*N/w bound with generous slack (N=10000, w=256 -> ~107 expected)
    assert(joined.count { case (est, ex) => est - ex > 400 } == 0)
  }

  test("counter additivity: merged increment builds == monolithic build") {
    val a = stream.filter(col("k") % 2 === 0)
    val b = stream.filter(col("k") % 2 =!= 0)
    val merged = CountMin.build(a, "k", 128, 4)
      .unionByName(CountMin.build(b, "k", 128, 4))
      .groupBy("row_id", "col_id").agg(sum(col("cnt")).as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    val mono = CountMin.build(stream, "k", 128, 4)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == mono)
  }

  test("unseen keys estimate 0 when their cells are empty") {
    val sketch = CountMin.build(Seq("a").toDF("k"), "k", 4096, 4)
    val est = CountMin.estimate(Seq("zzz-never-seen").toDF("k"), sketch, "k",
      4096, 4).select("est_count").as[Long].head()
    assert(est == 0L)
  }
}
