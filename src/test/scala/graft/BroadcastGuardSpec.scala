package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions

class BroadcastGuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def joinHint(df: DataFrame) =
    df.queryExecution.optimizedPlan.collectFirst { case j: Join => j.hint }.get

  test("oversized broadcast hint is stripped; a genuinely small one survives") {
    GraftFunctions.register(spark)
    val probe = spark.range(10).toDF("k2")
    spark.conf.set("spark.graft.broadcastGuard.maxBytes", "1000")
    try {
      // ~800 KB estimated — far over the 1000-byte cap: hint must go
      val big = spark.range(100000).toDF("k")
      val stripped = joinHint(probe.join(broadcast(big), col("k2") === col("k")))
      assert(stripped.rightHint.forall(_.strategy.isEmpty),
        s"oversized hint survived: $stripped")
      // 5 rows — under the cap: hint must be honored untouched
      val small = spark.range(5).toDF("k")
      val kept = joinHint(probe.join(broadcast(small), col("k2") === col("k")))
      assert(kept.rightHint.exists(_.strategy.contains(BROADCAST)),
        s"small hint lost: $kept")
    } finally spark.conf.unset("spark.graft.broadcastGuard.maxBytes")
  }

  test("with the default 1 GiB cap, ordinary dimension broadcasts pass through") {
    GraftFunctions.register(spark)
    val dim = spark.range(1000).toDF("k")
    val fact = spark.range(100000).toDF("k2")
    val h = joinHint(fact.join(broadcast(dim), col("k2") === col("k")))
    assert(h.rightHint.exists(_.strategy.contains(BROADCAST)))
  }
}
