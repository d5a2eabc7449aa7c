package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The AUTOMATIC answer to join skew, next to the manual one.
  *
  * j_salted_skew_join documents manual salting — the fallback that works
  * for skewed AGGREGATION keys and engines without runtime re-planning.
  * For plain skewed JOINS the engine's first answer at 100 TB is AQE's
  * skew-join split: after the shuffle's map stage, runtime statistics
  * reveal the oversized partition, and OptimizeSkewedJoin splits it into
  * sub-partitions (duplicating the matching build side) so one hot key
  * no longer serializes through one task. This spec proves the engine's
  * configuration actually triggers it: a deliberately skewed key (one key
  * carrying ~98% of rows) through a sort-merge join must come back from
  * execution with `isSkewJoin = true` on the final adaptive plan.
  *
  * Thresholds are scaled down (KB, not the 256MB production default)
  * because the fixture's hot partition is KB-sized — the *mechanism*
  * under test is identical. Config is scoped to an isolated session.
  */
class AqeSkewSpec extends AnyFunSuite {

  test("AQE splits the skewed side of a sort-merge join at runtime") {
    val spark = SparkTestSession.spark.newSession()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    // fixture-scale thresholds: hot partition ~hundreds of KB
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    // keep AQE from collapsing the small shuffle into one partition
    // before the skew reader can split it
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // force the sort-merge path (a broadcast join would sidestep skew)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "4")

    // ~98% of the fact side lands on key 0; dim side is uniform
    val fact = spark.range(200000).select(
      when(col("id") < 196000, 0L).otherwise(col("id") % 97 + 1).as("k"),
      col("id").as("v"))
    val dim = spark.range(98).select(col("id").as("k"), (col("id") * 2).as("w"))
    val joined = fact.join(dim.hint("merge"), "k")
      .groupBy("k").agg(count(lit(1)).as("n"))

    // correctness first: the skew split must not change the result
    val rows = joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(0L) == 196000L, s"hot key count: ${rows.get(0L)}")
    assert(rows.size == 98, s"key count: ${rows.size}")

    // collect() executed THIS df's QueryExecution: inspect its final
    // adaptive plan for the runtime skew split
    val adaptive = joined.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => a
    }.getOrElse(fail("no AdaptiveSparkPlanExec — AQE did not engage"))
    // materialized stages appear as QueryStageExec leaves in the final
    // plan; the join lives INSIDE one, so descend through stage plans
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val inner = p match {
        case q: QueryStageExec => allNodes(q.plan)
        case _ => Seq.empty
      }
      p +: (p.children.flatMap(allNodes) ++ inner)
    }
    val smjs = allNodes(adaptive.executedPlan)
      .collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, "no SortMergeJoin in the final adaptive plan")
    assert(smjs.exists(_.isSkewJoin),
      "AQE did not mark the sort-merge join as a skew join — the hot " +
        "partition ran through a single task")
  }
}
