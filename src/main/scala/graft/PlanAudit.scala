package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: build every SparkEntry query against a (small) sfDir and
  * report scale-hostile physical operators — CartesianProduct and
  * BroadcastNestedLoopJoin — with the query that planned them. 1-row
  * scalar combines legitimately plan as BNLJ; anything else is a bug.
  * Usage: runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.allDefs.foreach { q =>
      try {
        val plan = q.run(spark, sfDir).queryExecution.sparkPlan.toString
        val cart = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin")
        if (cart || bnlj)
          println(s"[audit] ${q.name}: " +
            (if (cart) "CartesianProduct " else "") +
            (if (bnlj) "BroadcastNestedLoopJoin" else ""))
      } catch { case e: Throwable =>
        println(s"[audit] ${q.name}: PLAN FAILED ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    println("[audit] done")
    spark.stop()
  }
}
