package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run named queries (or all, with no args) against a scale
  * dir with per-query wall time. Usage:
  *   runMain graft.Probe <sfDir> [query ...]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val explain = sys.env.get("PROBE_EXPLAIN").contains("1")
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        if (explain) {
          println(s"==== $n ====")
          println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        }
        val c = df.count()
        println(f"[probe] $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$c")
      } catch {
        case e: Throwable =>
          println(f"[probe] $n%-28s FAILED: ${e.getMessage.take(200)}")
      }
    }
    spark.stop()
  }
}
