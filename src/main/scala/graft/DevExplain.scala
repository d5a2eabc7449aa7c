package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted plan of named queries and time repeated
  * executions in one warm session (the Bench harness times a single cold
  * run per session — fine for the driver's round metric, useless for
  * isolating where a regression lives). Not part of the driver contract.
  *
  * Usage: runMain graft.DevExplain <sfDir> <nReps> <query...>
  */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (sys.env.contains("DEV_EXPLAIN_PLAN")) {
        println(s"==== $name plan ====")
        fn(spark, sfDir).explain("formatted")
      }
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"$name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3fs ($n rows)")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
