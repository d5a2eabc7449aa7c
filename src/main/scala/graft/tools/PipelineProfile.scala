package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: per-stage wall-clock of the medallion run, by running it
  * twice — once as-is for the total, once with a listener counting jobs —
  * plus a stage-by-stage manual replay mirroring Pipeline.run's actions.
  * Usage: runMain graft.tools.PipelineProfile [sfDir]
  */
object PipelineProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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

    // warm the session (codegen, FS, parquet footers)
    graft.engine.Tables.events(spark, sfDir).count()

    for (i <- 1 to 3) {
      val lake = java.nio.file.Files.createTempDirectory(s"profile-lake$i").toString
      val t = System.nanoTime()
      new graft.engine.Pipeline(spark, lake).run(sfDir)
      println(f"[profile] Pipeline.run #$i%d            ${(System.nanoTime() - t) / 1e9}%6.2fs")
    }
    spark.stop()
  }
}
