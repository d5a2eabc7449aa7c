package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{Det, Tables}

/** Dev scratch: bisect the fixed ~6 s cold-run cost of the shingle
  * explode family (t_ngram_novelty et al). Each variant is timed in the
  * SAME fresh JVM, coarsest last, so the first variant absorbs the
  * session/JIT warmup the way the bench's first run does.
  * Usage: runMain graft.tools.ColdProbe <sfDir> <variant...>
  */
object ColdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val variants = args.drop(1)
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
    // same warmup as Bench
    try spark.read.parquet(s"$sfDir/region.parquet").count() catch { case _: Throwable => () }

    def docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[coldprobe] $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.3fs rows=$n")
    }

    variants.foreach {
      case "scan" => time("scan")(docs.count())
      case "explode_seq" => time("explode_seq")(
        docs.filter(size(col("t")) >= 3)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(t) - 2), i -> concat(" +
              "element_at(t, i), ' ', element_at(t, i + 1), ' ', " +
              "element_at(t, i + 2)))")).as("sg"))
          .count())
      case "h56" => time("h56")(
        docs.filter(size(col("t")) >= 3)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(t) - 2), i -> concat(" +
              "element_at(t, i), ' ', element_at(t, i + 1), ' ', " +
              "element_at(t, i + 2)))")).as("sg"))
          .select(col("doc_id"), Det.h56(col("sg")).as("shash"))
          .count())
      case "distinct" => time("distinct")(
        docs.filter(size(col("t")) >= 3)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(t) - 2), i -> concat(" +
              "element_at(t, i), ' ', element_at(t, i + 1), ' ', " +
              "element_at(t, i + 2)))")).as("sg"))
          .select(col("doc_id"), Det.h56(col("sg")).as("shash"))
          .distinct()
          .count())
      case "full" => time("full")(
        SparkEntryRef.run(spark, sfDir, "t_ngram_novelty"))
      case v if v.startsWith("phases:") =>
        val qn = v.stripPrefix("phases:")
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(qn)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.assertAnalyzed()
        val t2 = System.nanoTime()
        df.queryExecution.optimizedPlan
        val t3 = System.nanoTime()
        df.queryExecution.executedPlan
        val t4 = System.nanoTime()
        val n = df.count()
        val t5 = System.nanoTime()
        println(f"[coldprobe] $qn phases: construct=${(t1-t0)/1e9}%.3f analyze=${(t2-t1)/1e9}%.3f optimize=${(t3-t2)/1e9}%.3f plan=${(t4-t3)/1e9}%.3f execute=${(t5-t4)/1e9}%.3f rows=$n")
      case v if v.startsWith("hash:") =>
        // contention probe: spread the doc scan 32 ways, explode shingles,
        // hash each with the named function, count. Run twice for warm.
        val which = v.stripPrefix("hash:")
        val base = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
          .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), split(col("text"), " ").as("t"))
          .filter(size(col("t")) >= 3)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(t) - 2), i -> concat(" +
              "element_at(t, i), ' ', element_at(t, i + 1), ' ', " +
              "element_at(t, i + 2)))")).as("sg"))
        val hashed = which match {
          case "md5"  => base.select(conv(substring(md5(col("sg")), 1, 14), 16, 10).cast("long").as("h"))
          case "md5raw" => base.select(md5(col("sg")).as("h"))
          case "xx"   => base.select(xxhash64(col("sg")).as("h"))
          case "sha2" => base.select(sha2(col("sg"), 256).as("h"))
          case "none" => base.select(length(col("sg")).as("h"))
        }
        (1 to 2).foreach { i =>
          val t0 = System.nanoTime()
          val n = hashed.agg(count(lit(1))).collect()(0).getLong(0)
          println(f"[coldprobe] hash:$which rep $i ${(System.nanoTime() - t0) / 1e9}%8.3fs rows=$n")
        }
      case v if v.startsWith("listen:") =>
        val qn = v.stripPrefix("listen:")
        import org.apache.spark.scheduler._
        val stages = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long, Int)]()
        val lst = new SparkListener {
          override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
            stages += ((si.stageId, si.name.take(60), dur,
              si.taskMetrics.executorRunTime, si.numTasks))
          }
        }
        spark.sparkContext.addSparkListener(lst)
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(qn)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // let the listener bus drain
        spark.sparkContext.removeSparkListener(lst)
        println(f"[coldprobe] $qn listen wall=$wall%.3f rows=$n")
        stages.sortBy(-_._3).take(12).foreach { case (id, nm, dur, run, nt) =>
          println(f"[coldprobe]   stage $id%4d wall=${dur/1000.0}%7.3f taskSum=${run/1000.0}%8.3f ntasks=$nt%3d $nm")
        }
        println(f"[coldprobe]   stageWallSum=${stages.map(_._3).sum/1000.0}%.3f nstages=${stages.size}")
      case other => println(s"[coldprobe] unknown variant $other")
    }
    spark.stop()
  }

  object SparkEntryRef {
    def run(spark: SparkSession, sfDir: String, name: String): Long =
      graft.SparkEntry.queries(name)(spark, sfDir).count()
  }
}
