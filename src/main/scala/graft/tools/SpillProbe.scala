package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: run named queries under whatever heap the JVM was given
  * (SPARK_DRIVER_MEM) and report, per query, the wall plus the
  * listener-collected task totals of memoryBytesSpilled /
  * diskBytesSpilled and peakExecutionMemory — the hard evidence that a
  * constrained-memory run actually SPILLED through
  * UnsafeExternalSorter/ExternalAppendOnlyMap rather than never feeling
  * pressure (or OOMing). Emits one JSON line per query and a totals
  * line, for the ARCHITECTURE MEMORY note. Not part of the driver
  * contract.
  *
  * Usage: SPARK_DRIVER_MEM=2g sbt "runMain graft.tools.SpillProbe <sfDir> <query...>"
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
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
    val memSpilled = new AtomicLong
    val diskSpilled = new AtomicLong
    val peakMem = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          memSpilled.addAndGet(m.memoryBytesSpilled)
          diskSpilled.addAndGet(m.diskBytesSpilled)
          peakMem.updateAndGet(p => math.max(p, m.peakExecutionMemory))
        }
      }
    })
    val heap = Runtime.getRuntime.maxMemory()
    var totMem = 0L
    var totDisk = 0L
    names.foreach { name =>
      memSpilled.set(0); diskSpilled.set(0); peakMem.set(0)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      // drop cached/locally-checkpointed blocks before the next query —
      // leftover storage memory from one query must not masquerade as
      // the next one's pressure (and at tight heaps it can tip a later
      // query into OOM that a fresh session would absorb)
      spark.catalog.clearCache()
      // scoped like Verify: drop the blocks Stage registered, NOT every
      // persistent RDD — a blanket unpersist would evict the memoized
      // shared lake and charge each later query a full re-stage
      graft.engine.Stage.releaseStaged(spark)
      // listener events drain asynchronously; give the bus a beat
      Thread.sleep(1000)
      val wall = (System.nanoTime() - t0) / 1e9
      totMem += memSpilled.get; totDisk += diskSpilled.get
      println(s"""SPILL {"query":"$name","rows":$n,""" +
        f""""wall_sec":$wall%.1f,""" +
        s""""memory_spilled_mb":${memSpilled.get / 1048576},""" +
        s""""disk_spilled_mb":${diskSpilled.get / 1048576},""" +
        s""""peak_exec_mem_mb":${peakMem.get / 1048576}}""")
    }
    println(s"""SPILL_TOTAL {"heap_mb":${heap / 1048576},""" +
      s""""queries":${names.length},""" +
      s""""memory_spilled_mb":${totMem / 1048576},""" +
      s""""disk_spilled_mb":${totDisk / 1048576}}""")
    spark.stop()
  }
}
