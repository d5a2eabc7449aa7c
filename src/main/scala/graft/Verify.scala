package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional: query names after outDir restrict the run (local iteration)
    val only = args.drop(2).toSet
    def selected(name: String) = only.isEmpty || only.contains(name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Non-ANSI: invalid casts → NULL (matches DuckDB TRY_CAST oracle
      // semantics); divisions are still explicitly zero-guarded in queries.
      .config("spark.sql.ansi.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS); read as long, normalized in
      // graft.engine.Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // cross-mode correctness runs (scripts/crossmode_verify.sh) set the
      // staging durability mode here; default matches Stage's default
      .config(graft.engine.Stage.modeKey,
        sys.env.getOrElse("SPARK_GRAFT_STAGE_MODE", "local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        spark.catalog.clearCache()
        // also free localCheckpoint blocks (see Bench.scala: the SQL cache
        // manager doesn't own them, and ContextCleaner lag lets them pile
        // into the storage fraction across 145 queries). Scoped to the
        // ids Stage registered, not all persistent RDDs.
        graft.engine.Stage.releaseStaged(spark)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // the FULL map, even on a restricted run: a second restricted Verify
    // into the same outDir must not shrink oracle_sql.json and demote the
    // first run's queries to rows-only (check.py looks up only the names
    // it is asked to grade, so extra keys are harmless)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
