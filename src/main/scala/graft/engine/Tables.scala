package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided testdata lake (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All queries go through here so
  * scans stay uniform: plain `spark.read.parquet` → Catalyst handles column
  * pruning + predicate pushdown into the parquet reader (verify via
  * `.explain("formatted")`: PushedFilters / ReadSchema).
  *
  * At 100 TB these would be partitioned/bucketed table locations instead of
  * single files; the API (name → DataFrame) is the stable seam.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS); when the session reads nanos
    * as LongType (spark.sql.legacy.parquet.nanosAsLong=true) normalize to a
    * microsecond timestamp — integer `div` (not double math: ~1.7e18 ns
    * exceeds double's 2^53 exact range), truncation matching DuckDB's
    * ns→µs conversion. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = s.read.parquet(s"$d/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
