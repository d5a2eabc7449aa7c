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

  /** `events.ts` physical-type normalization — the driver has shipped this
    * column as parquet TIMESTAMP(NANOS) (read as LongType under
    * spark.sql.legacy.parquet.nanosAsLong=true) and as TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (read as TIMESTAMP_NTZ) across rounds; both
    * are normalized here to a session-zone TIMESTAMP so downstream
    * instant functions (`unix_micros`, window math) resolve identically
    * regardless of fixture vintage.
    *  - LongType nanos → integer `div` 1000 (not double math: ~1.7e18 ns
    *    exceeds double's 2^53 exact range), truncation matching DuckDB's
    *    ns→µs conversion.
    *  - TIMESTAMP_NTZ → cast to TIMESTAMP under the session's UTC zone:
    *    same wall-clock micros, now an instant — bit-identical to what
    *    DuckDB computes from the naive value. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = s.read.parquet(s"$d/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
