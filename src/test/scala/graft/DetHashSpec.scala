package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Det

/** Cross-engine contract for the md5-derived 56-bit hash: the golden
  * values below were computed in DuckDB v1.0 as
  * `CAST('0x'||substring(md5(s), pos, 14) AS BIGINT)` at pos 1 and 17 —
  * Spark's `conv(substring(md5(s), pos, 14), 16, 10)` must reproduce them
  * bit-for-bit, or every sampling/split/LSH oracle keyed on h56 drifts.
  */
class DetHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("h56 matches DuckDB golden values at both hex spans") {
    val golden = Map(
      "hello42" -> (49156304825265618L, 65189679344659414L),
      "0:123" -> (38289212522303763L, 30830916059535936L),
      "a b c" -> (1953239705055622L, 47283126883261207L),
      "" -> (59705185845313714L, 65724448282310722L),
      "7:doc-9" -> (3487689330424970L, 50405147225587523L))
    val got = golden.keys.toSeq.toDF("s")
      .select(col("s"), Det.h56(col("s")), Det.h56(col("s"), pos = 17))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == golden)
  }

  test("h56 stays non-negative and under 2^56 (affine-combination headroom)") {
    val vals = spark.range(1000)
      .select(Det.h56(concat(lit("s:"), col("id").cast("string"))).as("h"))
      .as[Long].collect()
    assert(vals.forall(v => v >= 0 && v < (1L << 56)))
    // enough headroom that h1 + 63*h2 cannot overflow a signed long
    assert((1L << 56) - 1 + 63L * ((1L << 56) - 1) > 0)
  }
}
