package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.SilverCovid
import graft.operators.{Chunking, Salting}
import scala.util.Random

/** Property-style invariants (SURVEY §5.3) over seeded-random covid-like
  * series and salted-operator equivalences. (Plain seeded generation
  * rather than scalatestplus property DSL — the offline dependency cache
  * carries scalatest + scalacheck only.)
  */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def randomSeries(seed: Int) = {
    val rnd = new Random(seed)
    val nCountries = 1 + rnd.nextInt(4)
    val nDays = 1 + rnd.nextInt(12)
    (for {
      c <- 0 until nCountries
      day <- 0 until nDays
    } yield (s"C$c", day, rnd.nextInt(100000).toDouble,
      rnd.nextInt(120000).toDouble, rnd.nextInt(120000).toDouble)).toList
  }

  private def toDf(rows: List[(String, Int, Double, Double, Double)]) =
    rows.toDF("country", "day", "confirmed", "deaths", "recovered")
      .withColumn("record_date",
        date_add(lit("2020-01-01").cast("date"), col("day")))
      .drop("day")

  test("invariants: active ≥ 0, rate guard at 0, score ∈ [0,100]") {
    (1 to 8).foreach { seed =>
      val out = SilverCovid.transform(toDf(randomSeries(seed))).select(
        min("active").as("mina"),
        min("mortality_rate").as("minr"),
        min(when(col("confirmed") === 0, col("mortality_rate"))).as("zero_rate"),
        min("data_quality_score").as("mins"),
        max("data_quality_score").as("maxs"))
        .collect().head
      assert(out.getDouble(0) >= 0.0, s"seed $seed: active < 0")
      assert(out.getDouble(1) >= 0.0, s"seed $seed: negative rate")
      assert(out.isNullAt(2) || out.getDouble(2) === 0.0,
        s"seed $seed: confirmed=0 rate not 0")
      assert(out.getInt(3) >= 0 && out.getInt(4) <= 100, s"seed $seed: score")
    }
  }

  test("telescoping: sum(daily_new_cases) = last(confirmed) − first(confirmed)") {
    (1 to 8).foreach { seed =>
      SilverCovid.transform(toDf(randomSeries(100 + seed)))
        .groupBy("country").agg(
          sum("daily_new_cases").as("s"),
          expr("max_by(confirmed, record_date) - min_by(confirmed, record_date)").as("diff"))
        .collect()
        .foreach { r =>
          assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-6,
            s"seed $seed, ${r.getString(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}")
        }
    }
  }

  test("salted aggregation ≡ plain aggregation for several salt counts") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val plain = df.groupBy("l_returnflag")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
        .as("sum_l_extendedprice"), count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    Seq(1, 3, 8, 16).foreach { salts =>
      val salted = Salting.saltedSumCount(df, "l_returnflag",
          "l_extendedprice", salts)
        .orderBy("l_returnflag").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
      assert(salted === plain, s"salts=$salts")
    }
  }

  test("salted join ≡ plain join") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
    val salted = Salting.saltedJoin(orders, cust, "o_custkey", 8).count()
    val plain = orders.join(cust, Seq("o_custkey")).count()
    assert(salted === plain)
  }

  test("approx_count_distinct lands near exact") {
    val out = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("a"),
        countDistinct(col("o_custkey")).as("e")).collect().head
    val (a, e) = (out.getLong(0).toDouble, out.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.1, s"approx $a vs exact $e")
  }

  test("percentile_approx lands near the exact interpolated percentile") {
    val out = graft.engine.Tables.events(spark, "/root/testdata/sf0.001")
      .agg(
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("a"),
        expr("percentile(value, 0.5D)").as("e")).collect().head
    val (a, e) = (out.getDouble(0), out.getDouble(1))
    assert(math.abs(a - e) / math.max(e, 1e-9) < 0.05, s"approx $a vs exact $e")
  }

  test("chunking reconstructs every doc: drop the overlap, get the tokens back") {
    val rnd = new Random(11)
    val docs = (0 until 30).map { i =>
      val n = rnd.nextInt(50) // includes 0-token docs
      (i.toLong, (0 until n).map(j => s"t${rnd.nextInt(9)}_$j").mkString(" "))
    }
    val (chunk, overlap) = (7, 3)
    val step = chunk - overlap
    val out = Chunking.byTokens(docs.toDF("doc_id", "text"), "doc_id", "text",
        chunk, overlap)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(_.getString(2)).toList)
      .toMap
    docs.foreach { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").toList
      val chunks = out(id)
      // stitch: first chunk whole, then each subsequent minus its overlap
      val stitched = chunks.head.split(" ").toList ++
        chunks.tail.flatMap(_.split(" ").drop(overlap))
      assert(stitched === toks, s"doc $id not reconstructable")
      // each chunk's length is exactly min(chunk, n - start), tail-clamped
      chunks.zipWithIndex.foreach { case (c, i) =>
        val expected = math.min(chunk, toks.length - i * step)
        assert(c.split(" ").length === expected, s"doc $id chunk $i")
      }
      // every start is a valid token position
      assert((chunks.size - 1) * step < math.max(toks.length, 1))
    }
  }
}
