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

  test("semanticDedup ≡ brute-force keep rule on random vectors") {
    for (seed <- Seq(3, 17)) {
      val rnd = new Random(seed)
      val n = 40
      val dims = 8
      val vecs = (0 until n).map(i =>
        (i.toLong, Array.fill(dims)(rnd.nextGaussian().toFloat)))
      val cents = (0 until 4).map(c =>
        (c.toLong, Array.fill(dims)(rnd.nextGaussian().toFloat)))
      val out = graft.operators.Similarity.semanticDedup(
          vecs.toDF("vec_id", "embedding"), cents.toDF("cell", "c_emb"),
          threshold = 0.5)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      // driver-side reference: argmax-cosine cell (tie → lowest cell),
      // dropped iff a lower-id same-cell vector has rounded cos ≥ 0.5
      def cos(a: Array[Float], b: Array[Float]): Double = {
        val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
        val d = math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum)
        if (d > 0) ad.zip(bd).map { case (x, y) => x * y }.sum / d else 0.0
      }
      def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
      val cell = vecs.map { case (id, v) =>
        id -> cents.map { case (c, cv) => (c, cos(v, cv)) }
          .maxBy { case (c, s) => (s, -c) }._1
      }.toMap
      vecs.foreach { case (id, v) =>
        assert(out(id)._1 === cell(id), s"seed $seed cell of $id")
        val expectDropped = vecs.exists { case (j, w) =>
          j < id && cell(j) == cell(id) && r6(cos(w, v)) >= 0.5
        }
        assert(out(id)._2 === (if (expectDropped) 0L else 1L),
          s"seed $seed keep flag of $id")
      }
      // the lowest id of every cluster always survives
      cell.groupBy(_._2).foreach { case (_, members) =>
        assert(out(members.keys.min)._2 === 1L)
      }
    }
  }

  test("series correlation: affine copy r=1, negated r=-1, flat guarded to 0") {
    import graft.operators.TimeSeries
    val days = (1 to 10).map(i => java.sql.Date.valueOf(f"2024-01-$i%02d"))
    val q = days.zipWithIndex.map { case (d, i) => (d, (i + 1).toDouble) }
      .toDF("d", "qv")
    val series = days.zipWithIndex.flatMap { case (d, i) =>
      val x = (i + 1).toDouble
      Seq(("a", d, 2 * x + 5), ("b", d, -x), ("c", d, 7.0))
    }.toDF("k", "d", "v")
    val out = TimeSeries.correlationTopK(series, "k", "d", "v", q, k = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("a") === 1.0, "affine transform correlates perfectly")
    assert(out("b") === -1.0, "negated series anti-correlates")
    assert(out("c") === 0.0, "zero-variance series guarded to 0")
    // minPoints drops keys with too few aligned observations
    val sparse = Seq(("s", days.head, 1.0)).toDF("k", "d", "v")
    assert(TimeSeries.correlationTopK(series.unionByName(sparse),
      "k", "d", "v", q, k = 5, minPoints = 10).count() === 3)
  }

  test("best-lag detection finds the planted shift, zero for the sync copy") {
    import graft.operators.TimeSeries
    val days = (1 to 14).map(i => java.sql.Date.valueOf(f"2024-01-$i%02d"))
    // distinctive non-monotone reference values
    val qvals = (1 to 14).map(i => ((i * i * 7) % 13 + 1).toDouble)
    val q = days.zip(qvals).toDF("d", "qv")
    val series = (
      // trails the reference by 2 days: v(day i) = q(day i-2)
      days.drop(2).zip(qvals).map { case (d, x) => ("t2", d, x) } ++
      days.zip(qvals).map { case (d, x) => ("sync", d, x) })
      .toDF("k", "d", "v")
    val out = TimeSeries.bestLagCorrelation(series, "k", "d", "v", q,
        maxLag = 3, minPoints = 5)
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getDouble(3))))
      .toMap
    assert(out("t2") === ((2, 1.0)), s"planted 2-day trail: ${out("t2")}")
    assert(out("sync") === ((0, 1.0)), s"synchronous copy: ${out("sync")}")
  }

  test("duplicationWeights conserve mass: one unit per cluster or singleton") {
    val rnd = new Random(29)
    val n = 200
    // random pairs → clusters via the operator itself
    val pairs = (0 until 80).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val clusters = graft.operators.Dedup.connectedComponents(
      pairs.toDF("id_a", "id_b"))
    val docs = (0L until n.toLong).toDF("id")
    val out = graft.operators.Dedup.duplicationWeights(clusters, docs)
    val total = out.agg(sum("weight")).collect().head.getDouble(0)
    val nClusters = clusters.select("cluster_id").distinct().count()
    val nClustered = clusters.count()
    val expected = nClusters + (n - nClustered)
    // weights carry roundN(·, 6): a size-3 cluster sums to 0.999999, so
    // conservation holds to ~5e-7 per cluster, not exactly
    assert(math.abs(total - expected) < nClusters * 1e-6 + 1e-9,
      s"total weight $total != clusters+singletons $expected")
    // weights are positive and ≤ 1; cluster members share equal weight
    assert(out.filter(col("weight") <= 0 || col("weight") > 1).count() === 0)
  }

  test("gap-fill interpolation: linear between, ffill after, bfill before") {
    import graft.operators.TimeSeries
    def d(i: Int) = java.sql.Date.valueOf(f"2024-02-$i%02d")
    // series a: observed day 3 (10.0) and day 6 (40.0) of a 1..8 calendar
    // (bounds come from series b, observed on days 1 and 8)
    val obs = Seq(("a", d(3), 10.0), ("a", d(6), 40.0),
      ("b", d(1), 5.0), ("b", d(8), 5.0)).toDF("k", "dt", "v")
    val out = TimeSeries.gapFillInterpolate(obs, "k", "dt", "v")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getDouble(3), r.getString(4)))).toMap
    assert(out.size === 16, "2 series x 8 calendar days")
    assert(out(("a", "2024-02-03")) === ((10.0, "obs")))
    assert(out(("a", "2024-02-04")) === ((20.0, "interp")))
    assert(out(("a", "2024-02-05")) === ((30.0, "interp")))
    assert(out(("a", "2024-02-02")) === ((10.0, "bfill")))
    assert(out(("a", "2024-02-07")) === ((40.0, "ffill")))
    assert(out(("a", "2024-02-08")) === ((40.0, "ffill")))
    assert(out(("b", "2024-02-04")) === ((5.0, "interp")))
  }

  test("skyline frontier: dominance, price ties, duplicate points") {
    import graft.operators.Skyline
    // (price, size): (1,5) and (2,9) are the frontier; (3,9) is
    // dominated by (2,9) (same size, dearer), (2,3) by both. The
    // duplicate of (2,9) ties onto the frontier. Group h is independent.
    val df = Seq(("g", 1L, 1.0, 5), ("g", 2L, 2.0, 9), ("g", 3L, 3.0, 9),
      ("g", 4L, 2.0, 3), ("g", 5L, 2.0, 9), ("h", 6L, 9.0, 1))
      .toDF("grp", "id", "price", "size")
    val got = Skyline.frontier(df, "grp", "price", "size")
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 5L, 6L), s"got $got")
  }

  test("weighted median: two-pass equals the naive cumulative pick") {
    import graft.operators.WeightedStats
    val df = Seq(
      // group a: uniform weights over 1..5 → median 3
      ("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 1.0), ("a", 4.0, 1.0),
      ("a", 5.0, 1.0),
      // group b: heavy low value wins
      ("b", 1.0, 10.0), ("b", 100.0, 1.0),
      // group c: crossing happens inside bucket 2 (values 1.5,1.7|2.5)
      ("c", 1.5, 1.0), ("c", 1.7, 1.0), ("c", 2.5, 3.0))
      .toDF("grp", "v", "wt")
    val got = WeightedStats.weightedMedian(df, "grp", "v", "wt")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map("a" -> ((3.0, 5.0)), "b" -> ((1.0, 11.0)),
      "c" -> ((2.5, 5.0))), s"got $got")
  }

  test("cusum: accumulates excursions, clamps at zero, resets on dips") {
    import graft.operators.TimeSeries
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    // target 10: +5, +5, -20 (clamp), +3, +3 → 5, 10, 0, 3, 6
    val daily = Seq(
      ("a", d("2024-01-01"), 15.0, 10.0),
      ("a", d("2024-01-02"), 15.0, 10.0),
      ("a", d("2024-01-03"), -10.0, 10.0),
      ("a", d("2024-01-04"), 13.0, 10.0),
      ("a", d("2024-01-05"), 13.0, 10.0),
      ("b", d("2024-01-01"), 9.0, 10.0))
      .toDF("k", "day", "v", "t")
    val got = TimeSeries.cusum(daily, "k", "day", "v", "t")
      .as[(String, Date, Double, Double)].collect()
      .map(r => (r._1, r._2.toString) -> r._4).toMap
    assert(got(("a", "2024-01-01")) === 5.0)
    assert(got(("a", "2024-01-02")) === 10.0)
    assert(got(("a", "2024-01-03")) === 0.0)
    assert(got(("a", "2024-01-04")) === 3.0)
    assert(got(("a", "2024-01-05")) === 6.0)
    assert(got(("b", "2024-01-01")) === 0.0)
    assert(got.size === 6)
  }

  test("canonicalUrl is idempotent on arbitrary messy URLs") {
    import graft.functions.UrlFunctions
    import org.apache.spark.sql.functions.col
    val urls = Seq(
      "https://WWW.Example.COM/A/b/?utm_source=x&q=1&utm_y=2#frag",
      "http://Host.Net/path/",
      "https://a.b/x?utm_a=1",
      "https://a.b/x?z=9&utm_a=1&y=2#s",
      "https://UPPER.io/MiXeD/CaSe?Key=Val")
    val once = urls.toDF("u")
      .select(UrlFunctions.canonicalUrl(col("u")).as("c")).as[String]
      .collect()
    val twice = once.toSeq.toDF("u")
      .select(UrlFunctions.canonicalUrl(col("u")).as("c")).as[String]
      .collect()
    assert(once.toSeq === twice.toSeq,
      "canonicalization must be a projection (idempotent)")
    assert(once.forall(u => !u.contains("utm_") && !u.contains("#")))
  }

  test("quantile normalization maps into the observed value set, rank in range") {
    val out = SparkEntry.queries("t_quantile_normalize")(spark,
        "/root/testdata/sf0.001")
      .select("n_chars", "target_rank", "qnorm")
      .as[(Long, Long, Long)].collect()
    val values = out.map(_._1).toSet
    val n = out.length
    out.foreach { case (_, tr, q) =>
      assert(tr >= 1 && tr <= n, s"target rank $tr outside [1, $n]")
      assert(values.contains(q), s"qnorm $q is not an observed length")
    }
  }
}
