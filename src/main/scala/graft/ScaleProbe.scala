package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Det
import graft.functions.TextFunctions
import graft.operators.{Chunking, Contamination, CountMin, Dedup, Importance,
  Packing, QuantileSketch, Scd2, Shards, Snapshot, ZOrder}
import graft.engine.Stage.syntax._

/** Dev utility: scale-probe the corpus operators beyond the fixtures.
  * Replicates the sfDir documents table k× with offset ids (each doc
  * gains k−1 exact duplicates — a worst-ish case for dedup/contamination
  * candidate volume), writes it as parquet so scans are realistic, and
  * times the corpus operators on it. Usage:
  *   runMain graft.ScaleProbe [sfDir] [k]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(11)
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

    val docs = graft.engine.Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("scaleprobe").toString
    (0 until k).map(i => docs.withColumn("doc_id",
        col("doc_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents")
    val corpus = spark.read.parquet(s"$dir/documents")
    println(s"[scale] corpus: ${corpus.count()} docs (k=$k) at $dir")

    // optional: probe names after k restrict the run (local iteration)
    val only = args.drop(2).toSet
    def time(name: String)(df: => DataFrame): Unit = {
      if (only.nonEmpty && !only.contains(name)) return
      val t0 = System.nanoTime()
      val c = df.count()
      println(f"[scale] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$c")
      spark.catalog.clearCache()
      // free localCheckpoint blocks too (see Bench.scala) so one probe's
      // staging can't pressure the next measurement — scoped to the ids
      // Stage registered, not all persistent RDDs
      graft.engine.Stage.releaseStaged(spark)
    }

    time("chunking")(
      Chunking.byTokens(corpus, "doc_id", "text", chunk = 32, overlap = 8))
    time("shard_pack") {
      Shards.summary(
        Shards.assign(corpus, "doc_id", "n_chars", nShards = 64,
          heavyCutoff = 500), "n_chars")
    }
    time("contamination") {
      Contamination.ngramOverlap(
        corpus.filter(col("doc_id") % 20 =!= 0),
        corpus.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", shingleSize = 3, threshold = 0.5)
    }
    time("minhash_pairs")(
      Dedup.minhashNearDups(corpus, "doc_id", "text", threshold = 0.8))
    time("minhash_probe") {
      // ingest shape: 10% arrives as a batch, probes the stored index
      val index = Dedup.minhashIndex(corpus.filter(col("doc_id") % 10 =!= 7),
        "doc_id", "text")
      Dedup.minhashProbe(corpus.filter(col("doc_id") % 10 === 7), index,
        "doc_id", "text", threshold = 0.8)
    }
    time("quantile_gate") {
      val scored = TextFunctions.qualityFeatures(corpus, "doc_id", "text")
        .select(col("doc_id"), col("lang"), col("quality_score"))
        .staged
      val th = scored.groupBy("lang")
        .agg(expr("percentile(quality_score, 0.25D)").as("lang_p25"))
      scored.join(broadcast(th), Seq("lang"))
        .filter(col("quality_score") >= col("lang_p25"))
    }
    time("training_export") {
      // the composed chain: gate → decontaminate → chunk
      val c = corpus.filter(col("doc_id") % 20 =!= 0)
      val bench = corpus.filter(col("doc_id") % 20 === 0)
      val scored = TextFunctions.qualityFeatures(c, "doc_id", "text")
        .select(col("doc_id"), col("lang"), col("quality_score"))
        .staged
      val th = scored.groupBy("lang")
        .agg(expr("percentile(quality_score, 0.25D)").as("lang_p25"))
      val gated = scored.join(broadcast(th), Seq("lang"))
        .filter(col("quality_score") >= col("lang_p25")).select("doc_id")
      val contaminated = Contamination.ngramOverlap(c, bench,
        "doc_id", "text", shingleSize = 3, threshold = 0.5)
        .select("doc_id").distinct()
      val clean = gated.join(contaminated, Seq("doc_id"), "left_anti")
      Chunking.byTokens(corpus.join(clean, Seq("doc_id")),
        "doc_id", "text", chunk = 32, overlap = 8)
    }

    // filter on the computed column: a bare count() over the final left
    // join would let Catalyst ELIMINATE the whole scoring subtree (the
    // right side is unique-keyed, so the join can't change row counts)
    time("lm_score")(
      TextFunctions.bigramLmScores(corpus, "doc_id", "text")
        .filter(col("lm_score") > 0))
    time("dup_spans")(
      Dedup.duplicateSpans(corpus, "doc_id", "text", window = 8)
        .filter(col("n_spans") > 0))
    time("boilerplate_strip")(
      TextFunctions.stripBoilerplate(corpus, "doc_id", "text")
        .filter(col("n_removed") >= 0))
    // BPE learn: the one driver-side learn boundary in the engine. The
    // collect is bounded by maxWords (512 here) REGARDLESS of k — corpus
    // growth only inflates the counts feeding the top-k, so the probe's
    // cost tracks the distributed word-count scan while the driver-side
    // merge learning stays constant-size. The assert pins the bound.
    time("bpe_learn") {
      import spark.implicits._
      val merges = graft.functions.Bpe.learnFromCorpus(
        corpus, "text", numMerges = 48, maxWords = 512)
      assert(merges.size <= 48, s"merge count: ${merges.size}")
      merges.toDF("left", "right")
    }
    // Fully-distributed learn (no vocabulary truncation): the corpus is
    // scanned once into the distinct-word relation; the 12 merge rounds
    // then operate on VOCABULARY-sized relations only. Under k-fold
    // corpus replication the vocabulary (and so every round) is
    // IDENTICAL — only the initial word-count scan grows — so the
    // measured exponent should sit near the scan's, never the rounds'.
    time("bpe_learn_distributed") {
      import spark.implicits._
      val merges = graft.functions.Bpe.learnDistributed(
        corpus, "text", numMerges = 12)
      assert(merges.size <= 12, s"merge count: ${merges.size}")
      merges.toDF("left", "right")
    }
    // sketch family + shuffle: all single-aggregate / single-window
    // shapes — the probe documents that their cost tracks corpus size
    // linearly (no pair enumeration anywhere to go quadratic)
    time("bloom_build_probe") {
      val hashed = corpus.select(col("doc_id"),
        sha2(Dedup.normalize(col("text")), 256).as("ch"))
      val bloom = graft.operators.Bloom.build(
        hashed.filter(col("doc_id") % 10 =!= 7), "ch", mBits = 1 << 20)
      graft.operators.Bloom.probe(
        hashed.filter(col("doc_id") % 10 === 7), bloom, "ch",
        mBits = 1 << 20)
    }
    time("kmv_distinct") {
      graft.operators.Kmv.estimate(
        graft.operators.Kmv.sketch(corpus, "source", "doc_id", 256),
        "source", 256)
    }
    time("cms_build") {
      CountMin.build(corpus, "source", width = 4096)
    }
    time("cms_estimate") {
      val sk = CountMin.buildSketch(corpus, "source", width = 4096)
      CountMin.estimate(corpus.select("source").distinct(), sk, "source")
    }
    time("kmv_quantiles") {
      QuantileSketch.quantiles(
        QuantileSketch.sample(corpus, "source", "doc_id", "n_chars", 256),
        "source", Seq(0.25, 0.5, 0.9))
    }
    // scale-path z-order layout: distributed range sort + two-phase rank
    // + per-file stats — the whole OPTIMIZE ZORDER job shape
    time("zorder_layout") {
      ZOrder.fileStats(
        ZOrder.fileLayoutRanged(
          corpus.select(col("doc_id"), col("n_chars")),
          Seq(ZOrder.zValue(pmod(col("n_chars"), lit(1024)),
            pmod(col("doc_id"), lit(1024)), 10), col("doc_id")),
          rowsPerFile = 4096),
        Seq("n_chars"))
    }
    // filters on computed columns below: same Catalyst-elimination trap
    // as lm_score — a bare count over the join/projection would let the
    // optimizer drop the hash/weight computation entirely
    time("snapshot_diff") {
      val newSnap = corpus.withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")))
      Snapshot.diff(corpus.filter(col("doc_id") % 10 =!= 0), newSnap,
          "doc_id", "text")
        .filter(col("status") =!= "unchanged")
    }
    time("seq_pack")(
      Packing.contiguous(
          corpus.withColumn("toks", TextFunctions.wordCount(col("text"))),
          "source", "doc_id", "toks", maxTokens = 128)
        .filter(col("seq_id") >= 0))
    time("importance_weights")(
      Importance.weights(
          corpus.withColumn("is_target",
            col("source").isin("src0", "src1", "src2", "src3", "src4")),
          "doc_id", "text", "is_target", vocabSize = 64)
        .filter(col("weight") > -1e18))
    time("epoch_shuffle")(
      Shards.shuffled(corpus, "doc_id", nShards = 64))
    // exact prefix-filter similarity join: the replicated corpus is its
    // WORST case by construction — every doc is an 11-clone cluster, so
    // the true pair set (and thus the candidate set, which the prefix
    // filter keeps near it) grows k² per cluster; the probe verifies cost
    // tracks that inherent output growth, not an accidental quadratic in
    // corpus size
    time("prefix_join")(
      Dedup.prefixJaccardJoin(corpus, "doc_id", "text", threshold = 0.8))
    // iterative centrality: 3 pregel-by-join rounds over a 3-out-link
    // synthetic graph — per-round cost is one edge join + one dst agg,
    // both linear in |E| = 3·|V|
    time("pagerank") {
      val docs = corpus.select(col("doc_id"))
      val n = docs.agg(count(lit(1)).as("__en"))
      val edges = docs.crossJoin(broadcast(n))
        .select(col("doc_id").as("src"), explode(array(
          (col("doc_id") * 31 + 1) % col("__en"),
          (col("doc_id") * 97 + 2) % col("__en"),
          (col("doc_id") * 211 + 3) % col("__en"))).as("dst"))
      graft.operators.Graph.pagerank(docs, edges, "doc_id", iterations = 3)
        .filter(col("pagerank") > 0)
    }

    // the full keep-rule chain: pairs → closure → priority selection.
    // MinHash pairs, not the ngram inverted index: the replicated corpus
    // multiplies every posting count by k, so the ngram posting cap (its
    // deliberate recall-for-scale guard) empties the pair set at 11× —
    // the LSH band path is the one that still yields pairs at scale.
    time("canonical_select") {
      val clusters = Dedup.connectedComponents(
        Dedup.minhashNearDups(corpus, "doc_id", "text", threshold = 0.8))
      val prio = corpus.select(col("source")).distinct()
        .withColumn("priority",
          regexp_extract(col("source"), "src(\\d+)", 1).cast("long"))
      Dedup.canonicalSelection(clusters,
        corpus.withColumnsRenamed(Map("doc_id" -> "id")), prio)
    }
    // cluster-aware train/eval split (t_leakage_safe_split): dup pairs →
    // CC closure → whole-cluster hash assignment. Same MinHash pair
    // source as canonical_select (ngram postings cap out under k×
    // replication); the replicated corpus is the worst case for the
    // closure — every doc sits in a k-member exact-dup cluster.
    time("leakage_split") {
      val clusters = Dedup.connectedComponents(
          Dedup.minhashNearDups(corpus, "doc_id", "text", threshold = 0.8))
        .staged
      Dedup.leakageSafeSplit(clusters, corpus, "doc_id", Seq(0.8, 0.2))
        .zipWithIndex.map { case (df, i) =>
          df.agg(count(lit(1)).as("n_docs"))
            .select(lit(i).cast("long").as("split_id"), col("n_docs"))
        }.reduce(_ unionByName _)
    }

    // embeddings replicated the same way: every vector gains k−1 EXACT
    // duplicates (cosine 1.0 — the within-cluster prune's worst case);
    // 256 cells keep clusters under the maxCluster guard at 11×
    val emb0 = graft.engine.Tables.embeddings(spark, sfDir)
    (0 until k).map(i => emb0.withColumn("vec_id",
        col("vec_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/embeddings")
    val emb = spark.read.parquet(s"$dir/embeddings")
    time("semantic_dedup") {
      val centroids = emb.filter(col("vec_id") < 256)
        .select(col("vec_id").as("cell"), col("embedding").as("c_emb"))
      graft.operators.Similarity.semanticDedup(emb, centroids,
        threshold = 0.3, maxCluster = 2048)
        .filter(col("is_kept") >= 0)
    }
    // kNN graph over the replicated vectors: every vector's cell gains
    // k-1 exact clones, so per-cell join work grows k² per cell while
    // cells stay fixed — the output (3 neighbors per vector) grows
    // linearly; cost should track the in-cell pair work
    time("knn_graph") {
      val centroids = emb.filter(col("vec_id") < 256)
        .select(col("vec_id").as("cell"), col("embedding").as("c_emb"))
      graft.operators.Similarity.knnGraph(emb, centroids, k = 3, nProbe = 2)
    }
    // full Lloyd training loop: 3 rounds of broadcast assign + (cell,
    // dim) aggregate — linear in rows × dims per round
    time("kmeans_train") {
      val init = emb.filter(col("vec_id") < 256)
        .select(col("vec_id").as("cell"), col("embedding").as("c_emb"))
      graft.operators.Similarity.kmeansIterate(emb, init, rounds = 3)
        .filter(col("n_members") >= 0)
    }

    // event-log probes: replicate events with offset user/event ids so
    // per-user event counts (funnel join fan-out, retention cells per
    // cohort) are scale-invariant
    val ev0 = graft.engine.Tables.events(spark, sfDir)
    (0 until k).map(i => ev0
        .withColumn("event_id", col("event_id") + lit(i * 100000000L))
        .withColumn("user_id", col("user_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/events")
    val ev = spark.read.parquet(s"$dir/events")
    time("funnel") {
      graft.operators.EventAnalytics.funnel(ev, "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"),
        maxGap = Some(expr("INTERVAL 48 HOUR")))
    }
    time("retention") {
      graft.operators.EventAnalytics.retentionCohorts(ev, "user_id", "ts")
    }
    time("transitions") {
      graft.operators.EventAnalytics.transitionMatrix(ev,
        "user_id", "event_type", "ts", "event_id")
    }
    // per-user series length is scale-invariant (offset user ids), so
    // these should track the event row count ~linearly
    time("ewma_fold") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("series").orderBy("d").rowsBetween(-63, 0)
      ev.groupBy(col("user_id").as("series"), to_date(col("ts")).as("d"))
        .agg(Det.dsum(coalesce(col("value"), lit(0.0)), 4).as("v"))
        .withColumn("ewma", aggregate(collect_list(col("v")).over(w),
          lit(null).cast("double"),
          (acc, x) => when(acc.isNull, x)
            .otherwise(lit(0.7) * acc + lit(0.3) * x)))
    }
    time("gap_fill") {
      val obs = ev
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .groupBy((col("user_id") % 2200).as("series"),
          to_date(col("ts")).as("d"))
        .agg(Det.dsum(col("value"), 4).as("v"))
      graft.operators.TimeSeries.gapFillInterpolate(obs, "series", "d", "v")
    }
    time("attribution") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val p = ev.withColumn("touch_ts",
          max(when(col("event_type") =!= "purchase", col("ts"))).over(w))
        .filter(col("event_type") === "purchase")
      p.as("p").join(ev.as("e"),
          col("e.user_id") === col("p.user_id") &&
            col("e.ts") === col("p.touch_ts") &&
            col("e.event_type") =!= "purchase", "left")
        .groupBy(col("p.event_id"), col("p.value"))
        .agg(max(col("e.event_id")).as("touch_id"))
    }
    // synthetic link graph over the replicated corpus (same generator as
    // g_pagerank/g_triangle_count, ~3 out-edges per node)
    time("triangle_count") {
      val nodes = corpus.select(col("doc_id"))
      val n = nodes.agg(count(lit(1)).as("__en"))
      val edges = nodes.crossJoin(broadcast(n))
        .select(col("doc_id").as("src"), explode(array(
          (col("doc_id") * 31 + 1) % col("__en"),
          (col("doc_id") * 97 + 2) % col("__en"),
          (col("doc_id") * 211 + 3) % col("__en"))).as("dst"))
      graft.operators.Graph.triangleCounts(nodes, edges, "doc_id")
    }
    // k exact copies per doc = worst-case posting density for the
    // containment index (same stress as the jaccard family)
    time("containment")(
      Dedup.containmentDups(corpus, "doc_id", "text", threshold = 0.9))
    time("kmv_join_card") {
      graft.operators.Kmv.joinCardinality(
        graft.operators.Kmv.countedSketch(ev, "user_id", 256),
        graft.operators.Kmv.countedSketch(
          graft.engine.Tables.orders(spark, sfDir), "o_custkey", 256), 256)
    }

    // dimension/fact probes: replicate customer and orders with the same
    // id offsets so per-key join cardinality is scale-invariant
    val cust0 = graft.engine.Tables.customer(spark, sfDir)
    val ord0 = graft.engine.Tables.orders(spark, sfDir)
    (0 until k).map(i => cust0.withColumn("c_custkey",
        col("c_custkey") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/customer")
    (0 until k).map(i => ord0
        .withColumn("o_custkey", col("o_custkey") + lit(i * 10000000L))
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/orders")
    val cust = spark.read.parquet(s"$dir/customer")
    val ord = spark.read.parquet(s"$dir/orders")

    def dimUpdates = cust.filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"),
        when(col("c_custkey") % 6 === 0, concat(col("c_mktsegment"), lit("_V2")))
          .otherwise(col("c_mktsegment")).as("c_mktsegment"))
    def dimCurrent = cust.select(col("c_custkey"), col("c_mktsegment"),
      lit("1990-01-01").cast("date").as("valid_from"),
      lit(null).cast("date").as("valid_to"), lit(true).as("is_current"))

    // fact-table probes: replicate lineitem (same orderkey offsets as
    // orders → basket sizes scale-invariant) and part (brand domain
    // fixed → k× parts per brand, stressing the frontier window)
    val li0 = graft.engine.Tables.lineitem(spark, sfDir)
    (0 until k).map(i => li0.withColumn("l_orderkey",
        col("l_orderkey") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/lineitem")
    val li = spark.read.parquet(s"$dir/lineitem")
    val part0 = graft.engine.Tables.part(spark, sfDir)
    (0 until k).map(i => part0.withColumn("p_partkey",
        col("p_partkey") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/part")
    val pt = spark.read.parquet(s"$dir/part")
    time("copurchase") {
      val b = li.select(col("l_orderkey"), col("l_partkey")).distinct()
      b.select(col("l_orderkey"), col("l_partkey").as("pk_a"))
        .join(b.select(col("l_orderkey"), col("l_partkey").as("pk_b")),
          Seq("l_orderkey"))
        .filter(col("pk_a") < col("pk_b"))
        .groupBy("pk_a", "pk_b").agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("pk_a"), col("pk_b")).limit(100)
    }
    // item-item CF end-to-end (q_item_recs): co-pair prune, sqrt-cosine
    // sim, top-20 neighborhoods, user scoring, top-3 window. Replication
    // regime = more transactions over a fixed catalog, so co counts
    // inflate k× — the ABSOLUTE co>=2 prune stops pruning (pairs seen
    // once now pass: measured exp 1.22 at k=11, vs the ~1.0 linear floor
    // this per-user operator has from k× users), while the RELATIVE
    // prune (the threshold as a basket-count fraction — how co-occurrence
    // thresholds are actually set at corpus scale) keeps the pair space
    // fixed. Probe both: `item_recs` is the absolute degeneration
    // control; `item_recs_shipped` is the exact in-plan fractional
    // threshold q_item_recs ships (greatest(2, ceil(n_baskets/75000)) —
    // 2 at the fixture SFs, 2k under this replication).
    def itemRecs(minCo: Option[Long]) = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val ob = li.select(col("l_orderkey"), col("l_partkey")).distinct().staged
      val nb = ob.agg(expr(graft.operators.Itemsets.thresholdExprSql(
        "count(DISTINCT l_orderkey)")).as("__thr"))
      val freq = ob.groupBy("l_partkey").agg(count(lit(1)).as("f"))
      val co0 = ob.select(col("l_orderkey"), col("l_partkey").as("ia"))
        .join(ob.select(col("l_orderkey"), col("l_partkey").as("ib")),
          Seq("l_orderkey"))
        .filter(col("ia") < col("ib"))
        .groupBy("ia", "ib").agg(count(lit(1)).as("n"))
      val co = minCo match {
        case Some(m) => co0.filter(col("n") >= m)
        case None    => co0.crossJoin(broadcast(nb))
          .filter(col("n") >= col("__thr")).drop("__thr")
      }
      val sim = co
        .join(freq.select(col("l_partkey").as("ia"), col("f").as("fa")), Seq("ia"))
        .join(freq.select(col("l_partkey").as("ib"), col("f").as("fb")), Seq("ib"))
        .select(col("ia"), col("ib"),
          Det.roundN(col("n") / sqrt(col("fa") * col("fb")), 6).as("s"))
        .staged
      val nbrW = Window.partitionBy("ia").orderBy(desc("s"), col("ib"))
      val simd = sim.unionByName(sim.select(col("ib").as("ia"),
          col("ia").as("ib"), col("s")))
        .withColumn("nrk", row_number().over(nbrW))
        .filter(col("nrk") <= 20).drop("nrk")
      val ui = ord.select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
        .join(ob, Seq("l_orderkey"))
        .select(col("o_custkey"), col("l_partkey")).distinct().staged
      val sc = ui.join(simd, ui("l_partkey") === simd("ia"))
        .groupBy(col("o_custkey"), col("ib").as("rec_part"))
        .agg(sum(col("s").cast(DecimalType(18, 6))).cast("double").as("score"))
      val unseen = sc.join(
        ui.select(col("o_custkey"), col("l_partkey").as("rec_part")),
        Seq("o_custkey", "rec_part"), "left_anti")
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("score"), col("rec_part"))
      unseen.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
    }
    time("item_recs")(itemRecs(minCo = Some(2L)))
    time("item_recs_shipped")(itemRecs(minCo = None))
    // A-priori 3-itemsets (a_itemsets3): candidate lattice from frequent
    // pairs, third edge pruned before support counting. Absolute
    // minSupport=2 degenerates under k× replication (all supports
    // inflate k×, so the lattice admits every triple — output exploded
    // 0 → 1.6M rows at k=11, exp ~1.4); the shipped RELATIVE threshold
    // (frequentTriplesFrac: greatest(2, ceil(n_baskets/75000)) = 2k
    // here — a fixed fraction of baskets, the A-priori norm) keeps the
    // lattice scale-invariant. `itemsets3` stays the degeneration
    // control; `itemsets3_shipped` is a_itemsets3's exact code path.
    time("itemsets3")(
      graft.operators.Itemsets.frequentTriples(li, "l_orderkey",
        "l_partkey", minSupport = 2L))
    time("itemsets3_shipped")(
      graft.operators.Itemsets.frequentTriplesFrac(li, "l_orderkey",
        "l_partkey"))
    // pair lift over basket co-occurrence + broadcast support/total
    // relations (a_basket_lift)
    time("basket_lift") {
      val b = li.select(col("l_orderkey"), col("l_partkey")).distinct().staged
      val no = b.agg(countDistinct(col("l_orderkey")).as("n_orders"))
      val sup = b.groupBy("l_partkey").agg(count(lit(1)).as("n_part"))
      b.select(col("l_orderkey"), col("l_partkey").as("pk_a"))
        .join(b.select(col("l_orderkey"), col("l_partkey").as("pk_b")),
          Seq("l_orderkey"))
        .filter(col("pk_a") < col("pk_b"))
        .groupBy("pk_a", "pk_b").agg(count(lit(1)).as("n_pair"))
        .join(broadcast(sup.select(col("l_partkey").as("pk_a"),
          col("n_part").as("__sa"))), Seq("pk_a"))
        .join(broadcast(sup.select(col("l_partkey").as("pk_b"),
          col("n_part").as("__sb"))), Seq("pk_b"))
        .crossJoin(broadcast(no))
        .select(col("pk_a"), col("pk_b"), col("n_pair"),
          Det.roundN(col("n_pair") * lit(1.0) * col("n_orders")
            / (col("__sa") * lit(1.0) * col("__sb")), 6).as("lift"))
        .orderBy(col("n_pair").desc, col("pk_a"), col("pk_b")).limit(50)
    }
    // TPC-H Q21 shape: late lineitems in F-orders, EXISTS(other
    // supplier) as LEFT SEMI, NOT EXISTS(other late supplier) as LEFT
    // ANTI — the semi+anti self-join pair on the (order, supplier) set.
    // Orders carry a synthetic orderdate spread so the late predicate
    // selects a stable fraction at any k.
    time("q21_sole_late") {
      val fo = ord.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val ls = li.select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(fo, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"))
        .select("l_orderkey", "l_suppkey").distinct().staged
      val alls = li.select(col("l_orderkey").as("ok"),
        col("l_suppkey").as("sk")).distinct()
      ls.join(alls, col("l_orderkey") === col("ok") &&
          col("l_suppkey") =!= col("sk"), "left_semi")
        .join(ls.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2")),
          col("l_orderkey") === col("ok2") &&
            col("l_suppkey") =!= col("sk2"), "left_anti")
        .groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
    }
    // TPC-H Q18 shape: HAVING over the order-quantity aggregate feeding
    // a keyed join chain — the big-group filter-then-join
    time("q18_large_orders") {
      import org.apache.spark.sql.types.DecimalType
      val big = li.groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("q"))
        .filter(col("q") > 150)
      big.join(ord, col("o_orderkey") === col("l_orderkey"))
        .join(cust.select(col("c_custkey"), col("c_name")),
          col("c_custkey") === col("o_custkey"))
        .orderBy(desc("o_totalprice")).limit(20)
    }
    // TPC-H Q13 shape: LEFT OUTER join keeping zero-order customers +
    // the count-of-counts distribution
    time("q13_distribution") {
      cust.select("c_custkey")
        .join(ord.filter(col("o_orderpriority") =!= "5-LOW")
          .select("o_custkey", "o_orderkey"),
          col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
    }
    // TPC-H Q2 shape: per-part MIN decorrelation joined back on
    // (part, cost) equality
    time("q2_min_cost") {
      val supply = li.groupBy("l_partkey", "l_suppkey")
        .agg(Det.roundN(min(col("l_extendedprice") / col("l_quantity")), 6)
          .as("cost")).staged
      val best = supply.groupBy("l_partkey").agg(min("cost").as("min_cost"))
      supply.join(best, supply("l_partkey") === best("l_partkey")
        && col("cost") === col("min_cost"))
    }
    time("weighted_median")(
      graft.operators.WeightedStats.weightedMedian(li,
        "l_returnflag", "l_extendedprice", "l_quantity"))
    time("pareto_frontier")(
      graft.operators.Skyline.frontier(
        pt.select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          col("p_size")),
        "p_brand", "p_retailprice", "p_size"))

    time("scd2_merge")(
      Scd2.merge(dimCurrent, dimUpdates, "c_custkey", Seq("c_mktsegment"),
        lit("1995-01-01").cast("date")))
    time("temporal_lookup") {
      val dim = Scd2.merge(dimCurrent, dimUpdates, "c_custkey",
        Seq("c_mktsegment"), lit("1995-01-01").cast("date"))
      val facts = ord.select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("order_date"))
      facts.join(dim,
        col("o_custkey") === col("c_custkey") &&
          col("order_date") >= col("valid_from") &&
          (col("valid_to").isNull || col("order_date") < col("valid_to")))
    }

    // fuzzy join over a k×-growing vocabulary of natural-text 12-char
    // slices (replica index shifts the slice offset, so replicas add NEW
    // strings with realistic Zipfian gram skew — the distribution the
    // rarest-first prefix selection exploits; uniform random grams would
    // be the documented worst case for any lossless q-gram scheme)
    // DISJOINT slice windows per replica (offset stride = slice length):
    // overlapping windows would make every replica's slice a near-dup of
    // its neighbors and grow the true pair count quadratically — that
    // measures the workload, not the operator
    time("fuzzy_join") {
      graft.operators.FuzzyJoin.editDistancePairs(
        corpus.select(expr(
          "substring(text, CAST(doc_id / 10000000 AS INT) % 20 * 12 + 1, 12)")
          .as("s")), "s", maxDist = 2)
    }
    // interval overlap with replicas decorrelated in time (+3000 days
    // per replica) so per-day interval density — and thus output — stays
    // scale-invariant per row; expect ~linear
    time("interval_overlap") {
      val base = ord.select(col("o_orderkey"),
        (datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long") +
          floor(col("o_custkey") / 10000000L).cast("long") * 3000L).as("lo"))
      val a = base.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("a_key"), col("lo").as("a_lo"),
          (col("lo") + 7L).as("a_hi"))
      val b = base.filter(col("o_orderkey") % 2 === 1)
        .select(col("lo").as("b_lo"), (col("lo") + 7L).as("b_hi"))
      graft.operators.RangeJoin.intervalOverlap(a, b,
          "a_lo", "a_hi", "b_lo", "b_hi", bucketWidth = 7.0)
        .groupBy("a_key").agg(count(lit(1)).as("n_overlap"))
    }
    // equal-frequency edges + assignment over the replicated fact column
    time("binning") {
      val edges = graft.operators.Binning.equalFrequencyEdges(
        ord, "o_totalprice", k = 10, bucketWidth = 5000.0)
      graft.operators.Binning.assign(
          ord.select(col("o_orderkey"), col("o_totalprice")),
          "o_totalprice", edges, "bin")
        .groupBy("bin").agg(count(lit(1)).as("n_rows"))
    }
    // RFM: per-customer aggregate (customers grow k×) + one quintile pass
    time("rfm") {
      val mx = ord.agg(max(col("o_orderdate")).as("maxd"))
      val rfm = ord.crossJoin(broadcast(mx))
        .groupBy(col("o_custkey"))
        .agg(datediff(max(col("maxd")).cast("date"),
            max(col("o_orderdate")).cast("date")).as("recency"),
          count(lit(1)).as("frequency"),
          Det.dsum(col("o_totalprice")).as("monetary"))
      graft.operators.Binning.assign(rfm, "recency",
        graft.operators.Binning.equalFrequencyEdges(rfm, "recency", 5, 50.0),
        "r_score")
    }
    // sliding distinct users: constant-fanout explode, expect ~linear
    time("dau_wau") {
      val ud = ev.select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("i"), col("day"))
        .select(col("user_id"), date_add(col("day"), col("i")).as("day"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as("wau"))
      dau.join(wau, Seq("day"))
    }
    // k-core peel over the synthetic link graph (nodes/edges grow k×,
    // degree distribution scale-invariant): 6 rounds of degree aggregate
    // + survivor semi-joins, lineage cut per round
    time("kcore") {
      // DENSE ids 0..N-1 (replicated doc_ids are offset-sparse, so
      // mod-N edge targets would point at phantom nodes and the whole
      // graph would peel instantly — measuring nothing): the affine
      // multipliers are coprime to N only sometimes, but degree stays
      // ~6-regular and the 4-core survives, so all 6 rounds do real work
      val nc = corpus.count()
      val nodes = spark.range(nc).toDF("doc_id")
      val edges = nodes
        .select(col("doc_id").as("src"), explode(array(
          (col("doc_id") * 31 + 1) % nc,
          (col("doc_id") * 97 + 2) % nc,
          (col("doc_id") * 211 + 3) % nc)).as("dst"))
      graft.operators.Graph.kcore(nodes, edges, "doc_id", k = 4, rounds = 6)
    }
    // exact Gini via bucket-decomposed rank sums (orders grow k×, value
    // range fixed → rows-per-bucket grow linearly, buckets constant)
    time("gini")(
      graft.operators.Inequality.gini(ord, "o_totalprice", 5000.0))
    // per-group quartiles: groups fixed (5 segments), rows grow k×
    time("grouped_deciles")(
      graft.operators.Binning.groupedEqualFrequencyEdges(
        cust, "c_mktsegment", "c_acctbal", k = 4, bucketWidth = 500.0))
    // nearest as-of on the replicated event log (per-user candidate
    // density scale-invariant): one union, two sorted window passes
    time("asof_nearest") {
      val evt = ev.withColumn("tsu", unix_micros(col("ts")))
      val probes = evt.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "tsu")
      val cands = evt.filter(col("event_type") =!= "purchase")
        .select(col("event_id").as("cand_id"),
          col("user_id").as("cand_user"),
          col("event_type").as("cand_type"), col("tsu").as("cand_tsu"))
      graft.operators.AsOfJoin.nearest(probes, cands, "user_id",
        "cand_user", "tsu", "cand_tsu", "cand_id",
        Seq("cand_id", "cand_type"))
    }
    // bipartite fuzzy lookup: dict AND probe vocabularies both grow k×
    // (disjoint natural-text slices; probes drop their 5th char)
    time("fuzzy_lookup") {
      val dict = corpus.select(expr(
        "substring(text, CAST(doc_id / 10000000 AS INT) % 20 * 12 + 1, 12)")
        .as("name"))
      val probes = dict.select(
        concat(substring(col("name"), 1, 4), substring(col("name"), 6, 20))
          .as("dirty"))
      graft.operators.FuzzyJoin.editDistanceLookup(
        probes, dict, "dirty", "name", maxDist = 2)
    }
    // gaps-and-islands streaks: per-user windows, users grow k×
    time("streaks") {
      import org.apache.spark.sql.expressions.Window
      val days = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      days.withColumn("__g",
          datediff(col("day"), lit("1970-01-01").cast("date")).cast("long")
            - row_number().over(
              Window.partitionBy("user_id").orderBy("day")))
        .groupBy("user_id", "__g").agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_streaks"), max(col("len")).as("longest"))
    }

    // ---- round-7 session-4 probes ------------------------------------

    // sign-bit signatures + Hamming rank: one posexplode aggregate over
    // rows × dims/32 plus a broadcast-query scan — linear in vectors
    time("binary_hamming") {
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"))
      graft.operators.Quantize.hammingTopK(emb, q, k = 11, pool = 50)
    }
    // MMR: corpus is touched once by the retrieval scan; the greedy runs
    // over the fixed 30-candidate pool — total time should be flat + one
    // linear scan regardless of k×
    time("mmr_diverse") {
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"))
      graft.operators.Similarity.mmrDiverseTopK(emb, q, k = 8, poolSize = 30)
    }
    // silhouette: one broadcast-codebook scan + 16-row-per-vector window
    time("silhouette") {
      val cents = emb.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cell"), col("embedding").as("c_emb"))
      graft.operators.Similarity.silhouetteByCell(emb, cents)
    }
    // LSH eval: candidates follow the capped minhash shape; ground truth
    // is the UNCAPPED co-occurrence index — the deliberately quadratic
    // eval harness, expected superlinear on a duplicate-heavy corpus
    // (that is why it runs on fixtures, never production)
    time("lsh_eval")(
      Dedup.lshEval(corpus, "doc_id", "text", threshold = 0.8))
    // phrase search: postings filtered to the two phrase tokens before
    // the adjacency join — linear in matching postings
    time("phrase_search")(
      TextFunctions.phraseSearch(corpus, "doc_id", "text",
        Seq("value", "table")))
    // golden record: one entity-keyed aggregate + modal two-level agg
    time("golden_record") {
      val recency = struct(col("ts"), col("event_id"))
      ev.groupBy("user_id").agg(
        min(col("ts")).as("first_seen"),
        max_by(col("event_type"), recency).as("last_event_type"),
        count(lit(1)).as("n_events"))
    }
    // Holt fold: per-series state, series count grows k× with fixed length
    time("holt") {
      val daily = ev
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(Det.dsum(coalesce(col("value"), lit(0.0)), 4).as("v"))
      graft.operators.TimeSeries.holt(daily, "user_id", "day", "v", 0.3, 0.1)
    }
    // LPA: per-round keyed join + two aggregates over a k×-node graph
    time("label_propagation") {
      val nodes = corpus.select(col("doc_id"))
      val n = nodes.agg(count(lit(1)).as("__en"))
      val edges = nodes.crossJoin(broadcast(n))
        .select(col("doc_id").as("src"), explode(array(
          (col("doc_id") * 31 + 1) % col("__en"),
          (col("doc_id") * 97 + 2) % col("__en"),
          (col("doc_id") * 211 + 3) % col("__en"))).as("dst"))
      graft.operators.Graph.labelPropagation(nodes, edges, "doc_id",
        rounds = 3)
    }

    // ---- round-7 session-4 probes, second batch ----------------------

    def syntheticEdges(nodes: DataFrame) = {
      val n = nodes.agg(count(lit(1)).as("__en"))
      nodes.crossJoin(broadcast(n))
        .select(col("doc_id").as("src"), explode(array(
          (col("doc_id") * 31 + 1) % col("__en"),
          (col("doc_id") * 97 + 2) % col("__en"),
          (col("doc_id") * 211 + 3) % col("__en"))).as("dst"))
    }
    // betweenness: forward/backward rounds, per-source frontier work;
    // sources stay 5-per-100-ids so source count grows with k — the
    // honest pivot-sampling scale story
    time("betweenness") {
      val nodes = corpus.select(col("doc_id"))
      graft.operators.Graph.betweenness(nodes, syntheticEdges(nodes),
        "doc_id", isSource = col("doc_id") % 1000 === 0, depth = 3)
    }
    time("harmonic") {
      val nodes = corpus.select(col("doc_id"))
      graft.operators.Graph.harmonicFromSources(nodes, syntheticEdges(nodes),
        "doc_id", isSource = col("doc_id") % 1000 === 0, depth = 4)
    }
    // grid density: one cell aggregate + dense-cell CC (cells bounded by
    // the coordinate range, NOT by points — the whole scale argument)
    time("density_cluster") {
      val pts = emb.select(col("vec_id"),
        col("embedding").getItem(0).as("x"),
        col("embedding").getItem(1).as("y"))
      graft.operators.Density.gridCluster(pts, "vec_id", "x", "y",
        eps = 0.1, minPts = 5L)
    }
    // priority sample: narrow scan + TakeOrdered(k+1)
    time("priority_sample")(
      graft.operators.Sampling.prioritySample(corpus, "doc_id", "n_chars",
        k = 50))
    // rendezvous: constant-fanout explode + argmax per key
    time("rendezvous")(
      graft.operators.Shards.rendezvous(corpus.select("doc_id"), "doc_id", 9))
    // per-file bloom build over the replicated corpus keyed by synthetic
    // file ids — the index-build cost of the skipping story
    time("bloom_per_file") {
      val filed = corpus.select(col("doc_id"),
        (col("doc_id") % 64).as("file_id"),
        col("doc_id").cast("string").as("ukey"))
      graft.operators.Bloom.buildPerGroup(filed, "file_id", "ukey",
        mBits = 2048L, k = 5)
    }
    // feature hashing: one explode + one hash aggregate
    time("feature_hashing") {
      corpus.select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("tk"))
        .select(col("doc_id"), (Det.h56(col("tk")) % 1024).as("fi"),
          (lit(1) - lit(2) * (Det.h56(col("tk"), 17) % 2)).as("sgn"))
        .groupBy("doc_id", "fi").agg(sum(col("sgn")).as("v"))
    }
    // linear attribution: user-keyed touch×purchase join, per-user bounded
    time("attribution_linear") {
      val t = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("ts").as("t_ts"),
          col("event_id").as("t_id"), col("event_type").as("channel"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"),
          col("event_id").as("pid"), col("value"))
      p.join(t, Seq("user_id"))
        .filter((col("t_ts") < col("p_ts")) ||
          (col("t_ts") === col("p_ts") && col("t_id") < col("pid")))
        .filter(unix_micros(col("p_ts")) - unix_micros(col("t_ts"))
          <= 259200000000L)
        .groupBy("channel").agg(count(lit(1)).as("n"))
    }
    // ---- round-7 probes ----------------------------------------------
    // interval merge: two user-partitioned windows + two aggregates —
    // cost tracks rows; per-user state never leaves its partition
    time("interval_merge") {
      import org.apache.spark.sql.expressions.Window
      val iv = ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts"))
          + floor(greatest(col("value"), lit(1.0)) * 60).cast("long")
            * 1000000L).as("e"))
      val wPrev = Window.partitionBy("user_id").orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.partitionBy("user_id").orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      iv.withColumn("prev_max", max("e").over(wPrev))
        .withColumn("ni", when(col("prev_max").isNull
          || col("s") > col("prev_max"), 1L).otherwise(0L))
        .withColumn("island", sum("ni").over(wCum))
        .groupBy("user_id", "island")
        .agg(min("s").as("i0"), max("e").as("i1"), count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_merged"), sum("n").as("n_intervals"))
    }
    // survival lifetable: one user agg + one day agg + horizon-bounded
    // cumulative finish
    time("kaplan_meier") {
      import org.apache.spark.sql.expressions.Window
      val u = ev.groupBy("user_id").agg(
        min(unix_micros(col("ts"))).as("t0"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts"))))
          .as("tp"))
      val m = ev.agg(max(unix_micros(col("ts"))).as("max_us"))
      val lif = u.crossJoin(broadcast(m)).select(
        expr("(COALESCE(tp, max_us) - t0) div 3600000000").as("t"),
        when(col("tp").isNotNull, 1L).otherwise(0L).as("evf"))
      val lt = lif.groupBy("t")
        .agg(count(lit(1)).as("leaving"), sum("evf").as("deaths"))
      lt.withColumn("at_risk_proxy",
        sum("leaving").over(Window.orderBy("t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    }
    // hilbert layout job: quantize + 8 chained integer rounds + ranged
    // file assignment + stats — the OPTIMIZE CLUSTER BY shape
    time("hilbert_layout") {
      val evs = ev.select(col("event_id"), col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      val b = evs.agg(min("user_id").as("umin"), max("user_id").as("umax"),
        min("day").as("dmin"), max("day").as("dmax"))
      val q = evs.crossJoin(broadcast(b)).select(
        col("event_id"), col("user_id"), col("day"),
        graft.operators.Hilbert.quantize(col("user_id"), col("umin"),
          col("umax"), 8).as("qx"),
        graft.operators.Hilbert.quantize(col("day"), col("dmin"),
          col("dmax"), 8).as("qy"))
      val hil = graft.operators.Hilbert.index(q, "qx", "qy", 8, "hd")
      ZOrder.fileStats(
        ZOrder.fileLayoutRanged(hil, Seq(col("hd"), col("event_id")),
          rowsPerFile = 4096),
        Seq("user_id", "day"))
    }
    // changepoint: one day rollup + per-type windows over the horizon
    time("changepoint") {
      import org.apache.spark.sql.expressions.Window
      val daily = ev.groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("event_type")
      daily.withColumn("sk", sum("c").over(wCum))
        .withColumn("sn", sum("c").over(wAll))
        .filter(col("sk") < col("sn"))
    }
    // span corruption: tokenize + hash flag + two ordered reassembly
    // aggregates — pure map + one doc-keyed shuffle
    time("span_corruption") {
      import org.apache.spark.sql.expressions.Window
      val toks = corpus.select(col("doc_id"),
          posexplode(split(trim(lower(col("text"))), "\\s+"))
            .as(Seq("pos", "term")))
        .filter(col("term") =!= "")
      val sp = toks.withColumn("span_id", expr("pos div 3"))
        .withColumn("masked",
          when(Det.h56(concat(lit("span:"), col("doc_id").cast("string"),
            lit(":"), expr("pos div 3").cast("string"))) % 5 === 0, 1)
            .otherwise(0))
      val ks = sp.withColumn("k",
          when(col("masked") === 1, dense_rank().over(
            Window.partitionBy("doc_id", "masked").orderBy("span_id")) - 1))
        .withColumn("mp",
          min("pos").over(Window.partitionBy("doc_id", "span_id")))
      ks.filter(col("masked") === 0 || col("pos") === col("mp"))
        .select(col("doc_id"), col("pos"),
          when(col("masked") === 0, col("term"))
            .otherwise(concat(lit("<extra_id_"), col("k").cast("string"),
              lit(">"))).as("piece"))
        .groupBy("doc_id")
        .agg(array_join(expr("transform(array_sort(" +
          "collect_list(struct(pos, piece))), x -> x.piece)"), " ")
          .as("corrupted"))
    }
    // zipf fit: vocab agg + top-500 rank + one moment aggregate — the
    // window runs over the VOCABULARY, not the corpus
    time("zipf_fit") {
      import org.apache.spark.sql.expressions.Window
      val f = corpus.select(explode(split(trim(lower(col("text"))),
          "\\s+")).as("term"))
        .filter(col("term") =!= "")
        .groupBy("term").agg(count(lit(1)).as("freq"))
      f.withColumn("rank",
          row_number().over(Window.orderBy(desc("freq"), col("term"))))
        .filter(col("rank") <= 500)
        .agg(count(lit(1)).as("n"), sum(log(col("rank"))).as("sx"),
          sum(log(col("freq"))).as("sy"))
    }
    // native jaro-winkler throughput: one expression call per row over
    // 40-char slices — map-side only
    time("jaro_winkler") {
      graft.expressions.GraftFunctions.register(spark)
      corpus.select(col("doc_id"),
          graft.expressions.GraftFunctions.jaro_winkler(
            substring(col("text"), 1, 40),
            reverse(substring(col("text"), 1, 40))).as("jw"))
        .filter(col("jw") >= 0.0)
    }
    // poisson bootstrap over the event stream: ×32 map-side replicate
    // explode + two aggregates — the replication happens in the map
    // phase, never a shuffle of 32× data
    time("poisson_bootstrap") {
      val reps = ev.select(col("event_type"), col("value"), col("event_id"))
        .withColumn("b", explode(sequence(lit(0), lit(31))))
        .withColumn("u",
          Det.h56(concat(col("event_id").cast("string"), lit(":"),
            col("b").cast("string"))) * lit(1.0)
            / lit(7.2057594037927936e16))
      reps.withColumn("w",
          when(col("u") < 0.36787944117144233, 0L)
            .when(col("u") < 0.7357588823428846, 1L)
            .when(col("u") < 0.9196986029286058, 2L).otherwise(3L))
        .groupBy("event_type", "b")
        .agg((sum(col("w") * col("value")) / sum("w")).as("bmean"))
        .groupBy("event_type")
        .agg(avg("bmean").as("bavg"), count(lit(1)).as("nb"))
    }

    // ---- session-6 probes (experiment-analysis family) ---------------
    // discretized KS: one groupBy over the fixed $100 bin domain, window
    // over ≤5k bins, scalar finish — bin count is scale-invariant, so
    // cost should track the scan alone
    time("ks_test") {
      import org.apache.spark.sql.expressions.Window
      val h = ord.select(
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
          .otherwise(0).as("hi"),
        floor(col("o_totalprice") / 100.0).cast("long").as("bin"))
      val hist = h.groupBy("bin").agg(
        sum("hi").as("c_hi"), sum(expr("1 - hi")).as("c_lo"))
      val w = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist.select(col("bin"), sum("c_hi").over(w).as("a"),
        sum("c_lo").over(w).as("b"))
    }
    // randomization test: ×64 map-side replicate fanout (explode, no
    // pre-shuffle data copy) + one (b, side) groupBy — the honest 64×
    // compute is all in the map phase; shuffle carries 128 groups
    time("randomization") {
      val pool = ev.filter(col("event_type").isin("purchase", "click"))
        .select(col("event_id"), col("value"))
        .withColumn("b", explode(sequence(lit(0), lit(63))))
        .withColumn("side",
          (Det.h56(concat(col("event_id").cast("string"), lit(":"),
            col("b").cast("string"))) % 2).cast("int"))
      pool.groupBy("b", "side")
        .agg(Det.dsum(col("value")).as("s"), count(lit(1)).as("n"))
    }
    // CUPED: one groupBy(user) then two constant-size moment aggregates
    time("cuped_moments") {
      import org.apache.spark.sql.types.DecimalType
      val dec2 = DecimalType(18, 2)
      val u = ev.groupBy("user_id").agg(
        sum(when(unix_micros(col("ts")) < 1705363200000000L,
          col("value").cast(dec2)).otherwise(lit(0).cast(dec2))).as("x"),
        sum(when(unix_micros(col("ts")) >= 1705363200000000L,
          col("value").cast(dec2)).otherwise(lit(0).cast(dec2))).as("y"))
      val x15 = col("x").cast(DecimalType(15, 2))
      val y15 = col("y").cast(DecimalType(15, 2))
      u.agg(count(lit(1)).as("n"),
        sum(x15 * y15).cast("double").as("sxy"),
        sum(x15 * x15).cast("double").as("sxx"))
    }
    // Mantel-Haenszel (stands in for the whole ord⋈cust stratified
    // family: bh_fdr, ipw, power_mde share the join→nation-agg shape)
    time("mantel_haenszel") {
      ord.join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("st"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0).as("t"),
          when(col("o_orderstatus") === "F", 1).otherwise(0).as("f"))
        .groupBy("st").agg(
          sum(col("t") * col("f")).as("a"),
          sum(col("t") * (lit(1) - col("f"))).as("b"),
          sum((lit(1) - col("t")) * col("f")).as("c"),
          sum((lit(1) - col("t")) * (lit(1) - col("f"))).as("d"))
    }
    // encoding anomaly: map-only injection + length-diff metrics — text
    // bytes never leave the scan stage
    time("encoding_anomaly") {
      val inj = corpus.select(col("doc_id"), col("text"),
        (Det.h56(concat(lit("enc:"), col("doc_id").cast("string"))) % 10)
          .cast("int").as("r"))
      val cor = inj.select(col("doc_id"),
        when(col("r") === 0, expr("replace(text, 'a', 'Ã¡')"))
          .when(col("r") === 1, concat(col("text"), lit("�")))
          .otherwise(col("text")).as("t"))
      cor.select(col("doc_id"),
        (length(col("t")) - length(expr("replace(t, 'Ã', '')")))
          .as("n_moji"),
        (length(col("t")) - length(regexp_replace(col("t"),
          "[^\\x00-\\x7F]", ""))).as("n_nonascii"))
    }
    // n-gram novelty: distinct (doc, h56(shingle)) → df groupBy → join
    // back — shingles shuffle as 16-byte hashes; the k× duplicate corpus
    // is the worst case (every shingle's df inflates k×, zero uniques)
    time("ngram_novelty") {
      val toks = corpus.select(col("doc_id"), split(col("text"), " ").as("t"))
      val sh = toks.filter(size(col("t")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(t) - 2), i -> concat(" +
            "element_at(t, i), ' ', element_at(t, i + 1), ' ', " +
            "element_at(t, i + 2)))")).as("sg"))
        .select(col("doc_id"), Det.h56(col("sg")).as("shash")).distinct()
      val freq = sh.groupBy("shash").agg(count(lit(1)).as("df"))
      sh.join(freq, "shash").groupBy("doc_id").agg(
        count(lit(1)).as("n_sh"),
        sum(when(col("df") === 1, 1).otherwise(0)).as("n_uniq"))
    }
    // modularity finish over the LP labels (LP itself probed above):
    // two edge→label joins + community aggregates
    time("modularity") {
      import graft.operators.Graph
      val docs = corpus.select(col("doc_id"))
      val nn = docs.agg(count(lit(1)).as("__en"))
      val edges = docs.crossJoin(broadcast(nn))
        .select(col("doc_id").as("src"), explode(array(
          (col("doc_id") * 31 + 1) % col("__en"),
          (col("doc_id") * 97 + 2) % col("__en"),
          (col("doc_id") * 211 + 3) % col("__en"))).as("dst"))
      val lab = Graph.labelPropagation(docs, edges, "doc_id", rounds = 1)
        .select(col("doc_id").as("id"), col("community").as("label"))
      val base = edges.filter(col("src") =!= col("dst")).distinct()
      val es = base.unionByName(
        base.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      val labB = lab.select(col("id").as("bid"), col("label").as("blabel"))
      es.join(lab, es("src") === lab("id"))
        .join(labB, es("dst") === col("bid"))
        .filter(col("label") === col("blabel"))
        .groupBy("label").agg(count(lit(1)).as("e2_c"))
    }

    // ---- round-7 session-7 probes: the alignment/preference family ---

    // preference pairs: one qualityFeatures scan + one struct-argmax hash
    // aggregate; groups stay (source, lang)-bounded while members grow k×
    time("preference_pairs") {
      TextFunctions.qualityFeatures(corpus, "doc_id", "text")
        .groupBy("source", "lang").agg(
          count(lit(1)).as("n"),
          max(struct(col("quality_score"), (-col("doc_id")).as("negid")))
            .as("c"),
          min(struct(col("quality_score"), (-col("doc_id")).as("negid")))
            .as("r"))
    }
    // bradley-terry: match generation (per-lang rank window) grows k× in
    // battles; the fit itself runs on the (source × source)-bounded win
    // matrix, so iterations are constant-size regardless of k
    time("bradley_terry") {
      import org.apache.spark.sql.expressions.Window
      val feats = TextFunctions.qualityFeatures(corpus, "doc_id", "text")
        .select(col("doc_id"), col("source"), col("lang"),
          col("quality_score"))
      val ranked = feats
        .withColumn("__h", Det.h56(col("doc_id").cast("string")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("lang").orderBy(col("__h"), col("doc_id"))))
        .withColumn("m", expr("(rn + 1) DIV 2"))
      val l = ranked.filter(col("rn") % 2 === 1)
        .select(col("lang"), col("m"), col("doc_id").as("l_doc"),
          col("source").as("l_src"), col("quality_score").as("l_q"))
      val r = ranked.filter(col("rn") % 2 === 0)
        .select(col("lang"), col("m"), col("doc_id").as("r_doc"),
          col("source").as("r_src"), col("quality_score").as("r_q"))
      val games = l.join(r, Seq("lang", "m"))
        .filter(col("l_src") =!= col("r_src"))
        .withColumn("winner",
          when(col("l_q") > col("r_q") ||
            (col("l_q") === col("r_q") && col("l_doc") < col("r_doc")),
            col("l_src")).otherwise(col("r_src")))
        .withColumn("a", least(col("l_src"), col("r_src")))
        .withColumn("b", greatest(col("l_src"), col("r_src")))
        .groupBy("a", "b")
        .agg(count(lit(1)).as("n"),
          count(when(col("winner") === col("a"), 1)).as("wins_a"))
      graft.operators.BradleyTerry.fit(games, rounds = 5)
    }
    // quantile normalize: per-source rank windows deepen k× per source
    // partition; the quantile function stays a VALUE-bounded histogram
    // (distinct n_chars), so the banded range probe's build side is flat
    time("quantile_normalize") {
      import org.apache.spark.sql.expressions.Window
      val d0 = corpus.select(col("doc_id"), col("source"), col("n_chars"))
      val ranked = d0
        .withColumn("src_rank", row_number().over(Window.partitionBy("source")
          .orderBy(col("n_chars"), col("doc_id"))).cast("long"))
        .withColumn("src_n", count(lit(1)).over(Window.partitionBy("source")))
      val nn = d0.agg(count(lit(1)).as("nn"))
      val points = ranked.crossJoin(broadcast(nn))
        .withColumn("target_rank",
          when(col("src_n") === 1, expr("1L + nn DIV 2"))
            .otherwise(expr(
              "1L + ((src_rank - 1) * (nn - 1) + src_n - 2) DIV (src_n - 1)")))
      val bins = d0.select(col("n_chars").as("q_value"))
        .groupBy("q_value").agg(count(lit(1)).as("cnt"))
        .withColumn("hi", sum("cnt").over(Window.orderBy("q_value")))
        .select(col("q_value"), (col("hi") - col("cnt") + 1).as("lo"),
          (col("hi") + 1).as("hi_excl"))
      graft.operators.RangeJoin.pointInInterval(points, bins,
        "target_rank", "lo", "hi_excl", bucketWidth = 4096.0)
    }
    // url canonicalization: map-side explode ×2 + one hash aggregate
    time("url_canonical") {
      val id = col("doc_id").cast("string")
      val raw = corpus.select(col("doc_id"), explode(array(
        concat(lit("https://"), upper(col("source")), lit(".Example.COM/d/"),
          id, lit("?lang="), col("lang")),
        concat(lit("https://"), col("source"), lit(".example.com/d/"),
          id, lit("/?lang="), col("lang"), lit("&utm_source=f"))))
        .as("raw_url"))
      raw.withColumn("c",
          graft.functions.UrlFunctions.canonicalUrl(col("raw_url")))
        .groupBy("c").agg(count(lit(1)).as("n"), min("raw_url").as("first"))
    }
    // range search: member side grows k× (every clone qualifies at
    // cosine 1.0 — worst case for output volume); probes stay 8×4
    time("range_search") {
      val centroids = emb.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cell"), col("embedding").as("c_emb"))
      val qs = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      graft.operators.Similarity.ivfRangeSearch(emb, centroids, qs,
        tau = 0.25, nProbe = 4)
    }
    // feature scale: two explode → hash-aggregate passes over rows × dims
    time("feature_scale") {
      import org.apache.spark.sql.types.DecimalType
      val dims = emb.select(col("vec_id"), posexplode(col("embedding")))
        .select(col("pos").cast("long").as("dim"),
          col("col").cast("double").as("x"))
      val stats = dims.groupBy("dim").agg(
          count(lit(1)).as("n"),
          (sum(Det.roundN(col("x"), 12).cast(DecimalType(38, 18)))
            .cast("double") / count(lit(1))).as("mean"),
          (sum(Det.roundN(col("x") * col("x"), 12).cast(DecimalType(38, 18)))
            .cast("double") / count(lit(1))).as("m2"))
        .withColumn("std",
          sqrt(greatest(col("m2") - col("mean") * col("mean"), lit(0.0))))
      dims.join(broadcast(stats), Seq("dim"))
        .withColumn("zv", when(col("std") > 0,
          (col("x") - col("mean")) / col("std")).otherwise(lit(0.0)))
        .groupBy("dim").agg(avg("zv").as("post_mean"))
    }

    // huber: two broadcast-stat passes over the replicated event scan +
    // DECIMAL-summed aggregates — cost should track the scan alone
    time("huber_mean") {
      import org.apache.spark.sql.types.DecimalType
      val kk = lit(1.345)
      val v = ev.filter(col("value").isNotNull)
        .select(col("event_type"), col("value").as("x"))
      val st = v.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        (Det.dsum(col("x"), 6) / count(lit(1))).as("m0"),
        sqrt(greatest(Det.dsum(col("x") * col("x"), 4) / count(lit(1))
          - (Det.dsum(col("x"), 6) / count(lit(1)))
            * (Det.dsum(col("x"), 6) / count(lit(1))), lit(0.0))).as("s"))
      v.join(broadcast(st), Seq("event_type"))
        .groupBy(col("event_type"), col("n"), col("m0"), col("s"))
        .agg((col("m0") + sum(Det.roundN(greatest(-kk * col("s"),
          least(kk * col("s"), col("x") - col("m0"))), 12)
          .cast(DecimalType(38, 18))).cast("double") / col("n")).as("m1"))
    }
    // pattern match: per-(user, day) ordered reassembly — group state is
    // one user-day, so replication grows group COUNT, not group size
    time("pattern_match") {
      val e = ev.select(col("user_id"), to_date(col("ts")).as("day"),
        col("ts"), col("event_id"),
        when(col("event_type") === "view", "v")
          .when(col("event_type") === "click", "c")
          .when(col("event_type") === "purchase", "p")
          .when(col("event_type") === "signup", "s")
          .otherwise("e").as("ini"))
      e.groupBy("user_id", "day")
        .agg(collect_list(struct(col("ts"), col("event_id"), col("ini")))
          .as("__evs"))
        .withColumn("seq",
          expr("array_join(transform(array_sort(__evs), x -> x.ini), '')"))
        .select(col("user_id"), col("day"),
          expr("size(regexp_extract_all(seq, 'v[ce]*p', 0))").as("nc"))
    }
    // ratio-delta CI: broadcast-dim star join + one moment aggregate
    time("ratio_delta_ci") {
      val supp = graft.engine.Tables.supplier(spark, sfDir)
        .select(col("s_suppkey"), col("s_nationkey"))
      val nat = graft.engine.Tables.nation(spark, sfDir)
        .select(col("n_nationkey"), col("n_name"))
      li.join(broadcast(supp), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(nat), col("n_nationkey") === col("s_nationkey"))
        .select(col("n_name"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("x"),
          col("l_quantity").cast("double").as("y"))
        .groupBy("n_name").agg(count(lit(1)).as("n"),
          Det.dsum(col("x"), 6).as("sx"), Det.dsum(col("y"), 6).as("sy"),
          Det.dsum(col("x") * col("y"), 4).as("sxy"))
    }
    // l-diversity: two nested map-side-combinable aggregates
    time("l_diversity") {
      cust.select(col("c_mktsegment"), col("c_nationkey"),
          floor(col("c_acctbal") / 2000).cast("long").as("band"))
        .groupBy("c_mktsegment", "c_nationkey", "band")
        .agg(count(lit(1)).as("c"))
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(sum("c").as("n"), count(lit(1)).as("l"), max("c").as("max_c"))
    }
    // class balance: the explode GENERATES target-per-class rows — output
    // grows k× (5 classes × majority size), the deliberate worst case
    time("class_balance") {
      val docs2 = corpus.select(col("doc_id"), col("lang"))
      val n = docs2.groupBy("lang").agg(count(lit(1)).as("n_before"))
      val t = n.agg(max("n_before").as("target"))
      docs2.join(broadcast(n), "lang").crossJoin(broadcast(t))
        .withColumn("copies",
          expr("target DIV n_before") +
            when(Det.h56(col("doc_id").cast("string")) % col("n_before")
              < col("target") % col("n_before"), 1).otherwise(0))
        .select(col("lang"),
          explode(sequence(lit(1), col("copies").cast("int")))
            .as("copy_idx"))
        .groupBy("lang").agg(count(lit(1)).as("n_after"))
    }
    // ROC-AUC: one histogram groupBy over the value-bounded score
    // domain + windows over that bounded relation
    time("auc_histogram") {
      import org.apache.spark.sql.expressions.Window
      val f = corpus.select(
        when(col("n_chars") > 500, 500).otherwise(col("n_chars")).as("s"),
        when(col("lang") === "en", 1).otherwise(0).as("y"))
      val h = f.groupBy("s").agg(
        count(when(col("y") === 1, 1)).as("c1"),
        count(when(col("y") === 0, 1)).as("c0"))
      h.withColumn("c0_below",
          sum("c0").over(Window.orderBy("s")) - col("c0"))
        .agg(sum(lit(2) * col("c1") * col("c0_below")
          + col("c1") * col("c0")).as("u2"))
    }
    // conformal: per-group rank windows over the calibration third —
    // partitions deepen k× per priority group (5 groups)
    time("conformal") {
      import org.apache.spark.sql.expressions.Window
      val f = ord.select(col("o_orderkey"),
        col("o_orderpriority").as("grp"), col("o_totalprice").as("y"),
        (Det.h56(col("o_orderkey").cast("string")) % 3).as("fold"))
      val m = f.filter(col("fold") === 0).groupBy("grp")
        .agg((Det.dsum(col("y")) / count(lit(1))).as("yhat"))
      f.filter(col("fold") === 1).join(broadcast(m), "grp")
        .select(col("grp"), abs(col("y") - col("yhat")).as("score"),
          col("o_orderkey"))
        .withColumn("rn", row_number().over(Window.partitionBy("grp")
          .orderBy(col("score"), col("o_orderkey"))))
        .groupBy("grp").agg(max("rn").as("n_cal"))
    }
    // matryoshka: TWO brute-force rankings (full + truncated) over the
    // replicated vectors × 8-query broadcast
    time("dim_truncation") {
      import org.apache.spark.sql.expressions.Window
      graft.expressions.GraftFunctions.register(spark)
      import graft.expressions.GraftFunctions.cosine_sim
      val qs = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          slice(col("embedding"), 1, 16).as("qe16"))
      def topk(simCol: org.apache.spark.sql.Column) =
        emb.crossJoin(broadcast(qs))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("__sim", Det.roundN(simCol, 6))
          .withColumn("__rk", row_number().over(Window
            .partitionBy("query_id").orderBy(desc("__sim"), col("vec_id"))))
          .filter(col("__rk") <= 10)
          .select(col("query_id"), col("vec_id"))
      topk(cosine_sim(col("embedding"), col("qe"))).unionByName(
        topk(cosine_sim(slice(col("embedding"), 1, 16), col("qe16"))))
    }
    // cohort LTV: customer-keyed first-order join + calendar² cell grid
    time("cohort_ltv") {
      import org.apache.spark.sql.types.DecimalType
      val firstO = ord.groupBy("o_custkey")
        .agg(min("o_orderdate").as("first_dt"))
      ord.join(firstO, "o_custkey")
        .select(
          (year(col("first_dt")) * 100 + month(col("first_dt")))
            .as("cohort_ym"),
          ((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            - (year(col("first_dt")) * 12 + month(col("first_dt"))))
            .as("age_months"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("rev"))
        .groupBy("cohort_ym", "age_months").agg(sum("rev").as("rev"))
    }
    // q7 star: the one fact-to-fact keyed join (lineitem x orders) under
    // two broadcast dimension paths
    time("q7_star") {
      val custNation = cust
        .join(broadcast(graft.engine.Tables.nation(spark, sfDir)
          .select(col("n_nationkey"), col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "cust_nation")
      val suppNation = graft.engine.Tables.supplier(spark, sfDir)
        .join(broadcast(graft.engine.Tables.nation(spark, sfDir)
          .select(col("n_nationkey").as("sk"),
            col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sk"))
        .select("s_suppkey", "supp_nation")
      li.join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .join(ord.select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
        .filter(col("cust_nation") < col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")),
          6).as("revenue"))
    }
    // concurrency sweep: 2 rows per (user, day), per-day windows
    time("max_concurrency") {
      import org.apache.spark.sql.expressions.Window
      val span = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(min("ts").as("lo"), max("ts").as("hi"))
      val sweep = span.select(col("day"), col("lo").as("t"),
          lit(1).as("delta"), col("user_id"))
        .unionAll(span.select(col("day"), col("hi").as("t"),
          lit(-1).as("delta"), col("user_id")))
      sweep.withColumn("conc",
          sum("delta").over(Window.partitionBy("day")
            .orderBy(col("t"), col("delta").desc, col("user_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("day").agg(max("conc").as("p"))
    }
    // absorption: one corpus-sized LEAD window + constant-size value
    // iteration over the 5x5 matrix
    time("absorption") {
      import org.apache.spark.sql.expressions.Window
      val steps = ev.select(col("event_type").as("from_type"),
        lead("event_type", 1).over(Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))).as("to_type"))
      steps.filter(col("to_type").isNotNull)
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    }

    spark.stop()
  }
}
