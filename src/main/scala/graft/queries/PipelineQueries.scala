package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{Det, GoldEngagement, Pipeline, SilverPosts, SilverUsers, Tables}
import graft.sources.Sources

/** Queries exposing the medallion modules (Bronze/Silver/Gold/Pipeline)
  * through the driver surface. */
object PipelineQueries {

  val defs: Seq[QueryDef] = Seq(

    // SilverPosts: the reference's declared-but-never-built clean_posts
    // feature set (transform_silver.py:82-95), on documents(title=source,
    // body=text).
    QueryDef.sql(
      "q_silver_posts", {
        def hits(ws: Seq[String]) =
          raw"len(list_filter(str_split_regex(trim(lower(text)), '\s+'), t -> t IN (${ws.map(w => s"'$w'").mkString(", ")})))"
        raw"""WITH f AS (
             |  SELECT doc_id, source, text,
             |    len(str_split_regex(trim(lower(text)), '\s+')) AS wc,
             |    length(regexp_replace(text, '\s+', '', 'g')) AS chars,
             |    ${hits(SilverPosts.positiveWords)} AS pos,
             |    ${hits(SilverPosts.negativeWords)} AS neg
             |  FROM documents)
             |SELECT doc_id, length(source) AS title_length,
             |  length(text) AS body_length, CAST(wc AS BIGINT) AS word_count,
             |  CASE WHEN wc > 0 THEN ${Det.roundNSql("chars * 1.0 / wc", 2)} ELSE 0.0 END AS avg_word_length,
             |  contains(text, 'http://') OR contains(text, 'https://') AS has_links,
             |  CASE WHEN wc > 0 THEN ${Det.roundNSql("(pos - neg) * 1.0 / wc", 4)} ELSE 0.0 END AS sentiment_score
             |FROM f ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      SilverPosts.transform(
          Tables.documents(s, d), titleCol = "source", bodyCol = "text")
        .select("doc_id", "title_length", "body_length", "word_count",
          "avg_word_length", "has_links", "sentiment_score")
        .orderBy("doc_id")
    },

    // SilverUsers over a synthesized nested users frame (testdata has no
    // nested users table): customer → {id, name, email, phone, address
    // {geo{lat,lng}}, company} with deliberate invalid branches, then the
    // full nested-extraction transform. The oracle rebuilds the same
    // synthetic frame as flat columns and mirrors every derivation —
    // double→string→try_cast round-trips agree because both engines use
    // shortest-roundtrip double formatting in this value range.
    QueryDef.sql(
      "q_silver_users",
      raw"""WITH nested AS (
         |  SELECT c_custkey AS id, c_name AS name,
         |    lower(c_name) || '_u' AS username,
         |    CASE WHEN c_custkey % 4 = 0
         |         THEN regexp_replace(lower(c_name), '[^a-z0-9]', '', 'g') || '.nodomain'
         |         ELSE regexp_replace(lower(c_name), '[^a-z0-9]', '', 'g') || '@example.com'
         |    END AS email,
         |    CASE WHEN c_custkey % 5 = 0 THEN 'no digits here'
         |         ELSE '1-' || CAST(c_custkey AS VARCHAR) END AS phone,
         |    'example.org' AS website, '1 Main St' AS street,
         |    c_mktsegment AS city, '00000' AS zipcode,
         |    CASE WHEN c_custkey % 3 = 0 THEN 'not-a-number'
         |         ELSE CAST(c_acctbal / 100 AS VARCHAR) END AS lat,
         |    CAST(c_nationkey * 1.5 AS VARCHAR) AS lng,
         |    c_mktsegment AS company_name, 'cp' AS catchphrase
         |  FROM customer),
         |t AS (
         |  SELECT CAST(id AS BIGINT) AS user_id,
         |    lower(trim(name)) AS full_name, username,
         |    lower(trim(email)) AS email,
         |    regexp_matches(lower(trim(email)),
         |      '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$$') AS email_valid,
         |    CASE WHEN contains(lower(trim(email)), '@')
         |         THEN split_part(lower(trim(email)), '@', 2) END AS email_domain,
         |    CAST(length(lower(trim(name))) AS BIGINT) AS name_length,
         |    phone,
         |    phone IS NOT NULL AND regexp_matches(phone, '[0-9]') AS phone_valid,
         |    regexp_replace(phone, '[^0-9]', '', 'g') AS phone_digits,
         |    website, street, city, zipcode,
         |    COALESCE(TRY_CAST(lat AS DOUBLE), 0.0) AS latitude,
         |    COALESCE(TRY_CAST(lng AS DOUBLE), 0.0) AS longitude,
         |    company_name, catchphrase AS company_catchphrase,
         |    GREATEST(0, 100
         |      - CASE WHEN NOT regexp_matches(lower(trim(email)),
         |          '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$$')
         |          THEN 30 ELSE 0 END
         |      - CASE WHEN NOT (phone IS NOT NULL AND regexp_matches(phone, '[0-9]'))
         |          THEN 20 ELSE 0 END) AS data_quality_score
         |  FROM nested)
         |SELECT * FROM t ORDER BY user_id""".stripMargin) { (s, d) =>
      val nested = Tables.customer(s, d).select(
        col("c_custkey").as("id"),
        col("c_name").as("name"),
        concat(lower(col("c_name")), lit("_u")).as("username"),
        when(col("c_custkey") % 4 === 0,
          concat(regexp_replace(lower(col("c_name")), "[^a-z0-9]", ""), lit(".nodomain")))
          .otherwise(concat(regexp_replace(lower(col("c_name")), "[^a-z0-9]", ""),
            lit("@example.com"))).as("email"),
        when(col("c_custkey") % 5 === 0, lit("no digits here"))
          .otherwise(concat(lit("1-"), col("c_custkey").cast("string"))).as("phone"),
        lit("example.org").as("website"),
        struct(
          lit("1 Main St").as("street"), lit("Apt 1").as("suite"),
          col("c_mktsegment").as("city"), lit("00000").as("zipcode"),
          struct(
            when(col("c_custkey") % 3 === 0, lit("not-a-number"))
              .otherwise((col("c_acctbal") / 100).cast("string")).as("lat"),
            (col("c_nationkey") * 1.5).cast("string").as("lng")).as("geo"))
          .as("address"),
        struct(col("c_mktsegment").as("name"), lit("cp").as("catchPhrase"),
          lit("bs").as("bs")).as("company"))
      SilverUsers.transform(nested).orderBy("user_id")
    },

    // Sources family end-to-end (S1 land, S3 multiLine JSON, S5 CSV with
    // inference, S7 glob discovery, S8 filename routing): lands two files
    // into a temp landing dir, routes by filename substring, scans each
    // with the right reader, returns per-route row/column counts.
    QueryDef.rowsOnly("s3_source_routing") { (s, d) =>
      import s.implicits._
      val src = java.nio.file.Files.createTempDirectory("graft-src")
      val land = java.nio.file.Files.createTempDirectory("graft-landing").toString
      java.nio.file.Files.writeString(src.resolve("users_1.json"),
        """[{"id": 1, "name": "Ann", "email": "a@b.co",
          |  "address": {"city": "X", "geo": {"lat": "1.5", "lng": "2"}}},
          | {"id": 2, "name": "Bob", "email": null,
          |  "address": {"city": "Y", "geo": {"lat": null, "lng": "q"}}}]""".stripMargin)
      java.nio.file.Files.writeString(src.resolve("covid_1.csv"),
        "Date,Country/Region,Province/State,Confirmed,Deaths\n" +
          "2020-01-01,US,,10,0\n2020-01-02,US,,15,1\n2020-01-01,FR,,3,0\n")
      Sources.land(src.resolve("users_1.json").toUri.toString, land, "users_1.json")
      Sources.land(src.resolve("covid_1.csv").toUri.toString, land, "covid_1.csv")
      val routed = Sources.route(land, Seq(
        "users" -> (ps => Sources.jsonAll(s, ps)),
        "covid" -> (ps => Sources.csvAll(s, ps)),
        "posts" -> (ps => Sources.jsonAll(s, ps))))
      routed.toSeq.sortBy(_._1)
        .map { case (k, df) => (k, df.count(), df.columns.length.toLong) }
        .toDF("route", "rows", "columns")
    },

    // Bucketed co-located join, surfaced in the bench: both sides are
    // written via writeBucketed on the join key, so the sort-merge join
    // runs with NO exchange on either side — the shuffle is paid once at
    // write time, the 100 TB play for fact tables that join the same key
    // repeatedly. PipelineSpec asserts the no-Exchange plan for exactly
    // this construction; here the result is oracled against a plain DuckDB
    // join, so the co-located path is also value-verified.
    QueryDef.sql(
      "q_bucketed_join",
      s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
         |  ${Det.dsumSql("o_totalprice")} AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val lake = java.nio.file.Files.createTempDirectory("graft-bucketed-lake").toString
      val p = new Pipeline(s, lake)
      p.writeBucketed(
        Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice"),
        "silver", "bj_orders", "o_custkey", 8)
      p.writeBucketed(
        Tables.customer(s, d)
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "silver", "bj_customer", "o_custkey", 8)
      // merge hint forces the sort-merge path so the co-located layout is
      // what's exercised (a broadcast join would trivially avoid shuffles)
      s.table("silver_bj_orders").hint("merge")
        .join(s.table("silver_bj_customer"), "o_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          Det.dsum(col("o_totalprice")).as("revenue"))
        .orderBy("c_mktsegment")
    },

    // Targeted delete over a partitioned lake table — the
    // right-to-be-forgotten shape: land events partitioned by date,
    // delete every row of a deterministic key set, read the survivors
    // back. Only partitions containing a deleted key are rewritten
    // (PipelineSpec asserts untouched partitions keep their files
    // byte-for-byte); the oracle is the plain anti-join the lake state
    // must equal.
    QueryDef.sql(
      "q_delete_propagation",
      s"""SELECT event_id, user_id FROM events
         |WHERE user_id % 37 <> 0
         |ORDER BY event_id""".stripMargin) { (s, d) =>
      val lake = java.nio.file.Files
        .createTempDirectory("graft-delete-lake").toString
      val p = new Pipeline(s, lake)
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          to_date(col("ts")).as("event_date"))
      p.upsertByDate(ev, "silver", "del_events", "event_date")
      val doomed = ev.filter(col("user_id") % 37 === 0)
        .select("user_id").distinct()
      p.deleteKeys("silver", "del_events", "event_date", "user_id", doomed)
      p.read("silver", "del_events")
        .select("event_id", "user_id")
        .orderBy("event_id")
    },

    // CDC apply — MERGE INTO over the partitioned lake: one batch
    // carrying deletes, in-place updates, and inserts lands atomically
    // as delete-by-key (partition-minimal rewrite) + partitioned append
    // of the new images. The lake end state hash-checks against the
    // plain SQL statement of the merge semantics.
    QueryDef.sql(
      "q_cdc_apply",
      s"""WITH ev AS (
         |  SELECT event_id, user_id, value, CAST(ts AS DATE) AS d
         |  FROM events)
         |SELECT event_id, user_id,
         |  CASE WHEN event_id % 7 = 0 THEN value + 1000.0 ELSE value END
         |    AS value
         |FROM ev WHERE d <= DATE '2024-01-20' AND event_id % 11 <> 0
         |UNION ALL
         |SELECT event_id, user_id, value FROM ev
         |WHERE d > DATE '2024-01-20'
         |ORDER BY event_id""".stripMargin) { (s, d) =>
      val lake = java.nio.file.Files
        .createTempDirectory("graft-cdc-lake").toString
      val p = new Pipeline(s, lake)
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          to_date(col("ts")).as("event_date"))
      val cut = lit("2024-01-20").cast("date")
      val base = ev.filter(col("event_date") <= cut)
      p.upsertByDate(base, "silver", "cdc_events", "event_date")
      val del = base.filter(col("event_id") % 11 === 0)
        .withColumn("op", lit("D"))
      val upd = base
        .filter(col("event_id") % 11 =!= 0 && col("event_id") % 7 === 0)
        .withColumn("value", col("value") + 1000.0)
        .withColumn("op", lit("U"))
      val ins = ev.filter(col("event_date") > cut).withColumn("op", lit("I"))
      p.applyCdc("silver", "cdc_events", "event_date", "event_id",
        del.unionByName(upd).unionByName(ins))
      p.read("silver", "cdc_events")
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    },

    // Full medallion pipeline run (bronze→silver→gold over a parquet lake,
    // K3/K4/K5/K6/K7 sinks) returning per-stage counts — the §3.1
    // orchestration as an observable query.
    QueryDef.rowsOnly("q_pipeline_run") { (s, d) =>
      import s.implicits._
      val lake = java.nio.file.Files.createTempDirectory("graft-lake").toString
      val counts = new Pipeline(s, lake).run(d)
      counts.toSeq.sortBy(_._1).toDF("stage", "rows")
    },

    // gold.user_engagement_metrics: the reference's declared-but-never-
    // populated engagement rollup (model_gold.py:93-103, indexed at :132)
    // over silver clean_posts — per (engagement_date, user_id) counts /
    // lengths / additive score / activity CASE / last-active window. The
    // oracle rebuilds GoldEngagement.attribute's deterministic user/date
    // stand-in (the reference's posts feed carries userId natively).
    QueryDef.sql(
      "q_user_engagement",
      raw"""WITH f AS (
           |  SELECT doc_id, length(text) AS body_length,
           |    len(str_split_regex(trim(lower(text)), '\s+')) AS word_count
           |  FROM documents),
           |posts AS (
           |  SELECT CAST(doc_id % ${GoldEngagement.nUsers} + 1 AS BIGINT) AS user_id,
           |    DATE '${GoldEngagement.epoch}' + CAST(doc_id % ${GoldEngagement.nDays} AS INTEGER) AS engagement_date,
           |    body_length, word_count
           |  FROM f),
           |agg AS (
           |  SELECT engagement_date, user_id, COUNT(*) AS post_count,
           |    ${Det.roundNSql(Det.davgSql("body_length"), 2)} AS avg_post_length,
           |    CAST(SUM(word_count) AS BIGINT) AS total_words
           |  FROM posts GROUP BY 1, 2)
           |SELECT engagement_date, user_id, post_count, avg_post_length,
           |  total_words,
           |  CAST(FLOOR(CAST(post_count * 1000 + total_words * 10
           |      AS DECIMAL(28,2))
           |    + CAST(avg_post_length * 5 AS DECIMAL(28,2))
           |    + CAST(0.5 AS DECIMAL(28,2))) AS DOUBLE) / 100.0
           |    AS engagement_score,
           |  CASE WHEN post_count >= 5 THEN 'power_user'
           |       WHEN post_count >= 3 THEN 'active'
           |       WHEN post_count >= 2 THEN 'casual'
           |       ELSE 'occasional' END AS activity_level,
           |  MAX(engagement_date) OVER (PARTITION BY user_id) AS last_active_date
           |FROM agg ORDER BY engagement_date, user_id""".stripMargin) { (s, d) =>
      val posts = SilverPosts.transform(
        Tables.documents(s, d), titleCol = "source", bodyCol = "text")
      GoldEngagement.transform(GoldEngagement.attribute(posts))
        .orderBy("engagement_date", "user_id")
    },
  )
}
