package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{Det, Pipeline, SilverPosts, SilverUsers, Tables}
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
    // full nested-extraction transform. Deterministic; module semantics
    // oracle'd piecewise by f_email_ops / f_quality_score, end-to-end by
    // the unit spec.
    QueryDef.rowsOnly("q_silver_users") { (s, d) =>
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

    // Full medallion pipeline run (bronze→silver→gold over a parquet lake,
    // K3/K4/K5/K6/K7 sinks) returning per-stage counts — the §3.1
    // orchestration as an observable query.
    QueryDef.rowsOnly("q_pipeline_run") { (s, d) =>
      import s.implicits._
      val lake = java.nio.file.Files.createTempDirectory("graft-lake").toString
      val counts = new Pipeline(s, lake).run(d)
      counts.toSeq.sortBy(_._1).toDF("stage", "rows")
    },
  )
}
