package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{Det, Tables}

/** Scalar-function families (SURVEY §2.9): string normalization + email /
  * phone validity, date arithmetic, guarded conditional math, lineage
  * hashing, JSON extraction. All pure column expressions inside whole-stage
  * codegen — zero UDFs, exactly as SURVEY §2.11 prescribes.
  *
  * The testdata has no email/phone columns, so emails are synthesized
  * deterministically from customer rows (keyed on c_custkey) to exercise
  * valid + invalid branches of every rule.
  */
object Scalars {

  // Synthesized email with deliberate bad cases:
  //   custkey%4==0 → no '@' (invalid), %4==1 → no TLD dot (invalid),
  //   else name@example.com (valid).
  private val emailSql =
    """CASE WHEN c_custkey % 4 = 0 THEN lower(trim(c_name)) || '.nodomain'
      |     WHEN c_custkey % 4 = 1 THEN lower(trim(c_name)) || '@nodot'
      |     ELSE lower(trim(c_name)) || '@example.com' END""".stripMargin.replace("\n", " ")

  private def emailCol = {
    val base = lower(trim(col("c_name")))
    when(col("c_custkey") % 4 === 0, concat(base, lit(".nodomain")))
      .when(col("c_custkey") % 4 === 1, concat(base, lit("@nodot")))
      .otherwise(concat(base, lit("@example.com")))
  }

  private val emailRegex = "^[A-Za-z0-9#._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"

  val defs: Seq[QueryDef] = Seq(

    // Email normalize / validate / domain-extract.
    // Ref: transform_silver.py:167-196; validate_silver.py:122-123.
    QueryDef.sql(
      "f_email_ops",
      s"""SELECT c_custkey, email,
         |  regexp_full_match(email, '${emailRegex}') AS email_valid,
         |  CASE WHEN contains(email, '@') THEN split_part(email, '@', 2) END AS email_domain,
         |  length(email) AS email_length
         |FROM (SELECT c_custkey, $emailSql AS email FROM customer)
         |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"), emailCol.as("email"))
        .select(col("c_custkey"), col("email"),
          col("email").rlike(emailRegex).as("email_valid"),
          when(col("email").contains("@"),
            substring_index(col("email"), "@", -1)).as("email_domain"),
          length(col("email")).cast("long").as("email_length"))
        .orderBy("c_custkey")
    },

    // Phone-style digit checks & normalize (digits-only regex strip).
    // Ref: transform_silver.py:186,199.
    QueryDef.sql(
      "f_phone_normalize",
      """SELECT s_suppkey, s_name,
        |  regexp_matches(s_name, '[0-9]') AS has_digit,
        |  regexp_replace(s_name, '[^0-9]', '', 'g') AS digits_only
        |FROM supplier ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"),
          col("s_name").rlike("[0-9]").as("has_digit"),
          regexp_replace(col("s_name"), "[^0-9]", "").as("digits_only"))
        .orderBy("s_suppkey")
    },

    // Date arithmetic family: ±interval, format, diff vs fixed anchor.
    // Ref: model_gold.py:259,267,453; ingest_bronze.py:67 (format);
    // validate_silver.py:243 (staleness).
    QueryDef.sql(
      "f_date_arithmetic",
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(o_orderdate AS DATE) + 7 AS plus_7d,
        |  CAST(o_orderdate AS DATE) - 30 AS minus_30d,
        |  strftime(o_orderdate, '%Y%m%d%H%M%S') AS ts_compact,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2026-01-01') AS BIGINT) AS age_days,
        |  CAST(o_orderdate AS DATE) < DATE '1992-06-01'
        |    OR CAST(o_orderdate AS DATE) > DATE '2026-01-02' AS out_of_range
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val od = to_date(col("o_orderdate"))
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          od.as("order_date"),
          date_add(od, 7).as("plus_7d"),
          date_sub(od, 30).as("minus_30d"),
          date_format(col("o_orderdate"), "yyyyMMddHHmmss").as("ts_compact"),
          datediff(lit("2026-01-01").cast("date"), od).cast("long").as("age_days"),
          (od < lit("1992-06-01").cast("date") ||
            od > lit("2026-01-02").cast("date")).as("out_of_range"))
        .orderBy("o_orderkey")
    },

    // Conditional math family: clamp-to-zero, guarded ratio→0, % change,
    // severity CASE chain, floor-to-long clamp.
    // Ref: transform_silver.py:297-341; model_gold.py:482-490;
    // aggregate_gold.py:188-215.
    QueryDef.sql(
      "f_math_conditional",
      s"""SELECT l_orderkey, l_linenumber,
         |  ${Det.roundNSql("GREATEST(0.0, l_quantity - 25.0)", 2)} AS qty_over_25,
         |  CASE WHEN l_quantity > 0
         |       THEN ${Det.roundNSql("l_discount / l_quantity * 100", 4)}
         |       ELSE 0.0 END AS discount_rate,
         |  CASE WHEN l_extendedprice > 90000 THEN 'CRITICAL'
         |       WHEN l_extendedprice > 50000 THEN 'HIGH'
         |       WHEN l_extendedprice > 10000 THEN 'MEDIUM'
         |       ELSE 'LOW' END AS severity,
         |  CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor_long,
         |  l_tax > l_discount AS tax_exceeds_discount
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          Det.roundN(greatest(lit(0.0), col("l_quantity") - 25.0), 2)
            .as("qty_over_25"),
          when(col("l_quantity") > 0,
            Det.roundN(col("l_discount") / col("l_quantity") * 100, 4))
            .otherwise(0.0).as("discount_rate"),
          when(col("l_extendedprice") > 90000, "CRITICAL")
            .when(col("l_extendedprice") > 50000, "HIGH")
            .when(col("l_extendedprice") > 10000, "MEDIUM")
            .otherwise("LOW").as("severity"),
          floor(col("l_extendedprice")).cast("long").as("price_floor_long"),
          (col("l_tax") > col("l_discount")).as("tax_exceeds_discount"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Additive penalty quality score — pure column arithmetic, no UDF.
    // 100 − 30(invalid email) − 20(no digits in key) − 10(negative balance),
    // floored at 0. Ref: transform_silver.py:188-194,319-336.
    QueryDef.sql(
      "f_quality_score",
      s"""SELECT c_custkey,
         |  GREATEST(0, 100
         |    - CASE WHEN NOT regexp_full_match(email, '${emailRegex}') THEN 30 ELSE 0 END
         |    - CASE WHEN NOT regexp_matches(c_name, '[0-9]') THEN 20 ELSE 0 END
         |    - CASE WHEN c_acctbal < 0 THEN 10 ELSE 0 END) AS quality_score
         |FROM (SELECT c_custkey, c_name, c_acctbal, $emailSql AS email FROM customer)
         |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          emailCol.as("email"))
        .select(col("c_custkey"),
          greatest(lit(0), lit(100)
            - when(!col("email").rlike(emailRegex), 30).otherwise(0)
            - when(!col("c_name").rlike("[0-9]"), 20).otherwise(0)
            - when(col("c_acctbal") < 0, 10).otherwise(0)).as("quality_score"))
        .orderBy("c_custkey")
    },

    // Lineage hashing: sha256 16-hex prefix + md5.
    // Ref: ingest_bronze.py:52-54,65,111.
    QueryDef.sql(
      "f_hash_lineage",
      """SELECT p_partkey,
        |  substr(sha256(p_name), 1, 16) AS content_hash,
        |  md5(p_name || '|' || p_brand) AS row_hash
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          sha2(col("p_name"), 256).substr(1, 16).as("content_hash"),
          md5(concat_ws("|", col("p_name"), col("p_brand"))).as("row_hash"))
        .orderBy("p_partkey")
    },

    // JSON extraction from a string column (schema-on-read escape hatch,
    // the raw_data/JSONB pattern). Ref: load_bronze.py:98-100,237;
    // transform_silver.py:149,171-183.
    QueryDef.sql(
      "f_json_extract",
      """SELECT event_id,
        |  CAST(props->>'$.k' AS INT) AS k,
        |  COALESCE(CAST(props->>'$.missing' AS INT), -1) AS missing_default
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          coalesce(get_json_object(col("props"), "$.missing").cast("int"),
            lit(-1)).as("missing_default"))
        .orderBy("event_id")
    },

    // Nested struct round-trip: parse JSON → typed struct → fields, with
    // string→double geo cast defaulting to 0.0 (users.address.geo quirk).
    // Ref: transform_silver.py:171-183; SURVEY §7.4.4. Spark and DuckDB
    // serialize the reserialized struct byte-identically (compact
    // separators, string-typed k), so the JSON text is oracle-checked.
    QueryDef.sql(
      "f_json_struct_roundtrip",
      """SELECT event_id,
        |  COALESCE(TRY_CAST(props->>'$.k' AS DOUBLE), 0.0) AS k_num,
        |  to_json(struct_pack(event_id := event_id, k := props->>'$.k'))
        |    AS reserialized
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("k", StringType)))
      Tables.events(s, d)
        .select(col("event_id"),
          from_json(col("props"), schema).as("parsed"))
        .select(col("event_id"),
          coalesce(col("parsed.k").cast("double"), lit(0.0)).as("k_num"),
          to_json(struct(col("event_id"), col("parsed.k").as("k"))).as("reserialized"))
        .orderBy("event_id")
    },

    // Luhn checksum validation — the PII-scanner upgrade from "looks
    // like a card number" (regex) to "IS a checksum-valid card number":
    // 16 synthetic digits per customer (deterministic from custkey),
    // double every second digit from the right, subtract 9 when > 9,
    // valid iff the sum divides 10. Pure integer digit arithmetic over
    // a 16-position constant fanout — identical on any engine; masked
    // output (first 4 + last 4) models the redaction a real scanner
    // emits.
    QueryDef.sql(
      "f_luhn_validate",
      s"""WITH card AS (
         |  SELECT c_custkey,
         |    '4' || lpad(CAST(c_custkey * 7919 % 100000000000000 AS VARCHAR), 14, '0')
         |      || CAST(c_custkey % 10 AS VARCHAR) AS num
         |  FROM customer),
         |digits AS (
         |  SELECT c_custkey, num, i,
         |    CAST(substr(num, i, 1) AS INT) AS dg
         |  FROM card, (SELECT unnest(generate_series(1, 16)) AS i) ii),
         |scored AS (
         |  SELECT c_custkey, num,
         |    SUM(CASE WHEN (17 - i) % 2 = 0
         |      THEN CASE WHEN dg * 2 > 9 THEN dg * 2 - 9 ELSE dg * 2 END
         |      ELSE dg END) AS s
         |  FROM digits GROUP BY 1, 2)
         |SELECT c_custkey,
         |  substr(num, 1, 4) || '********' || substr(num, 13, 4) AS card_masked,
         |  (s % 10 = 0) AS luhn_valid
         |FROM scored ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val num = concat(lit("4"),
        lpad((col("c_custkey") * 7919 % 100000000000000L).cast("string"),
          14, "0"),
        (col("c_custkey") % 10).cast("string"))
      val card = Tables.customer(s, d).select(col("c_custkey"), num.as("num"))
      val digits = card
        .select(col("c_custkey"), col("num"),
          posexplode(split(col("num"), "")).as(Seq("__p", "__d")))
        .select(col("c_custkey"), col("num"), (col("__p") + 1).as("i"),
          col("__d").cast("int").as("dg"))
      val doubled = when((lit(17) - col("i")) % 2 === 0,
        when(col("dg") * 2 > 9, col("dg") * 2 - 9).otherwise(col("dg") * 2))
        .otherwise(col("dg"))
      digits.groupBy("c_custkey", "num")
        .agg(sum(doubled).as("s"))
        .select(col("c_custkey"),
          concat(substring(col("num"), 1, 4), lit("********"),
            substring(col("num"), 13, 4)).as("card_masked"),
          (col("s") % 10 === 0).as("luhn_valid"))
        .orderBy("c_custkey")
    },
  )
}
