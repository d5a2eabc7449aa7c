package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Silver users transform: nested-JSON extraction, validity flags,
  * quality score, keyed dedup — the reference's per-row Python loop
  * (transform_silver.py:166-223) as pure column expressions.
  *
  * Input shape (users JSON, FIXTURES.md A): id, name, username, email,
  * phone, website, address struct {street, suite, city, zipcode,
  * geo{lat: string, lng: string}}, company struct {name, catchPhrase, bs}.
  */
object SilverUsers {

  val emailRegex = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"

  def transform(users: DataFrame): DataFrame = {
    val email = lower(trim(col("email")))
    val emailValid = email.rlike(emailRegex)
    val phoneValid = col("phone").isNotNull && col("phone").rlike("[0-9]")
    // tiebreak on value columns — user_id is the partition key, so
    // ordering by it alone would make keep-first arbitrary for dup ids
    val w = Window.partitionBy("user_id")
      .orderBy(col("email").asc_nulls_last, col("full_name").asc_nulls_last,
        col("phone").asc_nulls_last)
    users.select(
        col("id").cast("long").as("user_id"),
        lower(trim(col("name"))).as("full_name"),
        col("username"),
        email.as("email"),
        emailValid.as("email_valid"),
        when(email.contains("@"), substring_index(email, "@", -1))
          .as("email_domain"),
        length(lower(trim(col("name")))).as("name_length"),
        col("phone"),
        phoneValid.as("phone_valid"),
        regexp_replace(col("phone"), "[^0-9]", "").as("phone_digits"),
        col("website"),
        col("address.street").as("street"),
        col("address.city").as("city"),
        col("address.zipcode").as("zipcode"),
        // geo lat/lng arrive as STRINGS; invalid/missing → 0.0 not null
        // (transform_silver.py:176-178, SURVEY §7.4.4)
        coalesce(expr("try_cast(address.geo.lat AS DOUBLE)"), lit(0.0)).as("latitude"),
        coalesce(expr("try_cast(address.geo.lng AS DOUBLE)"), lit(0.0)).as("longitude"),
        col("company.name").as("company_name"),
        col("company.catchPhrase").as("company_catchphrase"),
        // 100 − 30 bad email − 20 bad phone (transform_silver.py:188-194)
        greatest(lit(0), lit(100)
          - when(!emailValid || email.isNull, 30).otherwise(0)
          - when(!phoneValid, 20).otherwise(0)).as("data_quality_score"))
      // P9 dedup on user_id, keep-first deterministic
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
