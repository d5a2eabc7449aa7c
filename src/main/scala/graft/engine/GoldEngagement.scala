package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gold user-engagement rollup — the reference declares + indexes
  * gold.user_engagement_metrics (model_gold.py:93-103,132: engagement_date,
  * user_id, post_count, avg_post_length, total_words, engagement_score,
  * activity_level, last_active_date) but never populates it; SURVEY's intro
  * mandates implementing the declared computation. This is the natural
  * consumer of silver.clean_posts ([[SilverPosts]]) keyed the way the DDL's
  * PRIMARY KEY (engagement_date, user_id) says.
  *
  * The testdata documents table carries no user attribution, so
  * [[attribute]] derives the deterministic (user_id, engagement_date) the
  * reference's posts feed has natively (JSONPlaceholder posts carry
  * userId 1..10): user_id = doc_id % 10 + 1, engagement_date = 2024-01-01
  * + (doc_id % 28) days. Swap [[attribute]] for the real columns when the
  * source carries them.
  *
  * Column semantics (no reference formula exists — the table was never
  * inserted into — so these are the declared-schema-implied ones):
  *   - post_count / total_words / avg_post_length: per-key count, word
  *     sum, mean post length in chars (2 dp, decimal-summed).
  *   - engagement_score: additive, posts-dominant —
  *     10·posts + 0.1·words + 0.05·avg_len, 2 dp.
  *   - activity_level: CASE chain on post_count (the DDL's VARCHAR(20)).
  *   - last_active_date: the user's max engagement_date over full history
  *     (window over user_id, not the group key).
  *
  * Scale: one hash aggregate on (engagement_date, user_id) — map-side
  * combinable, cardinality grows with users×days not rows — plus one
  * window partitioned by user_id. No driver-side step.
  */
object GoldEngagement {

  val nUsers = 10
  val nDays = 28
  val epoch = "2024-01-01"

  /** Deterministic stand-in for the posts feed's native (userId, date). */
  def attribute(cleanPosts: DataFrame): DataFrame =
    cleanPosts
      .withColumn("user_id", (col("doc_id") % nUsers + 1).cast("long"))
      .withColumn("engagement_date",
        date_add(lit(epoch).cast("date"), (col("doc_id") % nDays).cast("int")))

  /** posts must carry (engagement_date, user_id, body_length, word_count). */
  def transform(posts: DataFrame): DataFrame =
    posts.groupBy("engagement_date", "user_id")
      .agg(
        count(lit(1)).as("post_count"),
        Det.roundN(Det.davg(col("body_length")), 2).as("avg_post_length"),
        sum(col("word_count")).cast("long").as("total_words"))
      // score*100 = 1000·posts + 10·words + 5·avg_len is EXACT in
      // DECIMAL(28,2) (avg_len carries 2 decimals, so 5·avg_len has 2),
      // which makes the half-up rounding a decimal floor instead of a
      // double floor: the all-double form hit a genuine .xx5 tie at
      // sf0.001 that Spark (pure double) and DuckDB (mixed
      // decimal/double) split to opposite sides. Found by the cross-SF
      // verify gate; the decimal form is tie-exact at any SF.
      .withColumn("engagement_score",
        floor((col("post_count") * 1000 + col("total_words") * 10)
            .cast(DecimalType(28, 2))
          + (col("avg_post_length") * 5).cast(DecimalType(28, 2))
          + lit(0.5).cast(DecimalType(28, 2)))
          .cast("double") / 100.0)
      .withColumn("activity_level",
        when(col("post_count") >= 5, "power_user")
          .when(col("post_count") >= 3, "active")
          .when(col("post_count") >= 2, "casual")
          .otherwise("occasional"))
      .withColumn("last_active_date",
        max(col("engagement_date")).over(Window.partitionBy("user_id")))
      .select("engagement_date", "user_id", "post_count", "avg_post_length",
        "total_words", "engagement_score", "activity_level",
        "last_active_date")
}
