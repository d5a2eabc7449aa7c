package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join over a string column — "which
  * values are misspellings / near-variants of each other", the blocking
  * primitive behind entity resolution and catalog reconciliation (the
  * reference normalizes free-text columns row-at-a-time, e.g.
  * scripts/silver/model_silver.py:61-67; pairwise reconciliation is the
  * missing cross-row half of that cleanup).
  *
  * A naive formulation is the all-pairs cross join with a
  * `levenshtein(a, b) <= d` predicate — O(n²) comparisons, a
  * BroadcastNestedLoopJoin that cannot survive any real vocabulary. This
  * operator makes candidate generation an EQUI-join via positional
  * q-gram prefix filtering (the Ed-Join scheme, Xiao et al., PVLDB 2008):
  *
  *   1. explode each string into its q-gram MULTISET (posexplode keeps
  *      duplicate grams as distinct rows);
  *   2. compute global gram document-frequencies — one map-side-combinable
  *      aggregate — and rank each string's grams rarest-first (freq, gram,
  *      pos: a total order);
  *   3. keep each string's first `q*d + 1` grams (its prefix). One edit
  *      destroys at most q grams, so two strings within distance d share
  *      at least `max(|ga|,|gb|) - q*d` grams; whenever that count bound
  *      is >= 1, their rarest-first prefixes must intersect — the
  *      inverted-index join on prefix grams is therefore LOSSLESS;
  *   4. hash-join prefixes on gram, length-filter `| |a| - |b| | <= d`
  *      (d edits change length by at most d), dedupe pairs;
  *   5. verify candidates with the exact codegen'd `levenshtein`.
  *
  * Strings too short for the bound (`len < q*d + q`, where the longer
  * side's gram count `len - q + 1` can be <= q*d and a within-distance
  * pair may share zero grams) are routed through an explicit short-string
  * bucket: a self-cross of ONLY those strings. That set is bounded by the
  * alphabet (every member is shorter than q*d + q chars), so the cross is
  * a broadcast of a few thousand rows at worst, and losslessness holds
  * overall: long×long pairs via the prefix index, short×short via the
  * bucket, and a short×long pair within distance d forces the long side's
  * bound positive, so the prefix index covers it (both sides emit
  * prefixes regardless of length).
  *
  * Shuffle volume: O(total grams) for the frequency join + rank, then
  * O(candidates) for verification — candidates, not n², is the scaling
  * term, and rare-gram prefixes keep posting lists short without any
  * lossy cap. Returns (str_a, str_b, edit_dist), str_a < str_b.
  */
object FuzzyJoin {

  /** @param df      relation carrying the string column (deduplicated
    *                internally; pass the projected column)
    * @param strCol  string column to join on
    * @param maxDist inclusive Levenshtein threshold d >= 1
    * @param q       gram size (default 2; bigrams suit short fields)
    */
  def editDistancePairs(df: DataFrame, strCol: String, maxDist: Int,
      q: Int = 2): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1: $maxDist")
    require(q >= 1, s"q must be >= 1: $q")
    val prefixLen = q * maxDist + 1
    val minLongLen = q * maxDist + q // gram count > q*d ⇔ len >= q*d + q

    val strs = df.select(col(strCol).cast("string").as("__s"))
      .filter(col("__s").isNotNull && length(col("__s")) >= 1)
      .distinct()
      .withColumn("__len", length(col("__s")))

    // 1. positional gram multiset (strings shorter than q grams emit none
    //    — they are all in the short bucket anyway).
    val grams = strs
      .select(col("__s"), col("__len"), posexplode(
        expr(s"transform(sequence(1, greatest(__len - $q + 1, 0)), " +
          s"i -> substring(__s, i, $q))")).as(Seq("__pos", "__g")))

    // 2-3. rarest-first rank per string; the per-string window partitions
    //      are gram counts (string length), never corpus-sized.
    val freq = grams.groupBy("__g").agg(count(lit(1)).as("__df"))
    val prefix = grams.join(freq, Seq("__g"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("__s").orderBy(col("__df"), col("__g"),
          col("__pos"))))
      .filter(col("__rk") <= prefixLen)
      .select(col("__s"), col("__len"), col("__g"))

    // 4. inverted-index candidate join + length filter.
    val indexed = prefix
      .select(col("__s").as("str_a"), col("__len").as("__la"), col("__g"))
      .join(prefix
        .select(col("__s").as("str_b"), col("__len").as("__lb"), col("__g")),
        Seq("__g"))
      .filter(col("str_a") < col("str_b") &&
        abs(col("__la") - col("__lb")) <= maxDist)
      .select("str_a", "str_b").distinct()

    // Short×short fallback: both sides below the bound's reach.
    val short = strs.filter(col("__len") < minLongLen).select("__s", "__len")
    val shortPairs = short.select(col("__s").as("str_a"), col("__len").as("__la"))
      .crossJoin(short.select(col("__s").as("str_b"), col("__len").as("__lb")))
      .filter(col("str_a") < col("str_b") &&
        abs(col("__la") - col("__lb")) <= maxDist)
      .select("str_a", "str_b")

    // 5. exact verification on the candidate set only.
    indexed.union(shortPairs).distinct()
      .withColumn("edit_dist", levenshtein(col("str_a"), col("str_b")))
      .filter(col("edit_dist") <= maxDist)
  }

  /** Bipartite best-match lookup — for each distinct probe string, the
    * closest dictionary string within `maxDist` (ties broken by the
    * lexicographically smallest match): the entity-resolution shape, a
    * dirty feed reconciled against a canonical vocabulary.
    *
    * Same lossless machinery as [[editDistancePairs]] with the two sides
    * kept asymmetric: gram document-frequencies come from the UNION of
    * both sides (the prefix theorem needs one shared global gram order,
    * not two), each side emits its own `q*d + 1` rarest-gram prefix, and
    * the short-string fallback crosses short probes against short
    * dictionary entries only. The final argmin is a map-side-combinable
    * `min(struct(dist, match))` — no window over the probe set.
    * Returns (probe, match, edit_dist); probes with no match within
    * `maxDist` are absent (left-join downstream if needed).
    */
  def editDistanceLookup(probes: DataFrame, dict: DataFrame,
      probeCol: String, dictCol: String, maxDist: Int,
      q: Int = 2): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1: $maxDist")
    require(q >= 1, s"q must be >= 1: $q")
    val prefixLen = q * maxDist + 1
    val minLongLen = q * maxDist + q

    def clean(df: DataFrame, c: String) =
      df.select(col(c).cast("string").as("__s"))
        .filter(col("__s").isNotNull && length(col("__s")) >= 1)
        .distinct()
        .withColumn("__len", length(col("__s")))
    val p = clean(probes, probeCol)
    val d = clean(dict, dictCol)

    def grams(df: DataFrame) = df
      .select(col("__s"), col("__len"), posexplode(
        expr(s"transform(sequence(1, greatest(__len - $q + 1, 0)), " +
          s"i -> substring(__s, i, $q))")).as(Seq("__pos", "__g")))
    val pg = grams(p)
    val dg = grams(d)
    val freq = pg.select("__g").union(dg.select("__g"))
      .groupBy("__g").agg(count(lit(1)).as("__df"))

    def prefix(g: DataFrame) = g.join(freq, Seq("__g"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("__s").orderBy(col("__df"), col("__g"),
          col("__pos"))))
      .filter(col("__rk") <= prefixLen)
      .select(col("__s"), col("__len"), col("__g"))

    val indexed = prefix(pg)
      .select(col("__s").as("probe"), col("__len").as("__lp"), col("__g"))
      .join(prefix(dg)
        .select(col("__s").as("match"), col("__len").as("__ld"), col("__g")),
        Seq("__g"))
      .filter(abs(col("__lp") - col("__ld")) <= maxDist)
      .select("probe", "match").distinct()

    val shortPairs = p.filter(col("__len") < minLongLen)
      .select(col("__s").as("probe"), col("__len").as("__lp"))
      .crossJoin(d.filter(col("__len") < minLongLen)
        .select(col("__s").as("match"), col("__len").as("__ld")))
      .filter(abs(col("__lp") - col("__ld")) <= maxDist)
      .select("probe", "match")

    indexed.union(shortPairs).distinct()
      .withColumn("edit_dist", levenshtein(col("probe"), col("match")))
      .filter(col("edit_dist") <= maxDist)
      .groupBy("probe")
      .agg(min(struct(col("edit_dist"), col("match"))).as("__m"))
      .select(col("probe"), col("__m.match").as("match"),
        col("__m.edit_dist").as("edit_dist"))
  }
}
