package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Stage.syntax._

/** Frequent-itemset mining (A-priori) over basket data — the market-basket
  * step past pairwise co-occurrence (`a_copurchase_pairs` /
  * `a_basket_lift`): which item TRIPLES recur across orders.
  *
  * The naive 3-way basket self-join enumerates Σ C(|basket|, 3) rows —
  * cubic in basket width and corpus-wide; that shape is the ORACLE here,
  * never the plan. A-priori's monotonicity (every subset of a frequent
  * set is frequent) gives the scale path:
  *
  *   1. frequent items (one count, semi-join filters the basket relation)
  *   2. frequent pairs over the filtered baskets (one i<j self-join —
  *      the already-shipped pair shape)
  *   3. candidate triples = freq-pair ⋈ freq-pair sharing the first item
  *      (b < c), pruned by "third edge (b,c) also frequent" — a
  *      candidate relation bounded by the frequent-pair count, NOT by
  *      the corpus
  *   4. support counted by three keyed joins of the candidates back to
  *      the filtered basket relation — only candidate-relevant rows flow
  *
  * Every join is equi-keyed (no cartesian), every aggregate map-side
  * combinable; the candidate relation is the only quadratic-ish object
  * and it lives in frequent-pair space. Reference analytics stop at
  * top-sellers (model_gold.py:139-241); this is the lattice level above.
  */
object Itemsets {

  /** Frequent triples with support >= minSupport.
    * Returns (p1, p2, p3, support), p1 < p2 < p3, support-ranked. */
  def frequentTriples(baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport: $minSupport")
    val b = baskets.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct().staged
    val freqItems = b.groupBy("it").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minSupport).select("it")
    val bf = b.join(freqItems, Seq("it"), "left_semi").staged
    val freqPairs = bf.select(col("bk"), col("it").as("ia"))
      .join(bf.select(col("bk"), col("it").as("ib")), Seq("bk"))
      .filter(col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("__n2"))
      .filter(col("__n2") >= minSupport)
      .select("ia", "ib").staged
    val cands = freqPairs.select(col("ia").as("p1"), col("ib").as("p2"))
      .join(freqPairs.select(col("ia").as("p1"), col("ib").as("p3")), Seq("p1"))
      .filter(col("p2") < col("p3"))
      // a-priori prune: the third edge (p2, p3) must itself be frequent
      .join(freqPairs.select(col("ia").as("p2"), col("ib").as("p3")),
        Seq("p2", "p3"), "left_semi")
    cands
      .join(bf.select(col("it").as("p1"), col("bk")), Seq("p1"))
      .join(bf.select(col("it").as("p2"), col("bk")), Seq("p2", "bk"))
      .join(bf.select(col("it").as("p3"), col("bk")), Seq("p3", "bk"))
      .groupBy("p1", "p2", "p3").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .orderBy(desc("support"), col("p1"), col("p2"), col("p3"))
  }
}
