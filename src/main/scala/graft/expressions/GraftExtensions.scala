package graft.expressions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Engine extension point (SparkSessionExtensions): registers graft's
  * native expressions so SQL and the Column API can call them. Install
  * with `.withExtensions(new GraftExtensions)` at session build, or
  * post-hoc via [[GraftFunctions.register]] for sessions the engine
  * doesn't construct (the driver's Verify/Bench builders do the latter).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftFunctions.cosineSimDescriptor)
    e.injectFunction(GraftFunctions.dotProductDescriptor)
    e.injectFunction(GraftFunctions.jaroWinklerDescriptor)
    e.injectFunction(GraftFunctions.kmvSketchDescriptor)
    e.injectOptimizerRule(BroadcastGuard)
  }
}

object GraftFunctions {

  private[graft] val cosineSimDescriptor =
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1)): Expression)

  private[graft] val dotProductDescriptor =
    (new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1)): Expression)

  private[graft] val jaroWinklerDescriptor =
    (new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[Expression]) => JaroWinkler(children(0), children(1)): Expression)

  private[graft] val kmvSketchDescriptor =
    (new FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "kmv_sketch"),
      (children: Seq[Expression]) => KmvSketchAgg(children): Expression)

  /** Idempotent runtime registration into an existing session: the
    * cosine_sim expression plus the BroadcastGuard optimizer rule (via
    * experimental.extraOptimizations — the post-hoc injection point for
    * sessions the engine didn't construct). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      children => CosineSim(children(0), children(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      children => DotProduct(children(0), children(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler",
      children => JaroWinkler(children(0), children(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_sketch",
      children => KmvSketchAgg(children),
      "scala_udf")
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[BroadcastGuard]))
      spark.experimental.extraOptimizations = existing :+ BroadcastGuard(spark)
  }

  /** Column-API call; requires the function registered in the session. */
  def cosine_sim(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  def dot_product(a: Column, b: Column): Column =
    call_function("dot_product", a, b)

  def jaro_winkler(a: Column, b: Column): Column =
    call_function("jaro_winkler", a, b)

  /** One-pass KMV sketch aggregate (requires registration). */
  def kmv_sketch(h: Column, k: Int): Column =
    call_function("kmv_sketch", h, org.apache.spark.sql.functions.lit(k))
}
