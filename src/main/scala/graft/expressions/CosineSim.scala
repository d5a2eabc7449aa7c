package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two array<float> columns.
  *
  * Why a custom Expression (SURVEY §7.3 preference order (b)): the
  * built-in composition — `aggregate(zip_with(a, b, _*_), 0d, _+_)` over
  * casted arrays — is a chain of higher-order functions, which Spark
  * evaluates interpreted (CodegenFallback, no common-subexpression
  * elimination), allocating a lambda frame per element. For ANN scans
  * that's the innermost loop over every vector in the corpus. This
  * expression generates a single fused Java loop over the raw float
  * arrays (one pass computes dot, |a|², |b|²), participating in
  * whole-stage codegen, with an identical interpreted eval as fallback.
  *
  * Math is done in double with left-to-right accumulation — bit-identical
  * to the HOF composition and to a single-node oracle, so it can swap in
  * under the existing oracle-checked queries.
  *
  * Null/shape semantics: NULL if either side is NULL; 0.0 when either
  * norm is 0; mismatched lengths use the shorter prefix for the dot
  * product (norms over each full array).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    CosineSim.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = CosineSim.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Single fused pass; shared by interpreted eval and generated code. */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.min(nx, ny)
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    var na = 0.0
    i = 0
    while (i < nx) { val v = x.getFloat(i).toDouble; na += v * v; i += 1 }
    var nb = 0.0
    i = 0
    while (i < ny) { val v = y.getFloat(i).toDouble; nb += v * v; i += 1 }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0) dot / denom else 0.0
  }
}
