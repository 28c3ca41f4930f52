package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Codegen'd cosine similarity: `cosine_sim(v, q)` where `v` is
 * array<float> OR array<double> and `q` is array<double>.
 *
 * The built-in form (`aggregate`/`zip_with`/`transform`, Ann.cosineCol) is
 * UDF-free but each higher-order function materializes an intermediate
 * array and evaluates its lambda per element through the interpreter; on
 * the ANN brute-force scan — the hot path at 10^9-vector scale — that is
 * three array allocations per row. This expression is one fused loop over
 * the two arrays inside whole-stage codegen: no intermediates, no lambda
 * dispatch. Same accumulation order as `cosineCol` (left-to-right dot and
 * norms), so results are bitwise identical (CosineExpressionsSpec).
 *
 * Kernel shape mirrors `Ann.cosineKernel` (used driver-side for IVF
 * centroid probing); empty or zero-norm inputs yield -1.0 like the kernel.
 */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) => TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckSuccess
      case (l, r) => TypeCheckFailure(
        s"cosine_sim expects (array<float|double>, array<double>), got (${l.sql}, ${r.sql})")
    }
  }

  private def leftIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val q = b.asInstanceOf[ArrayData]
    if (leftIsFloat) CosineSim.kernel(v, q) else CosineSim.kernelD(v, q)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = if (leftIsFloat) "kernel" else "kernelD"
    nullSafeCodeGen(ctx, ev, (vC, qC) =>
      s"${ev.value} = graft.functions.CosineSim.$k($vC, $qC);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object CosineSim {
  /** One fused pass: dot product + both norms (invoked from generated code
    * — static, no boxing). Accumulation order matches Ann.cosineCol
    * (left-to-right), so the double result is bitwise identical. */
  def kernel(v: ArrayData, q: ArrayData): Double = {
    val n = math.min(v.numElements(), q.numElements())
    var dot = 0.0; var nv = 0.0; var nq = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      val y = q.getDouble(i)
      dot += x * y; nv += x * x; nq += y * y
      i += 1
    }
    if (nv == 0 || nq == 0) -1.0 else dot / (math.sqrt(nv) * math.sqrt(nq))
  }

  /** `kernel` for an array<double> vector (x read as double directly —
    * bitwise-equal to `cosineCol` over the same doubles). */
  def kernelD(v: ArrayData, q: ArrayData): Double = {
    val n = math.min(v.numElements(), q.numElements())
    var dot = 0.0; var nv = 0.0; var nq = 0.0
    var i = 0
    while (i < n) {
      val x = v.getDouble(i)
      val y = q.getDouble(i)
      dot += x * y; nv += x * x; nq += y * y
      i += 1
    }
    if (nv == 0 || nq == 0) -1.0 else dot / (math.sqrt(nv) * math.sqrt(nq))
  }
}

object CosineFunctions {
  val Name = "cosine_sim"

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(Name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[CosineSim].getName, Name),
        (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1)))
    }
  }

  /** cosine_sim(vec: array<float|double>, query: array<double>) as a Column. */
  def cosineSim(spark: SparkSession, vec: Column, query: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(Name, vec, query)
  }
}
