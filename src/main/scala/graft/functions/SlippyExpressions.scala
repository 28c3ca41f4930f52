package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, IntegerType, LongType}

/**
 * Native Catalyst expressions for the slippy cell index — the engine's
 * H3/S2-style cell id (`cell = ToLocalId(WorldToTile(lon, lat, z), z)`,
 * reference math `/root/reference/src/HeatMap.Tiles/TileStatic.cs:145-168`).
 *
 * A codegen'd expression instead of a Scala UDF: stays inside whole-stage
 * codegen (no SerDe boundary, no closure dispatch) on the 10^12-row
 * point-indexing path. `doGenCode` emits a direct static call into the same
 * kernel `graft.core.Slippy` uses everywhere else, so index and pipeline
 * can never disagree.
 */
case class SlippyCell(lon: Expression, lat: Expression, zoom: Expression)
    extends TernaryExpression {

  override def first: Expression = lon
  override def second: Expression = lat
  override def third: Expression = zoom

  override def dataType: DataType = LongType
  override def nullable: Boolean = lon.nullable || lat.nullable || zoom.nullable

  override protected def nullSafeEval(lonV: Any, latV: Any, zoomV: Any): Any =
    graft.core.Slippy.worldTileLocalId(
      lonV.asInstanceOf[Double], latV.asInstanceOf[Double], zoomV.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lonC, latC, zC) =>
      s"${ev.value} = graft.core.Slippy.worldTileLocalId($lonC, $latC, $zC);")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (lon.dataType == DoubleType && lat.dataType == DoubleType && zoom.dataType == IntegerType)
      TypeCheckSuccess
    else TypeCheckFailure(
      s"slippy_cell expects (double, double, int), got (${lon.dataType}, ${lat.dataType}, ${zoom.dataType})")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(lon = newFirst, lat = newSecond, zoom = newThird)

  override def prettyName: String = "slippy_cell"
}

/** Codegen'd hierarchical cell encoding: `quad_key(lon, lat, zoom)` —
  * the prefix-embedding H3/S2-style id (`Slippy.quadKey`), computed inside
  * whole-stage codegen like `slippy_cell`. */
case class QuadKeyCell(lon: Expression, lat: Expression, zoom: Expression)
    extends TernaryExpression {

  override def first: Expression = lon
  override def second: Expression = lat
  override def third: Expression = zoom

  override def dataType: DataType = LongType
  override def nullable: Boolean = lon.nullable || lat.nullable || zoom.nullable

  override protected def nullSafeEval(lonV: Any, latV: Any, zoomV: Any): Any =
    graft.core.Slippy.worldToQuadKey(
      lonV.asInstanceOf[Double], latV.asInstanceOf[Double], zoomV.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lonC, latC, zC) =>
      s"${ev.value} = graft.core.Slippy.worldToQuadKey($lonC, $latC, $zC);")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (!(lon.dataType == DoubleType && lat.dataType == DoubleType && zoom.dataType == IntegerType))
      TypeCheckFailure(
        s"quad_key expects (double, double, int), got (${lon.dataType}, ${lat.dataType}, ${zoom.dataType})")
    else if (zoom.foldable && zoom.eval() != null && {
      val z = zoom.eval().asInstanceOf[Int]; z < 0 || z > 29
    })
      // analysis-time bound check: zoom > 29 would overflow the Long packing
      // (2·29 interleaved bits + 5 zoom bits); catch a literal out-of-range
      // zoom at plan time instead of a runtime require on executors
      TypeCheckFailure(s"quad_key zoom must be in [0, 29], got ${zoom.eval()}")
    else TypeCheckSuccess
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(lon = newFirst, lat = newSecond, zoom = newThird)

  override def prettyName: String = "quad_key"
}

object QuadKeyFunctions {
  val Name = "quad_key"

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(Name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[QuadKeyCell].getName, Name),
        (exprs: Seq[Expression]) => QuadKeyCell(exprs(0), exprs(1), exprs(2)))
    }
  }

  def quadKey(spark: SparkSession, lon: Column, lat: Column, zoom: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(Name, lon, lat,
      org.apache.spark.sql.functions.lit(zoom))
  }
}

object SlippyFunctions {
  val Name = "slippy_cell"

  /** Idempotently register slippy_cell in a session's function registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(Name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[SlippyCell].getName, Name),
        (exprs: Seq[Expression]) => SlippyCell(exprs(0), exprs(1), exprs(2)))
    }
  }

  /** Column builder (goes through the registry so it works on the Spark 4
    * Column API without touching internals). */
  def slippyCell(spark: SparkSession, lon: Column, lat: Column, zoom: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(Name, lon, lat,
      org.apache.spark.sql.functions.lit(zoom))
  }
}

/** SparkSessionExtensions hook: `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(SlippyFunctions.Name),
      new ExpressionInfo(classOf[SlippyCell].getName, SlippyFunctions.Name),
      (exprs: Seq[Expression]) => SlippyCell(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier(QuadKeyFunctions.Name),
      new ExpressionInfo(classOf[QuadKeyCell].getName, QuadKeyFunctions.Name),
      (exprs: Seq[Expression]) => QuadKeyCell(exprs(0), exprs(1), exprs(2))))
    ext.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
  }
}
