package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector similarity primitives over `array<float>` / `array<double>`
  * embedding columns.
  *
  * Two interchangeable implementations with IDENTICAL arithmetic (left-to-
  * right double accumulation — bit-reproducible and oracle-matchable):
  *
  *   - `dotHof` / `cosineHof`: built-in higher-order functions
  *     (`aggregate(zip_with(...))`) — whole-stage-codegen friendly, used in
  *     the oracle-checked queries;
  *   - [[DotProduct]]: a custom Catalyst `BinaryExpression` with `doGenCode`
  *     emitting a tight primitive loop (no per-element lambda closure /
  *     boxing) — the hot path for brute-force top-k at scale.
  *
  * North-star extension (SURVEY.md §7.3 step 5); the reference itself has no
  * vector ops.
  */
object VectorFunctions {

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Σ aᵢ·bᵢ accumulated left-to-right in double. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  def normHof(a: Column): Column = sqrt(dotHof(a, a))

  /** cos(a,b) = dot/(‖a‖·‖b‖), all-double, fixed evaluation order. */
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (normHof(a) * normHof(b))

  /** Codegen'd dot product (same LTR double arithmetic as [[dotHof]]). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(asDouble(a)),
      ColumnBridge.expression(asDouble(b))))
  }

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
}

/** Dot product of two `array<double>` columns as a native Catalyst
  * expression: interpreted eval + whole-stage-codegen (`doGenCode`) paths
  * both accumulate left-to-right, matching the HOF variant bit-for-bit.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<double>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
