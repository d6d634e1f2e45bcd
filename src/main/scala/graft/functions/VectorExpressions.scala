package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the vector-similarity hot loop.
  *
  * Why it exists: the portable formulation
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is correct but Spark's
  * higher-order functions are interpreted (no doGenCode) — every
  * element pays lambda-variable binding and boxing, and the zip_with
  * materializes an intermediate array. At 100 TB × 64-dim embeddings
  * that interpreted loop IS the query cost. This expression compiles
  * to a tight primitive `double` loop inside whole-stage codegen —
  * no allocation, no boxing — and keeps the surrounding projection
  * codegen-fused (a HOF in the projection forces the whole stage
  * interpreted for that expression tree).
  *
  * Semantics match the HOF form bit-for-bit on well-formed input:
  * sequential left-to-right summation over min(len(a), len(b))
  * elements (identical FP summation order ⇒ identical result bits).
  * Null arrays propagate null; null ELEMENTS are not expected
  * (embeddings are dense) and read as 0.0 rather than poisoning the
  * sum.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<double> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native vector expressions. */
object VectorFunctions {
  /** Codegen'd dot product of two array<double> columns. */
  def dotNative(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}
