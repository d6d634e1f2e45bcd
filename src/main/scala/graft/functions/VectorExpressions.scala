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

/** Squared L2 distance between two array<double> columns, folded
  * left-to-right in doubles — the codegen'd twin of the portable
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, _+_)` form.
  *
  * Why a SECOND expression instead of expanding through [[DotProduct]]
  * (‖a‖² + ‖b‖² − 2·a·b): the expansion changes the floating-point
  * summation ORDER, so a value can land one ulp away from the HOF
  * form — and ClusterOps' determinism contract rounds distances to a
  * 1e-6 grid BEFORE the argmin compare, where an ulp at a grid
  * boundary flips an assignment and breaks the DuckDB oracle hash.
  * This expression keeps the exact per-element (x−y)² fold, so it is
  * bit-identical to the HOF (and to the oracle's replay) while
  * compiling to a tight primitive loop inside whole-stage codegen —
  * the ~18× interpreted-HOF penalty (SURVEY §2.5 measurement) removed
  * without touching the numeric contract. Null arrays propagate null;
  * dense embeddings have no null elements (read as 0.0 if present).
  */
case class SqL2Dist(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq_l2_dist requires array<double> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "sq_l2_dist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Signed-random-projection signature over an array<double> column:
  * bit j = (Σ_i emb(i) · planes(j)(i)) > 0, packed little-endian into
  * one long — ALL nBits computed in a single pass per row.
  *
  * Why it exists (r11, guide §4 — the srp_near_dup sf30 knee): the
  * per-bit column form `Σ_j when(dot(emb, lit(h_j)) > 0, 1<<j)` built
  * a 60-dot expression tree whose evaluation measured ~190 µs/row at
  * sf30 (112 s for 600 k rows — the whole candidate-plane cost),
  * ~100× the arithmetic: sixty separate expression dispatches per row
  * against sixty GenericArrayData literals (boxed getDouble per
  * element). This expression holds the planes as a primitive
  * double[][] and runs the same multiply-accumulate loops.
  *
  * Bit-for-bit identical to the column form by construction: per
  * plane, sequential left-to-right `s += emb(i) * h(i)` over
  * min(len, dim) elements — the exact [[DotProduct]] fold — and the
  * same `> 0` threshold and `1L << j` packing. SrpProps pins the
  * equivalence against the retained reference form on random input.
  */
case class SrpSignatureExpr(child: Expression, planes: Array[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_signature requires array<double> input, got ${other.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "srp_signature"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var sig = 0L
    var j = 0
    while (j < planes.length) {
      val h = planes(j)
      val n = math.min(x.numElements(), h.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * h(i); i += 1 }
      if (s > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |long $sig = 0L;
         |for (int $j = 0; $j < $p.length; $j++) {
         |  final double[] $h = $p[$j];
         |  final int $n = java.lang.Math.min($a.numElements(), $h.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $h[$i];
         |  }
         |  if ($s > 0) $sig |= 1L << $j;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points for the native vector expressions. */
object VectorFunctions {
  /** Codegen'd dot product of two array<double> columns. */
  def dotNative(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Codegen'd squared L2 distance — bit-identical to the HOF fold. */
  def sqL2Native(a: Column, b: Column): Column =
    GraftBridge.column(SqL2Dist(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** One-pass SRP signature — bit-identical to the per-bit
    * `when(dot(emb, lit(plane)) > 0, 1 << j)` column form.
    */
  def srpSignatureNative(emb: Column, planes: Array[Array[Double]]): Column =
    GraftBridge.column(SrpSignatureExpr(GraftBridge.expression(emb), planes))
}
