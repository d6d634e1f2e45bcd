package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.functions.{lit, struct}
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}

/** Running COMPOSITION of 2-D affine maps as a window function:
  * the general second-order linear recurrence
  * `v_t = A_t · v_{t-1} + c_t` evaluated as an associative scan.
  *
  * Each input row carries one affine map `f_t(v) = A_t v + c_t` as a
  * 6-field struct (m11,m12,m21,m22,c1,c2); the aggregate's buffer is
  * the COMPOSED map `f_t ∘ … ∘ f_1` (affine maps are closed under
  * composition: `(F∘G)(v) = F_m G_m v + F_m g_c + f_c`), and the
  * evaluate result is that composed map itself — callers apply it to
  * a seed state with [[Affine2.applyTo]] or compose slice-level maps
  * with [[Affine2.compose]]. This is [[ClampScan]]'s trick lifted
  * from the clamped-shift monoid to the full affine monoid: ONE
  * ordered pass replaces a depth-many sequential recursion, and —
  * because composition is associative — per-slice partial maps can be
  * combined ACROSS slices, which is what lets
  * [[graft.operators.RecurrenceOps.affineScanBy]] run the recurrence
  * distributed (Blelloch's parallel scan, 1990, applied to linear
  * recurrences as in Blelloch §1.4 "recurrence solving").
  *
  * Instances: Holt's double exponential smoothing (level+trend — the
  * `holt_smooth` query), EWMA (degenerate 1-D case), damped-trend
  * Holt, any AR(2)-style filter with data-dependent coefficients.
  *
  * Same window-evaluator contract as [[ClampScan]]: composition is
  * non-commutative, so this is legal ONLY inside a running ROWS frame
  * (UNBOUNDED PRECEDING → CURRENT ROW) where rows arrive in frame
  * order and partial buffers never merge — mergeExpressions throws.
  *
  * Float parity note: the composed-matrix association differs from
  * the sequential recurrence's left-to-right association by the usual
  * reassociation ulps; for contractive maps (spectral radius < 1 —
  * every smoothing filter) the relative drift stays ~n·ε, far inside
  * the r4 output grid consumers round to (pinned bit-tight by
  * RecurrenceSpec's sequential-vs-distributed law test).
  */
case class Affine2Compose(map: Expression)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(map)
  override def dataType: DataType = Affine2.MapType
  override def nullable: Boolean = false
  override def prettyName: String = "affine2_compose"

  private lazy val p11 = AttributeReference("af_p11", DoubleType, nullable = false)()
  private lazy val p12 = AttributeReference("af_p12", DoubleType, nullable = false)()
  private lazy val p21 = AttributeReference("af_p21", DoubleType, nullable = false)()
  private lazy val p22 = AttributeReference("af_p22", DoubleType, nullable = false)()
  private lazy val q1 = AttributeReference("af_q1", DoubleType, nullable = false)()
  private lazy val q2 = AttributeReference("af_q2", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] =
    Seq(p11, p12, p21, p22, q1, q2)

  // identity map — also what an EMPTY exclusive frame evaluates to,
  // which is exactly the "no predecessor slices" offset the
  // distributed form needs (no coalesce dance).
  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(1.0), Literal(0.0), Literal(0.0), Literal(1.0),
    Literal(0.0), Literal(0.0))

  private def f(i: Int): Expression = GetStructField(map, i)

  // compose the incoming row's map AFTER the buffer: P' = M·P, q' = M·q + c
  override lazy val updateExpressions: Seq[Expression] = Seq(
    Add(Multiply(f(0), p11), Multiply(f(1), p21)),
    Add(Multiply(f(0), p12), Multiply(f(1), p22)),
    Add(Multiply(f(2), p11), Multiply(f(3), p21)),
    Add(Multiply(f(2), p12), Multiply(f(3), p22)),
    Add(Add(Multiply(f(0), q1), Multiply(f(1), q2)), f(4)),
    Add(Add(Multiply(f(2), q1), Multiply(f(3), q2)), f(5)))

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(Seq(
      Literal("m11"), p11, Literal("m12"), p12,
      Literal("m21"), p21, Literal("m22"), p22,
      Literal("c1"), q1, Literal("c2"), q2))

  override lazy val mergeExpressions: Seq[Expression] =
    throw new UnsupportedOperationException(
      "affine2_compose composes in row order — running window frames only")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Affine2Compose =
    copy(map = newChildren(0))
}

object Affine2 {

  val MapType: StructType = StructType(Seq(
    StructField("m11", DoubleType, nullable = false),
    StructField("m12", DoubleType, nullable = false),
    StructField("m21", DoubleType, nullable = false),
    StructField("m22", DoubleType, nullable = false),
    StructField("c1", DoubleType, nullable = false),
    StructField("c2", DoubleType, nullable = false)))

  /** Build a per-row affine map struct `v ↦ [[a11,a12],[a21,a22]]·v +
    * (c1,c2)`. All six may be data-dependent Columns.
    */
  def affineMap(a11: Column, a12: Column, a21: Column, a22: Column,
      c1: Column, c2: Column): Column =
    struct(a11.cast("double").as("m11"), a12.cast("double").as("m12"),
      a21.cast("double").as("m21"), a22.cast("double").as("m22"),
      c1.cast("double").as("c1"), c2.cast("double").as("c2"))

  /** Running composition `f_t ∘ … ∘ f_1` of the frame's map structs;
    * use with `.over(runningRowsFrame)`.
    */
  def composeScan(map: Column): Column =
    GraftBridge.column(
      Affine2Compose(GraftBridge.expression(map)).toAggregateExpression())

  /** Pure-column composition `f ∘ g` (g applied first). */
  def compose(fm: Column, gm: Column): Column = {
    def a(c: Column, n: String): Column = c.getField(n)
    struct(
      (a(fm, "m11") * a(gm, "m11") + a(fm, "m12") * a(gm, "m21")).as("m11"),
      (a(fm, "m11") * a(gm, "m12") + a(fm, "m12") * a(gm, "m22")).as("m12"),
      (a(fm, "m21") * a(gm, "m11") + a(fm, "m22") * a(gm, "m21")).as("m21"),
      (a(fm, "m21") * a(gm, "m12") + a(fm, "m22") * a(gm, "m22")).as("m22"),
      (a(fm, "m11") * a(gm, "c1") + a(fm, "m12") * a(gm, "c2") + a(fm, "c1")).as("c1"),
      (a(fm, "m21") * a(gm, "c1") + a(fm, "m22") * a(gm, "c2") + a(fm, "c2")).as("c2"))
  }

  /** The identity map as a literal struct. */
  def identity: Column =
    struct(lit(1.0).as("m11"), lit(0.0).as("m12"),
      lit(0.0).as("m21"), lit(1.0).as("m22"),
      lit(0.0).as("c1"), lit(0.0).as("c2"))

  /** Apply a map struct to a state `(v1, v2)` → struct(s1, s2). */
  def applyTo(fm: Column, v1: Column, v2: Column): Column =
    struct(
      (fm.getField("m11") * v1 + fm.getField("m12") * v2 + fm.getField("c1")).as("s1"),
      (fm.getField("m21") * v1 + fm.getField("m22") * v2 + fm.getField("c2")).as("s2"))
}
