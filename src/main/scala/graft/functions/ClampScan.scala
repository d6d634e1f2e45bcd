package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Running two-sided-clamped sum as a WINDOW function:
  * `y_t = min(hi, max(lo, y_{t-1} + delta_t))`, `y_0 = seed` — the
  * error-budget carryover recurrence (budget_carryover), evaluated in
  * ONE ordered window pass instead of a depth-many recursive loop.
  *
  * Why this is legal as a scan: clamped-shift functions
  * `f(x) = min(b, max(a, x + s))` are CLOSED under composition —
  * `g∘f` for `g(y) = min(hi, max(lo, y + d))` is again of that form
  * with `s' = s + d`, `a' = max(lo, a + d)`,
  * `b' = min(hi, max(lo, b + d))` (min/max distributivity; holds
  * with no a ≤ b canonicalization — a saturated composition keeps
  * representing the constant function correctly). So the buffer
  * carries the composed (s, a, b) triple and each row's budget is
  * that function applied to the seed. This is the classic
  * "associative scan over a function monoid" trick; the one-sided
  * special case is the running-drawdown identity.
  *
  * Numerical parity with the sequential recurrence: whenever a clamp
  * has BOUND at some step, the a/b parameter chains accumulate the
  * exact same left-to-right float additions the sequential recurrence
  * performs after its last clamp — bit-identical results. Only the
  * never-clamped prefix differs (seed + Σd vs ((seed+d₁)+d₂)…), an
  * ulp-class difference absorbed by the r4 output grid.
  *
  * A DeclarativeAggregate used ONLY inside a running window frame
  * (ROWS UNBOUNDED PRECEDING → CURRENT ROW): the window evaluator
  * feeds rows in frame order and never merges partial buffers, which
  * is exactly the contract a non-commutative composition needs —
  * mergeExpressions therefore throws, like Spark's own
  * AggregateWindowFunctions. (Extending AggregateWindowFunction
  * directly was tried first; Spark 4's CheckAnalysis only admits
  * AggregateExpression-wrapped functions and its own internal window
  * function classes inside an OVER clause.)
  */
case class ClampScan(delta: Expression, lo: Expression, hi: Expression,
    seed: Expression)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(delta, lo, hi, seed)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "clamp_scan"

  private lazy val s = AttributeReference("cs_s", DoubleType, nullable = false)()
  private lazy val a = AttributeReference("cs_a", DoubleType, nullable = false)()
  private lazy val b = AttributeReference("cs_b", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(s, a, b)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(0.0),
    Literal(Double.NegativeInfinity),
    Literal(Double.PositiveInfinity))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    Add(s, delta),
    Greatest(Seq(lo, Add(a, delta))),
    Least(Seq(hi, Greatest(Seq(lo, Add(b, delta))))))

  override lazy val evaluateExpression: Expression =
    Least(Seq(b, Greatest(Seq(a, Add(seed, s)))))

  override lazy val mergeExpressions: Seq[Expression] =
    throw new UnsupportedOperationException(
      "clamp_scan composes in row order — running window frames only")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ClampScan =
    copy(delta = newChildren(0), lo = newChildren(1), hi = newChildren(2),
      seed = newChildren(3))
}

object ClampScan {
  /** Column form: running `min(hi, max(lo, prev + delta))` from
    * `seed`; use with `.over(windowSpec)`.
    */
  def clampScan(delta: Column, lo: Double, hi: Double, seed: Double): Column =
    GraftBridge.column(ClampScan(GraftBridge.expression(delta),
      Literal(lo), Literal(hi), Literal(seed)).toAggregateExpression())

  /** Column form of [[ClampScanFn]]: the composed clamped-shift
    * FUNCTION itself, `struct(s, a, b)`; use with `.over(windowSpec)`.
    */
  def clampScanFn(delta: Column, lo: Double, hi: Double): Column =
    GraftBridge.column(ClampScanFn(GraftBridge.expression(delta),
      Literal(lo), Literal(hi)).toAggregateExpression())
}

/** [[ClampScan]]'s sibling that returns the composed FUNCTION, not
  * its application: the running composition `f_t ∘ … ∘ f_1` of the
  * row-wise clamped shifts `f_i(x) = min(hi, max(lo, x + delta_i))`,
  * materialized as `struct(s, a, b)` with
  * `apply(x) = min(b, max(a, x + s))`.
  *
  * Why it exists (r10): budget_carryover's recursive CTE recursed one
  * DAY per UnionLoop step — ~30 sequential driver jobs whose cost is
  * pure scheduling floor. With the composed function exposed as a
  * column, the recursion can step one BLOCK of days at a time (the
  * within-block scan is this window, one pass, corpus-side parallel)
  * and the cross-block recurrence — the genuinely sequential part —
  * keeps the `WITH RECURSIVE` surface at a depth that is CONSTANT in
  * the series length. Numerics are [[ClampScan]]'s, unchanged: the
  * same (s, a, b) buffer chains, so a block-end triple applied to the
  * previous block's budget replays exactly the float ops the
  * day-by-day recursion performs whenever a clamp has bound since
  * block start, and is ulp-close otherwise (absorbed by the r4 output
  * grid). Same running-window-only contract: merge throws.
  */
case class ClampScanFn(delta: Expression, lo: Expression, hi: Expression)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(delta, lo, hi)
  override def dataType: DataType = types.StructType(Seq(
    types.StructField("s", DoubleType, nullable = false),
    types.StructField("a", DoubleType, nullable = false),
    types.StructField("b", DoubleType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "clamp_scan_fn"

  private lazy val s = AttributeReference("cf_s", DoubleType, nullable = false)()
  private lazy val a = AttributeReference("cf_a", DoubleType, nullable = false)()
  private lazy val b = AttributeReference("cf_b", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(s, a, b)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(0.0),
    Literal(Double.NegativeInfinity),
    Literal(Double.PositiveInfinity))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    Add(s, delta),
    Greatest(Seq(lo, Add(a, delta))),
    Least(Seq(hi, Greatest(Seq(lo, Add(b, delta))))))

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(Seq(
      Literal("s"), s, Literal("a"), a, Literal("b"), b))

  override lazy val mergeExpressions: Seq[Expression] =
    throw new UnsupportedOperationException(
      "clamp_scan_fn composes in row order — running window frames only")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ClampScanFn =
    copy(delta = newChildren(0), lo = newChildren(1), hi = newChildren(2))
}
