package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.classic.GraftBridge
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
}
