package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

/** Derived-timestamp pushdown (SURVEY §7 round-4 candidate i):
  * recovers parquet predicate pushdown for ts-range filters written
  * against the DERIVED µs timestamp of a raw-nanos events table.
  *
  * Why: `Tables.events` surfaces `ts` as
  * `timestamp_micros(cast(ns / 1000 as long))` over the INT64
  * TIMESTAMP(NANOS) column. A user's
  * `.filter(col("ts") >= "2024-01-08")` then compares a DERIVED
  * expression, which the parquet reader can never push — the 100 TB
  * fact table full-scans unless the user knows to call
  * `eventsInRange`. This rule makes the naive formulation
  * plan-equivalent: for each comparison `cmp(derived_ts, literal)`
  * in a Filter it conjoins a REDUNDANT range predicate on the raw
  * nanos attribute itself, which IS pushable (shows up in
  * `PushedFilters`, prunes row groups via min/max stats and, on a
  * partitioned layout, whole partitions). The original comparison is
  * kept, so results are bit-identical by construction; the added
  * bound is a proven superset under truncating division for positive
  * bounds (epoch+), and the rule simply skips non-positive /
  * overflowing bounds.
  *
  * Conf-gated via `spark.graft.nanosPushdown.enabled` (default true).
  * NanosPushdownSpec asserts the pushed scan, result-identity with
  * `eventsInRange`, and fixed-point idempotency.
  */
object NanosRangePushdown extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.nanosPushdown.enabled"

  /** Matches `timestamp_micros(ns div 1000)` (the loader's exact
    * integral form) plus the legacy shapes `timestamp_micros(cast(ns
    * / 1000 as long))` / bare Divide, so user-written conversions in
    * any of the three spellings all get the pushdown.
    */
  private object DerivedMicros {
    private def thousand(e: Expression): Boolean = e match {
      case Literal(d: Double, DoubleType) => d == 1000.0
      case Literal(l: Long, LongType) => l == 1000L
      case Literal(i: Int, _) => i == 1000
      case c: Cast => thousand(c.child)
      case _ => false
    }
    private def rawLongAttr(e: Expression): Option[Attribute] = e match {
      case a: Attribute if a.dataType == LongType => Some(a)
      case c: Cast => rawLongAttr(c.child)
      case _ => None
    }
    private def dividedAttr(e: Expression): Option[Attribute] = e match {
      case d: Divide if thousand(d.right) => rawLongAttr(d.left)
      case d: IntegralDivide if thousand(d.right) => rawLongAttr(d.left)
      case _ => None
    }
    def unapply(e: Expression): Option[Attribute] = e match {
      case MicrosToTimestamp(inner) => inner match {
        case c: Cast if c.dataType == LongType => dividedAttr(c.child)
        case other => dividedAttr(other)
      }
      case _ => None
    }
  }

  /** The superset raw-nanos bound for `cmp(trunc(ns/1000), t)`,
    * valid for t > 0 (see scaladoc; truncation == floor for the
    * positive ns such bounds can admit).
    */
  private def nanosBound(cmp: BinaryComparison, attr: Attribute, t: Long): Seq[Expression] = {
    if (t <= 0 || t >= Long.MaxValue / 1000 - 1) return Nil
    val lo = Literal(t * 1000L, LongType)
    val hi = Literal((t + 1) * 1000L, LongType)
    cmp match {
      case _: GreaterThanOrEqual => Seq(GreaterThanOrEqual(attr, lo))
      case _: GreaterThan => Seq(GreaterThanOrEqual(attr, hi))
      case _: LessThan => Seq(LessThan(attr, lo))
      case _: LessThanOrEqual => Seq(LessThan(attr, hi))
      case _: EqualTo => Seq(GreaterThanOrEqual(attr, lo), LessThan(attr, hi))
      case _ => Nil
    }
  }

  /** Bounds implied by one comparison, in either operand order. */
  private def implied(e: Expression): Seq[Expression] = e match {
    case cmp @ BinaryComparison(DerivedMicros(attr), Literal(t: Long, TimestampType)) =>
      nanosBound(cmp, attr, t)
    case cmp @ BinaryComparison(Literal(t: Long, TimestampType), DerivedMicros(attr)) =>
      // mirror the comparison so the attr is on the left
      val mirrored: BinaryComparison = cmp match {
        case _: GreaterThan => LessThan(cmp.right, cmp.left)
        case _: GreaterThanOrEqual => LessThanOrEqual(cmp.right, cmp.left)
        case _: LessThan => GreaterThan(cmp.right, cmp.left)
        case _: LessThanOrEqual => GreaterThanOrEqual(cmp.right, cmp.left)
        case other => other
      }
      nanosBound(mirrored, attr, t)
    case _ => Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "true").toBoolean) plan
    else plan.transform {
      case f @ Filter(cond, child) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val extra = conjuncts.flatMap(implied)
          .filterNot(b => conjuncts.exists(_.semanticEquals(b)))
          .distinct
        if (extra.isEmpty) f
        else Filter((conjuncts ++ extra).reduce(And), child)
    }
}
