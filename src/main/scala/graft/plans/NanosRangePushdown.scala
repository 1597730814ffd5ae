package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/**
 * Optimizer rule: time-range predicates over nanos-as-long timestamp
 * columns become parquet-pushable.
 *
 * Parquet TIMESTAMP(NANOS) columns are read as raw BIGINT (nanosAsLong)
 * and converted with `timestamp_micros(col div 1000)`; a range predicate
 * on the converted value is a post-scan DataFilter — the expression wraps
 * the attribute, so nothing reaches the parquet reader and no row group
 * is skipped. This rule adds the IMPLIED bound on the raw column as a
 * redundant conjunct, which the scan can push:
 *
 *   timestamp_micros(x div 1000) >= T  ==>  ... AND x >= T_micros * 1000
 *   timestamp_micros(x div 1000) <  T  ==>  ... AND x <  T_micros * 1000
 *
 * The original predicate is kept, so results are bit-identical; the new
 * conjunct only enables row-group skipping. Implications hold for
 * positive timestamp literals (T >= 1 microsecond; integral division
 * truncates toward zero, so pre-epoch literals are left alone) and
 * literals small enough that the nanos value cannot overflow a long.
 * Registered by [[GraftExtensions]]; idempotent under the fixed-point
 * optimizer batch (existing conjuncts are checked canonically).
 */
object NanosRangePushdown extends Rule[LogicalPlan] with PredicateHelper {

  private val MaxMicros = Long.MaxValue / 1000

  /** The raw long attribute under `timestamp_micros(attr div 1000)`. */
  private def nanosAttr(e: Expression): Option[Attribute] = e match {
    case MicrosToTimestamp(IntegralDivide(a: Attribute, d, _))
        if a.dataType == LongType && d.foldable &&
           d.eval() != null && d.eval().toString == "1000" => Some(a)
    case _ => None
  }

  private def impliedBound(cmp: Expression): Option[Expression] = cmp match {
    case GreaterThanOrEqual(m, Literal(t: Long, TimestampType))
        if t >= 1 && t < MaxMicros =>
      nanosAttr(m).map(a => GreaterThanOrEqual(a, Literal(t * 1000L, LongType)))
    case GreaterThan(m, Literal(t: Long, TimestampType))
        if t >= 0 && t < MaxMicros =>
      nanosAttr(m).map(a => GreaterThan(a, Literal(t * 1000L, LongType)))
    case LessThan(m, Literal(t: Long, TimestampType))
        if t >= 1 && t < MaxMicros =>
      nanosAttr(m).map(a => LessThan(a, Literal(t * 1000L, LongType)))
    case LessThanOrEqual(m, Literal(t: Long, TimestampType))
        if t >= 0 && t < MaxMicros - 1 =>
      nanosAttr(m).map(a => LessThan(a, Literal((t + 1) * 1000L, LongType)))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = splitConjunctivePredicates(cond).map(_.canonicalized).toSet
      val extras = splitConjunctivePredicates(cond)
        .flatMap(impliedBound)
        .filterNot(e => existing.contains(e.canonicalized))
      if (extras.isEmpty) f
      else Filter(extras.foldLeft(cond)(And(_, _)), child)
  }
}
