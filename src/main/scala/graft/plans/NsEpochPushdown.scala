package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, LongType, TimestampType}

/** Folds engine-side epoch-ns predicates back onto the underlying parquet
  * timestamp column so they survive into the scan's PushedFilters.
  *
  * The engine's time convention is TIME64NS (int64 ns, SURVEY §1.2), but
  * the storage layout keeps event time as a parquet TIMESTAMP(µs) column;
  * `Tables` bridges the two with a `unix_micros(ts) * 1000` projection.
  * A time-range predicate authored against the ns view therefore reaches
  * the datasource as `unix_micros(ts) * 1000 >= <ns literal>` — an
  * expression the parquet reader cannot push, which at 100 TB means a
  * full-history scan for every bounded time window.
  *
  * ns→µs is a monotonic bijection onto the µs grid, so each comparison
  * against a foldable ns literal rewrites exactly (ceil/floor per
  * direction) into a TimestampType comparison on the raw column, which
  * Spark's FileSourceStrategy then pushes into the reader (row-group and
  * partition pruning both apply). The rewrite is value-equivalent
  * including null semantics, so it is safe anywhere in the plan, not just
  * under Filter.
  */
object NsEpochPushdown extends Rule[LogicalPlan] {

  /** Matches the canonical ns-view shape `unix_micros(c) * 1000` (either
    * operand order) and yields the underlying timestamp-typed child.
    */
  private object NsOf {
    def unapply(e: Expression): Option[Expression] = e match {
      case Multiply(UnixMicros(c), Literal(1000L, LongType), _)
        if c.dataType == TimestampType => Some(c)
      case Multiply(Literal(1000L, LongType), UnixMicros(c), _)
        if c.dataType == TimestampType => Some(c)
      case _ => None
    }
  }

  private def tsLit(us: Long): Literal = Literal(us, TimestampType)
  private def ceilUs(ns: Long): Long = Math.floorDiv(ns + 999L, 1000L)
  private def floorUs(ns: Long): Long = Math.floorDiv(ns, 1000L)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // c_us * 1000 >= L  <=>  c_us >= ceil(L / 1000)
    case GreaterThanOrEqual(NsOf(c), Literal(l: Long, LongType)) =>
      GreaterThanOrEqual(c, tsLit(ceilUs(l)))
    case LessThanOrEqual(Literal(l: Long, LongType), NsOf(c)) =>
      LessThanOrEqual(tsLit(ceilUs(l)), c)
    // c_us * 1000 > L   <=>  c_us > floor(L / 1000)
    case GreaterThan(NsOf(c), Literal(l: Long, LongType)) =>
      GreaterThan(c, tsLit(floorUs(l)))
    case LessThan(Literal(l: Long, LongType), NsOf(c)) =>
      LessThan(tsLit(floorUs(l)), c)
    // c_us * 1000 <= L  <=>  c_us <= floor(L / 1000)
    case LessThanOrEqual(NsOf(c), Literal(l: Long, LongType)) =>
      LessThanOrEqual(c, tsLit(floorUs(l)))
    case GreaterThanOrEqual(Literal(l: Long, LongType), NsOf(c)) =>
      GreaterThanOrEqual(tsLit(floorUs(l)), c)
    // c_us * 1000 < L   <=>  c_us < ceil(L / 1000)
    case LessThan(NsOf(c), Literal(l: Long, LongType)) =>
      LessThan(c, tsLit(ceilUs(l)))
    case GreaterThan(Literal(l: Long, LongType), NsOf(c)) =>
      GreaterThan(tsLit(ceilUs(l)), c)
    // Equality holds only on the µs grid; off-grid literals can never
    // match (null stays null — EqualTo's own null semantics via the
    // IsNull guard).
    case EqualTo(NsOf(c), Literal(l: Long, LongType)) => nsEquals(c, l)
    case EqualTo(Literal(l: Long, LongType), NsOf(c)) => nsEquals(c, l)
    case IsNotNull(NsOf(c)) => IsNotNull(c)
    case IsNull(NsOf(c)) => IsNull(c)
  }

  private def nsEquals(c: Expression, ns: Long): Expression =
    if (Math.floorMod(ns, 1000L) == 0L) EqualTo(c, tsLit(floorUs(ns)))
    else If(IsNull(c), Literal.create(null, BooleanType), Literal.FalseLiteral)
}
