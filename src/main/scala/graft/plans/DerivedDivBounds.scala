package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.functions.MicrosOf

/** Optimizer rule: derive parquet-pushable bounds on the RAW column
  * from range predicates over a DERIVED epoch-µs column.
  *
  * The archive exposes a microsecond `t` derived from the stored `ts`
  * (ArchiveSource.scala — `ts div 1000` over legacy epoch-nano longs,
  * `micros_of(ts)` over timestamp/timestamp_ntz data); a filter on `t`
  * is opaque to parquet pushdown, so a naive user query reads every
  * row group — at archive scale that is a full-archive scan for a
  * one-day window. This rule derives the raw bound for every query
  * shape automatically; the adapter's `tsRangeUs` helpers rely on it
  * too (they carry no manual raw bound).
  *
  * Two derivation families, both appended to the same Filter — never a
  * replacement, so semantics are untouched and the optimizer's
  * pushdown machinery finds an attribute-level predicate it can hand
  * the parquet footer:
  *
  * 1. `a div c` (attribute `a: long`, literal `c > 0`, Java truncating
  *    division) compared against a literal:
  *     - `a div c ≥ x` (x ≥ 1)  ⟹ `a ≥ x·c`
  *     - `a div c ≤ y` (y ≥ 0)  ⟹ `a ≤ (y+1)·c − 1`
  *     - strict and flipped comparisons via the integer shift,
  *       equality via both bounds.
  *    The x/y sign guards keep the derivation exact under truncation
  *    toward zero (e.g. `a div 1000 ≥ 0` admits a ∈ (−1000, 0), so no
  *    lower bound may be derived from x = 0); epoch timestamps sit far
  *    in the valid range. Overflowing derivations are skipped.
  *
  * 2. `micros_of(a)` ([[graft.functions.MicrosOf]] — a REINTERPRET of
  *    the internal µs long of a timestamp/timestamp_ntz attribute,
  *    hence a bijection) compared against a long literal: every
  *    comparison maps 1:1 to `a cmp Literal(x, a.dataType)` — exact
  *    for all five operators, no shifts, no timezone arithmetic
  *    (timestamp literals ARE internal µs longs).
  *
  * Already-present bounds are not re-added (the rule is a fixpoint
  * no-op, required for optimizer batches).
  */
object DerivedDivBounds extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val derived = conjuncts.flatMap(derive)
        .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
        .foldLeft(Seq.empty[Expression])((acc, d) =>
          if (acc.exists(_.semanticEquals(d))) acc else acc :+ d)
      if (derived.isEmpty) f
      else Filter((conjuncts ++ derived).reduce(And), child)
  }

  /** Matches `attr div positiveLiteral` over a long attribute. */
  private object DivAttr {
    def unapply(e: Expression): Option[(Attribute, Long)] = e match {
      case d: IntegralDivide => (d.left, longLit(d.right)) match {
        case (a: Attribute, Some(c)) if a.dataType == LongType && c > 0 =>
          Some((a, c))
        case _ => None
      }
      case _ => None
    }
  }

  /** Matches `micros_of(attr)` over a timestamp-typed attribute — a
    * bijection with the stored value, so bounds transfer exactly. */
  private object MicrosAttr {
    def unapply(e: Expression): Option[Attribute] = e match {
      case MicrosOf(a: Attribute)
          if graft.functions.TimeFns.isTimestampLike(a.dataType) => Some(a)
      case _ => None
    }
  }

  /** A timestamp literal carrying epoch-µs x in the attribute's own
    * type (both timestamp types store µs longs internally). */
  private def tsLit(a: Attribute, x: Long): Literal = Literal(x, a.dataType)

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case _ => None
  }

  private def derive(p: Expression): Seq[Expression] = p match {
    case GreaterThanOrEqual(DivAttr(a, c), Lit(x)) => lower(a, c, x)
    case GreaterThan(DivAttr(a, c), Lit(x)) => shifted(x, 1).toSeq.flatMap(lower(a, c, _))
    case LessThanOrEqual(DivAttr(a, c), Lit(y)) => upper(a, c, y)
    case LessThan(DivAttr(a, c), Lit(y)) => shifted(y, -1).toSeq.flatMap(upper(a, c, _))
    case EqualTo(DivAttr(a, c), Lit(x)) => lower(a, c, x) ++ upper(a, c, x)
    // literal-first spellings
    case GreaterThanOrEqual(Lit(y), DivAttr(a, c)) => upper(a, c, y)
    case GreaterThan(Lit(y), DivAttr(a, c)) => shifted(y, -1).toSeq.flatMap(upper(a, c, _))
    case LessThanOrEqual(Lit(x), DivAttr(a, c)) => lower(a, c, x)
    case LessThan(Lit(x), DivAttr(a, c)) => shifted(x, 1).toSeq.flatMap(lower(a, c, _))
    case EqualTo(Lit(x), DivAttr(a, c)) => lower(a, c, x) ++ upper(a, c, x)
    // micros_of: 1:1 transfer — same comparison, timestamp literal
    case GreaterThanOrEqual(MicrosAttr(a), Lit(x)) => Seq(GreaterThanOrEqual(a, tsLit(a, x)))
    case GreaterThan(MicrosAttr(a), Lit(x)) => Seq(GreaterThan(a, tsLit(a, x)))
    case LessThanOrEqual(MicrosAttr(a), Lit(y)) => Seq(LessThanOrEqual(a, tsLit(a, y)))
    case LessThan(MicrosAttr(a), Lit(y)) => Seq(LessThan(a, tsLit(a, y)))
    case EqualTo(MicrosAttr(a), Lit(x)) => Seq(EqualTo(a, tsLit(a, x)))
    case GreaterThanOrEqual(Lit(y), MicrosAttr(a)) => Seq(LessThanOrEqual(a, tsLit(a, y)))
    case GreaterThan(Lit(y), MicrosAttr(a)) => Seq(LessThan(a, tsLit(a, y)))
    case LessThanOrEqual(Lit(x), MicrosAttr(a)) => Seq(GreaterThanOrEqual(a, tsLit(a, x)))
    case LessThan(Lit(x), MicrosAttr(a)) => Seq(GreaterThan(a, tsLit(a, x)))
    case EqualTo(Lit(x), MicrosAttr(a)) => Seq(EqualTo(a, tsLit(a, x)))
    case _ => Nil
  }

  private object Lit {
    def unapply(e: Expression): Option[Long] = longLit(e)
  }

  private def shifted(v: Long, by: Long): Option[Long] =
    try Some(Math.addExact(v, by)) catch { case _: ArithmeticException => None }

  /** `a div c ≥ x` (x ≥ 1) ⟹ `a ≥ x·c` — equality in fact: x ≥ 1
    * forces a > 0, where truncation equals floor. */
  private def lower(a: Attribute, c: Long, x: Long): Seq[Expression] =
    if (x < 1) Nil
    else try Seq(GreaterThanOrEqual(a, Literal(Math.multiplyExact(x, c))))
    catch { case _: ArithmeticException => Nil }

  /** `a div c ≤ y` (y ≥ 0) ⟹ `a ≤ (y+1)·c − 1`: for a ≥ 0 by floor
    * algebra; any negative a trivially satisfies the bound. */
  private def upper(a: Attribute, c: Long, y: Long): Seq[Expression] =
    if (y < 0) Nil
    else try Seq(LessThanOrEqual(a, Literal(Math.subtractExact(
      Math.multiplyExact(Math.addExact(y, 1L), c), 1L))))
    catch { case _: ArithmeticException => Nil }

  /** Runtime installation for sessions not built with
    * `spark.sql.extensions=graft.functions.GraftExtensions`:
    * experimental optimizations run as their own optimizer batch, and
    * the transformed Filter still sits directly above the relation, so
    * physical planning's pushdown sees the derived bounds. Idempotent —
    * and synchronized: `extraOptimizations` is a plain
    * read-modify-write seq and adapters register from arbitrary
    * threads (same race [[RasterFusion.register]] guards against). */
  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }
}
