package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: derive parquet-pushable bounds on the RAW column
  * from range predicates over an integral-division DERIVED column.
  *
  * The archive keeps raw nanosecond `ts` in parquet and exposes the
  * microsecond `t = ts div 1000` (ArchiveSource.scala:135-150); a
  * filter on `t` is opaque to parquet pushdown, so a naive user query
  * reads every row group — at archive scale that is a full-archive
  * scan for a one-day window. [[graft.sources.EventsArchiveAdapter]]'s
  * `tsRangeUs` helpers pair the raw bound MANUALLY; this rule derives
  * it for every query shape automatically, the same t↔ts algebra the
  * adapter documents (`t ∈ [x,y] ⟺ ts ∈ [x·1000, y·1000+999]`).
  *
  * For any conjunct comparing `a div c` (attribute `a: long`, literal
  * `c > 0`, Java truncating division) against a literal, an IMPLIED
  * bound on `a` is appended to the same Filter — never a replacement,
  * so semantics are untouched and the optimizer's pushdown machinery
  * finds an attribute-level predicate it can hand the parquet footer:
  *  - `a div c ≥ x` (x ≥ 1)  ⟹ `a ≥ x·c`
  *  - `a div c ≤ y` (y ≥ 0)  ⟹ `a ≤ (y+1)·c − 1`
  *  - strict and flipped comparisons via the integer shift, equality
  *    via both bounds.
  * The x/y sign guards keep the derivation exact under truncation
  * toward zero (e.g. `a div 1000 ≥ 0` admits a ∈ (−1000, 0), so no
  * lower bound may be derived from x = 0); epoch timestamps sit far
  * in the valid range. Overflowing derivations are skipped, and
  * already-present bounds are not re-added (the rule is a fixpoint
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
