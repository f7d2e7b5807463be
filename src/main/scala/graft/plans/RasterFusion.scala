package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** SURVEY §4's raster-fusion strategy: the `/image` hot path's
  * filter → pixel-project → partial-aggregate chain collapsed into ONE
  * custom physical operator pair, registered through
  * `spark.experimental.extraStrategies` (the same public hook
  * [[DerivedDivBounds]] uses for its optimizer rule).
  *
  * Why a whole-operator plan node (preference (c) in the build rules):
  * the declarative [[graft.operators.Raster.binPoints]] chain is
  * already codegen-friendly, but it materializes a projected row per
  * POINT between the filter/projection stage and the generic hash
  * aggregate. The fused operator exploits what the planner cannot
  * know: the aggregate's key domain is a bounded PIXEL GRID, so a
  * single pass can filter, project t→px / value→py and accumulate
  * (cnt, sum, min, max) into a per-partition hash grid without ever
  * emitting the intermediate row — one operator, zero intermediate
  * materialization, partial state bounded by #keys × width × height
  * cells per task (never by point count).
  *
  * Plan shape: [[RasterBinPlan]] (logical) →
  * [[RasterBinPartialExec]] (narrow: one pass per child partition) →
  * hash exchange on (keys, px, py) inserted automatically by
  * `EnsureRequirements` against [[RasterBinMergeExec]]'s required
  * distribution → merge combines cells and emits
  * `keys…, px, py, cnt, vmean, vmin, vmax`. Every px/py/filter rule
  * replicates [[graft.operators.Raster.binPoints]] EXACTLY —
  * RasterFusionSpec pins value parity on fixtures and asserts the
  * fused operators appear in the executed plan. */
object RasterFusion {

  /** Idempotent strategy registration (mirrors
    * [[DerivedDivBounds.register]]). `extraStrategies` is a plain
    * read-modify-write seq, and the HTTP shim calls this from a request
    * thread pool — serialize the check-and-append or two first requests
    * can double-register (or drop) a strategy. */
  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(RasterStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ RasterStrategy
  }

  /** Fused drop-in for [[graft.operators.Raster.binPoints]]: same
    * arguments, same output schema `(keys…, px, py, cnt, vmean, vmin,
    * vmax)`, same values — different physical plan. */
  def binPoints(points: DataFrame, keys: Seq[String],
      t0Us: Long, t1Us: Long, vmin: Double, vmax: Double,
      width: Int, height: Int, logScale: Boolean = false): DataFrame = {
    require(t1Us > t0Us && width > 0 && height > 0)
    // the exec reads (keys…, t, value_r) POSITIONALLY off the select
    // below; a key literally named "t" or "value_r" would make that
    // select duplicate/shift columns and silently bin the wrong slots
    require(!keys.exists(Set("t", "value_r")),
      s"raster key columns may not be named 't' or 'value_r': $keys")
    val spark = points.sparkSession
    register(spark)
    // explicit casts: the exec reads t/value_r POSITIONALLY as
    // long/double — an int t or float value_r that the declarative
    // operator would coerce via expression analysis must be coerced
    // here too, or the raw slot reads return garbage
    val child = points.select(keys.map(col) :+
      col("t").cast("long").as("t") :+
      col("value_r").cast("double").as("value_r"): _*)
    val plan = RasterBinPlan(
      RasterParams(keys.length, t0Us, t1Us, vmin, vmax, width, height,
        logScale),
      child.queryExecution.analyzed)
    GraftPlanBridge.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
  }

  /** Fused drop-in for [[graft.operators.Raster.binPoints]] ∘
    * [[graft.operators.Raster.hoverColumns]] — the `/image` hover path
    * end-to-end as ONE custom plan: filter + pixel-project + partial
    * grid accumulation ([[RasterBinPartialExec]], unchanged), then a
    * single exchange clustered on (keys, px) into
    * [[RasterHoverMergeExec]], which folds the partial CELLS straight
    * into per-pixel-column reductions. The declarative form pays two
    * exchanges (grid on (keys, px, py), then a second generic aggregate
    * on (keys, px)); this pays one, and its partial state is the same
    * O(keys × pixels) bound. Output `keys…, px, col_min, col_max,
    * col_count` — value-identical to the declarative composition
    * (min/max/sum are associative over partials, so the py level never
    * needs finalizing first; RasterFusionSpec pins parity). */
  def hoverColumns(points: DataFrame, keys: Seq[String],
      t0Us: Long, t1Us: Long, vmin: Double, vmax: Double,
      width: Int, height: Int, logScale: Boolean = false): DataFrame = {
    require(t1Us > t0Us && width > 0 && height > 0)
    require(!keys.exists(Set("t", "value_r")),
      s"raster key columns may not be named 't' or 'value_r': $keys")
    val spark = points.sparkSession
    register(spark)
    val child = points.select(keys.map(col) :+
      col("t").cast("long").as("t") :+
      col("value_r").cast("double").as("value_r"): _*)
    val plan = RasterHoverPlan(
      RasterParams(keys.length, t0Us, t1Us, vmin, vmax, width, height,
        logScale),
      child.queryExecution.analyzed)
    GraftPlanBridge.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
  }
}

/** The scalar grid parameters, serializable into task closures. The
  * scalar functions replicate `Raster.pxCol` / `Raster.pyCol` / the
  * `binPoints` filter bit for bit (same op order, same coercions). */
final case class RasterParams(numKeys: Int, t0: Long, t1: Long,
    vmin: Double, vmax: Double, width: Int, height: Int,
    logScale: Boolean) {

  def px(t: Long): Long = {
    val num = (t - t0) * width.toLong
    val span = t1 - t0
    val m = ((num % span) + span) % span
    math.min(((num - m).toDouble / span.toDouble).toLong, width - 1L)
  }

  def py(v: Double): Long = {
    val (value, lo, hi) =
      if (logScale) (math.log10(v), math.log10(vmin), math.log10(vmax))
      else (v, vmin, vmax)
    math.min(math.floor((value - lo) / (hi - lo) * height),
      (height - 1L).toDouble).toLong
  }

  def keep(t: Long, v: Double): Boolean = {
    val lo = if (logScale) math.max(vmin, java.lang.Double.MIN_VALUE)
             else vmin
    t >= t0 && t <= t1 && !v.isNaN && v >= lo && v <= vmax
  }
}

/** Logical raster-bin node. The child MUST produce `keys…, t, value_r`
  * positionally ([[RasterFusion.binPoints]] guarantees it). The six
  * grid attributes are constructor state so `copy`/`transform` keep
  * their exprIds stable — downstream resolution binds to them. */
final case class RasterBinPlan(params: RasterParams, child: LogicalPlan,
    gridAttrs: Seq[Attribute] = RasterBinPlan.freshGridAttrs())
  extends UnaryNode {

  override def output: Seq[Attribute] =
    child.output.take(params.numKeys) ++ gridAttrs
  // gridAttrs are produced here, not consumed from the child — without
  // this the planner would flag them as missing inputs
  override def producedAttributes: AttributeSet = AttributeSet(gridAttrs)
  // the exec reads the child POSITIONALLY (keys…, t, value_r), so every
  // child column is semantically referenced even though no expression
  // names t/value_r — without this, ColumnPruning inserts a Project
  // under the node and the positional reads land on pruned slots
  override def references: AttributeSet = child.outputSet
  override protected def withNewChildInternal(
      newChild: LogicalPlan): RasterBinPlan = copy(child = newChild)
}

object RasterBinPlan {
  private[plans] def freshGridAttrs(): Seq[Attribute] = Seq(
    AttributeReference("px", LongType, nullable = false)(),
    AttributeReference("py", LongType, nullable = false)(),
    AttributeReference("cnt", LongType, nullable = false)(),
    AttributeReference("vmean", DoubleType, nullable = false)(),
    AttributeReference("vmin", DoubleType, nullable = false)(),
    AttributeReference("vmax", DoubleType, nullable = false)())
}

/** Logical fused-hover node — same child contract as [[RasterBinPlan]]
  * (positional `keys…, t, value_r`), column-reduction output. */
final case class RasterHoverPlan(params: RasterParams, child: LogicalPlan,
    hoverAttrs: Seq[Attribute] = RasterHoverPlan.freshHoverAttrs())
  extends UnaryNode {

  override def output: Seq[Attribute] =
    child.output.take(params.numKeys) ++ hoverAttrs
  override def producedAttributes: AttributeSet = AttributeSet(hoverAttrs)
  override def references: AttributeSet = child.outputSet
  override protected def withNewChildInternal(
      newChild: LogicalPlan): RasterHoverPlan = copy(child = newChild)
}

object RasterHoverPlan {
  private[plans] def freshHoverAttrs(): Seq[Attribute] = Seq(
    AttributeReference("px", LongType, nullable = false)(),
    AttributeReference("col_min", DoubleType, nullable = false)(),
    AttributeReference("col_max", DoubleType, nullable = false)(),
    AttributeReference("col_count", LongType, nullable = false)())
}

/** Plans [[RasterBinPlan]] / [[RasterHoverPlan]] into exec pairs —
  * both share [[RasterBinPartialExec]]; only the merge differs. */
object RasterStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case r: RasterBinPlan =>
      val partial = RasterBinPartialExec(r.params, planLater(r.child))
      RasterBinMergeExec(r.output, r.params.numKeys, partial) :: Nil
    case h: RasterHoverPlan =>
      val partial = RasterBinPartialExec(h.params, planLater(h.child))
      RasterHoverMergeExec(h.output, h.params.numKeys, partial) :: Nil
    case _ => Nil
  }
}

/** One pixel cell's running (cnt, sum, min, max). `sum` accumulates
  * e6-QUANTIZED integer units (`round(v·10⁶)` half-away-from-zero,
  * the dot_e8 rounding contract): a raw double accumulator is
  * order-dependent across partition merges, and the round-12 sf1
  * oracle audit caught exactly that — q07/q36 `vmean` drifting 1 ulp
  * from DuckDB once cells held enough points (the old "cell
  * populations are tiny so the double sum stays exact" assumption).
  * Integer sums are merge-order-free, so vmean is bit-identical at
  * any scale; overflow needs Σ|v| > 9.2×10¹² in ONE pixel cell. */
private[plans] final class CellAgg(var cnt: Long, var sum: Long,
    var mn: Double, var mx: Double) {
  def add(v: Double): Unit = {
    cnt += 1; sum += CellAgg.e6(v)
    if (v < mn) mn = v
    if (v > mx) mx = v
  }
  def merge(o: CellAgg): Unit = {
    cnt += o.cnt; sum += o.sum
    if (o.mn < mn) mn = o.mn
    if (o.mx > mx) mx = o.mx
  }
}

private[plans] object CellAgg {
  /** `round(v·10⁶)` half-away-from-zero — see [[graft.functions.DotE8
    * .roundE4]] for the shared tie contract with SQL `round()`.
    *
    * PRECONDITION: `v` is finite. Every caller sits behind
    * [[RasterParams.keep]] (NaN and the finite axis bounds exclude
    * ±Inf), and the check below makes that contract LOUD: Math.round
    * would otherwise map NaN→0 and ±Inf→±MaxValue, handing a future
    * unfiltered caller a plausible-looking finite vmean where the old
    * double sum at least surfaced NaN/Inf. */
  def e6(v: Double): Long = {
    if (v.isNaN || v.isInfinite)
      throw new IllegalArgumentException(
        s"CellAgg.e6: non-finite value $v — callers must pre-filter " +
          "via RasterParams.keep")
    val x = v * 1e6
    if (x >= 0) Math.round(x) else -Math.round(-x)
  }
}

/** Shared partial-cell fold for the two merge execs: groups incoming
  * partial rows (`keys…, px, py, cnt, sum, mn, mx`) by their first
  * `groupWidth` columns — k+2 for the grid merge, k+1 for the hover
  * merge (py ignored) — and merges the trailing [[CellAgg]] slots,
  * whose positions are fixed by [[RasterBinPartialExec]]'s layout.
  * One fold implementation means the UnsafeRow key-copy discipline
  * can never diverge between the merges. */
private[plans] object CellFold {
  def fold(rows: Iterator[InternalRow], childTypes: Array[DataType],
      numKeys: Int,
      groupWidth: Int): java.util.HashMap[InternalRow, CellAgg] = {
    // map key: UnsafeRow over the group prefix — value-based equality
    // and hashing; copied once on first sight (the projection reuses
    // its buffer). The scratch row WRAPS the array (no per-row alloc).
    val keyProj = UnsafeProjection.create(childTypes.take(groupWidth))
    val grid = new java.util.HashMap[InternalRow, CellAgg]()
    val keyVals = new Array[Any](groupWidth)
    val keyRow =
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        keyVals)
    rows.foreach { row =>
      var i = 0
      while (i < groupWidth) { keyVals(i) = row.get(i, childTypes(i)); i += 1 }
      val uKey = keyProj(keyRow)
      val incoming = new CellAgg(row.getLong(numKeys + 2),
        row.getLong(numKeys + 3), row.getDouble(numKeys + 4),
        row.getDouble(numKeys + 5))
      val agg = grid.get(uKey)
      if (agg == null) grid.put(uKey.copy(), incoming)
      else agg.merge(incoming)
    }
    grid
  }
}

/** One pass over each child partition: filter + pixel projection +
  * grid accumulation, emitting one partial row per non-empty cell —
  * `keys…, px, py, cnt, sum, mn, mx`. */
final case class RasterBinPartialExec(params: RasterParams,
    child: SparkPlan,
    aggAttrs: Seq[Attribute] = RasterBinPartialExec.freshAggAttrs())
  extends UnaryExecNode {

  // aggAttrs are constructor state, NOT derived per call: the merge
  // parent's distribution and the inserted exchange reference them by
  // exprId, and plan copies (codegen wrapping, AQE stage re-planning)
  // must preserve them
  override def output: Seq[Attribute] =
    child.output.take(params.numKeys) ++ aggAttrs

  override protected def doExecute(): RDD[InternalRow] = {
    val p = params
    val k = p.numKeys
    val keyTypes: Array[DataType] =
      child.output.take(k).map(_.dataType).toArray
    val outTypes: Array[DataType] = output.map(_.dataType).toArray
    child.execute().mapPartitions({ rows =>
      // map key: UnsafeRow over (keys…, px, py) — value-based equality
      // and hashing; copied once on first sight (the projection reuses
      // its buffer)
      val keyProj = UnsafeProjection.create(
        keyTypes ++ Array[DataType](LongType, LongType))
      val grid = new java.util.HashMap[InternalRow, CellAgg]()
      // one reusable scratch row for the whole partition: the generic
      // row WRAPS the array (no copy), and keyProj serializes it into
      // the projection's own buffer — per-row allocation would defeat
      // the zero-materialization point of the fused operator
      val keyVals = new Array[Any](k + 2)
      val keyRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          keyVals)
      rows.foreach { row =>
        if (!row.isNullAt(k) && !row.isNullAt(k + 1)) {
          val t = row.getLong(k)
          val v = row.getDouble(k + 1)
          if (p.keep(t, v)) {
            var i = 0
            while (i < k) { keyVals(i) = row.get(i, keyTypes(i)); i += 1 }
            keyVals(k) = p.px(t)
            keyVals(k + 1) = p.py(v)
            val uKey = keyProj(keyRow)
            val agg = grid.get(uKey)
            if (agg == null)
              grid.put(uKey.copy(), new CellAgg(1L, CellAgg.e6(v), v, v))
            else agg.add(v)
          }
        }
      }
      val outProj = UnsafeProjection.create(outTypes)
      val it = grid.entrySet().iterator()
      new Iterator[InternalRow] {
        override def hasNext: Boolean = it.hasNext
        override def next(): InternalRow = {
          val e = it.next()
          val key = e.getKey; val a = e.getValue
          val vals = new Array[Any](k + 6)
          var i = 0
          while (i < k) { vals(i) = key.get(i, keyTypes(i)); i += 1 }
          vals(k) = key.getLong(k)
          vals(k + 1) = key.getLong(k + 1)
          vals(k + 2) = a.cnt; vals(k + 3) = a.sum
          vals(k + 4) = a.mn; vals(k + 5) = a.mx
          outProj(InternalRow.fromSeq(vals.toIndexedSeq))
        }
      }
    }, preservesPartitioning = false)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): RasterBinPartialExec = copy(child = newChild)
}

object RasterBinPartialExec {
  private[plans] def freshAggAttrs(): Seq[Attribute] = Seq(
    AttributeReference("px", LongType, nullable = false)(),
    AttributeReference("py", LongType, nullable = false)(),
    AttributeReference("cnt", LongType, nullable = false)(),
    AttributeReference("sum", LongType, nullable = false)(), // e6 units
    AttributeReference("mn", DoubleType, nullable = false)(),
    AttributeReference("mx", DoubleType, nullable = false)())
}

/** Final merge: requires clustering on (keys, px, py) — the planner
  * inserts the hash exchange — then combines partial cells and emits
  * `keys…, px, py, cnt, vmean, vmin, vmax`. */
final case class RasterBinMergeExec(output: Seq[Attribute], numKeys: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(child.output.take(numKeys + 2)))

  override protected def doExecute(): RDD[InternalRow] = {
    val k = numKeys
    val childTypes: Array[DataType] = child.output.map(_.dataType).toArray
    val outTypes: Array[DataType] = output.map(_.dataType).toArray
    child.execute().mapPartitions({ rows =>
      val grid = CellFold.fold(rows, childTypes, k, groupWidth = k + 2)
      val outProj = UnsafeProjection.create(outTypes)
      val it = grid.entrySet().iterator()
      new Iterator[InternalRow] {
        override def hasNext: Boolean = it.hasNext
        override def next(): InternalRow = {
          val e = it.next()
          val key = e.getKey; val a = e.getValue
          val vals = new Array[Any](k + 6)
          var i = 0
          while (i < k) { vals(i) = key.get(i, childTypes(i)); i += 1 }
          vals(k) = key.getLong(k)
          vals(k + 1) = key.getLong(k + 1)
          vals(k + 2) = a.cnt
          // exact e6 integer sum, ONE de-quantizing multiply (cnt·10⁶
          // is exact in double up to cnt ≈ 9×10⁹), ONE IEEE division —
          // bit-identical to the oracle's formulation at any scale
          vals(k + 3) = a.sum.toDouble / (a.cnt.toDouble * 1e6)
          vals(k + 4) = a.mn; vals(k + 5) = a.mx
          outProj(InternalRow.fromSeq(vals.toIndexedSeq))
        }
      }
    }, preservesPartitioning = false)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): RasterBinMergeExec = copy(child = newChild)
}

/** Hover merge: requires clustering on (keys, px) only — coarser than
  * the grid merge — and folds partial CELL rows (`keys…, px, py, cnt,
  * sum, mn, mx`) directly into per-pixel-column reductions, emitting
  * `keys…, px, col_min, col_max, col_count`. The py slot is simply
  * ignored: min-of-mins / max-of-maxes / sum-of-counts over partials
  * equal the reductions over finalized cells (associativity), so the
  * grid never materializes. State is bounded by keys × width per task. */
final case class RasterHoverMergeExec(output: Seq[Attribute], numKeys: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(child.output.take(numKeys + 1)))

  override protected def doExecute(): RDD[InternalRow] = {
    val k = numKeys
    val childTypes: Array[DataType] = child.output.map(_.dataType).toArray
    val outTypes: Array[DataType] = output.map(_.dataType).toArray
    child.execute().mapPartitions({ rows =>
      // groupWidth k+1: group on (keys…, px) — the py slot is ignored,
      // the per-cell sums fold straight into column reductions
      val cols = CellFold.fold(rows, childTypes, k, groupWidth = k + 1)
      val outProj = UnsafeProjection.create(outTypes)
      val it = cols.entrySet().iterator()
      new Iterator[InternalRow] {
        override def hasNext: Boolean = it.hasNext
        override def next(): InternalRow = {
          val e = it.next()
          val key = e.getKey; val a = e.getValue
          val vals = new Array[Any](k + 4)
          var i = 0
          while (i < k) { vals(i) = key.get(i, childTypes(i)); i += 1 }
          vals(k) = key.getLong(k)
          vals(k + 1) = a.mn; vals(k + 2) = a.mx; vals(k + 3) = a.cnt
          outProj(InternalRow.fromSeq(vals.toIndexedSeq))
        }
      }
    }, preservesPartitioning = false)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): RasterHoverMergeExec = copy(child = newChild)
}
