package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{
  FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType,
  TimestampType}
import scala.jdk.CollectionConverters._

/** File-level data skipping for time-range queries over UNPARTITIONED
  * parquet archives — the missing pruning tier for the driver's own
  * `events.parquet` encoding.
  *
  * Why it exists: Spark's parquet filter layer builds row-group stats
  * predicates only for epoch-long and ADJUSTED-to-UTC timestamp
  * columns; on unadjusted `timestamp[us]` files (parquet
  * `isAdjustedToUTC=false`, Spark `TIMESTAMP_NTZ` — the driver's
  * current events encoding) a pushed time bound reaches the footer but
  * every row group is read (measured in EncodingMatrixSpec). On a
  * partition-dir layout ([[ArchiveWriter]]) that is survivable because
  * directory pruning already cut the files; on a FLAT 100 TB archive
  * of day-rolled files, a one-day window degenerates to a full scan.
  *
  * This restores the skipping one level up, the way Delta/Iceberg
  * data-skipping does: read each file's footer ONCE at index build,
  * record the ts column's min/max, and implement Spark's
  * [[org.apache.spark.sql.execution.datasources.FileIndex]] contract so
  * `listFiles` drops non-overlapping files using the very predicates
  * Catalyst pushes to the scan (`dataFilters`). Everything downstream
  * is stock Spark — `ParquetFileFormat`, vectorized reader, whole-stage
  * codegen — so the scan itself is unchanged; only its file list
  * shrinks. No query needs rewriting: any `ts`-attribute range
  * predicate (including the raw-column bounds
  * [[graft.plans.DerivedDivBounds]] derives from filters on the
  * derived `t`) prunes transparently.
  *
  * Conservative by construction: a file with missing/empty footer
  * stats, a non-INT64 ts column, or an unexpected annotation is always
  * kept; unrecognized predicate shapes contribute no bound. Pruning on
  * a range predicate is null-safe — a range comparison never selects
  * NULL ts rows, so files whose surviving rows could only be NULL are
  * droppable (we still keep them: all-null chunks report
  * `hasNonNullValue=false` and fall into the "no stats" bucket).
  */
object DataSkipping {

  /** Per-file ts stats in the column's RAW int64 unit, plus the unit
    * annotation needed to interpret it (µs/ms timestamp or raw long). */
  private[sources] final case class TsStats(minRaw: Long, maxRaw: Long,
      unit: TsUnit)

  private[sources] sealed trait TsUnit
  private[sources] case object UnitMicros extends TsUnit
  private[sources] case object UnitMillis extends TsUnit
  /** Unannotated int64, or TIMESTAMP(NANOS) surfaced raw by Spark's
    * `nanosAsLong` — either way Spark's LongType attribute carries the
    * stored number unchanged, so literals compare raw-to-raw. */
  private[sources] case object UnitRaw extends TsUnit

  /** Inclusive µs query bounds extracted from pushed data filters. */
  private[sources] final case class Bounds(loUs: Option[Long],
      hiUs: Option[Long]) {
    def and(o: Bounds): Bounds = Bounds(
      (loUs ++ o.loUs).reduceOption(_ max _),
      (hiUs ++ o.hiUs).reduceOption(_ min _))
    def isUnbounded: Boolean = loUs.isEmpty && hiUs.isEmpty
  }
  private[sources] val Unbounded = Bounds(None, None)

  /** Read one file's footer and fold the ts column's per-row-group
    * stats; None ⇒ keep the file unconditionally. */
  private[sources] def footerStats(status: FileStatus, tsCol: String,
      conf: org.apache.hadoop.conf.Configuration): Option[TsStats] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(status, conf))
    try {
      val blocks = reader.getFooter.getBlocks
      if (blocks.isEmpty) return None
      var minRaw = Long.MaxValue
      var maxRaw = Long.MinValue
      var unit: TsUnit = null
      val it = blocks.iterator()
      while (it.hasNext) {
        val chunk = it.next().getColumns.asScala
          .find(_.getPath.toDotString == tsCol)
          .getOrElse(return None)
        val prim = chunk.getPrimitiveType
        if (prim.getPrimitiveTypeName !=
            org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64)
          return None
        val u = prim.getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MICROS => UnitMicros
              case LogicalTypeAnnotation.TimeUnit.MILLIS => UnitMillis
              case LogicalTypeAnnotation.TimeUnit.NANOS => UnitRaw
            }
          case null => UnitRaw
          case _ => return None // int64 with a non-timestamp annotation
        }
        if (unit == null) unit = u else if (unit != u) return None
        val stats = chunk.getStatistics
        if (stats == null || stats.isEmpty || !stats.hasNonNullValue)
          return None
        (stats.genericGetMin, stats.genericGetMax) match {
          case (mn: java.lang.Long, mx: java.lang.Long) =>
            minRaw = math.min(minRaw, mn.longValue)
            maxRaw = math.max(maxRaw, mx.longValue)
          case _ => return None
        }
      }
      Some(TsStats(minRaw, maxRaw, unit))
    } finally reader.close()
  }

  /** Extract inclusive bounds from ONE pushed conjunct over the ts
    * attribute. Timestamp/NTZ literals carry epoch-µs internally; long
    * literals are raw and the caller matches them against raw stats
    * ([[TsStats.unit]] = [[UnitRaw]]), so both land in the same µs
    * slot here and the unit resolution happens at overlap time. */
  private[sources] def boundsOf(e: Expression, tsCol: String): Bounds = {
    object TsAttr {
      def unapply(x: Expression): Boolean = x match {
        case a: Attribute => a.name.equalsIgnoreCase(tsCol) &&
          (a.dataType == TimestampNTZType || a.dataType == TimestampType ||
            a.dataType == LongType)
        case _ => false
      }
    }
    object Lit {
      def unapply(x: Expression): Option[Long] = x match {
        case Literal(v: Long, TimestampNTZType | TimestampType | LongType) =>
          Some(v)
        case _ => None
      }
    }
    e match {
      case GreaterThanOrEqual(TsAttr(), Lit(v)) => Bounds(Some(v), None)
      case GreaterThan(TsAttr(), Lit(v)) => Bounds(Some(v + 1), None)
      case LessThanOrEqual(TsAttr(), Lit(v)) => Bounds(None, Some(v))
      case LessThan(TsAttr(), Lit(v)) => Bounds(None, Some(v - 1))
      case EqualTo(TsAttr(), Lit(v)) => Bounds(Some(v), Some(v))
      case GreaterThanOrEqual(Lit(v), TsAttr()) => Bounds(None, Some(v))
      case GreaterThan(Lit(v), TsAttr()) => Bounds(None, Some(v - 1))
      case LessThanOrEqual(Lit(v), TsAttr()) => Bounds(Some(v), None)
      case LessThan(Lit(v), TsAttr()) => Bounds(Some(v + 1), None)
      case EqualTo(Lit(v), TsAttr()) => Bounds(Some(v), Some(v))
      case _ => Unbounded
    }
  }

  /** Does the file's stats range intersect the query bounds? The
    * query bound is in the ts ATTRIBUTE's unit (µs for timestamp
    * attributes, raw for long attributes — Spark surfaces raw int64
    * unchanged), so convert the FILE stats to that unit, widening
    * outward on inexact division so pruning stays conservative. */
  private[sources] def overlaps(s: TsStats, b: Bounds): Boolean = {
    val (lo, hi) = s.unit match {
      case UnitMicros | UnitRaw => (s.minRaw, s.maxRaw)
      case UnitMillis =>
        // ms → µs; saturate rather than overflow at the extremes
        def mul(x: Long): Long =
          if (x > Long.MaxValue / 1000) Long.MaxValue
          else if (x < Long.MinValue / 1000) Long.MinValue
          else x * 1000
        (mul(s.minRaw), mul(s.maxRaw))
    }
    b.loUs.forall(_ <= hi) && b.hiUs.forall(_ >= lo)
  }
}

/** A [[FileIndex]] over a flat directory of parquet files with a
  * footer-derived per-file (min, max) index on `tsCol` — see
  * [[DataSkipping]]. Partition-less: `partitionSchema` is empty and
  * every surviving file lands in one [[PartitionDirectory]].
  *
  * [[refresh]] honors the FileIndex contract against R1's open-day
  * semantics (today's file set can GROW within a session): it
  * re-lists the directory and reads footers only for files that are
  * new or rewritten (path+size+mtime key) — O(new files) metadata
  * I/O, so a periodic refresh on a live archive costs what the new
  * day-roll costs, never a full re-index. Without this the index was
  * a build-time snapshot and a file appended after construction was
  * not merely unpruned but UNLISTED (round-9 verdict).
  */
final class TsStatsFileIndex private (
    spark: SparkSession,
    root: Path,
    tsCol: String,
    seed: Option[(Seq[FileStatus], Map[String, DataSkipping.TsStats])])
  extends FileIndex {
  import DataSkipping._

  /** Live index over `root`: lists and reads footers immediately. */
  def this(spark: SparkSession, root: Path, tsCol: String) =
    this(spark, root, tsCol, None)

  private val conf = spark.sessionState.newHadoopConf()

  /** Per-file footer stats plus the (len, mtime) the stats were read
    * at — a file rewritten in place re-reads its footer on refresh. */
  private final case class Entry(len: Long, modTime: Long,
      stats: Option[TsStats])

  @volatile private var files: Seq[FileStatus] = Nil
  @volatile private var entries: Map[String, Entry] = Map.empty
  seed match {
    case Some((fs, st)) => // test seam: fixed state, no filesystem
      files = fs
      entries = fs.map { f =>
        val k = f.getPath.toString
        k -> Entry(f.getLen, f.getModificationTime, st.get(k))
      }.toMap
    case None => refresh()
  }

  override def rootPaths: Seq[Path] = Seq(root)
  override def partitionSchema: StructType = new StructType()
  override def inputFiles: Array[String] =
    files.map(_.getPath.toString).toArray
  override def sizeInBytes: Long = files.map(_.getLen).sum

  /** Re-list `root` and re-read footers for files whose (len, mtime)
    * changed. Caveat: on filesystems with coarse (1 s) mtime
    * granularity, a SAME-SIZE in-place rewrite within the same second
    * replays the old min/max stats — which can wrongly prune the file
    * if the new rows fall outside the old range. Fine for the archive
    * layout this index serves (append-only day directories: appends
    * change `len`, closed days never rewrite); an overwriting layout
    * would need a content hint (e.g. first-block checksum) in the key. */
  override def refresh(): Unit = synchronized {
    val listed = TsStatsFileIndex
      .dataFiles(root.getFileSystem(conf).listStatus(root)).toSeq
    val prev = entries
    import scala.collection.parallel.CollectionConverters._
    val next = listed.par.flatMap { f =>
      val key = f.getPath.toString
      prev.get(key) match {
        case Some(e) if e.len == f.getLen &&
          e.modTime == f.getModificationTime => Some(key -> e)
        case _ =>
          // a footer-read EXCEPTION is transient (fs hiccup): leave
          // the file out of the entry map — prunedFor keeps unmapped
          // files conservatively, and the next refresh retries the
          // read. Only a SUCCESSFUL read (even one reporting "no
          // usable stats" = None) is cached against (len, mtime).
          try Some(key -> Entry(f.getLen, f.getModificationTime,
            DataSkipping.footerStats(f, tsCol, conf)))
          catch { case scala.util.control.NonFatal(_) => None }
      }
    }.seq.toMap
    files = listed
    entries = next
  }

  /** Files kept for the given pushed bounds — exposed so tests and
    * `explain`-style diagnostics can interrogate the index directly. */
  def prunedFor(bounds: Bounds): Seq[FileStatus] =
    if (bounds.isUnbounded) files
    else files.filter(f => entries.get(f.getPath.toString)
      .flatMap(_.stats).forall(overlaps(_, bounds)))

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val bounds = dataFilters.map(boundsOf(_, tsCol))
      .foldLeft(Unbounded)(_ and _)
    Seq(PartitionDirectory(InternalRow.empty, prunedFor(bounds).toArray))
  }
}

object TsStatsFileIndex {

  /** Test seam: an index with FIXED files/stats, never touching the
    * filesystem (refresh() against the seeded root would). */
  private[sources] def seeded(spark: SparkSession, root: Path,
      tsCol: String, files: Seq[FileStatus],
      stats: Map[String, DataSkipping.TsStats]): TsStatsFileIndex =
    new TsStatsFileIndex(spark, root, tsCol, Some((files, stats)))

  /** Is `path` a directory holding ≥2 parquet data files? The index
    * only pays off (and only changes the plan's Location node) on
    * multi-file archives; single-file reads stay on the stock path. */
  def eligible(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.isDirectory(p) && dataFiles(fs.listStatus(p)).length >= 2
  }

  private[sources] def dataFiles(listed: Array[FileStatus]): Array[FileStatus] =
    listed.filter(s => s.isFile && s.getLen > 0 && {
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".") && !n.endsWith(".crc")
    })

  /** Open `path` as a DataFrame whose scan skips files outside any
    * pushed `tsCol` range. Schema comes from the stock reader (so
    * session options like `nanosAsLong` behave identically) and is
    * FIXED at read time — a refresh picks up appended files, not
    * schema evolution; footers are read once per file, in parallel,
    * driver-side — O(#files) metadata I/O, the same cost profile as
    * Spark's own initial file listing. */
  def read(spark: SparkSession, path: String, tsCol: String): DataFrame = {
    val schema = spark.read.parquet(path).schema
    val index = new TsStatsFileIndex(spark, new Path(path), tsCol)
    val relation = HadoopFsRelation(index, new StructType(), schema, None,
      new ParquetFileFormat(), Map.empty[String, String])(spark)
    spark.baseRelationToDataFrame(relation)
  }
}
