package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference,
  EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In,
  IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Not, Or, StartsWith}
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex,
  PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One directory's recorded statistics for one column — the parsed form
  * of a [[SnapshotLake.manifestStats]] line. */
private[graft] sealed trait ColStats {
  def rows: Long
  def nulls: Long
  final def allNull: Boolean = nulls == rows
}

/** Numeric/date/timestamp column stats; `min`/`max` are None for an
  * all-null column (exact decimal domain, manifest v3 r17). */
private[graft] case class DirColStats(rows: Long, nulls: Long,
                                      min: Option[BigDecimal],
                                      max: Option[BigDecimal])
    extends ColStats

/** String column stats (manifest v4, r18): Iceberg-style truncate(16)
  * bounds in UTF8 BINARY order — `min` is a ≤16-code-point PREFIX of the
  * true minimum (a prefix never sorts above the original), `max` is the
  * true maximum when ≤16 code points, else its 16-code-point prefix with
  * the last code point incremented (strictly above everything sharing
  * the prefix). Either side may be independently absent: an
  * all-code-point-max prefix has no finite increment, so `max` drops
  * while `min` still prunes. Comparisons run on [[UTF8String]] — its
  * compareTo IS unsigned-byte order, the order parquet records string
  * stats in (Java String order differs above U+FFFF and would not be
  * conservative). */
private[graft] case class DirStrStats(rows: Long, nulls: Long,
                                      min: Option[UTF8String],
                                      max: Option[UTF8String])
    extends ColStats

/** Truncate(16) bound construction for string stats (r18). */
private[graft] object StrBounds {
  val TruncateTo = 16 // code points, the Iceberg default

  /** Valid lower bound: the ≤16-code-point prefix. */
  def lower(min: UTF8String): UTF8String =
    if (min.numChars <= TruncateTo) min else min.substring(0, TruncateTo)

  /** Valid upper bound: exact when short; else the truncated prefix with
    * its last code point incremented (skipping the surrogate gap — those
    * code points never occur in valid strings but U+D7FF+1 would land
    * there). None when every prefix code point is already U+10FFFF. */
  def upper(max: UTF8String): Option[UTF8String] = {
    if (max.numChars <= TruncateTo) return Some(max)
    val cps = max.substring(0, TruncateTo).toString.codePoints().toArray
    var i = cps.length - 1
    while (i >= 0) {
      if (cps(i) < 0x10FFFF) {
        val next = if (cps(i) == 0xD7FF) 0xE000 else cps(i) + 1
        val kept = cps.take(i) :+ next
        return Some(UTF8String.fromString(
          new String(kept, 0, kept.length)))
      }
      i -= 1
    }
    None
  }
}

/** Planning-time directory pruning from manifest-recorded column stats
  * (r17 numeric, r18 strings — the Iceberg manifest-stats idea): a pushed
  * predicate that no row of a directory can satisfy removes the whole
  * directory from the file listing BEFORE any parquet footer is opened.
  * Z-order layout ([[SnapshotLake.compactZOrder]]) already guarantees
  * tight per-dir envelopes; this surfaces them to the planner.
  *
  * Strictly conservative: only bare `attr op literal` comparisons over
  * columns with recorded stats can disqualify; everything else keeps the
  * directory. And/Or compose (Or prunes only when BOTH branches prune);
  * a `Not` never prunes (its child's stats bound the wrong side). */
private[graft] object StatsPrune {

  /** Parse `#stats` manifest lines → dir → col → stats. Two line arities
    * coexist: 7 fields = numeric (exact decimal min/max, r17), 8 fields
    * with a `str` kind tag = string (base64 UTF-8 truncate(16) bounds,
    * r18 — base64 keeps arbitrary user bytes tab/newline-safe in the
    * line protocol). Sentinel `-` and malformed lines drop out; an r17
    * reader sees 8 fields, fails its arity check, and simply does not
    * prune on strings — forward-compatible by construction. */
  def parse(lines: Seq[String]): Map[String, Map[String, ColStats]] =
    lines.flatMap { l =>
      val p = l.split("\t", -1)
      if (p.length == 7 && p(2) != "-")
        scala.util.Try((p(1), p(2),
          DirColStats(p(3).toLong, p(4).toLong,
            if (p(5).isEmpty) None else Some(BigDecimal(p(5))),
            if (p(6).isEmpty) None else Some(BigDecimal(p(6))))
            : ColStats)).toOption
      else if (p.length == 8 && p(3) == "str")
        scala.util.Try((p(1), p(2),
          DirStrStats(p(4).toLong, p(5).toLong,
            if (p(6).isEmpty) None else Some(UTF8String.fromBytes(
              java.util.Base64.getDecoder.decode(p(6)))),
            if (p(7).isEmpty) None else Some(UTF8String.fromBytes(
              java.util.Base64.getDecoder.decode(p(7)))))
            : ColStats)).toOption
      else None
    }.groupBy(_._1)
      .map { case (d, xs) => d -> xs.map(x => x._2 -> x._3).toMap }

  /** A comparable exact value for a predicate literal, in the same
    * domain the stats were recorded in (dates as epoch days, timestamps
    * as epoch micros). None = this literal cannot drive pruning. */
  private def litBD(value: Any, dt: DataType): Option[BigDecimal] =
    (value, dt) match {
      case (null, _) => None
      case (v: Byte, _) => Some(BigDecimal(v.toInt))
      case (v: Short, _) => Some(BigDecimal(v.toInt))
      case (v: Int, _) => Some(BigDecimal(v))
      case (v: Long, _) => Some(BigDecimal(v))
      case (v: Float, _) =>
        if (v.isNaN || v.isInfinite) None else Some(BigDecimal(v.toDouble))
      case (v: Double, _) =>
        if (v.isNaN || v.isInfinite) None else Some(BigDecimal(v))
      // decimal literals compare exactly in the recorded decimal domain
      // (r19 — money-column range predicates now drive dir pruning)
      case (v: Decimal, _) => Some(v.toBigDecimal)
      case (v: java.math.BigDecimal, _) => Some(BigDecimal(v))
      case _ => None
    }

  /** True iff NO row with the given stats can satisfy `attr op lit`.
    * Each comparison needs only the bound it tests against, so a string
    * column with a dropped upper bound still prunes `<`/`<=`/half of
    * `=`. */
  private def cmpPrunes(op: String, st: ColStats, v: Any,
                        dt: DataType): Boolean =
    if (st.allNull) true // comparisons are never true on NULL
    else (st, v, dt) match {
      case (cs: DirColStats, _, _) =>
        litBD(v, dt).exists { lit =>
          op match {
            case "="  => cs.min.exists(lit < _) || cs.max.exists(lit > _)
            case ">"  => cs.max.exists(_ <= lit)
            case ">=" => cs.max.exists(_ < lit)
            case "<"  => cs.min.exists(_ >= lit)
            case "<=" => cs.min.exists(_ > lit)
            case _ => false
          }
        }
      case (ss: DirStrStats, u: UTF8String, StringType) => op match {
        case "="  => ss.min.exists(u.compareTo(_) < 0) ||
                     ss.max.exists(u.compareTo(_) > 0)
        case ">"  => ss.max.exists(_.compareTo(u) <= 0)
        case ">=" => ss.max.exists(_.compareTo(u) < 0)
        case "<"  => ss.min.exists(_.compareTo(u) >= 0)
        case "<=" => ss.min.exists(_.compareTo(u) > 0)
        case _ => false
      }
      case _ => false
    }

  /** True iff `e` proves the directory has no matching row. */
  def disqualifies(e: Expression,
                   st: Map[String, ColStats]): Boolean = e match {
    case And(l, r) => disqualifies(l, st) || disqualifies(r, st)
    case Or(l, r) => disqualifies(l, st) && disqualifies(r, st)
    case _: Not => false
    case IsNull(a: AttributeReference) =>
      st.get(a.name).exists(_.nulls == 0L)
    case IsNotNull(a: AttributeReference) =>
      st.get(a.name).exists(_.allNull)
    case EqualTo(a: AttributeReference, Literal(v, dt)) =>
      prune("=", a, v, dt, st)
    case EqualTo(Literal(v, dt), a: AttributeReference) =>
      prune("=", a, v, dt, st)
    case EqualNullSafe(a: AttributeReference, l @ Literal(v, dt)) =>
      if (v == null) st.get(a.name).exists(_.nulls == 0L)
      else prune("=", a, v, dt, st)
    case EqualNullSafe(l @ Literal(v, dt), a: AttributeReference) =>
      if (v == null) st.get(a.name).exists(_.nulls == 0L)
      else prune("=", a, v, dt, st)
    case GreaterThan(a: AttributeReference, Literal(v, dt)) =>
      prune(">", a, v, dt, st)
    case GreaterThan(Literal(v, dt), a: AttributeReference) =>
      prune("<", a, v, dt, st)
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
      prune(">=", a, v, dt, st)
    case GreaterThanOrEqual(Literal(v, dt), a: AttributeReference) =>
      prune("<=", a, v, dt, st)
    case LessThan(a: AttributeReference, Literal(v, dt)) =>
      prune("<", a, v, dt, st)
    case LessThan(Literal(v, dt), a: AttributeReference) =>
      prune(">", a, v, dt, st)
    case LessThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
      prune("<=", a, v, dt, st)
    case LessThanOrEqual(Literal(v, dt), a: AttributeReference) =>
      prune(">=", a, v, dt, st)
    // p-prefixed strings occupy exactly [p, pIncr) in byte order (pIncr
    // = p with its last code point incremented), so a StartsWith prunes
    // when the dir's [min, max] envelope misses that interval: max < p,
    // or min ≥ pIncr. The commonest string filter on id-prefixed tables
    // (r18).
    case StartsWith(a: AttributeReference, Literal(p: UTF8String,
        StringType)) =>
      st.get(a.name).exists {
        case ss: DirStrStats =>
          ss.allNull ||
            ss.max.exists(_.compareTo(p) < 0) ||
            incLast(p).exists(pi => ss.min.exists(_.compareTo(pi) >= 0))
        case _ => false
      }
    case In(a: AttributeReference, list) if list.nonEmpty &&
        list.forall(_.isInstanceOf[Literal]) =>
      st.get(a.name).exists { cs =>
        list.forall {
          case Literal(v, dt) => cmpPrunes("=", cs, v, dt)
          case _ => false
        }
      }
    case _ => false
  }

  /** `p` with its last code point incremented — the least string above
    * EVERY p-prefixed string; None if the last code point is U+10FFFF
    * (then nothing above the prefix family is expressible this way). */
  private def incLast(p: UTF8String): Option[UTF8String] = {
    val cps = p.toString.codePoints().toArray
    if (cps.isEmpty || cps(cps.length - 1) >= 0x10FFFF) None
    else {
      val last = cps(cps.length - 1)
      cps(cps.length - 1) = if (last == 0xD7FF) 0xE000 else last + 1
      Some(UTF8String.fromString(new String(cps, 0, cps.length)))
    }
  }

  private def prune(op: String, a: AttributeReference, v: Any,
                    dt: DataType, st: Map[String, ColStats]): Boolean =
    st.get(a.name).exists(cs => cmpPrunes(op, cs, v, dt))
}

/** An [[InMemoryFileIndex]] rooted at exactly the manifest's directories
  * that additionally answers `listFiles` THROUGH the manifest stats:
  * directories the pushed data filters disqualify contribute no files to
  * the scan — planning-time pruning with zero footer reads. Serves both
  * graftlake read paths (the V1 relation and the V2 catalog scan). */
private[graft] class StatsPrunedFileIndex(
    spark: SparkSession, dirs: Seq[String],
    schema: StructType,
    stats: Map[String, Map[String, ColStats]])
    extends InMemoryFileIndex(spark, dirs.map(new Path(_)),
      Map.empty[String, String], Some(schema)) {

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression])
      : Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    if (dataFilters.isEmpty || stats.isEmpty) base
    else {
      val dropped = dirs.filter(d => stats.get(d).exists(st =>
        dataFilters.exists(f => StatsPrune.disqualifies(f, st))))
      if (dropped.isEmpty) base
      else {
        val prefixes = dropped.map(_.stripSuffix("/") + "/")
        base.map(pd => pd.copy(files = pd.files.filterNot(f =>
            prefixes.exists(f.getPath.toUri.getPath.startsWith))))
          .filter(_.files.nonEmpty)
      }
    }
  }
}
