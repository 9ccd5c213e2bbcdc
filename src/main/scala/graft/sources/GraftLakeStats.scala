package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference,
  EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In,
  IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Not, Or}
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex,
  PartitionDirectory}
import org.apache.spark.sql.types._

/** One directory's recorded statistics for one column — the parsed form
  * of a [[SnapshotLake.manifestStats]] line. `min`/`max` are None for an
  * all-null column. */
private[graft] case class DirColStats(rows: Long, nulls: Long,
                                      min: Option[BigDecimal],
                                      max: Option[BigDecimal]) {
  def allNull: Boolean = nulls == rows
}

/** Planning-time directory pruning from manifest-recorded column stats
  * (r17, VERDICT r16 item 2 — the Iceberg manifest-stats idea): a pushed
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

  /** Parse `#stats` manifest lines → dir → col → stats (sentinel `-`
    * lines and malformed lines drop out). */
  def parse(lines: Seq[String]): Map[String, Map[String, DirColStats]] =
    lines.flatMap { l =>
      val p = l.split("\t", -1)
      if (p.length != 7 || p(2) == "-")
        None
      else scala.util.Try((p(1), p(2), DirColStats(p(3).toLong, p(4).toLong,
        if (p(5).isEmpty) None else Some(BigDecimal(p(5))),
        if (p(6).isEmpty) None else Some(BigDecimal(p(6)))))).toOption
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
      case _ => None
    }

  /** True iff NO row with the given stats can satisfy `attr op lit`. */
  private def cmpPrunes(op: String, st: DirColStats,
                        lit: BigDecimal): Boolean =
    if (st.allNull) true // comparisons are never true on NULL
    else (st.min, st.max) match {
      case (Some(mn), Some(mx)) => op match {
        case "="  => lit < mn || lit > mx
        case ">"  => mx <= lit
        case ">=" => mx < lit
        case "<"  => mn >= lit
        case "<=" => mn > lit
        case _ => false
      }
      case _ => false
    }

  private def flip(op: String): String = op match {
    case ">" => "<"; case ">=" => "<="; case "<" => ">"; case "<=" => ">="
    case other => other
  }

  /** True iff `e` proves the directory has no matching row. */
  def disqualifies(e: Expression,
                   st: Map[String, DirColStats]): Boolean = e match {
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
    case In(a: AttributeReference, list) if list.nonEmpty &&
        list.forall(_.isInstanceOf[Literal]) =>
      st.get(a.name).exists { cs =>
        list.forall {
          case Literal(v, dt) =>
            litBD(v, dt).exists(b => cmpPrunes("=", cs, b))
          case _ => false
        }
      }
    case _ => false
  }

  private def prune(op: String, a: AttributeReference, v: Any,
                    dt: DataType, st: Map[String, DirColStats]): Boolean =
    st.get(a.name).exists(cs =>
      litBD(v, dt).exists(b => cmpPrunes(op, cs, b)))
}

/** An [[InMemoryFileIndex]] rooted at exactly the manifest's directories
  * that additionally answers `listFiles` THROUGH the manifest stats:
  * directories the pushed data filters disqualify contribute no files to
  * the scan — planning-time pruning with zero footer reads. Serves both
  * graftlake read paths (the V1 relation and the V2 catalog scan). */
private[graft] class StatsPrunedFileIndex(
    spark: SparkSession, dirs: Seq[String],
    schema: StructType,
    stats: Map[String, Map[String, DirColStats]])
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
