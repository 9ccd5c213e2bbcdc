package graft

import graft.sources.{DirColStats, StatsPrune}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Adversarial property for the manifest-stats pruner (r17): pruning is
  * only ever allowed to be a NO-OP optimization — if `disqualifies` says
  * a directory has no matching row, then evaluating the same predicate
  * over the directory's actual rows must find none. Stats are computed
  * here exactly as the writer records them (min/max over non-nulls, null
  * and row counts), predicates are generated over both a stats-covered
  * column and an uncovered one, composed with And/Or/Not, with literals
  * drawn to straddle the data range. A single counterexample means
  * silently lost rows at read time, so this property is the safety net
  * under every future evaluator extension. */
object StatsPruneProps extends Properties("StatsPrune") {

  private val kAttr = AttributeReference("k", LongType)()
  private val xAttr = AttributeReference("x", DoubleType)()
  private val zAttr = AttributeReference("z", LongType)() // no stats

  private case class Dir(ks: Seq[Option[Long]], xs: Seq[Option[Double]])

  private val dirGen: Gen[Dir] = for {
    n <- Gen.chooseNum(1, 40)
    ks <- Gen.listOfN(n, Gen.oneOf(
      Gen.const(None),
      Gen.chooseNum(-50L, 50L).map(Some(_))))
    xs <- Gen.listOfN(n, Gen.oneOf(
      Gen.const(None),
      Gen.chooseNum(-10.0, 10.0).map(Some(_))))
  } yield Dir(ks, xs)

  private def statsOf(d: Dir): Map[String, DirColStats] = {
    def one(vs: Seq[Option[Double]]): DirColStats = {
      val nn = vs.flatten
      DirColStats(vs.size.toLong, (vs.size - nn.size).toLong,
        if (nn.isEmpty) None else Some(BigDecimal(nn.min)),
        if (nn.isEmpty) None else Some(BigDecimal(nn.max)))
    }
    Map("k" -> one(d.ks.map(_.map(_.toDouble))), "x" -> one(d.xs))
  }

  private val leafGen: Gen[Expression] = {
    val kLit = Gen.chooseNum(-60L, 60L).map(v => Literal(v))
    val xLit = Gen.chooseNum(-12.0, 12.0).map(v => Literal(v))
    Gen.oneOf(
      kLit.map(l => EqualTo(kAttr, l)), kLit.map(l => EqualTo(l, kAttr)),
      kLit.map(l => GreaterThan(kAttr, l)),
      kLit.map(l => GreaterThanOrEqual(l, kAttr)),
      kLit.map(l => LessThan(kAttr, l)),
      kLit.map(l => LessThanOrEqual(kAttr, l)),
      kLit.map(l => EqualNullSafe(kAttr, l)),
      Gen.listOfN(3, Gen.chooseNum(-60L, 60L)).map(vs =>
        In(kAttr, vs.map(v => Literal(v)))),
      Gen.const(IsNull(kAttr)), Gen.const(IsNotNull(kAttr)),
      xLit.map(l => GreaterThan(xAttr, l)),
      xLit.map(l => LessThanOrEqual(l, xAttr)),
      xLit.map(l => EqualTo(xAttr, l)),
      Gen.const(IsNull(xAttr)), Gen.const(IsNotNull(xAttr)),
      kLit.map(l => EqualTo(zAttr, l))) // uncovered column: never prunes
  }

  private def predGen(depth: Int): Gen[Expression] =
    if (depth == 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      2 -> (for (a <- predGen(depth - 1); b <- predGen(depth - 1))
        yield And(a, b)),
      2 -> (for (a <- predGen(depth - 1); b <- predGen(depth - 1))
        yield Or(a, b)),
      1 -> predGen(depth - 1).map(Not))

  /** SQL three-valued truth of `e` over one row (None = NULL). */
  private def eval(e: Expression, k: Option[Long], x: Option[Double],
                   z: Long): Option[Boolean] = {
    def cmp(a: AttributeReference, l: Any,
            f: (Double, Double) => Boolean): Option[Boolean] = {
      val av: Option[Double] = a.name match {
        case "k" => k.map(_.toDouble)
        case "x" => x
        case _ => Some(z.toDouble)
      }
      val lv = l match {
        case i: Long => i.toDouble
        case d: Double => d
        case other => other.toString.toDouble
      }
      av.map(f(_, lv))
    }
    e match {
      case And(l, r) => (eval(l, k, x, z), eval(r, k, x, z)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(l, r) => (eval(l, k, x, z), eval(r, k, x, z)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case Not(c) => eval(c, k, x, z).map(!_)
      case EqualTo(a: AttributeReference, Literal(v, _)) =>
        cmp(a, v, _ == _)
      case EqualTo(Literal(v, _), a: AttributeReference) =>
        cmp(a, v, _ == _)
      case EqualNullSafe(a: AttributeReference, Literal(v, _)) =>
        Some(cmp(a, v, _ == _).getOrElse(false))
      case GreaterThan(a: AttributeReference, Literal(v, _)) =>
        cmp(a, v, _ > _)
      case GreaterThan(Literal(v, _), a: AttributeReference) =>
        cmp(a, v, _ < _)
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) =>
        cmp(a, v, _ >= _)
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) =>
        cmp(a, v, _ <= _)
      case LessThan(a: AttributeReference, Literal(v, _)) =>
        cmp(a, v, _ < _)
      case LessThan(Literal(v, _), a: AttributeReference) =>
        cmp(a, v, _ > _)
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) =>
        cmp(a, v, _ <= _)
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) =>
        cmp(a, v, _ >= _)
      case In(a: AttributeReference, list) =>
        val hits = list.map { case Literal(v, _) => cmp(a, v, _ == _) }
        if (hits.exists(_.contains(true))) Some(true)
        else if (hits.forall(_.contains(false))) Some(false)
        else None
      case IsNull(a: AttributeReference) => Some(a.name match {
        case "k" => k.isEmpty
        case "x" => x.isEmpty
        case _ => false
      })
      case IsNotNull(a: AttributeReference) => Some(a.name match {
        case "k" => k.nonEmpty
        case "x" => x.nonEmpty
        case _ => true
      })
      case other => sys.error(s"unhandled: $other")
    }
  }

  property("a disqualified dir truly has no matching row") =
    forAll(dirGen, predGen(2)) { (d, p) =>
      val st = statsOf(d)
      if (!StatsPrune.disqualifies(p, st)) true
      else d.ks.zip(d.xs).zipWithIndex.forall { case ((k, x), i) =>
        !eval(p, k, x, i.toLong).contains(true)
      }
    }

  property("obvious gap probes do prune (the evaluator is not vacuous)") =
    forAll(dirGen) { d =>
      val st = statsOf(d)
      val kVals = d.ks.flatten
      kVals.isEmpty || {
        val above = kVals.max + 10
        StatsPrune.disqualifies(EqualTo(kAttr, Literal(above)), st) &&
          StatsPrune.disqualifies(GreaterThan(kAttr, Literal(above)), st)
      }
    }

  // ---- string arm (r18): truncate(16) bounds, UTF-8 byte order --------

  private val sAttr = AttributeReference("s",
    org.apache.spark.sql.types.StringType)()

  /** Strings over an adversarial alphabet: ASCII straddlers, multi-byte,
    * a supplementary code point (UTF-8 vs UTF-16 order divergence), and
    * lengths crossing the 16-code-point truncation boundary. */
  private val strGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 20)
    cs <- Gen.listOfN(n, Gen.oneOf("a", "b", "z", "é", "交", "😀", "~"))
  } yield cs.mkString

  private def u8(s: String) =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)

  private def strStats(vs: Seq[Option[String]])
      : Map[String, graft.sources.ColStats] = {
    val nn = vs.flatten.map(u8)
    val mn = nn.sorted(Ordering.fromLessThan[
      org.apache.spark.unsafe.types.UTF8String](_.compareTo(_) < 0))
      .headOption
    val mx = nn.sorted(Ordering.fromLessThan[
      org.apache.spark.unsafe.types.UTF8String](_.compareTo(_) < 0))
      .lastOption
    Map("s" -> graft.sources.DirStrStats(vs.size.toLong,
      (vs.size - nn.size).toLong,
      mn.map(graft.sources.StrBounds.lower),
      mx.flatMap(graft.sources.StrBounds.upper)))
  }

  private val strLit: Gen[Literal] =
    strGen.map(v => Literal(u8(v), org.apache.spark.sql.types.StringType))

  private val strLeafGen: Gen[Expression] = Gen.oneOf(
    strLit.map(l => EqualTo(sAttr, l)), strLit.map(l => EqualTo(l, sAttr)),
    strLit.map(l => GreaterThan(sAttr, l)),
    strLit.map(l => LessThan(sAttr, l)),
    strLit.map(l => GreaterThanOrEqual(sAttr, l)),
    strLit.map(l => LessThanOrEqual(sAttr, l)),
    strLit.map(l => EqualNullSafe(sAttr, l)),
    strLit.map(l => StartsWith(sAttr, l)),
    Gen.listOfN(3, strLit).map(ls => In(sAttr, ls)),
    Gen.const(IsNull(sAttr)), Gen.const(IsNotNull(sAttr)))

  private def strPredGen(depth: Int): Gen[Expression] =
    if (depth == 0) strLeafGen
    else Gen.frequency(
      3 -> strLeafGen,
      2 -> (for (a <- strPredGen(depth - 1); b <- strPredGen(depth - 1))
        yield And(a, b)),
      2 -> (for (a <- strPredGen(depth - 1); b <- strPredGen(depth - 1))
        yield Or(a, b)),
      1 -> strPredGen(depth - 1).map(Not))

  /** Three-valued truth over one string row, comparisons in UTF-8 byte
    * order (UTF8String.compareTo) — the order the stats live in. */
  private def strEval(e: Expression, s: Option[String]): Option[Boolean] = {
    def cmp(l: Any, f: Int => Boolean): Option[Boolean] =
      s.map(v => f(u8(v).compareTo(
        l.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])))
    e match {
      case And(l, r) => (strEval(l, s), strEval(r, s)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(l, r) => (strEval(l, s), strEval(r, s)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case Not(c) => strEval(c, s).map(!_)
      case EqualTo(_: AttributeReference, Literal(v, _)) => cmp(v, _ == 0)
      case EqualTo(Literal(v, _), _: AttributeReference) => cmp(v, _ == 0)
      case EqualNullSafe(_: AttributeReference, Literal(v, _)) =>
        Some(cmp(v, _ == 0).getOrElse(false))
      case GreaterThan(_: AttributeReference, Literal(v, _)) => cmp(v, _ > 0)
      case GreaterThanOrEqual(_: AttributeReference, Literal(v, _)) =>
        cmp(v, _ >= 0)
      case LessThan(_: AttributeReference, Literal(v, _)) => cmp(v, _ < 0)
      case LessThanOrEqual(_: AttributeReference, Literal(v, _)) =>
        cmp(v, _ <= 0)
      case StartsWith(_: AttributeReference, Literal(v, _)) =>
        s.map(x => x.startsWith(v.toString))
      case IsNull(_: AttributeReference) => Some(s.isEmpty)
      case IsNotNull(_: AttributeReference) => Some(s.nonEmpty)
      case In(_: AttributeReference, list) =>
        val hits = list.map { case Literal(v, _) => cmp(v, _ == 0) }
        if (hits.exists(_.contains(true))) Some(true)
        else if (hits.forall(_.contains(false))) Some(false)
        else None
      case other => sys.error(s"unhandled: $other")
    }
  }

  private val strDirGen: Gen[Seq[Option[String]]] = for {
    n <- Gen.chooseNum(1, 30)
    vs <- Gen.listOfN(n, Gen.oneOf(Gen.const(None), strGen.map(Some(_))))
  } yield vs

  property("a string-disqualified dir truly has no matching row") =
    forAll(strDirGen, strPredGen(2)) { (vs, p) =>
      val st = strStats(vs)
      if (!StatsPrune.disqualifies(p, st)) true
      else vs.forall(v => !strEval(p, v).contains(true))
    }

  property("string gap probes do prune through truncated bounds") =
    forAll(strDirGen) { vs =>
      val nn = vs.flatten
      nn.isEmpty || {
        val st = strStats(vs)
        // "🿿" (U+1FFFF) sorts above every generated code point, so an
        // equality above a 21-cp ceiling must prune even though max was
        // truncated at 16 — the incremented prefix still bounds it
        val above = "🿿" * 21
        StatsPrune.disqualifies(
          EqualTo(sAttr, Literal(u8(above),
            org.apache.spark.sql.types.StringType)), st)
      }
    }

  // ---- decimal endpoints (r19): exact fractional-domain pruning ------

  private val decType = org.apache.spark.sql.types.DecimalType(12, 2)
  private val dAttr = AttributeReference("price", decType)()

  private val centGen: Gen[BigDecimal] =
    Gen.chooseNum(-100000L, 100000L).map(c => BigDecimal(c, 2))

  private val decDirGen: Gen[Seq[Option[BigDecimal]]] = for {
    n <- Gen.chooseNum(1, 30)
    vs <- Gen.listOfN(n, Gen.oneOf(Gen.const(None), centGen.map(Some(_))))
  } yield vs

  private def decStats(vs: Seq[Option[BigDecimal]])
      : Map[String, DirColStats] = {
    val nn = vs.flatten
    Map("price" -> DirColStats(vs.size.toLong, (vs.size - nn.size).toLong,
      if (nn.isEmpty) None else Some(nn.min),
      if (nn.isEmpty) None else Some(nn.max)))
  }

  private def decLit(v: BigDecimal): Literal =
    Literal(org.apache.spark.sql.types.Decimal(v, 12, 2), decType)

  private def decPredGen(depth: Int): Gen[Expression] = {
    val leaf: Gen[Expression] = centGen.flatMap { v =>
      Gen.oneOf[Expression](
        EqualTo(dAttr, decLit(v)), EqualTo(decLit(v), dAttr),
        GreaterThan(dAttr, decLit(v)), GreaterThan(decLit(v), dAttr),
        GreaterThanOrEqual(dAttr, decLit(v)),
        LessThan(dAttr, decLit(v)), LessThanOrEqual(dAttr, decLit(v)),
        IsNull(dAttr), IsNotNull(dAttr))
    }
    if (depth == 0) leaf
    else Gen.frequency(
      3 -> leaf,
      2 -> (for (a <- decPredGen(depth - 1); b <- decPredGen(depth - 1))
        yield And(a, b)),
      2 -> (for (a <- decPredGen(depth - 1); b <- decPredGen(depth - 1))
        yield Or(a, b)),
      1 -> decPredGen(depth - 1).map(Not))
  }

  private def decEval(e: Expression,
                      v: Option[BigDecimal]): Option[Boolean] = {
    def cmp(l: Any, f: Int => Boolean): Option[Boolean] = {
      val lv = l.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toBigDecimal
      v.map(x => f(x.compare(lv)))
    }
    e match {
      case And(l, r) => (decEval(l, v), decEval(r, v)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(l, r) => (decEval(l, v), decEval(r, v)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case Not(c) => decEval(c, v).map(!_)
      case EqualTo(_: AttributeReference, Literal(l, _)) => cmp(l, _ == 0)
      case EqualTo(Literal(l, _), _: AttributeReference) => cmp(l, _ == 0)
      case GreaterThan(_: AttributeReference, Literal(l, _)) =>
        cmp(l, _ > 0)
      case GreaterThan(Literal(l, _), _: AttributeReference) =>
        cmp(l, _ < 0)
      case GreaterThanOrEqual(_: AttributeReference, Literal(l, _)) =>
        cmp(l, _ >= 0)
      case LessThan(_: AttributeReference, Literal(l, _)) => cmp(l, _ < 0)
      case LessThanOrEqual(_: AttributeReference, Literal(l, _)) =>
        cmp(l, _ <= 0)
      case IsNull(_: AttributeReference) => Some(v.isEmpty)
      case IsNotNull(_: AttributeReference) => Some(v.nonEmpty)
      case other => sys.error(s"unhandled: $other")
    }
  }

  property("a decimal-disqualified dir truly has no matching row") =
    forAll(decDirGen, decPredGen(2)) { (vs, p) =>
      val st = decStats(vs)
      if (!StatsPrune.disqualifies(p, st)) true
      else vs.forall(v => !decEval(p, v).contains(true))
    }

  property("decimal gap probes do prune (cent-exact, not double-rounded)") =
    forAll(decDirGen) { vs =>
      val nn = vs.flatten
      nn.isEmpty || {
        val st = decStats(vs)
        // one cent above the max must prune an equality and a >=
        val above = nn.max + BigDecimal("0.01")
        StatsPrune.disqualifies(EqualTo(dAttr, decLit(above)), st) &&
          StatsPrune.disqualifies(GreaterThanOrEqual(dAttr, decLit(above)),
            st) &&
          // the max itself must NOT prune equality (exactness both ways)
          !StatsPrune.disqualifies(EqualTo(dAttr, decLit(nn.max)), st)
      }
    }
}
