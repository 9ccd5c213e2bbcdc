package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType,
  StructField, StructType, TimestampType}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Randomized round-trip and pushdown-semantics properties for the V2
  * connector — the adversarial twin of EventsV2Spec's example cases.
  * Every generated frame (unicode incl. supplementary-plane strings,
  * nulls in every column, extreme-but-valid timestamps and doubles) must
  * survive v2-write → v2-read AND v2-write → from_json-read bit-for-bit,
  * and a pushed string range filter must select exactly the rows Spark's
  * own (UTF8String binary order) comparison selects.
  */
object EventsV2Props extends Properties("events-v2") {
  private lazy val spark = TestSpark.spark
  private val Fmt = "graft.sources.v2.EventsV2Provider"

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  // strings exercising ASCII, BMP beyond ASCII, and supplementary planes
  // (the UTF-16-vs-UTF-8 ordering divergence). Built from WHOLE code
  // points — an unpaired surrogate is not a valid string and cannot
  // round-trip any UTF-8 wire format.
  private val genStr: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    // bound the LIST, never char-truncate the result: a .take(n) on the
    // string can split a surrogate pair and fabricate an ill-formed
    // input no UTF-8 format could round-trip (found by this property's
    // own first run)
    Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "é", "ß", "中", "😀", "￿"))
        .map(_.mkString)),
    Gen.const("￿"), Gen.const("😀"))

  private val genRow: Gen[Row] = for {
    id  <- Gen.choose(0L, 1L << 60)
    sec <- Gen.choose(0L, 4102444800L) // 1970..2100, in-range for the fmt
    us  <- Gen.choose(0L, 999999L)
    uid <- Gen.option(Gen.choose(0L, 1000L))
    tpe <- Gen.option(genStr)
    // no -0.0: the deterministic encoder's Go-style whole-number
    // rendering drops the sign of negative zero (as "-0" vs "0" is the
    // one divergence from Go's marshal) — a documented wire limitation,
    // not a reader defect
    v   <- Gen.option(Gen.oneOf(Gen.choose(-1e12, 1e12),
             Gen.oneOf(0.0, 1e-300, Double.MinPositiveValue)))
    pr  <- Gen.option(genStr)
  } yield Row(id,
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec, us * 1000L)),
    uid.map(Long.box).orNull, tpe.orNull,
    v.map(Double.box).orNull, pr.orNull)

  private def mkDir(): String =
    java.nio.file.Files.createTempDirectory("ev2-props")
      .toFile.getAbsolutePath

  /** deleteOnExit never removes non-empty dirs — reclaim each case's
    * data eagerly or 100 populated temp dirs leak per property run. */
  private def rmTree(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
  }

  private def canon(rows: Seq[Row]): Seq[Seq[Any]] =
    rows.map(_.toSeq.map {
      case t: java.sql.Timestamp => t.getTime * 1000 + t.getNanos / 1000 % 1000
      case x => x
    }).sortBy(_.mkString("|"))

  property("write -> both readers, bit-for-bit") =
    forAll(Gen.listOfN(20, genRow)) { rows =>
      // distinct ids keep the sort canonical
      val distinctRows = rows.zipWithIndex.map { case (r, i) =>
        Row.fromSeq((i.toLong) +: r.toSeq.tail) }
      val dir = mkDir()
      val df = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(distinctRows).asJava), schema)
      df.write.format(Fmt).mode("append").save(dir)
      val v2 = spark.read.format(Fmt).load(dir)
        .select(schema.fieldNames.map(col): _*).collect().toSeq
      val fj = graft.sources.EventJsonSource.readValid(spark, dir)
        .select(schema.fieldNames.map(col): _*).collect().toSeq
      rmTree(dir)
      val in = canon(distinctRows)
      Prop(canon(v2) == in) :| "v2 read diverged" &&
        Prop(canon(fj) == in) :| "from_json read diverged"
    }

  property("pushed string range == Spark's own binary-order filter") =
    forAll(Gen.listOfN(25, genRow), genStr) { (rows, cut) =>
      val distinctRows = rows.zipWithIndex.map { case (r, i) =>
        Row.fromSeq((i.toLong) +: r.toSeq.tail) }
      val dir = mkDir()
      val df = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(distinctRows).asJava), schema)
      df.write.format(Fmt).mode("append").save(dir)
      val pushedIds = spark.read.format(Fmt).load(dir)
        .filter(col("event_type") > lit(cut))
        .select(col("event_id")).collect().map(_.getLong(0)).toSet
      // reference: the SAME predicate evaluated by Spark itself on an
      // unfiltered v2 read (no pushdown survives a prior collect)
      val all = spark.read.format(Fmt).load(dir)
        .select(col("event_id"), col("event_type")).collect()
      val sparkIds = all.filter(r => !r.isNullAt(1) &&
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1))
          .compareTo(org.apache.spark.unsafe.types.UTF8String
            .fromString(cut)) > 0)
        .map(_.getLong(0)).toSet
      rmTree(dir)
      Prop(pushedIds == sparkIds) :|
        s"pushdown selected $pushedIds but Spark semantics say $sparkIds"
    }
}
