package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.PartitionTransforms

/** The property that makes partition pruning safe: for every transform
  * and every value, the dir value the WRITE side computes (the Catalyst
  * expression, evaluated through a real plan) equals the dir value the
  * SCAN side replays driver-side for a pushed literal. A divergence on
  * any input is a silently-dropped row, so this is checked over
  * adversarial generators (surrogate pairs, Hive-escaped characters,
  * negative numbers, boundary dates) rather than just the happy path.
  */
class PartitionTransformsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  /** Evaluate the write-side dir expression on a one-row frame, as a
    * string — the value partitionBy would use for the directory. */
  private def writeDirValue(transform: String, v: Any, dt: DataType): Option[String] = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(StructField("c", dt)))
    val row = org.apache.spark.sql.Row(v)
    val df = spark.createDataFrame(List(row).asJava, schema)
    PartitionTransforms.dirExpr(transform, "c", dt).map { ex =>
      String.valueOf(df.select(ex.cast("string")).head.get(0))
    }
  }

  private val trickyString: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf(':', '=', '%', '/', '#', ' ', 'é', '世'),
    Gen.const('\ud83d').map(_ => '\ud83d'))).map { cs =>
    // assemble, pairing any high surrogate with a low one so the string
    // stays valid UTF-16 (lone surrogates aren't storable text)
    val sb = new StringBuilder
    cs.foreach { c => if (c == '\ud83d') sb.append("😀") else sb.append(c) }
    sb.toString
  }

  test("truncate[n] on strings: write expression == driver replay (incl. non-BMP)") {
    check(Prop.forAll(trickyString, Gen.choose(1, 5)) { (s, n) =>
      writeDirValue(s"truncate[$n]", s, StringType) ==
        PartitionTransforms.dirValueOf(s"truncate[$n]", s, StringType)
    })
  }

  test("truncate[n] on longs: write expression == driver replay (incl. negatives)") {
    check(Prop.forAll(Gen.choose(Long.MinValue / 4, Long.MaxValue / 4),
        Gen.choose(1, 1000)) { (x, n) =>
      writeDirValue(s"truncate[$n]", x, LongType) ==
        PartitionTransforms.dirValueOf(s"truncate[$n]", x, LongType)
    })
  }

  test("bucket[n]: write expression == driver replay for longs and strings") {
    check(Prop.forAll(Gen.choose(Long.MinValue / 2, Long.MaxValue / 2),
        Gen.choose(1, 64)) { (x, n) =>
      writeDirValue(s"bucket[$n]", x, LongType) ==
        PartitionTransforms.dirValueOf(s"bucket[$n]", x, LongType)
    })
    check(Prop.forAll(trickyString, Gen.choose(1, 64)) { (s, n) =>
      writeDirValue(s"bucket[$n]", s, StringType) ==
        PartitionTransforms.dirValueOf(s"bucket[$n]", s, StringType)
    })
  }

  test("temporal transforms on DATE: write expression == driver replay") {
    val dateGen = Gen.choose(-20000, 40000) // ~1915..2079 as epoch days
      .map(d => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d.toLong)))
    for (tr <- Seq("year", "month", "day")) {
      check(Prop.forAll(dateGen) { d =>
        writeDirValue(tr, d, DateType) ==
          PartitionTransforms.dirValueOf(tr, d, DateType)
      })
    }
  }

  test("temporal transforms on TIMESTAMP_NTZ: write expression == driver replay") {
    val ldtGen = for {
      d <- Gen.choose(0, 25000) // ~1970..2038 as epoch days
      s <- Gen.choose(0, 86399)
    } yield java.time.LocalDate.ofEpochDay(d.toLong).atStartOfDay.plusSeconds(s.toLong)
    for (tr <- Seq("year", "month", "day", "hour")) {
      check(Prop.forAll(ldtGen) { t =>
        writeDirValue(tr, t, TimestampNTZType) ==
          PartitionTransforms.dirValueOf(tr, t, TimestampNTZType)
      })
    }
  }

  test("temporal transforms on TIMESTAMP (instant): write == replay under UTC") {
    spark.sql("SELECT 1").collect() // force session init on this thread
    val tsGen = Gen.choose(0L, 2200000000L) // ~1970..2039 epoch seconds
      .map(s => java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s)))
    for (tr <- Seq("year", "month", "day", "hour")) {
      check(Prop.forAll(tsGen) { t =>
        writeDirValue(tr, t, TimestampType) ==
          PartitionTransforms.dirValueOf(tr, t, TimestampType) &&
          PartitionTransforms.dirValueOf(tr, t, TimestampType).nonEmpty
      })
    }
  }

  test("replay never disagrees with the write side — it refuses instead") {
    // the safety invariant behind every prune: for ANY value, replay is
    // either exactly the write-side dir value or None. Extreme years
    // (past 9999, BC) make date_format switch to signed/era forms the
    // fixed-width replay can't reproduce — those must come back None,
    // never a mismatching Some (that would silently drop rows).
    spark.sql("SELECT 1").collect()
    val wideTsGen = Gen.oneOf(
      Gen.choose(-62135596800L, 253402300799L), // years 0001..9999
      Gen.choose(253402300800L, 3000000000000L), // far future (> 9999)
      Gen.choose(-80000000000L, -62135596801L)   // BC / year-zero band
    ).map(s => java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s)))
    for (tr <- Seq("year", "month", "day", "hour")) {
      check(Prop.forAll(wideTsGen) { t =>
        PartitionTransforms.dirValueOf(tr, t, TimestampType) match {
          case None => true // refusing is always safe
          case some => some == writeDirValue(tr, t, TimestampType)
        }
      })
    }
  }

  test("non-UTC sessions neither lay out nor replay instant temporal dirs") {
    // a session whose instants render in a different zone must refuse
    // BOTH sides — layouts it writes can't be pruned by a UTC reader and
    // vice versa; refusing both keeps the pair consistent (never-wrong)
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val ts = java.sql.Timestamp.valueOf("2024-06-01 10:30:00")
      for (tr <- Seq("year", "month", "day", "hour")) {
        assert(PartitionTransforms.dirValueOf(tr, ts, TimestampType).isEmpty)
        assert(PartitionTransforms.dirExpr(tr, "c", TimestampType).isEmpty)
      }
      // timezone-independent types are unaffected by the session zone
      assert(PartitionTransforms.dirValueOf("day",
        java.sql.Date.valueOf("2024-06-01"), DateType).contains("2024-06-01"))
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }
}
