package graft

import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.llm.Multimodal

/** The decode stage is REAL for Netpbm: a generated PGM/PPM payload
  * round-trips through the typed mapPartitions pipeline and yields its
  * true dimensions — not pseudo-features — while non-image payloads take
  * the documented deterministic fallback. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def pgm(w: Int, h: Int): Array[Byte] = {
    val header = s"P5\n# test image\n$w $h\n255\n".getBytes(US_ASCII)
    val pixels = Array.tabulate(w * h)(i => (i % 251).toByte)
    header ++ pixels
  }

  private def ppm(w: Int, h: Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes(US_ASCII)
    val pixels = Array.tabulate(w * h * 3)(i => (i % 249).toByte)
    header ++ pixels
  }

  test("PgmCodec decodes real PGM/PPM headers and rejects non-images") {
    assert(Multimodal.PgmCodec.decode(pgm(17, 9)).map(d => (d._1, d._2))
      .contains((17, 9)))
    assert(Multimodal.PgmCodec.decode(ppm(5, 4)).map(d => (d._1, d._2))
      .contains((5, 4)))
    // truncated pixel data → reject, don't mis-decode
    assert(Multimodal.PgmCodec.decode(pgm(100, 100).dropRight(1)).isEmpty)
    assert(Multimodal.PgmCodec.decode("plain text payload".getBytes(US_ASCII)).isEmpty)
  }

  test("typed decode pipeline extracts true dimensions from image payloads") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, pgm(32, 16), "image/x-portable-graymap", "t", 0L),
      Multimodal.MediaRow(2L, ppm(8, 8), "image/x-portable-pixmap", "t", 0L),
      Multimodal.MediaRow(3L, "not an image".getBytes(US_ASCII), "text/plain", "t", 0L))
    val feats = Multimodal.decodeFeatures(rows.toDS()).collect()
      .map(f => f.doc_id -> ((f.width, f.height))).toMap
    assert(feats(1L) == ((32, 16)))
    assert(feats(2L) == ((8, 8)))
    // the non-image row flows through the fallback, not a crash
    assert(feats.contains(3L))
  }
}
