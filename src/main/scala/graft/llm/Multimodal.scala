package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with a typed metadata struct; decode/feature-extract runs as a
  * partition-local typed transform over `Dataset[MediaRow]`.
  *
  * The decode stage is REAL for the codec-free Netpbm family (PGM "P5" /
  * PPM "P6" — [[PgmCodec]], zero dependencies): header parse → true
  * width/height → pixel checksum. Payloads that aren't Netpbm (this
  * corpus's text-as-binary rows, or formats needing a codec library the
  * container lacks — JPEG etc.) fall back to clearly-marked STUB
  * pseudo-features so the pipeline stays total and deterministic. The
  * surrounding Spark plumbing — schema, binary handling, encoder
  * round-trip, partition-level batching via mapPartitions — is the real
  * thing either way.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String,
                      src: String, n_bytes: Long)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int,
                           height: Int, checksum: Long)

  /** Minimal real decoder for binary Netpbm images (PGM `P5`, PPM `P6`):
    * ASCII header (magic, width, height, maxval; '#' comments allowed)
    * followed by raw samples. Returns (width, height, pixelChecksum) or
    * None if the payload isn't Netpbm. */
  private[graft] object PgmCodec {
    def decode(p: Array[Byte]): Option[(Int, Int, Long)] = {
      if (p.length < 10 || p(0) != 'P' || (p(1) != '5' && p(1) != '6')) return None
      var i = 2
      def skipWs(): Unit = {
        var go = true
        while (go && i < p.length) {
          val c = p(i).toChar
          if (c == '#') { while (i < p.length && p(i) != '\n') i += 1 }
          else if (c.isWhitespace) i += 1
          else go = false
        }
      }
      def int(): Option[Int] = {
        skipWs()
        val start = i
        while (i < p.length && p(i) >= '0' && p(i) <= '9') i += 1
        if (i == start) None else Some(new String(p, start, i - start).toInt)
      }
      val channels = if (p(1) == '6') 3 else 1
      for {
        w <- int() if w > 0
        h <- int() if h > 0
        maxval <- int() if maxval > 0 && maxval < 65536
        bytesPerSample = if (maxval > 255) 2 else 1
        dataStart = i + 1 // single whitespace after maxval
        need = w.toLong * h * channels * bytesPerSample
        if dataStart + need <= p.length
      } yield {
        var cs = 1125899906842597L
        var j = dataStart
        val end = dataStart + need.toInt
        while (j < end) { cs = cs * 31 + (p(j) & 0xff); j += 1 }
        (w, h, cs)
      }
    }
  }

  /** Decode: real Netpbm parse first; otherwise the STUB fallback —
    * deterministic pseudo-features standing in for codecs (JPEG etc.)
    * the container doesn't ship. A real deployment extends the real
    * branch per format, keeping the signature. */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Long) =
    PgmCodec.decode(payload).getOrElse {
      var cs = 1125899906842597L // FNV-ish fold; deterministic
      var i = 0
      while (i < payload.length) { cs = cs * 31 + (payload(i) & 0xff); i += 1 }
      val w = 64 + math.abs(cs % 961).toInt   // fake "decoded" dimensions
      val h = 64 + math.abs((cs / 961) % 961).toInt
      (w, h, cs)
    }

  /** Metadata extraction over the binary payload — SQL-expressible half
    * of the multimodal path (oracle-checked). */
  def q62MultimodalMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        lit("text/plain").as("mime"),
        col("source").as("src"))
      .select(col("doc_id"), col("mime"), col("src"),
        octet_length(col("payload")).as("n_bytes"))
      .orderBy(col("doc_id"))

  val q62Sql: String =
    """SELECT doc_id, 'text/plain' AS mime, source AS src,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  /** The reusable typed decode stage: DataFrame → Dataset[MediaRow] →
    * mapPartitions(decode) → Dataset[MediaFeatures]. Partition-local so
    * a real decoder can amortize codec/model init per partition (the
    * same shape a Pandas-UDF/mapInPandas stage has in PySpark). */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights)
      rows.map { r =>
        val (w, h, cs) = fakeDecode(r.payload)
        MediaFeatures(r.doc_id, r.n_bytes, w, h, cs)
      }
    }
  }

  def q63MultimodalDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media: Dataset[MediaRow] = Tables.documents(s, dir)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        lit("text/plain").as("mime"),
        col("source").as("src"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .as[MediaRow]
    decodeFeatures(media).toDF().orderBy(col("doc_id"))
  }

  case class TextFrameRow(doc_id: Long, text: String)
  case class Frame(doc_id: Long, frame_idx: Int, frame_chars: Long, feature: Long)

  /** Frame sampling: each payload is chunked into fixed 64-char "frames"
    * (standing in for video frame extraction), every 4th frame is
    * sampled, and a per-frame featurizer runs partition-locally. The
    * explode happens inside mapPartitions so one input row fans out to
    * many feature rows without a generator plan node — the batch shape a
    * real decode+sample stage has (a codec would consume bytes; frames
    * are chars here so the featurizer — the same mod-1e9+7 fold as q61 —
    * is replayable by the DuckDB oracle, making the whole fan-out
    * hash-checked rather than rows-only). */
  def q65MultimodalFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id"), col("text")).as[TextFrameRow]
    val frameSize = 64; val sampleEvery = 4
    media.mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights)
      rows.flatMap { r =>
        // chunk and fold over CODEPOINTS, not UTF-16 units — DuckDB's
        // LENGTH/SUBSTR/ascii are codepoint-based, and a non-BMP char
        // (surrogate pair) would otherwise shift frame boundaries
        val cps = r.text.codePoints().toArray
        val n = cps.length
        val nFrames = math.max((n + frameSize - 1) / frameSize, 1)
        (0 until nFrames by sampleEvery).iterator.map { idx =>
          val from = idx * frameSize
          val until = math.min(from + frameSize, n)
          var cs = 0L
          var i = from
          while (i < until) { cs = (cs * 31 + cps(i)) % 1000000007L; i += 1 }
          Frame(r.doc_id, idx, (until - from).toLong, cs)
        }
      }
    }.toDF()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("frame_chars")).as("sampled_chars"),
        min(col("feature")).as("min_feature"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB replay: unnest the sampled frame indexes, substr the chunk,
    * fold it with list_reduce — then the same per-doc aggregate. */
  val q65Sql: String =
    """WITH w AS (
      |  SELECT doc_id, text, LENGTH(text) AS n,
      |    GREATEST(CAST(CEIL(LENGTH(text) / 64.0) AS BIGINT), 1) AS n_frames
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, UNNEST(range(0, n_frames, 4)) AS idx, text, n FROM w),
      |feat AS (
      |  SELECT doc_id, idx,
      |    CAST(LENGTH(SUBSTR(text, CAST(idx * 64 + 1 AS INTEGER), 64)) AS BIGINT) AS frame_chars,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(regexp_extract_all(SUBSTR(text, CAST(idx * 64 + 1 AS INTEGER), 64), '(?s).'),
      |        c -> CAST(ascii(c) AS BIGINT))),
      |      (a, c) -> (a * 31 + c) % 1000000007) AS feature
      |  FROM f)
      |SELECT doc_id, COUNT(*) AS n_sampled,
      |  CAST(SUM(frame_chars) AS BIGINT) AS sampled_chars,
      |  MIN(feature) AS min_feature
      |FROM feat GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_multimodal_meta"   -> q62MultimodalMeta _,
    "q63_multimodal_decode" -> q63MultimodalDecode _,
    "q65_multimodal_frames" -> q65MultimodalFrames _,
  )

  /** DuckDB replay of the q63 stub decoder: the UTF-8 byte stream is
    * recovered as `hex(encode(text))` and folded two hex chars at a
    * time with HUGEINT arithmetic mod 2^64 (Java's long wraps; DuckDB's
    * BIGINT errors on overflow), then mapped back to the signed value.
    * Width/height replay Java's truncating division via
    * `(cs - cs % 961) / 961` (DuckDB `//` floors, which differs on
    * negatives). The corpus holds no 'P5 ' payloads, so the Netpbm
    * branch never fires — the fold IS the decode on this data. */
  val q63Sql: String =
    """WITH h AS (
      |  SELECT doc_id, octet_length(encode(text)) AS nb, hex(encode(text)) AS hx
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, nb,
      |    list_reduce(
      |      list_prepend(CAST(1125899906842597 AS HUGEINT),
      |        list_transform(range(0, CAST(nb AS INTEGER)),
      |          i -> CAST(CAST(concat('0x', hx[i*2+1:i*2+2]) AS INTEGER) AS HUGEINT))),
      |      (a, c) -> (a * 31 + c) % CAST('18446744073709551616' AS HUGEINT)) AS cs_u
      |  FROM h),
      |s AS (
      |  SELECT doc_id, nb,
      |    CASE WHEN cs_u >= CAST('9223372036854775808' AS HUGEINT)
      |         THEN CAST(cs_u - CAST('18446744073709551616' AS HUGEINT) AS BIGINT)
      |         ELSE CAST(cs_u AS BIGINT) END AS cs
      |  FROM f)
      |SELECT doc_id, CAST(nb AS BIGINT) AS n_bytes,
      |  CAST(64 + abs(cs % 961) AS INTEGER) AS width,
      |  CAST(64 + abs(((cs - (cs % 961)) // 961) % 961) AS INTEGER) AS height,
      |  cs AS checksum
      |FROM s ORDER BY doc_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q62_multimodal_meta"   -> q62Sql,
    "q65_multimodal_frames" -> q65Sql,
    "q63_multimodal_decode" -> q63Sql,
  )
}
