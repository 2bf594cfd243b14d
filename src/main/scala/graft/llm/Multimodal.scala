package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with a typed metadata struct; decode/feature-extract runs as a
  * partition-local typed transform over `Dataset[MediaRow]`.
  *
  * The container has no image/audio codecs, so `fakeDecode` below is a
  * clearly-marked STUB standing in for the real decoder (it derives
  * deterministic pseudo-features from the bytes). Everything around it —
  * schema, binary payload handling, encoder round-trip, partition-level
  * batching via mapPartitions — is the real Spark plumbing a decode stage
  * needs, and is what the tests exercise.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String,
                      src: String, n_bytes: Long)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int,
                           height: Int, checksum: Long)

  /** STUB decoder: stands in for e.g. JPEG decode + resize. Deterministic
    * pseudo-features so tests are stable; a real deployment swaps this
    * body for an actual codec call, keeping the signature. */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Long) = {
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

  /** Typed decode pipeline: DataFrame → Dataset[MediaRow] →
    * mapPartitions(decode) → Dataset[MediaFeatures]. Partition-local so a
    * real decoder can amortize codec/model init per partition (the same
    * shape a Pandas-UDF/mapInPandas stage has in PySpark). Rows-only
    * oracle (stub features are engine-internal). */
  def q63MultimodalDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media: Dataset[MediaRow] = Tables.documents(s, dir)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        lit("text/plain").as("mime"),
        col("source").as("src"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .as[MediaRow]
    media.mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights)
      rows.map { r =>
        val (w, h, cs) = fakeDecode(r.payload)
        MediaFeatures(r.doc_id, r.n_bytes, w, h, cs)
      }
    }.toDF().orderBy(col("doc_id"))
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

  val oracle: Map[String, String] = Map(
    "q62_multimodal_meta"   -> q62Sql,
    "q65_multimodal_frames" -> q65Sql,
    // q63: stubbed byte-level decoder features → rows-only (byte folds
    // over multi-byte text aren't replayable from SQL's codepoint view).
  )
}
