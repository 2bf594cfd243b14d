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

  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Long, feature: Long)

  /** Frame sampling: each payload is chunked into fixed 64-byte "frames"
    * (standing in for video frame extraction), every 4th frame is
    * sampled, and a stub per-frame featurizer runs partition-locally.
    * The explode happens inside mapPartitions so one input row fans out
    * to many feature rows without a generator plan node — the batch
    * shape a real decode+sample stage has. Rows-only oracle (stub
    * features); frame counts are deterministic from n_bytes. */
  def q65MultimodalFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        lit("video/fake").as("mime"), col("source").as("src"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .as[MediaRow]
    val frameSize = 64; val sampleEvery = 4
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val nFrames = math.max((r.payload.length + frameSize - 1) / frameSize, 1)
        (0 until nFrames by sampleEvery).iterator.map { idx =>
          val from = idx * frameSize
          val until = math.min(from + frameSize, r.payload.length)
          val chunk = java.util.Arrays.copyOfRange(r.payload, from, math.max(until, from))
          val (_, _, cs) = fakeDecode(chunk) // STUB featurizer per frame
          Frame(r.doc_id, idx, (until - from).toLong, cs)
        }
      }
    }.toDF()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sampled"), sum(col("frame_bytes")).as("sampled_bytes"),
        min(col("feature")).as("min_feature"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_multimodal_meta"   -> q62MultimodalMeta _,
    "q63_multimodal_decode" -> q63MultimodalDecode _,
    "q65_multimodal_frames" -> q65MultimodalFrames _,
  )

  val oracle: Map[String, String] = Map(
    "q62_multimodal_meta" -> q62Sql,
    // q63: stubbed decoder features → rows-only.
  )
}
