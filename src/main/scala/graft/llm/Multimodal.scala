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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_multimodal_meta"   -> q62MultimodalMeta _,
    "q63_multimodal_decode" -> q63MultimodalDecode _,
  )

  val oracle: Map[String, String] = Map(
    "q62_multimodal_meta" -> q62Sql,
    // q63: stubbed decoder features → rows-only.
  )
}
