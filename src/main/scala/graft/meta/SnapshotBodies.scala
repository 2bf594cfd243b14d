package graft.meta

import org.json4s._
import org.json4s.jackson.Serialization

/** Externalized snapshot payloads.
  *
  * A version document that inlines every snapshot's file list makes a
  * commit cost O(history × files): at 100 TB (~10⁶ data files) and a
  * retained history, every commit would re-serialize gigabytes of
  * unchanged file lists, and every load would parse them back. Instead,
  * each snapshot's heavy fields — file list, per-file column stats,
  * delete files, sequence map — are written ONCE as an immutable,
  * content-addressed side document (`snap-<id>-<hash>.body.json` next
  * to the version files), and every version containing that snapshot
  * references it by name. A commit then writes one new body (the new
  * snapshot) plus a slim version document of headers — O(current
  * commit), not O(history). The same idea as Iceberg's shared manifest
  * files, adapted to this store's one-document-per-version protocol.
  *
  * Correctness does not rest on snapshots never mutating: a body is
  * re-referenced only when the in-memory snapshot's payload is the one
  * cached under that name (reference-identity fast path — `inflate`
  * installs the cached instances — with structural equality as the slow
  * path). Anything else serializes a fresh body whose name carries a
  * content hash, so replays and racing committers writing identical
  * content land idempotently under write-if-absent semantics.
  *
  * Pre-upgrade metadata (snapshots without `bodyRef`) passes through
  * both directions unchanged — old version documents stay readable, and
  * the next commit migrates them to bodies. Bodies orphaned by expired
  * history or lost CAS races are never re-referenced (content-addressed
  * names) and are left for maintenance cleanup. */
object SnapshotBodies {

  implicit private val formats: Formats = Serialization.formats(NoTypeHints)

  final case class Body(files: List[String],
                        fileStats: Map[String, List[ColStatDef]],
                        deleteFiles: List[DeleteFileDef],
                        fileSeqs: Map[String, Long])

  // (store scope + body name) → parsed body. Bodies are immutable; the
  // bound only caps memory. The cached instances ARE the ones installed
  // into inflated snapshots — that identity is the strip fast path.
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Body]()
  private def cachePut(k: String, b: Body): Unit = {
    if (cache.size > 256) cache.clear()
    cache.put(k, b)
  }

  private def same(b: Body, s: SnapshotDef): Boolean =
    ((b.files eq s.files) || b.files == s.files) &&
      ((b.fileStats eq s.fileStats) || b.fileStats == s.fileStats) &&
      ((b.deleteFiles eq s.deleteFiles) || b.deleteFiles == s.deleteFiles) &&
      ((b.fileSeqs eq s.fileSeqs) || b.fileSeqs == s.fileSeqs)

  private def hashHex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString

  /** The persisted (slim) form of `m` plus the body documents that are
    * not yet known to exist, as (relative name, text). Callers write
    * the bodies BEFORE the version CAS with create-if-absent semantics
    * and ignore already-exists — names are content-addressed, so a
    * duplicate write carries identical bytes. `scope` keys the cache
    * per store+table (two tables may share body names). */
  def strip(scope: String, m: TableMetadata)
      : (TableMetadata, Seq[(String, String)]) = {
    val out = Seq.newBuilder[(String, String)]
    val slim = m.snapshots.map { s =>
      val reusable = s.bodyRef.exists(n =>
        Option(cache.get(s"$scope/$n")).exists(same(_, s)))
      val name = s.bodyRef.filter(_ => reusable).getOrElse {
        val body = Body(s.files, s.fileStats, s.deleteFiles, s.fileSeqs)
        val json = Serialization.write(body)
        val n = s"snap-${s.snapshotId}-${hashHex(json)}.body.json"
        out += ((n, json))
        cachePut(s"$scope/$n", body)
        n
      }
      s.copy(files = Nil, fileStats = Map.empty, deleteFiles = Nil,
        fileSeqs = Map.empty, bodyRef = Some(name))
    }
    (m.copy(snapshots = slim), out.result())
  }

  /** Re-inflate a loaded slim document: resolve each `bodyRef` through
    * `read` (relative name → document text), caching parsed bodies so
    * repeated loads of a table's history parse each body once per JVM.
    * Snapshots without a ref (pre-upgrade inline metadata) pass through
    * unchanged. */
  def inflate(scope: String, m: TableMetadata,
              read: String => String): TableMetadata =
    if (m.snapshots.forall(_.bodyRef.isEmpty)) m
    else m.copy(snapshots = m.snapshots.map { s =>
      s.bodyRef match {
        case None => s
        case Some(n) =>
          val k = s"$scope/$n"
          val body = Option(cache.get(k)).getOrElse {
            val b = Serialization.read[Body](read(n))
            cachePut(k, b)
            b
          }
          s.copy(files = body.files, fileStats = body.fileStats,
            deleteFiles = body.deleteFiles, fileSeqs = body.fileSeqs)
      }
    })
}
