package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL stored procedures for the catalog's maintenance verbs — the
  * Spark-4 `ProcedureCatalog` surface, so every layout/lifecycle
  * operation a table owner runs is one `CALL` away instead of an
  * API-only method (the operational dual of the reference's
  * commit-endpoint administration, `/root/reference/api/handlers/
  * tables.go:192`):
  * {{{
  *   CALL graft.system.add_files('ns.t', '/data/existing-parquet')
  *   CALL graft.system.compact(table => 'ns.t')
  *   CALL graft.system.compact_zorder('ns.t', 'c1,c2', 8)
  *   CALL graft.system.expire_snapshots('ns.t', 3, 0)
  *   CALL graft.system.rollback('ns.t', 2)
  *   CALL graft.system.create_branch('ns.t', 'audit')
  *   CALL graft.system.create_tag('ns.t', 'v1')
  *   CALL graft.system.fast_forward('ns.t', 'audit')
  *   CALL graft.system.drop_ref('ns.t', 'audit')
  * }}}
  * Each returns a one-row result (the committed snapshot / removal
  * count) through a LocalScan — metadata-scale by construction. The
  * procedures run exactly the public maintenance methods; no second
  * code path exists to drift. */
private[graft] object Procedures {

  val Names: Seq[String] = Seq("add_files", "compact", "compact_zorder",
    "expire_snapshots", "remove_orphan_files", "rewrite_position_deletes",
    "rollback", "create_branch", "create_tag", "fast_forward", "drop_ref")

  def load(cat: GraftCatalog, name: String): UnboundProcedure =
    name.toLowerCase match {
      case "add_files" => proc("add_files",
        params(("table", StringType, None), ("source_dir", StringType, None),
          // optional 'k=v,k2=v2' scope: import ONLY matching hive dirs
          // (Iceberg add_files' partition_filter)
          ("partition_filter", StringType, Some("''"))),
        StructType(Seq(StructField("snapshot_id", LongType),
          StructField("added_files", IntegerType)))) { in =>
        def strArg(i: Int): String =
          if (in.numFields <= i || in.isNullAt(i)) ""
          else in.getUTF8String(i).toString.trim
        val filter: Map[String, String] =
          strArg(2).split(",").map(_.trim).filter(_.nonEmpty).map { kv =>
            kv.split("=", 2) match {
              case Array(k, v) => k -> v
              case _ => throw new IllegalArgumentException(
                s"partition_filter entry '$kv' is not k=v")
            }
          }.toMap
        val (m, n) = cat.addFiles(identOf(in.getUTF8String(0)),
          in.getUTF8String(1).toString, filter)
        row(m.currentSnapshotId.getOrElse(-1L), n)
      }
      case "compact" => proc("compact",
        params(("table", StringType, None),
          ("target_file_count", IntegerType, Some("1")),
          // optional dir-key scope 'k=v,k2=v2' (as rendered in
          // $partitions/file paths): rewrite ONLY matching files
          ("partition", StringType, Some("''")),
          // optional size scope '64m': bin-pack ONLY files below it
          ("smaller_than", StringType, Some("''"))),
        StructType(Seq(StructField("snapshot_id", LongType),
          StructField("files", IntegerType)))) { in =>
        def strArg(i: Int): String =
          if (in.numFields <= i || in.isNullAt(i)) ""
          else in.getUTF8String(i).toString.trim
        val scope: Map[String, String] =
          strArg(2).split(",").map(_.trim).filter(_.nonEmpty).map { kv =>
            kv.split("=", 2) match {
              case Array(k, v) => k -> v
              case _ => throw new IllegalArgumentException(
                s"partition entry '$kv' is not k=v")
            }
          }.toMap
        val smaller: Option[Long] = strArg(3) match {
          case "" => None
          case v =>
            val m = "(?i)^(\\d+)\\s*([kmg]?)b?$".r
            def malformed(): Nothing = throw new IllegalArgumentException(
              s"smaller_than must be a positive byte count (optionally " +
                s"k/m/g-suffixed), got '$v'")
            v match {
              case m(digits, suffix) =>
                val shift = suffix.toLowerCase match {
                  case "" => 0; case "k" => 10; case "m" => 20; case "g" => 30
                }
                // overflow-safe: '99999999999999999g' must reject, not
                // silently become a negative threshold (r7 advice);
                // >19-digit inputs get the same message, not a raw NFE
                val base = try digits.toLong catch {
                  case _: NumberFormatException => malformed()
                }
                try {
                  val bytes = Math.multiplyExact(base, 1L << shift)
                  if (bytes <= 0L) malformed()
                  Some(bytes)
                } catch { case _: ArithmeticException => malformed() }
              case _ => malformed()
            }
        }
        val ident0 = identOf(in.getUTF8String(0))
        val m = smaller match {
          case Some(bytes) =>
            cat.compactSmallFiles(ident0, bytes, scope, intArg(in, 1, 1))
          case None if scope.isEmpty => cat.compact(ident0, intArg(in, 1, 1))
          case None => cat.compactPartition(ident0, scope, intArg(in, 1, 1))
        }
        row(m.currentSnapshotId.getOrElse(-1L),
          m.currentSnapshot.map(_.files.size).getOrElse(0))
      }
      case "compact_zorder" => proc("compact_zorder",
        params(("table", StringType, None), ("zorder_cols", StringType, None),
          ("target_file_count", IntegerType, Some("8"))),
        StructType(Seq(StructField("snapshot_id", LongType),
          StructField("files", IntegerType)))) { in =>
        val cols = in.getUTF8String(1).toString.split(",").map(_.trim).filter(_.nonEmpty)
        val m = cat.compactZOrder(identOf(in.getUTF8String(0)), cols.toSeq,
          intArg(in, 2, 8))
        row(m.currentSnapshotId.getOrElse(-1L),
          m.currentSnapshot.map(_.files.size).getOrElse(0))
      }
      case "expire_snapshots" => proc("expire_snapshots",
        params(("table", StringType, None), ("keep", IntegerType, Some("1")),
          ("grace_ms", LongType, Some("3600000"))),
        StructType(Seq(StructField("removed_files", IntegerType)))) { in =>
        row(cat.expireSnapshots(identOf(in.getUTF8String(0)),
          intArg(in, 1, 1), longArg(in, 2, 3600000L)))
      }
      case "remove_orphan_files" => proc("remove_orphan_files",
        params(("table", StringType, None),
          ("grace_ms", LongType, Some("3600000"))),
        StructType(Seq(StructField("removed_files", IntegerType)))) { in =>
        row(cat.removeOrphanFiles(identOf(in.getUTF8String(0)),
          longArg(in, 1, 3600000L)))
      }
      case "rewrite_position_deletes" => proc("rewrite_position_deletes",
        params(("table", StringType, None)),
        StructType(Seq(StructField("removed_delete_files", IntegerType),
          StructField("added_delete_files", IntegerType)))) { in =>
        val (removed, added) =
          cat.rewritePositionDeletes(identOf(in.getUTF8String(0)))
        row(removed, added)
      }
      case "rollback" => proc("rollback",
        params(("table", StringType, None), ("snapshot_id", LongType, None)),
        snapshotResult) { in =>
        row(cat.rollback(identOf(in.getUTF8String(0)), in.getLong(1))
          .currentSnapshotId.getOrElse(-1L))
      }
      case "create_branch" => proc("create_branch",
        params(("table", StringType, None), ("name", StringType, None)),
        snapshotResult) { in =>
        row(cat.createBranch(identOf(in.getUTF8String(0)),
          in.getUTF8String(1).toString)
          .refs(in.getUTF8String(1).toString).snapshotId)
      }
      case "create_tag" => proc("create_tag",
        params(("table", StringType, None), ("name", StringType, None)),
        snapshotResult) { in =>
        row(cat.createTag(identOf(in.getUTF8String(0)),
          in.getUTF8String(1).toString)
          .refs(in.getUTF8String(1).toString).snapshotId)
      }
      case "fast_forward" => proc("fast_forward",
        params(("table", StringType, None), ("branch", StringType, None)),
        snapshotResult) { in =>
        row(cat.fastForward(identOf(in.getUTF8String(0)),
          in.getUTF8String(1).toString).currentSnapshotId.getOrElse(-1L))
      }
      case "drop_ref" => proc("drop_ref",
        params(("table", StringType, None), ("name", StringType, None)),
        StructType(Seq(StructField("refs", IntegerType)))) { in =>
        row(cat.dropRef(identOf(in.getUTF8String(0)),
          in.getUTF8String(1).toString).refs.size)
      }
      case other =>
        throw new UnsupportedOperationException(
          s"procedure system.$other does not exist; known: ${Names.mkString(", ")}")
    }

  private val snapshotResult =
    StructType(Seq(StructField("snapshot_id", LongType)))

  private def identOf(t: UTF8String): Identifier = {
    val parts = t.toString.split("\\.")
    require(parts.length >= 2, s"expected namespace.table, got '$t'")
    Identifier.of(parts.init, parts.last)
  }

  // optional args may arrive null when the engine passed no default
  private def intArg(in: InternalRow, i: Int, dflt: Int): Int =
    if (in.numFields <= i || in.isNullAt(i)) dflt else in.getInt(i)
  private def longArg(in: InternalRow, i: Int, dflt: Long): Long =
    if (in.numFields <= i || in.isNullAt(i)) dflt else in.getLong(i)

  private def params(ps: (String, DataType, Option[String])*)
      : Array[ProcedureParameter] =
    ps.map { case (n, dt, d) =>
      val b = ProcedureParameter.in(n, dt)
      d.foreach(b.defaultValue)
      b.build()
    }.toArray

  private def row(vs: Any*): Array[InternalRow] =
    Array(new GenericInternalRow(vs.toArray))

  private def proc(pname: String, ps: Array[ProcedureParameter],
                   resultSchema: StructType)
                  (body: InternalRow => Array[InternalRow]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = pname
      override def description(): String = s"graft maintenance procedure $pname"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = pname
          override def description(): String = s"graft maintenance procedure $pname"
          override def parameters(): Array[ProcedureParameter] = ps
          override def isDeterministic: Boolean = false // commits mutate state
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val result = body(input)
            val scan: Scan = new LocalScan {
              override def rows(): Array[InternalRow] = result
              override def readSchema(): StructType = resultSchema
            }
            Seq(scan).asJava.iterator()
          }
        }
    }
}
