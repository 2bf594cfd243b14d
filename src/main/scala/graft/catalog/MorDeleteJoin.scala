package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit, max}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Distributed merge-on-read delete application for tables whose live
  * equality-delete files exceed the broadcast-class byte budget
  * ([[MergeOnRead.byteBudget]]).
  *
  * Under the budget the scan collects the delete keys once on the
  * driver and ships them in the reader factory — cheap, no extra
  * shuffle. Past it that collect would hold gigabytes of boxed keys on
  * the driver, so this rule rewrites the relation BEFORE scan planning
  * into plain relational algebra the engine already distributes:
  *
  * {{{
  *   Union(
  *     clean-files relation,                       // vectorized, untouched
  *     Project(drop seq,
  *       Join(LeftAnti,
  *         Union(per-sequence dirty-file relations // + lit(file seq)
  *               ...),
  *         Aggregate(keys -> max(delete seq),      // delete files as a
  *                   delete-file parquet scan),    // DISTRIBUTED frame
  *         keys equal AND max-delete-seq > file-seq)))
  * }}}
  *
  * Sequence scoping (a delete applies only to rows of files added at a
  * STRICTLY lower sequence) becomes the join's non-equi conjunct: each
  * dirty-file relation is tagged with its constant added-sequence, the
  * delete side reduces to one `max(sequence)` row per key, and a data
  * row dies iff its key was deleted at a higher sequence. Files no
  * delete can touch bypass the join entirely and keep their vectorized
  * columnar path. Delete keys never exist on the driver; Catalyst plans
  * the anti join like any other (AQE, codegen, skew handling).
  *
  * Installed by [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions=graft.functions.GraftExtensions`) — the same
  * deployment story as other lakehouse engines' session extensions.
  */
object MorDeleteJoin extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case rel: DataSourceV2Relation => graftOf(rel) match {
      case Some(t) if t.morOverBudget =>
        val wantsMeta = rel.output.exists(a =>
          PosDelta.names.contains(a.name) &&
            !t.schema().fieldNames.contains(a.name))
        val flavors = t.liveDeleteFiles.map(_.keyFieldIds.isEmpty).distinct
        if (flavors.size > 1) {
          // mixed flavors (writers never produce this; an identifier-
          // fields flip mid-life could — alterTable refuses that, this
          // guards a hand-edited metadata file): NEITHER rewrite applies
          // every delete, so fall through to the scan's budget refusal
          // rather than silently resurrecting the other flavor's rows
          rel
        } else if (t.liveDeleteFiles.forall(_.keyFieldIds.nonEmpty)) {
          // a coordinate query over an EQUALITY table has no join shape
          // here (the subsets carry no metadata columns) — fall through
          // to the scan's own clear refusal, never mis-zip outputs
          if (wantsMeta) rel else rewrite(rel, t)
        } else rewritePos(rel, t, wantsMeta)
      case _ => rel
    }
  }

  /** The Graft table behind a relation this rule may rewrite: a plain
    * read, or the matched-row read of a DELTA row-level command (DML
    * wraps the table in [[RowLevelOperationTable]], so without this arm
    * an over-budget DELETE/UPDATE/MERGE dies at scan build). The delta
    * read only needs a correct current-state frame — any equivalent
    * plan will do. The COPY-ON-WRITE path is deliberately excluded: its
    * write side correlates with the scan's matched files, which this
    * rewrite would sever. */
  private def graftOf(rel: DataSourceV2Relation): Option[GraftTable] =
    rel.table match {
      case t: GraftTable => Some(t)
      case other =>
        org.apache.spark.sql.connector.write.RowLevelOperationTables
          .unwrap(other) match {
            case Some((g: GraftTable, _: GraftDeltaOperation)) => Some(g)
            case Some((g: GraftTable, _: GraftPositionDeltaOperation)) => Some(g)
            case _ => None
          }
    }

  /** A column name absent from the data schema (suffix-extended on the
    * astronomically unlikely collision). */
  private def fresh(base: String, schema: StructType): String = {
    var n = base
    while (schema.fieldNames.contains(n)) n = n + "_"
    n
  }

  private def rewrite(rel: DataSourceV2Relation, t: GraftTable): LogicalPlan = {
    val spark = SparkSession.active
    val schema = t.schema()
    val seqCol = fresh("__graft_file_seq", schema)
    val delSeqCol = fresh("__graft_delete_seq", schema)
    val deletes = t.liveDeleteFiles
    val maxDelSeq = deletes.map(_.seq).max
    val rels = t.effectiveRelFiles(rel.options)
    // a file is join-relevant iff some delete was committed at a higher
    // sequence than its own added-sequence; the rest keep the plain
    // vectorized scan
    val (dirty, clean) = rels.partition(r => t.morFileSeq(r) < maxDelSeq)

    // the from-version window (if any) is already baked into the subset
    // file lists — the subset relations must not re-apply it
    def subsetRel(files: Seq[String]): DataSourceV2Relation =
      DataSourceV2Relation.create(t.fileSubsetTable(files), rel.catalog,
        rel.identifier, stripped(rel.options))

    def restoreOutput(p: LogicalPlan): LogicalPlan =
      Project(rel.output.zip(p.output).map { case (o, n) =>
        Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier,
          explicitMetadata = Some(o.metadata))
      }, p)

    if (dirty.isEmpty) return restoreOutput(subsetRel(rels))

    // dirty side: one relation per distinct added-sequence, each tagged
    // with that sequence as a literal column
    val dirtyUnion = {
      val plans: Seq[LogicalPlan] = dirty.groupBy(t.morFileSeq).toSeq
        .sortBy(_._1).map { case (s, files) =>
          val r = subsetRel(files)
          Project(r.output :+ Alias(Literal(s), seqCol)(), r)
        }
      if (plans.size == 1) plans.head else Union(plans)
    }

    val dataDir = t.store.dataDir(t.ns, t.table)

    // one anti join per distinct identifier-field set (almost always one)
    val joined = deletes.groupBy(_.keyFieldIds).toSeq
      .sortBy(_._1.mkString(","))
      .foldLeft(dirtyUnion) { case (left, (keyIds, dfs)) =>
        val keyNames = keyIds.map(MergeOnRead.nameOfFieldId(schema, _))
        val keySchema = StructType(keyNames.map(n =>
          schema.fields(schema.fieldIndex(n))))
        // delete-file reads resolve key columns by field id (rename-
        // proof), scoped to this read via option
        val delDf = dfs.groupBy(_.seq).toSeq.sortBy(_._1).map {
          case (dseq, files) =>
            GraftTable.idReader(spark).schema(keySchema)
              .parquet(files.map(f => s"$dataDir/${f.path}"): _*)
              .withColumn(delSeqCol, lit(dseq))
        }.reduceLeft(_ unionByName _)
          .groupBy(keyNames.map(col): _*)
          .agg(max(col(delSeqCol)).as(delSeqCol))
        val right = delDf.queryExecution.analyzed
        val lKeys = keyNames.map(n => left.output.find(_.name == n).get)
        val rKeys = keyNames.map(n => right.output.find(_.name == n).get)
        val cond = (lKeys.zip(rKeys).map { case (l, r) =>
            EqualTo(l, r): Expression
          } :+ (GreaterThan(right.output.find(_.name == delSeqCol).get,
            left.output.find(_.name == seqCol).get): Expression)).reduce(And)
        Join(left, right, LeftAnti, Some(cond), JoinHint.NONE)
      }

    val noSeq = Project(joined.output.filterNot(_.name == seqCol), joined)
    val combined =
      if (clean.isEmpty) noSeq
      else Union(Seq(subsetRel(clean): LogicalPlan, noSeq))
    restoreOutput(combined)
  }

  /** The position-flavored twin of [[rewrite]]: an over-budget set of
    * POSITION-delete files applies as a distributed left-anti join on
    * the physical row coordinate. Files no delete names keep their
    * vectorized scan; marked files read WITH `_graft_file`/`_graft_pos`
    * (the [[PosDeltaScan]] surface — whole-file counting partitions)
    * and anti-join the delete frames on (file, pos). No sequence
    * conjunct: a position delete names its exact target file, and
    * re-inserted rows land in new files. A row-level command's
    * matched-row read (rowId = the coordinate pair) keeps its metadata
    * columns through the join; a plain read projects them away. */
  private def rewritePos(rel: DataSourceV2Relation, t: GraftTable,
                         wantsMeta: Boolean): LogicalPlan = {
    val spark = SparkSession.active
    val dataDir = t.store.dataDir(t.ns, t.table)
    val deletes = t.liveDeleteFiles
    val rels = t.effectiveRelFiles(rel.options)
    // wantsMeta: the read asks for the coordinates themselves (DML
    // matched-row scan) rather than only data columns (plain query)
    val (dirty, clean) = rels.partition(t.posMarkedFiles)

    def subsetRel(files: Seq[String], withMeta: Boolean): DataSourceV2Relation = {
      val r = DataSourceV2Relation.create(t.fileSubsetTable(files), rel.catalog,
        rel.identifier, stripped(rel.options))
      if (withMeta) r.withMetadataColumns() else r
    }
    def restoreOutput(p: LogicalPlan): LogicalPlan =
      Project(rel.output.zip(p.output).map { case (o, n) =>
        Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier,
          explicitMetadata = Some(o.metadata))
      }, p)

    if (dirty.isEmpty) return restoreOutput(subsetRel(rels, wantsMeta))

    val dirtyRel = subsetRel(dirty, withMeta = true)
    val fileAttr = dirtyRel.output.find(_.name == PosDelta.FileCol).get
    val posAttr = dirtyRel.output.find(_.name == PosDelta.PosCol).get
    val delFrame = spark.read.schema(PosDelta.deleteFileSchema)
      .parquet(deletes.map(d => s"$dataDir/${d.path}"): _*)
    val right = delFrame.queryExecution.analyzed
    val cond = And(
      EqualTo(fileAttr, right.output.find(_.name == "file").get),
      EqualTo(posAttr, right.output.find(_.name == "pos").get))
    val joined = Join(dirtyRel, right, LeftAnti, Some(cond), JoinHint.NONE)
    val dirtySide: LogicalPlan =
      if (wantsMeta) joined
      else Project(joined.output.filterNot(a =>
        PosDelta.names.contains(a.name) &&
          !t.schema().fieldNames.contains(a.name)), joined)
    val combined =
      if (clean.isEmpty) dirtySide
      else Union(Seq(subsetRel(clean, wantsMeta): LogicalPlan, dirtySide))
    restoreOutput(combined)
  }

  /** The options map minus the incremental-window key the subsets have
    * already absorbed. */
  private def stripped(options: CaseInsensitiveStringMap)
      : CaseInsensitiveStringMap = {
    val m = new java.util.HashMap[String, String](options.asCaseSensitiveMap())
    m.remove("from-version")
    new CaseInsensitiveStringMap(m)
  }
}
