/*
 * Same-package accessor shim (the third of its kind in this repo, next
 * to GraftDatasets and RowLevelOperationTables): lives under Spark's
 * package ONLY because `ParquetPartitionReaderFactory.copy()` mentions
 * `private[sql]` parameter types (ParquetOptions) in its signature, so
 * the call cannot typecheck from `graft.*`. No private state is
 * accessed beyond that visibility bridge.
 */
package org.apache.spark.sql.execution.datasources.v2.parquet

import org.apache.spark.sql.connector.read.PartitionReaderFactory

/** Executor-side isolation for k-way-merged sorted runs
  * (graft.catalog.MergingRowReader): Spark 4.1's
  * `ParquetPartitionReaderFactory` carries ONE `ParquetReaderCallback`
  * per factory INSTANCE, and that callback's `advanceFile` CLOSES the
  * previously-opened file's record iterator whenever any reader built
  * by the same instance opens a new file — an early-release optimization
  * that is sound for the sequential file reads it was built for, and
  * fatal for a merge holding k interleaved live readers (each run dies
  * after its first row the moment the next run opens; SpjSpec's sorted
  * merge cases catch exactly this).
  *
  * `fresh` hands each run its own factory via case-class `copy()`: the
  * copy shares every field — crucially the ONE broadcast
  * SerializableConfiguration, so isolation costs zero extra driver
  * broadcasts (the previous design broadcast a fresh conf per FILE at
  * planning time — thousands of broadcasts per query on a big sorted
  * table) — while the constructor gives the copy its own fresh
  * callback. MUST be called on the DRIVER (planning time): the copy
  * constructor re-derives its flags from the held SQLConf, whose
  * transient config reader is null after executor-side
  * deserialization (NPE in ConfigEntry.readString otherwise). */
object GraftFactoryIsolation {
  def fresh(f: PartitionReaderFactory): PartitionReaderFactory = f match {
    case p: ParquetPartitionReaderFactory => p.copy()
    case other => other // non-parquet delegates carry no shared callback
  }
}
