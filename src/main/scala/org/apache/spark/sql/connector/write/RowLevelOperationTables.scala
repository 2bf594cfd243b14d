package org.apache.spark.sql.connector.write

import org.apache.spark.sql.connector.catalog.Table

/** [[RowLevelOperationTable]] — the wrapper Spark places around a table
  * while planning a row-level DELETE/UPDATE/MERGE — is `private[sql]`,
  * so graft's optimizer rules can't pattern-match it directly. This
  * accessor (compiled into the Spark package namespace, the standard
  * session-extension technique) exposes the wrapped table and operation
  * so [[graft.catalog.MorDeleteJoin]] can recognize a DML read over an
  * over-budget merge-on-read table.
  */
object RowLevelOperationTables {
  def unwrap(t: Table): Option[(Table, RowLevelOperation)] = t match {
    case r: RowLevelOperationTable => Some((r.table, r.operation))
    case _ => None
  }
}
