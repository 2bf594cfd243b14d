package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Windows.queries ++ ops.Scalars.queries ++
      ops.CatalogQueries.queries ++ ops.Extended.queries ++
      llm.Dedup.queries ++ llm.Similarity.queries ++
      llm.TextAnalysis.queries ++ llm.Multimodal.queries ++
      llm.Curation.queries ++ stream.Streaming.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++ ops.Windows.oracle ++ ops.Scalars.oracle ++
      ops.CatalogQueries.oracle ++ ops.Extended.oracle ++
      llm.Dedup.oracle ++ llm.Similarity.oracle ++
      llm.TextAnalysis.oracle ++ llm.Multimodal.oracle ++
      llm.Curation.oracle ++ stream.Streaming.oracle
}
