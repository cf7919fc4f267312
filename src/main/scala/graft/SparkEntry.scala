package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All operators live in the [[Registry]]; this object only adapts them
  * to the driver's shape.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's end-to-end pipeline (scan → envelope → JSON → template
    * render, reference `main.go:247-293`) over the events stream surrogate.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.EnvelopeOps.renderPipeline(
      Tables.load(spark, "/root/testdata/sf0.001", "events"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.id -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(o => q.id -> o)).toMap
}
