package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: an id from SURVEY.md §2, a DataFrame builder
  * over a scale-factor directory, and (when SQL-expressible) a hand-written
  * DuckDB oracle that must hash-match the builder's output.
  *
  * Determinism contract (SURVEY.md §7): every oracled query ends in a
  * total-order ORDER BY; float aggregates are rounded or computed in
  * DECIMAL; timestamps are emitted as TIMESTAMP_NTZ so both engines write
  * naive microsecond values; no MapType or raw float-array output columns.
  * DECIMAL is an INTERNAL type only — exact sums run in decimal but every
  * OUTPUT column is cast to double, because a decimal output stringifies
  * scale-padded ("61309.40") on the parquet side while the DuckDB oracle
  * yields a float ("61309.4"), failing the driver's value-hash compare.
  */
final case class Q(
    id: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Registry {
  import graft.operators._

  lazy val all: Seq[Q] =
    EnvelopeOps.qs ++ RelationalOps.qs ++ StreamingOps.qs ++ LlmOps.qs ++ PipelineOps.qs

  lazy val byId: Map[String, Q] = all.map(q => q.id -> q).toMap
}
