package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed envelope for the stream surrogate table (`events`).
  *
  * Mirrors the reference's record envelope (reference `main.go:264-279`):
  * `event_id` ≅ SequenceNumber, `ts` ≅ ApproximateArrivalTimestamp,
  * `user_id` ≅ partition key, `props` ≅ the dynamic JSON payload (`Log`).
  */
final case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String
)

/** Parquet-backed table access for the driver's test data.
  *
  * Every table is a plain columnar scan — Catalyst handles column pruning
  * and filter pushdown, so callers should express projections/predicates
  * declaratively on the returned DataFrame rather than pre-materializing.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    load(spark, dir, "events").as[Event]
  }
}
