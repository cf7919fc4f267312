package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (the engine's declared `Aggregator[IN, BUF, OUT]` surface,
  * SURVEY §2 "UDF/UDAF/UDTF"): per-group MinHash signature over input
  * tokens, k md5-derived 32-bit hash slots.
  *
  * The same sketch is computed relationally in `i7_minhash_sig` (explode +
  * k `min` aggs); `MinHashAggSpec` asserts both agree. The Aggregator form
  * exists for callers who need the sketch as ONE typed column expression
  * (`ds.groupByKey(...).agg(MinHashAgg.toColumn)`) — e.g. to combine with
  * other typed aggregations in a single pass. Merge is element-wise min,
  * so partial aggregation and spills behave like any algebraic agg.
  *
  * Hashing matches `PipelineOps.seededHash` (first 8 md5 hex chars of
  * "j:token", base 16) so signatures are interchangeable across both
  * paths and with the DuckDB oracle dialect.
  */
object MinHashAgg extends Aggregator[String, Array[Long], Array[Long]] {
  val NumHashes = 8
  private val MaxHash = 0xFFFFFFFFL

  override def zero: Array[Long] = Array.fill(NumHashes)(MaxHash + 1)

  private def hash(j: Int, token: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$j:$token".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16)
  }

  override def reduce(buf: Array[Long], token: String): Array[Long] = {
    var j = 0
    while (j < NumHashes) {
      val h = hash(j, token)
      if (h < buf(j)) buf(j) = h
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < NumHashes) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
