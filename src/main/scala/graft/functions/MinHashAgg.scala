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
  * Hashing matches `PipelineOps.minhashSig`: TWO md5 digests per token
  * ("0:token" / "1:token"), each sliced into four 32-bit big-endian
  * words — hash slot j is word j%4 of digest j/4 — so signatures are
  * interchangeable across both paths and with the DuckDB oracle dialect.
  */
object MinHashAgg extends Aggregator[String, Array[Long], Array[Long]] {
  val NumHashes = 8
  private val MaxHash = 0xFFFFFFFFL

  override def zero: Array[Long] = Array.fill(NumHashes)(MaxHash + 1)

  /** The 8 hash slots for one token: digests md5("0:"+t), md5("1:"+t),
    * each read as four consecutive unsigned 32-bit big-endian words
    * (≡ 8-hex-char slices of the concatenated hex string).
    */
  private def hashes(token: String): Array[Long] = {
    val out = new Array[Long](NumHashes)
    var seed = 0
    while (seed < 2) {
      val d = MessageDigest.getInstance("MD5")
        .digest(s"$seed:$token".getBytes("UTF-8"))
      var w = 0
      while (w < 4) {
        val o = w * 4
        out(seed * 4 + w) =
          ((d(o) & 0xFFL) << 24) | ((d(o + 1) & 0xFFL) << 16) |
            ((d(o + 2) & 0xFFL) << 8) | (d(o + 3) & 0xFFL)
        w += 1
      }
      seed += 1
    }
    out
  }

  override def reduce(buf: Array[Long], token: String): Array[Long] = {
    val hs = hashes(token)
    var j = 0
    while (j < NumHashes) {
      if (hs(j) < buf(j)) buf(j) = hs(j)
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
