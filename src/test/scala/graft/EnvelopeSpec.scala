package graft

import org.apache.spark.sql.functions.col
import graft.operators.EnvelopeOps

/** ShortHostId derivation corner cases (reference `main.go:252-262`:
  * last `:`-segment of the partition key, `task/` / `instance/` prefixes
  * stripped; Go `strings.Split` keeps trailing empty segments).
  */
class EnvelopeSpec extends SparkTestBase {
  import spark.implicits._

  private def short(ids: String*): Seq[String] =
    ids.toDF("host_id")
      .select(EnvelopeOps.shortHostId(col("host_id")).as("s"))
      .as[String].collect().toSeq

  test("ARN, ip-address and uuid partition-key shapes") {
    assert(short(
      "arn:aws:ecs:cluster/default:task/abc123",
      "ip-address:10.0.0.7",
      "uuid:instance/0f0f-42") == Seq("abc123", "10.0.0.7", "0f0f-42"))
  }

  test("no colon: whole key is the last segment") {
    assert(short("bare-host") == Seq("bare-host"))
  }

  test("bare prefix segments strip to empty") {
    assert(short("task/", "x:task/", "instance/") == Seq("", "", ""))
  }

  test("trailing colon yields empty segment (Go strings.Split semantics)") {
    assert(short("host:") == Seq(""))
  }

  test("prefix stripped only at segment start, once") {
    assert(short("a:task/task/x", "instance/task/y") ==
      Seq("task/x", "task/y"))
  }

  test("total on arbitrary strings: non-null in, non-null out") {
    val rnd = new scala.util.Random(7)
    val raw = (1 to 300).map(_ => rnd.alphanumeric.take(rnd.nextInt(20)).mkString(
      if (rnd.nextBoolean()) ":" else "")) :+ "" :+ ":::" :+ "a::b"
    val out = raw.toDF("host_id")
      .select(EnvelopeOps.shortHostId(col("host_id")).as("s"))
      .collect()
    assert(out.forall(r => !r.isNullAt(0)), "shortHostId must never be null for non-null input")
  }
}
