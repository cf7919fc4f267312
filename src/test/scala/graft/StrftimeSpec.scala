package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.functions.Strftime

/** Token translation + fallback semantics of the template-scope strftime
  * (reference `main.go:400-416`: C tokens in; unsupported format falls
  * back to RFC3339, `main.go:410-415`).
  */
class StrftimeSpec extends AnyFunSuite {

  test("common token translations (literals come out single-quoted)") {
    assert(Strftime.translate("%Y-%m-%d").contains("yyyy'-'MM'-'dd"))
    assert(Strftime.translate("%H:%M:%S").contains("HH':'mm':'ss"))
    assert(Strftime.translate("%Y-%m-%dT%H:%M:%S")
      .contains("yyyy'-'MM'-'dd'T'HH':'mm':'ss"))
    assert(Strftime.translate("%Y/%m/%d %H:%M").contains("yyyy'/'MM'/'dd' 'HH':'mm"))
    assert(Strftime.translate("%F %T").contains("yyyy-MM-dd' 'HH:mm:ss"))
  }

  test("%% renders a literal percent") {
    assert(Strftime.translate("100%%").contains("'100%'"))
  }

  test("alphabetic literals are quoted for java.time") {
    // An unquoted 'T' would be interpreted as a pattern letter and throw.
    assert(Strftime.translate("at %H").contains("'at 'HH"))
  }

  test("unsupported token falls back (translate = None)") {
    assert(Strftime.translate("%Q").isEmpty)
    assert(Strftime.translate("%Y %N").isEmpty)
  }

  test("translate is total: never throws on arbitrary input") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val s = rnd.nextString(rnd.nextInt(30))
      Strftime.translate(s) // must not throw, may be None
    }
    // trailing bare '%' is literal (no token char follows)
    assert(Strftime.translate("%").contains("'%'"))
  }
}

class StrftimeSparkSpec extends SparkTestBase {
  import spark.implicits._

  test("format applies translated pattern; fallback is RFC3339-micros") {
    // String cast parses in the UTC session TZ, so rendering roundtrips
    // regardless of the JVM default zone.
    val df = Seq("2024-03-05 07:08:09.123456").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    val got = df.select(
      Strftime.format(col("ts"), "%Y-%m-%dT%H:%M:%S").as("iso"),
      Strftime.format(col("ts"), "%Q").as("fallback"),
      Strftime.format(col("ts"), "%d/%m/%y").as("uk")).head()
    assert(got.getString(0) == "2024-03-05T07:08:09")
    assert(got.getString(1) == "2024-03-05T07:08:09.123456Z")
    assert(got.getString(2) == "05/03/24")
  }
}
