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

  test("reference extensions: %f micros / %L millis translate; %s is structural") {
    // main.go:406 registers WithMicroseconds('f'), WithMilliseconds('L'),
    // WithUnixSeconds('s') — a valid reference format must not fall back.
    assert(Strftime.translate("%H:%M:%S.%f").contains("HH':'mm':'ss'.'SSSSSS"))
    assert(Strftime.translate("%H:%M:%S.%L").contains("HH':'mm':'ss'.'SSS"))
    // %s has no java.time pattern token; `format` compiles it via
    // unix_timestamp instead of falling back (asserted in the Spark spec).
    assert(Strftime.translate("%s").isEmpty)
  }

  test("Go reference layout translates to java.time") {
    assert(Strftime.translateGoLayout("2006-01-02T15:04:05")
      .contains("yyyy'-'MM'-'dd'T'HH':'mm':'ss"))
    assert(Strftime.translateGoLayout("02 Jan 2006 03:04 PM")
      .contains("dd' 'MMM' 'yyyy' 'hh':'mm' 'a"))
    // Go's trimmed-fraction tokens can't be expressed (java.time pads).
    assert(Strftime.translateGoLayout("15:04:05.999").isEmpty)
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

  test("%s / %f / %L render unix seconds, micros, millis") {
    val df = Seq("2024-03-05 07:08:09.123456").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    val got = df.select(
      Strftime.format(col("ts"), "%s").as("epoch"),
      Strftime.format(col("ts"), "%H:%M:%S.%f").as("micro"),
      Strftime.format(col("ts"), "%H:%M:%S.%L").as("milli"),
      Strftime.format(col("ts"), "ts=%s.%f").as("mixed")).head()
    val epoch = java.time.Instant.parse("2024-03-05T07:08:09Z")
      .getEpochSecond.toString
    assert(got.getString(0) == epoch)
    assert(got.getString(1) == "07:08:09.123456")
    assert(got.getString(2) == "07:08:09.123")
    assert(got.getString(3) == s"ts=$epoch.123456")
  }

  test("long-tail C tokens match glibc C-locale strftime") {
    // Expected strings generated with `LC_ALL=C TZ=UTC date` for
    // 2024-03-05 (Tue), 2024-01-01 (Mon, week-00 boundary), and
    // 2021-01-03 (Sun, ISO week 53 of the PRIOR year).
    def fmts(s: String, fmt: String): String =
      Seq(s).toDF("s").select(
        Strftime.format(col("s").cast("timestamp"), fmt)).head().getString(0)
    val tue = "2024-03-05 07:08:09"
    assert(fmts(tue, "%C") == "20")
    assert(fmts(tue, "%u %w") == "2 2")
    assert(fmts(tue, "%U %W %V") == "09 10 10")
    assert(fmts(tue, "%e|%k|%l") == " 5| 7| 7")
    assert(fmts(tue, "%r") == "07:08:09 AM")
    assert(fmts(tue, "%R") == "07:08")
    assert(fmts(tue, "%D = %x") == "03/05/24 = 03/05/24")
    assert(fmts(tue, "%X") == "07:08:09")
    assert(fmts(tue, "%c") == "Tue Mar  5 07:08:09 2024")
    assert(fmts(tue, "%v") == " 5-Mar-2024")   // lestrrat %v = %e-%b-%Y
    assert(fmts(tue, "%h") == "Mar")
    assert(fmts(tue, "a%nb%tc") == "a\nb\tc")
    val mon = "2024-01-01 00:30:00"
    assert(fmts(mon, "%u %w") == "1 1")
    assert(fmts(mon, "%U %W %V") == "00 01 01")
    assert(fmts(mon, "%e|%k|%l") == " 1| 0|12")
    assert(fmts(mon, "%r") == "12:30:00 AM")
    val sun = "2021-01-03 13:05:00"
    assert(fmts(sun, "%u %w") == "7 0")
    assert(fmts(sun, "%U %W %V") == "01 00 53")
    assert(fmts(sun, "%k|%l") == "13| 1")
    assert(fmts(sun, "%r") == "01:05:00 PM")
    // %C is minimum-width, not truncating: century 100 prints 3 digits.
    assert(fmts("10000-01-01 00:00:00", "%C") == "100")
    // A token the reference library itself rejects still falls back.
    assert(fmts(tue, "%G") == "2024-03-05T07:08:09.000000Z")
  }

  test("formatGo renders a Go layout; unsupported layout falls back") {
    val df = Seq("2024-03-05 07:08:09.123456").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    val got = df.select(
      Strftime.formatGo(col("ts"), "2006/01/02 15:04:05").as("go"),
      Strftime.formatGo(col("ts"), "15:04:05.999").as("fallback")).head()
    assert(got.getString(0) == "2024/03/05 07:08:09")
    assert(got.getString(1) == "2024-03-05T07:08:09.123456Z")
  }
}
