ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kinesislogwatcherspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver json-parses the LAST line of `sbt "runMain graft.Bench"`
// stdout; sbt's `[success] Total time: ...` banner printed AFTER the
// app's compact JSON trailer is exactly why round 19's bench parsed
// null (VERDICT r20 ask #8). Suppress the banner globally so the
// trailer is the final stdout line on every driver run.
showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Heap default: the all-registry Bench/Verify runs thrash GC once the
// suite grows — measured at 193 queries / sf1: a 24g heap inflated the
// pair-family in-suite 4-13x (i70 182 s vs 13 s isolated, i67 30 s vs
// 1.5 s) purely from accumulated shuffle+broadcast residue; at 48g the
// same draw is 0.94x the healthy reference. But a flat 48g would fail
// JVM startup on any box under ~64 GiB (ADVICE r13), so the default is
// derived: 40% of MemTotal, capped at the bench box's 48g, floored at
// 4g — the 128 GiB runner still gets 48g, a 16 GiB laptop gets 6g and
// `sbt test` (small SFs) runs fine there. SPARK_DRIVER_MEM overrides
// for explicit sizing; the one-JVM local[32] driver stands in for 32
// executors that would each get their own heap on a real cluster.
val driverMem: String = sys.env.getOrElse("SPARK_DRIVER_MEM", {
  val memTotalKb =
    try scala.io.Source.fromFile("/proc/meminfo").getLines()
      .collectFirst { case l if l.startsWith("MemTotal:") =>
        l.trim.split("\\s+")(1).toLong }.getOrElse(0L)
    catch { case _: Throwable => 0L }
  val gib = math.max(4L, math.min(48L, memTotalKb * 2 / 5 / (1024L * 1024L)))
  s"${gib}g"
})
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem",
)
