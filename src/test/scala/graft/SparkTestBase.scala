package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM; sbt forks once). */
object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session

  /** Order-insensitive row comparison on stringified cells. */
  def rowSet(df: DataFrame): Set[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).map(_.toSeq).toSet

  def assertSameRows(got: DataFrame, want: DataFrame): Unit = {
    val g = rowSet(got); val w = rowSet(want)
    val missing = w -- g; val extra = g -- w
    assert(missing.isEmpty && extra.isEmpty,
      s"row mismatch: missing=${missing.take(3)} extra=${extra.take(3)} " +
        s"(got ${g.size} rows, want ${w.size})")
  }
}
