package graft.tools

/** Dev tool: print one [[graft.HealthStamp]] JSON line and exit.
  *
  * The round ritual keeps needing a point-in-time host reading between
  * draws (is the window healthy enough to promote? did the fault
  * episode pass?); this makes it one command instead of a scratch
  * classpath trick:
  *
  *   sbt "runMain graft.tools.HealthProbe"        # one stamp
  *   sbt "runMain graft.tools.HealthProbe 3 20"   # 3 stamps, 20 s apart
  */
object HealthProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1
    val gapSec = if (args.length > 1) args(1).toInt else 0
    (0 until n).foreach { i =>
      if (i > 0 && gapSec > 0) Thread.sleep(gapSec * 1000L)
      println(graft.HealthStamp.json())
    }
  }
}
