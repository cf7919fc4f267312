package graft.streaming

import java.util.concurrent.atomic.AtomicBoolean

/** Throttle-backoff retry, the source-connector concern the reference
  * hard-codes around Kinesis rate limits (reference `main.go:217-243`):
  * start at 50 ms, grow ×1.5 per throttled attempt, cap at 10 s, reset on
  * success. The sleeper is injectable so tests assert the exact delay
  * sequence without sleeping.
  */
object Retry {
  val InitialDelayMs: Long = 50L
  val MaxDelayMs: Long = 10000L
  val Growth: Double = 1.5

  def nextDelay(current: Long): Long =
    math.min((current * Growth).toLong, MaxDelayMs)

  /** Run `op`, retrying while `isThrottle(e)` holds, up to `maxAttempts`.
    * Non-throttle exceptions propagate immediately (the reference treats
    * only the two throttling error codes as retryable, `main.go:225-229`).
    */
  def withBackoff[A](maxAttempts: Int,
      isThrottle: Throwable => Boolean,
      sleep: Long => Unit = Thread.sleep)(op: => A): A = {
    var delay = InitialDelayMs
    var attempt = 1
    while (true) {
      try return op
      catch {
        case e: Throwable if isThrottle(e) && attempt < maxAttempts =>
          sleep(delay)
          delay = nextDelay(delay)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Print-once error side channel (reference `main.go:245,284-286` and
  * `main.go:398,411-413`): the first render/format error is reported, the
  * rest are suppressed — the row is skipped either way. The flag is an
  * atomic CAS exactly like the reference's.
  */
final class ErrorOnce(report: String => Unit) extends Serializable {
  private val reported = new AtomicBoolean(false)
  @volatile private var suppressedCount: Long = 0L

  /** Report the first error; count the rest. Returns true iff reported. */
  def apply(msg: => String): Boolean =
    if (reported.compareAndSet(false, true)) { report(msg); true }
    else { suppressedCount += 1; false }

  def suppressed: Long = suppressedCount
  def hasReported: Boolean = reported.get()
}
