package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{ErrorOnce, Retry}

class RetrySpec extends AnyFunSuite {

  private final class Throttled extends RuntimeException("throttled")

  test("backoff sequence: 50ms, x1.5 growth, 10s cap") {
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val out = Retry.withBackoff[Int](
      maxAttempts = 20,
      isThrottle = _.isInstanceOf[Throttled],
      sleep = delays += _) {
      calls += 1
      if (calls < 20) throw new Throttled else 42
    }
    assert(out == 42 && calls == 20)
    assert(delays.take(4) == Seq(50L, 75L, 112L, 168L))
    assert(delays.last <= Retry.MaxDelayMs)
    assert(delays.count(_ == Retry.MaxDelayMs) >= 1, s"cap must bind: $delays")
  }

  test("non-throttle exceptions propagate immediately") {
    var calls = 0
    intercept[IllegalArgumentException] {
      Retry.withBackoff[Int](10, _.isInstanceOf[Throttled], _ => ()) {
        calls += 1; throw new IllegalArgumentException("fatal")
      }
    }
    assert(calls == 1)
  }

  test("throttle beyond maxAttempts rethrows the throttle error") {
    var calls = 0
    intercept[Throttled] {
      Retry.withBackoff[Int](3, _.isInstanceOf[Throttled], _ => ()) {
        calls += 1; throw new Throttled
      }
    }
    assert(calls == 3)
  }

  test("error side channel reports once, counts the rest") {
    val msgs = scala.collection.mutable.ArrayBuffer.empty[String]
    val once = new ErrorOnce(msgs += _)
    assert(once("first failure"))
    assert(!once("second failure"))
    assert(!once("third failure"))
    assert(msgs == Seq("first failure"))
    assert(once.suppressed == 2 && once.hasReported)
  }

  test("error side channel does not evaluate suppressed messages") {
    val once = new ErrorOnce(_ => ())
    once("first")
    var evaluated = false
    once { evaluated = true; "expensive render of the error" }
    assert(!evaluated, "suppressed messages must stay lazy")
  }
}
