package graft

import org.scalatest.funsuite.AnyFunSuite

/** The measurement harness's own decision logic, deterministically
  * spec'd (r17, advice 3): every round's comparability argument leans
  * on the load guard's degraded label, so the label's edge cases —
  * the momentary dip inside a sustained burst, the exact deadline, a
  * host with no loadavg — are pinned with scripted samplers instead
  * of being trusted to a real clock. */
class HarnessSpec extends AnyFunSuite {

  /** scripted sampler + virtual sleep: returns (result, sleeps taken). */
  private def drive(samples: List[Double], threshold: Double = 3.0,
                    maxWaitS: Int = 600, pollS: Int = 15, confirmS: Int = 5)
      : ((Boolean, Long), List[Double]) = {
    var rest = samples
    var slept = List.empty[Double]
    val res = Bench.awaitQuiet(threshold, maxWaitS, pollS, confirmS,
      sample = () => rest match {
        case h :: t => rest = t; Some(h)
        case Nil => Some(samples.last) // script exhausted → hold last value
      },
      sleep = s => { slept = slept :+ s; s })
    (res, slept)
  }

  test("a momentary dip inside a sustained burst must NOT claim a quiet start") {
    // the r16 advice scenario: busy, one dip below threshold at a poll,
    // busy again — the single-sample guard would have started right at
    // the dip and labeled the artifact non-degraded; two-consecutive
    // demands the burst genuinely recede
    val ((degraded, waited), slept) = drive(
      List(5.0, 2.0, 5.0, 5.0, 2.0, 1.0), maxWaitS = 600)
    assert(!degraded, "the final two consecutive quiet samples admit the run")
    // after the dip (streak=1) the guard waits only confirmS, sees 5.0,
    // resets, and pays full polls again — the dip alone never admitted
    assert(slept.contains(5.0) && slept.count(_ == 15.0) >= 2,
      s"confirm gap after each dip, full polls while busy: $slept")
    assert(waited == slept.sum.toLong)
  }

  test("a never-quiet box runs degraded at EXACTLY the deadline — no overshoot") {
    val ((degraded, waited), slept) = drive(
      List(9.0), maxWaitS = 40, pollS = 15)
    assert(degraded)
    // 15 + 15 + 10 (clamped to the deadline), never 15 past it
    assert(slept == List(15.0, 15.0, 10.0), s"clamped gaps: $slept")
    assert(waited == 40L)
  }

  test("a quiet box is admitted after one confirm gap; an unreadable loadavg skips the wait") {
    val ((degraded, waited), slept) = drive(List(1.0, 1.2), maxWaitS = 600)
    assert(!degraded && slept == List(5.0) && waited == 5L,
      s"immediate quiet pays only the confirm sample: $slept")
    val none = Bench.awaitQuiet(3.0, 600, sample = () => None,
      sleep = s => fail(s"must not sleep without evidence: $s"))
    assert(none == (false, 0L))
  }

  test("loadavg vanishing MID-WAIT ends the wait unguarded, not with a crash") {
    // r17 advice: the deferring log line read l.get; a sampler that
    // returns None after a first successful read (loadavg became
    // unreadable mid-wait) reset the streak to 0 and the next log line
    // threw NoSuchElementException — crashing the bench instead of the
    // documented run-anyway posture. Mid-wait None now ends the wait
    // exactly like the initial None: no evidence, run unguarded.
    var calls = 0
    val res = Bench.awaitQuiet(3.0, 600,
      sample = () => { calls += 1; if (calls == 1) Some(9.0) else None },
      sleep = s => s)
    assert(res._1 == false, "no evidence must not label degraded")
    assert(res._2 == 15L, "one poll gap was consumed before evidence vanished")
  }

  test("a mid-run ramp self-labels: end-load at or over the admission threshold fires ramped") {
    // r18 verdict item 3: BENCH_full.7 admitted at load 2.55 and ended
    // at 10.21 under degraded:false — the artifact read as quiet. The
    // end-of-run resample labels exactly the breach cases and nothing
    // else; no-evidence stays unlabelled, like the admission guard.
    assert(Bench.ramped(Some(10.21), 3.0), "the r18 ramp case must fire")
    assert(Bench.ramped(Some(3.0), 3.0), "the admission bar itself is a breach")
    assert(!Bench.ramped(Some(2.9), 3.0), "an end-load under the bar stays unlabelled")
    assert(!Bench.ramped(None, 3.0), "no loadavg evidence stays unlabelled")
  }

  test("the dip at the LAST poll before the deadline stays degraded") {
    // burst for the whole window, dip exactly once as time runs out:
    // the confirm sample lands past the deadline-clamped budget and
    // the artifact must self-label degraded, not claim the dip
    val ((degraded, _), slept) = drive(
      List(9.0, 9.0, 9.0, 2.0, 9.0), maxWaitS = 45, pollS = 15)
    assert(degraded, s"one dip at the deadline must not admit: $slept")
  }
}
