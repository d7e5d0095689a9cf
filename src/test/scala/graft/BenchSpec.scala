package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-9 regression-flag semantics: median reference +
  * env normalization + absolute floor. The r8 driver run flagged 11
  * entries vs history BEST, all run-order jitter; the median reference
  * and the confirm-retry (min kept before flagging) are what make a
  * healthy run flag ~0 while a deliberately slowed query still trips. */
class BenchSpec extends AnyFunSuite {

  test("median is the upper median of the sorted history") {
    assert(Bench.median(Seq(1.0)) == 1.0)
    assert(Bench.median(Seq(3.0, 1.0)) == 3.0)
    assert(Bench.median(Seq(5.0, 1.0, 3.0)) == 3.0)
    // jitter-robust: one inflated driver run cannot move the reference
    // the way it moved a min/best-based one
    assert(Bench.median(Seq(0.5, 0.5, 0.5, 0.5, 40.0)) == 0.5)
  }

  test("healthy timings near the median never flag") {
    // r8's false-positive shape: stable 0.5s query, driver run 1.2s
    // (uniform env inflation the calib under-captured) — with median
    // 0.55 and env factor 1.47 the normalized 0.82s is within 1.5x
    assert(!Bench.shouldFlag(rawSec = 1.2, envFactor = 1.47,
      medianSec = 0.55))
    // exactly at the 1.5x boundary: not flagged (strict >)
    assert(!Bench.shouldFlag(rawSec = 1.5, envFactor = 1.0,
      medianSec = 1.0))
  }

  test("a deliberately slowed query still trips") {
    // 10x recompute storm on a 1s-median query, healthy environment
    assert(Bench.shouldFlag(rawSec = 10.0, envFactor = 1.0,
      medianSec = 1.0))
    // still trips through a degraded-but-calibrated environment
    assert(Bench.shouldFlag(rawSec = 20.0, envFactor = 2.0,
      medianSec = 1.0))
  }

  test("sub-second jitter never flags regardless of ratio") {
    assert(!Bench.shouldFlag(rawSec = 0.9, envFactor = 1.0,
      medianSec = 0.1))
  }
}
