package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.StealSampler

/** The steal sampler is the bench artifact's self-adjudication mechanism
  * (BENCH_rN.json per-pass steal_pct): its math must be exact on known
  * windows and its failure modes must report -1, never throw or fabricate.
  */
class StealSamplerSpec extends AnyFunSuite {

  test("pct computes steal share of elapsed jiffies") {
    val before = Some((100L, 1000L))
    val after = Some((140L, 1200L)) // 40 steal of 200 elapsed
    assert(math.abs(StealSampler.pct(before, after) - 20.0) < 1e-9)
  }

  test("pct is -1 on missing snapshots or a sub-tick window") {
    assert(StealSampler.pct(None, Some((1L, 2L))) == -1.0)
    assert(StealSampler.pct(Some((1L, 2L)), None) == -1.0)
    // no jiffies elapsed: a zero-width window proves nothing — flag it
    assert(StealSampler.pct(Some((5L, 100L)), Some((5L, 100L))) == -1.0)
    // clock went backwards (snapshot mixup): also -1, not a negative pct
    assert(StealSampler.pct(Some((5L, 200L)), Some((5L, 100L))) == -1.0)
  }

  test("snapshot reads a live (steal, total) pair on this Linux host") {
    val s = StealSampler.snapshot()
    assert(s.isDefined, "/proc/stat should be readable here")
    val (steal, total) = s.get
    assert(steal >= 0L)
    assert(total > 0L)
    assert(steal <= total)
  }

  test("pctIo computes both steal and iowait shares of elapsed jiffies") {
    val before = Some((100L, 50L, 1000L))
    val after = Some((140L, 60L, 1200L)) // 40 steal + 10 iowait of 200 elapsed
    val (steal, iowait) = StealSampler.pctIo(before, after)
    assert(math.abs(steal - 20.0) < 1e-9)
    assert(math.abs(iowait - 5.0) < 1e-9)
    // failure modes mirror pct: missing snapshot / zero-width window → (-1, -1)
    assert(StealSampler.pctIo(None, after) == ((-1.0, -1.0)))
    assert(StealSampler.pctIo(before, None) == ((-1.0, -1.0)))
    assert(StealSampler.pctIo(Some((5L, 5L, 100L)), Some((5L, 5L, 100L))) == ((-1.0, -1.0)))
  }

  test("snapshotIo reads a live (steal, iowait, total) triple on this host") {
    val s = StealSampler.snapshotIo()
    assert(s.isDefined, "/proc/stat should be readable here")
    val (steal, iowait, total) = s.get
    assert(steal >= 0L && iowait >= 0L)
    assert(total > 0L)
    assert(steal + iowait <= total)
    // the legacy pair view must agree with the triple
    val p = StealSampler.snapshot()
    assert(p.isDefined)
    assert(p.get._1 >= steal) // monotone counters, read later
  }

  test("measure wraps a body and returns a bounded pct") {
    val (result, pct) = StealSampler.measure {
      // burn a few ms so the window usually spans at least one tick; the
      // assertion still tolerates the sub-tick -1 outcome
      val end = System.nanoTime() + 20_000_000L
      var acc = 0L
      while (System.nanoTime() < end) acc += 1
      acc
    }
    assert(result > 0L)
    assert(pct == -1.0 || (pct >= 0.0 && pct <= 100.0))
  }
}
