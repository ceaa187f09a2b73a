package graft.core

/** Host-CPU-steal sampling around timed measurement windows.
  *
  * This VM is a guest whose host steals 27-46% of CPU under saturation
  * (observed round 16: byte-identical shuffle, 3.3x wall swing). A wall-time
  * number without a concurrent steal sample is unadjudicable: three separate
  * round artifacts (r14, r16) read as regressions until idle re-runs proved
  * them noise. The fix is to make every measurement self-adjudicating: read
  * the aggregate `cpu` line of /proc/stat before and after the window and
  * report the steal share of total jiffies elapsed IN that window.
  *
  * Pure driver-side file read — zero Spark jobs, ~microseconds per snapshot.
  * Fields of the `cpu` line (after the label): user nice system idle iowait
  * irq softirq steal guest guest_nice; steal is index 7 zero-based.
  */
object StealSampler {
  /** (stealJiffies, totalJiffies) since boot, or None off-Linux / unreadable. */
  def snapshot(): Option[(Long, Long)] =
    snapshotIo().map { case (s, _, t) => (s, t) }

  /** (stealJiffies, iowaitJiffies, totalJiffies) since boot, or None
    * off-Linux / unreadable. iowait (col 5 of the `cpu` line) is CPU-idle
    * time with outstanding disk I/O: the noise class the steal column is
    * blind to (r17 VERDICT: `t_pack_sequences` 7.7x over its floor at
    * steal≈0 while the same binary hit the floor minutes later — co-tenant
    * I/O contention shows here, not in steal). */
  def snapshotIo(): Option[(Long, Long, Long)] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        src.getLines().find(_.startsWith("cpu ")).map { line =>
          val t = line.trim.split("\\s+").drop(1).map(_.toLong)
          (if (t.length > 7) t(7) else 0L, if (t.length > 4) t(4) else 0L, t.sum)
        }
      } finally src.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Steal percentage over the window [before, after]; -1.0 when either
    * snapshot failed or no jiffies elapsed (sub-tick window).
    */
  def pct(before: Option[(Long, Long)], after: Option[(Long, Long)]): Double =
    (before, after) match {
      case (Some((s0, t0)), Some((s1, t1))) if t1 > t0 =>
        100.0 * (s1 - s0).toDouble / (t1 - t0).toDouble
      case _ => -1.0
    }

  /** (stealPct, iowaitPct) over the window [before, after]; (-1, -1) when
    * either snapshot failed or no jiffies elapsed. Same window semantics as
    * [[pct]] — both shares of the SAME total-jiffy denominator. */
  def pctIo(before: Option[(Long, Long, Long)],
            after: Option[(Long, Long, Long)]): (Double, Double) =
    (before, after) match {
      case (Some((s0, w0, t0)), Some((s1, w1, t1))) if t1 > t0 =>
        (100.0 * (s1 - s0).toDouble / (t1 - t0).toDouble,
          100.0 * (w1 - w0).toDouble / (t1 - t0).toDouble)
      case _ => (-1.0, -1.0)
    }

  /** Run `body`, returning (result, stealPctDuringBody). */
  def measure[A](body: => A): (A, Double) = {
    val b = snapshot()
    val r = body
    (r, pct(b, snapshot()))
  }
}
