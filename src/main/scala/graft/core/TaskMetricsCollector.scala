package graft.core

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-task-end maxima/totals over one timed query, from the listener bus —
  * the shared measurement rig of the ScaleStress/AnnStress adversarial rows
  * (wall alone can hide a 100-GB spill; these are the numbers the scale
  * argument is graded on). Listener delivery is async: give the bus a beat
  * (the callers' Thread.sleep) before reading. */
final class TaskMetricsCollector extends SparkListener {
  @volatile var maxTaskSpill = 0L // memory+disk spill, worst single task
  @volatile var totalSpill = 0L
  @volatile var shuffleWrite = 0L
  @volatile var tasks = 0L
  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) synchronized {
      val spill = m.memoryBytesSpilled + m.diskBytesSpilled
      if (spill > maxTaskSpill) maxTaskSpill = spill
      totalSpill += spill
      shuffleWrite += m.shuffleWriteMetrics.bytesWritten
      tasks += 1
    }
  }
  def reset(): Unit = synchronized {
    maxTaskSpill = 0L; totalSpill = 0L; shuffleWrite = 0L; tasks = 0L
  }
}
