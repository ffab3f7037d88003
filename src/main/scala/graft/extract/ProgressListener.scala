package graft.extract

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

/** Task-level progress reporting — the Spark analog of upstream's tqdm
  * bar (pdf2dataset prints per-task progress while the Ray pool drains;
  * with the Spark UI off by harness mandate, this listener is the only
  * runtime progress signal).
  *
  * Counts every task the session finishes while attached and emits
  * `[progress] label: done/total tasks` through `sink` (stderr by
  * default) every `every`-th completion AND on the task that reaches the
  * current total, so short runs always print a final line. `total` grows
  * as jobs are submitted — like tqdm with a growing totals bar; on a
  * shared session concurrent jobs' tasks are counted too (attach around
  * a dedicated job, as [[Pipeline.extractToParquet]] does).
  *
  * At corpus scale pass `every` ≈ total/1000: a 100 TB run is millions
  * of tasks and a line per task is log spam, not progress.
  */
final class ProgressListener(label: String,
    sink: String => Unit = ProgressListener.stderr,
    every: Int = 1) extends SparkListener {
  require(every >= 1, s"every must be >= 1, got $every")
  private val total = new java.util.concurrent.atomic.AtomicLong
  private val done = new java.util.concurrent.atomic.AtomicLong

  override def onJobStart(js: SparkListenerJobStart): Unit =
    total.addAndGet(js.stageInfos.map(_.numTasks.toLong).sum)

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val d = done.incrementAndGet()
    val t = total.get()
    if (d % every == 0 || d == t)
      sink(s"[progress] $label: $d/$t tasks")
  }
}

object ProgressListener {
  val stderr: String => Unit = s => Console.err.println(s)
}
