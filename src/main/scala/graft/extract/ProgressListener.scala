package graft.extract

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}

/** Task-level progress reporting — the Spark analog of upstream's tqdm
  * bar (pdf2dataset prints per-task progress while the Ray pool drains;
  * with the Spark UI off by harness mandate, this listener is the only
  * runtime progress signal).
  *
  * Emits `[progress] label: done/total tasks` through `sink` (stderr by
  * default) every `every`-th SUCCESSFUL task completion, plus a
  * `job done` line on each job end. `total` is the sum of submitted
  * jobs' planned task counts — an upper-bound estimate, like tqdm with
  * a growing totals bar: stages skipped via shuffle reuse keep their
  * planned tasks in the denominator, so `done` can finish below
  * `total`; the job-end line is the authoritative completion signal.
  * Failed/killed/speculative-duplicate attempts are not counted (only
  * `Success` task ends), so `done` never overshoots real work. On a
  * shared session concurrent jobs' tasks are counted too — attach
  * around a dedicated job, as [[Pipeline.extractToParquet]] does.
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

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
    if (te.reason == org.apache.spark.Success) {
      val d = done.incrementAndGet()
      if (d % every == 0) sink(s"[progress] $label: $d/${total.get()} tasks")
    }

  override def onJobEnd(je: SparkListenerJobEnd): Unit =
    sink(s"[progress] $label: job done (${done.get()}/${total.get()} tasks)")
}

object ProgressListener {
  val stderr: String => Unit = s => Console.err.println(s)
}
