package graft.util

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Runtime stage/shuffle meter for the perf probes: counts completed
  * stages and sums shuffle read/write bytes between [[reset]] and
  * [[snapshot]]. Plan-level explains cannot show what AQE +
  * ReuseExchange actually execute (and the plan-audit mode erases
  * checkpoint boundaries that change the runtime shape), so A/B
  * probes read THIS — the executed truth — next to wall time.
  * Listener events are asynchronous; [[snapshot]] waits for the
  * listener bus to drain. */
final class StageMeter(sc: SparkContext) extends SparkListener {
  private val stages = new AtomicInteger(0)
  private val shuffleWrite = new AtomicLong(0L)
  private val shuffleRead = new AtomicLong(0L)

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    stages.incrementAndGet()
    val m = e.stageInfo.taskMetrics
    if (m != null) {
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
    }
  }

  sc.addSparkListener(this)

  def reset(): Unit = {
    flush()
    stages.set(0); shuffleWrite.set(0L); shuffleRead.set(0L)
  }

  /** (stages, shuffleWriteBytes, shuffleReadBytes) since reset. */
  def snapshot(): (Int, Long, Long) = {
    flush()
    (stages.get, shuffleWrite.get, shuffleRead.get)
  }

  private def flush(): Unit =
    try { // private[spark] waitUntilEmpty is not callable; post a
      // barrier job instead: by the time a fresh 1-task job's stage
      // completion is observed, prior events are drained (FIFO bus)
      val before = stages.get
      sc.parallelize(Seq(1), 1).count()
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (stages.get <= before && System.nanoTime() < deadline)
        Thread.sleep(10)
      stages.decrementAndGet() // do not bill the barrier stage
      ()
    } catch { case _: Throwable => () }
}
