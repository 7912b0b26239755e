package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming throughput meter (the reference's MB/s statistics thread,
  * `/root/reference/src/statistics.rs:18-35`, restated as a
  * `StreamingQueryListener`): cumulative input rows plus the engine's own
  * per-batch input/processing rates — no extra work on the data path.
  *
  * Attach with `spark.streams.addListener(meter)`; read [[snapshot]] at any
  * time (thread-safe; progress events arrive asynchronously).
  */
class ThroughputMeter extends StreamingQueryListener {

  final case class Snapshot(
      batches: Long,
      totalInputRows: Long,
      lastInputRowsPerSecond: Double,
      lastProcessedRowsPerSecond: Double)

  private val batches = new AtomicLong(0)
  private val totalRows = new AtomicLong(0)
  private val lastRates = new AtomicReference[(Double, Double)]((0.0, 0.0))

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    batches.incrementAndGet()
    totalRows.addAndGet(p.numInputRows)
    val in = p.inputRowsPerSecond
    val proc = p.processedRowsPerSecond
    lastRates.set((if (in.isNaN) 0.0 else in, if (proc.isNaN) 0.0 else proc))
  }

  def snapshot: Snapshot = {
    val (in, proc) = lastRates.get()
    Snapshot(batches.get(), totalRows.get(), in, proc)
  }
}
