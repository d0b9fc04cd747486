package graft.observe

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming leg of the observability surface ([[RunMetrics]] covers batch
  * actions): a `StreamingQueryListener` that keeps a bounded per-query
  * history of batch progress — input rows, processing throughput, batch
  * wall, and STATE-STORE growth (rows + memory), the number that decides
  * whether a long-running stateful query survives the month or OOMs in
  * week two. DEPLOY.md's streaming-state sizing formulas give the expected
  * ceilings; this listener measures the actuals against them on a live
  * query, cluster or local.
  *
  * Usage:
  * {{{
  *   val sm = StreamMetrics.attach(spark)
  *   val q = df.writeStream...start()
  *   ...
  *   val r = sm.report(q.name)   // or report() for all queries
  *   if (r.exists(_.lastStateRows > expectedCeiling)) alert(...)
  *   StreamMetrics.detach(spark, sm)
  * }}}
  *
  * The listener is passive and driver-side only (progress events are
  * already produced by every streaming query); attach/detach cost nothing
  * on the data path. History is capped per query (default 256 batches,
  * oldest dropped) so a months-long query cannot grow driver memory.
  */
final class StreamMetrics private (historyPerQuery: Int)
    extends StreamingQueryListener {

  final case class Batch(
      queryName: String,
      batchId: Long,
      timestamp: String,
      numInputRows: Long,
      inputRowsPerSec: Double,
      processedRowsPerSec: Double,
      batchDurationMs: Long,
      stateRows: Long,
      stateMemBytes: Long,
      watermark: String)

  /** Aggregated view of one query's captured history. */
  final case class Report(
      queryName: String,
      batches: Int,
      totalInputRows: Long,
      maxBatchDurationMs: Long,
      p50BatchDurationMs: Long,
      lastStateRows: Long,
      maxStateMemBytes: Long,
      stateRowsGrowthPerBatch: Double)

  private val history =
    mutable.LinkedHashMap.empty[String, mutable.ArrayDeque[Batch]]

  // a restart under the same name is a NEW run (often a fresh checkpoint):
  // mixing its batches with the old run's would double-count totalInputRows
  // and span stateRowsGrowthPerBatch across the state reset
  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = synchronized {
    history.remove(Option(e.name).getOrElse(e.id.toString)); ()
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = synchronized {
    val p = e.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    val stateMem = p.stateOperators.map(_.memoryUsedBytes).sum
    val dur = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue).getOrElse(0L)
    val buf = history.getOrElseUpdate(name, mutable.ArrayDeque.empty)
    buf.append(Batch(name, p.batchId, p.timestamp, p.numInputRows,
      p.inputRowsPerSecond, p.processedRowsPerSecond, dur, stateRows,
      stateMem, Option(p.eventTime.get("watermark")).getOrElse("")))
    while (buf.length > historyPerQuery) buf.removeHead()
  }

  def batches(queryName: String): Seq[Batch] = synchronized {
    history.get(queryName).map(_.toSeq).getOrElse(Seq.empty)
  }

  def report(): Seq[Report] = synchronized { history.keys.toSeq }.flatMap(report)

  def report(queryName: String): Option[Report] = {
    val bs = batches(queryName)
    if (bs.isEmpty) None
    else {
      val durs = bs.map(_.batchDurationMs).sorted
      // state growth per batch from the endpoints of the captured window —
      // a keyed-state query with TTL should trend to ~0 once warm
      val growth =
        if (bs.length < 2) 0.0
        else (bs.last.stateRows - bs.head.stateRows).toDouble / (bs.length - 1)
      Some(Report(queryName, bs.length, bs.map(_.numInputRows).sum,
        durs.last, durs(durs.length / 2), bs.last.stateRows,
        bs.map(_.stateMemBytes).max, growth))
    }
  }
}

object StreamMetrics {
  def attach(spark: SparkSession, historyPerQuery: Int = 256): StreamMetrics = {
    val l = new StreamMetrics(historyPerQuery)
    spark.streams.addListener(l)
    l
  }

  def detach(spark: SparkSession, l: StreamMetrics): Unit =
    spark.streams.removeListener(l)
}
