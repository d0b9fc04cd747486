package graft.observe

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.graftbridge.ListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-action runtime metrics, captured driver-side from the Spark
  * listener bus — the observability leg of the 100 TB posture. Plan-shape
  * pins ([[PlanAudit]], PlanSpec) say what the engine INTENDS at scale;
  * these counters say what an actual run DID: how many bytes crossed each
  * shuffle, whether anything spilled, and how skewed the task-duration
  * distribution was (the straggler signal that decides whether a key needs
  * salting long before a 1000-executor run hits it).
  *
  * Usage — wrap exactly one Spark action:
  * {{{
  *   val (rows, m) = RunMetrics.capture(spark, "q1_agg") { df.count() }
  *   if (m.skew > 4) log.warn(s"stragglers: \${m.maxTaskMs}ms vs p50 \${m.p50TaskMs}ms")
  * }}}
  *
  * The listener is registered for the duration of `body` only and the bus
  * is drained before the snapshot is read, so counters are complete.
  * Scope caveat (by design): counters aggregate EVERYTHING the
  * SparkContext runs while `body` executes — capture measures serially
  * executed actions (the Bench/Verify/production-job shape), not
  * concurrent fan-out on a shared session.
  *
  * No reference analogue (the reference has no metrics surface at all);
  * the Spark-native mechanism is the public SparkListener API, the same
  * counters the Spark UI shows, so numbers line up with what an operator
  * staring at the UI of a production cluster sees.
  */
object RunMetrics {

  /** One action's aggregated task counters. Task-duration percentiles are
    * over every task in the capture window; `skew` = max/p50 task wall —
    * ~1 on an even operator, >>1 when one partition carries the stage.
    */
  final case class Snapshot(
      name: String,
      wallMs: Long,
      stages: Int,
      tasks: Int,
      taskTimeMs: Long,
      maxTaskMs: Long,
      p50TaskMs: Long,
      skew: Double,
      shuffleReadBytes: Long,
      shuffleReadRecords: Long,
      shuffleWriteBytes: Long,
      spillMemBytes: Long,
      spillDiskBytes: Long,
      inputBytes: Long,
      inputRecords: Long,
      peakExecMemBytes: Long) {

    def toJson: String =
      s"""{"name":"$name","wall_ms":$wallMs,"stages":$stages,"tasks":$tasks,""" +
        s""""task_time_ms":$taskTimeMs,"max_task_ms":$maxTaskMs,""" +
        s""""p50_task_ms":$p50TaskMs,"skew":${
          // Locale.ROOT: a comma-decimal default locale would emit 1,23
          String.format(java.util.Locale.ROOT, "%.2f", Double.box(skew))},""" +
        s""""shuffle_read_bytes":$shuffleReadBytes,""" +
        s""""shuffle_read_records":$shuffleReadRecords,""" +
        s""""shuffle_write_bytes":$shuffleWriteBytes,""" +
        s""""spill_mem_bytes":$spillMemBytes,"spill_disk_bytes":$spillDiskBytes,""" +
        s""""input_bytes":$inputBytes,"input_records":$inputRecords,""" +
        s""""peak_exec_mem_bytes":$peakExecMemBytes}"""
  }

  private final class Collector extends SparkListener {
    val durations = ArrayBuffer.empty[Long]
    var stages = 0
    var taskTime, shufRead, shufReadRecs, shufWrite = 0L
    var spillMem, spillDisk, inBytes, inRecs, peakMem = 0L

    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      synchronized { stages += 1 }

    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      val m = e.taskMetrics
      if (m != null) {
        durations += e.taskInfo.duration
        taskTime += e.taskInfo.duration
        shufRead += m.shuffleReadMetrics.totalBytesRead
        shufReadRecs += m.shuffleReadMetrics.recordsRead
        shufWrite += m.shuffleWriteMetrics.bytesWritten
        spillMem += m.memoryBytesSpilled
        spillDisk += m.diskBytesSpilled
        inBytes += m.inputMetrics.bytesRead
        inRecs += m.inputMetrics.recordsRead
        peakMem = math.max(peakMem, m.peakExecutionMemory)
      }
    }
  }

  def capture[T](spark: SparkSession, name: String)(body: => T): (T, Snapshot) = {
    val sc = spark.sparkContext
    val c = new Collector
    sc.addSparkListener(c)
    val t0 = System.nanoTime()
    try {
      val result = body
      val wallMs = (System.nanoTime() - t0) / 1000000L
      ListenerBridge.drain(sc)
      val snap = c.synchronized {
        val ds = c.durations.sorted
        val p50 = if (ds.isEmpty) 0L else ds(ds.length / 2)
        val max = if (ds.isEmpty) 0L else ds.last
        Snapshot(name, wallMs, c.stages, ds.length, c.taskTime, max, p50,
          if (p50 > 0) max.toDouble / p50 else 1.0,
          c.shufRead, c.shufReadRecs, c.shufWrite, c.spillMem, c.spillDisk,
          c.inBytes, c.inRecs, c.peakMem)
      }
      (result, snap)
    } finally sc.removeSparkListener(c)
  }
}
