package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SaveMode}
import graft.connect.Connector
import graft.pipeline._

/** Sink stage: resolve a named view and write it through the connector with
  * save-mode and pre-write repartition control; the input passes through so
  * downstream stages keep using the view.
  * (ref: load/CassandraLoad.scala:92-165.)
  *
  * Scale notes: `partitionBy` before the write is the coordinator-traffic /
  * file-clustering lever — cluster rows by the sink's partition keys so each
  * task writes dense batches; `numPartitions` alone caps write parallelism
  * (small-files control).
  */
final case class LoadStage(
    name: String,
    connector: Connector,
    inputView: String,
    table: String,
    saveMode: SaveMode = SaveMode.Overwrite,
    numPartitions: Option[Int] = None,
    partitionBy: Seq[String] = Nil,
    options: Map[String, String] = Map.empty)
    extends Stage {

  override def execute()(implicit ctx: PipelineContext): Option[DataFrame] = {
    detail += "inputView" -> inputView
    detail += "table" -> table
    detail += "saveMode" -> saveMode.toString

    val df = Views.resolve(inputView)

    // Write metrics listener, attached only for the duration of the write
    // (ref: CassandraLoad.scala:105,161).
    val listener = new WriteMetricsListener
    ctx.spark.sparkContext.addSparkListener(listener)
    try {
      // Batch-only sink: skip the write entirely for a streaming view
      // (ref: CassandraLoad.scala:108-109).
      if (!df.isStreaming) {
        val out = Repartition(df, numPartitions, partitionBy)
        detail += "numPartitions" -> out.queryExecution.toRdd.getNumPartitions
        connector.write(out, table, saveMode, options)
        // Listener delivery is asynchronous; the value read at detach time
        // is best-effort, and the key name says so.
        detail += "recordsWrittenApprox" -> listener.recordsWritten.get()
      }
    } finally ctx.spark.sparkContext.removeSparkListener(listener)

    Option(df) // passthrough (ref: CassandraLoad.scala:163)
  }
}

/** Captures stage-completion output metrics during a write
  * (ref: ListenerUtils.addStageCompletedListener usage,
  * CassandraLoad.scala:105). Listener delivery is asynchronous, so the
  * recorded count is best-effort at detach time.
  */
final class WriteMetricsListener extends SparkListener {
  val recordsWritten = new java.util.concurrent.atomic.AtomicLong(0)
  override def onStageCompleted(event: SparkListenerStageCompleted): Unit =
    recordsWritten.addAndGet(event.stageInfo.taskMetrics.outputMetrics.recordsWritten): Unit
}
