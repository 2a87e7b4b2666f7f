package graft.util

import org.apache.spark.sql.DataFrame

/** Conf-gated physical-plan dump for the frames INSIDE iterative
  * operators. A fixpoint's public explain shows only the checkpointed
  * leaf of its final generation; the plan that matters for a shuffle
  * audit is the per-round frame, which only exists transiently inside
  * the loop. Setting `spark.graft.planDumpDir=<dir>` makes operators
  * write `<dir>/<name>.txt` with `explain("formatted")` output for
  * each registered internal frame; unset (the default, including the
  * bench) it is a single conf lookup per call and writes nothing.
  */
object PlanDump {

  private val Key = "spark.graft.planDumpDir"

  def apply(name: String, df: DataFrame): Unit = {
    val dir = df.sparkSession.conf.get(Key, "")
    if (dir.nonEmpty) {
      val text = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val path = java.nio.file.Paths.get(dir, s"$name.txt")
      java.nio.file.Files.createDirectories(path.getParent)
      java.nio.file.Files.writeString(path, text)
    }
  }
}
