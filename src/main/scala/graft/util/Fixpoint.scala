package graft.util

import org.apache.spark.sql.SparkSession

/** Scoped AQE control for iterative fixpoint loops.
  *
  * Adaptive execution re-optimizes at EVERY exchange: each shuffle
  * becomes its own query stage — submitted, materialized, re-planned —
  * before the next stage may start. Inside a fixpoint loop (min-label
  * propagation, peels, rank pulls) that re-planning buys nothing: the
  * per-round state is a node-keyed table of KNOWN bounded shape, the
  * round's plan is a fixed key-join + map-side-combined aggregate the
  * static planner already handles, and every generation is materialized
  * through a checkpoint anyway — so AQE only inserts per-round stage
  * barriers and re-optimization latency, multiplied by rounds × stages.
  * Measured on the round-19 bench (sf0.1, local[32]): the
  * connected-components fixpoint over a 5k-edge graph ran 39.3 s with
  * AQE on vs 11.2 s off — identical results, identical plan shapes per
  * round (the same precedent as Spark's own MicroBatchExecution, which
  * force-disables AQE in stateful streaming).
  *
  * [[withoutAqe]] disables AQE for the duration of `body` and restores
  * the previous value after (nesting-safe: the inner restore re-installs
  * the outer scope's "false"). The loop's INTERNAL actions (checkpoints,
  * convergence probes) run without AQE; the DataFrame an operator
  * returns executes under the caller's own configuration as usual.
  *
  * Scale knob: `spark.graft.fixpoint.aqe=true` re-enables AQE inside
  * the loops for deployments whose per-round label tables are large
  * enough that runtime coalescing / skew splitting outweighs the
  * per-round re-planning latency (the 100 TB regime) — the local
  * default favors round latency, which is what bounds the fixpoint.
  */
object Fixpoint {

  private val AqeKey = "spark.sql.adaptive.enabled"
  private val KeepKey = "spark.graft.fixpoint.aqe"

  def withoutAqe[T](spark: SparkSession)(body: => T): T = {
    val keep = spark.conf.get(KeepKey, "false").equalsIgnoreCase("true")
    val prev = spark.conf.get(AqeKey, "true")
    if (keep || prev.equalsIgnoreCase("false")) body
    else {
      spark.conf.set(AqeKey, "false")
      try body finally spark.conf.set(AqeKey, prev)
    }
  }
}
