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
  *
  * CONCURRENCY CONTRACT: `spark.conf` is SESSION-global, not
  * thread-local, so while any fixpoint scope is open every OTHER query
  * submitted on the same session also plans without AQE. Scopes
  * themselves are safe to overlap (the restore is reference-counted
  * per session below — the last scope out re-installs the value the
  * first scope in saw, so concurrent fixpoints can no longer clobber
  * each other's `prev`), but a host that multiplexes AQE-sensitive
  * OLAP queries and fixpoint operators on one session concurrently
  * should give the fixpoints their own session (`newSession()` shares
  * the SparkContext and catalog but has independent conf) or set
  * `spark.graft.fixpoint.aqe=true`. Bench/Verify are single-threaded
  * and unaffected.
  */
object Fixpoint {

  private val AqeKey = "spark.sql.adaptive.enabled"
  private val KeepKey = "spark.graft.fixpoint.aqe"

  /** Per-session open-scope bookkeeping: depth of nested/overlapping
    * scopes and the conf value to restore when the last one exits.
    * Keyed on identity — two sessions never share an entry.
    */
  private final class Scope(var depth: Int, val prev: String)
  private val open =
    new java.util.IdentityHashMap[SparkSession, Scope]()

  def withoutAqe[T](spark: SparkSession)(body: => T): T = {
    val keep = spark.conf.get(KeepKey, "false").equalsIgnoreCase("true")
    if (keep) return body
    val entered = open.synchronized {
      val existing = open.get(spark)
      if (existing != null) { existing.depth += 1; true }
      else {
        val prev = spark.conf.get(AqeKey, "true")
        if (prev.equalsIgnoreCase("false")) false // off already; nothing to scope
        else {
          open.put(spark, new Scope(1, prev))
          spark.conf.set(AqeKey, "false")
          true
        }
      }
    }
    if (!entered) body
    else try body finally open.synchronized {
      val s = open.get(spark)
      s.depth -= 1
      if (s.depth == 0) {
        open.remove(spark)
        spark.conf.set(AqeKey, s.prev)
      }
    }
  }
}
