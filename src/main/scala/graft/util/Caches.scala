package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lifecycle tracking for the DataFrames the operators persist internally
  * (LSH signature/band tables, normed vector tables). Operators cache
  * through [[persist]]; a host that runs many operator invocations in one
  * long-lived session (Verify, Bench, a multi-stage pipeline) calls
  * [[unpersistAll]] between units of work so cached intermediates do not
  * accumulate for the life of the session.
  */
object Caches {

  private val tracked =
    java.util.Collections.synchronizedList(new java.util.ArrayList[DataFrame]())

  def persist(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked.add(df)
    df
  }

  /** Unpersist (non-blocking) everything persisted through [[persist]]. */
  def unpersistAll(): Unit = tracked.synchronized {
    tracked.forEach(df =>
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () })
    tracked.clear()
  }
}
