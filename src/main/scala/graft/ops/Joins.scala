package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators (SURVEY §2.3 extension surface).
  *
  * Spark has no ASOF JOIN node; the naive rewrite — an inequality
  * theta-join (`l.k = r.k AND l.t >= r.t`) topped by a max-window — plans
  * a per-key cartesian whose cost is |L_k|·|R_k| per key, disqualifying at
  * 100 TB. This implementation is the classic distributed form: UNION the
  * two sides, one hash shuffle on the key, one per-key sort on (time,
  * side), and a running `last(ignoreNulls)` window carries each right row
  * forward to every later left row. Cost is sort-merge-shaped
  * (O((|L|+|R|) log) per partition, a single shuffle, no join node at
  * all), the same plan family DuckDB's native ASOF executes.
  */
object Joins {

  /** As-of join: each left row picks the LATEST right row of the same key
    * whose `rightTime` <= the left row's `leftTime` (inclusive; left rows
    * with no prior right row keep null match columns). With
    * `forward = true` the direction flips: the EARLIEST right row at or
    * after `leftTime` instead (same trick, scanning time descending).
    *
    * Output: all left columns, then right's non-key columns (including
    * `rightTime`). Right payload column names must not collide with left
    * names — alias the right projection before calling.
    *
    * Determinism: among right rows tied on (key, time) the winner is the
    * greatest payload struct (fields in right's column order) — supply a
    * unique tie-break column or pre-aggregate right to one row per
    * (key, time) for a fully engine-portable result.
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      forward: Boolean = false): DataFrame = {
    val payload = right.columns.filterNot(keys.contains).toSeq
    val collide = left.columns.toSet.intersect(payload.toSet)
    require(collide.isEmpty,
      s"right payload columns collide with left: ${collide.mkString(", ")}")
    val l = left.select(keys.map(col)
      :+ col(leftTime).as("__t") :+ lit(1).as("__side")
      :+ struct(left.columns.map(col): _*).as("__l"): _*)
    val r = right.select(keys.map(col)
      :+ col(rightTime).as("__t") :+ lit(0).as("__side")
      :+ struct(payload.map(col): _*).as("__r"): _*)
    // unionByName fills the side-specific struct with null on the other
    // side — the null __r on left rows is exactly what last(ignoreNulls)
    // skips over.
    val u = l.unionByName(r, allowMissingColumns = true)
    // Right rows sort BEFORE left rows at an equal timestamp (side 0 < 1),
    // which is what makes the join inclusive; among equal-ts right rows
    // the struct ordering makes last() pick the max payload. Forward mode
    // scans time DESCENDING, so the running last() is the nearest right
    // row at-or-after instead of at-or-before.
    // nulls first in BOTH directions: a left row with an unknown time is
    // scanned before any right row and keeps a null match
    val tOrd = if (forward) col("__t").desc_nulls_first else col("__t").asc_nulls_first
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tOrd, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(left.columns.toSeq.map(c => col(s"__l.$c").as(c))
        ++ payload.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Nearest as-of join: each left row picks the CLOSEST right row of the
    * same key by absolute time distance, looking both directions, with an
    * optional tolerance (microseconds for timestamp columns, native units
    * for numeric time columns; matches farther than the tolerance are
    * dropped and the left row keeps null match columns). Ties between
    * an equally-near earlier and later right row resolve BACKWARD (the
    * at-or-before row) — the pandas `merge_asof(direction='nearest')`
    * convention.
    *
    * Plan shape: the same union + key-shuffle + running `last(ignoreNulls)`
    * machinery as [[asof]], but BOTH directions run over one union — two
    * window sorts (ascending and descending time) sharing a single
    * exchange, so the cost over [[asof]] is one extra per-partition sort,
    * not a second shuffle or a join node. Right rows with a null time
    * never match (their distance is unknown); pre-filter them. Right
    * payload names must not collide with left names; ties among right
    * rows at the same timestamp resolve to the greatest payload struct,
    * as in [[asof]].
    */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      toleranceMicros: Long = Long.MaxValue): DataFrame = {
    require(toleranceMicros >= 0,
      s"toleranceMicros must be >= 0, got $toleranceMicros")
    val payload = right.columns.filterNot(keys.contains).toSeq
    val collide = left.columns.toSet.intersect(payload.toSet)
    require(collide.isEmpty,
      s"right payload columns collide with left: ${collide.mkString(", ")}")
    val l = left.select(keys.map(col)
      :+ col(leftTime).as("__t") :+ lit(1).as("__side")
      :+ struct(left.columns.map(col): _*).as("__l"): _*)
    val r = right.select(keys.map(col)
      :+ col(rightTime).as("__t") :+ lit(0).as("__side")
      :+ struct(payload.map(col): _*).as("__r"): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    def dir(tOrd: Column) = Window.partitionBy(keys.map(col): _*)
      .orderBy(tOrd, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = u
      .withColumn("__mb", last(col("__r"), ignoreNulls = true)
        .over(dir(col("__t").asc_nulls_first)))
      .withColumn("__mf", last(col("__r"), ignoreNulls = true)
        .over(dir(col("__t").desc_nulls_first)))
      .where(col("__side") === 1)
    // distance in µs for timestamps, native units for numeric times
    def ticks(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(c)
        case org.apache.spark.sql.types.TimestampNTZType =>
          unix_micros(c.cast("timestamp"))
        case _ => c.cast("long")
      }
    val lt = ticks(col("__t"), left.schema(leftTime).dataType)
    val rdt = right.schema(rightTime).dataType
    val db = lt - ticks(col(s"__mb.$rightTime"), rdt)
    val df = ticks(col(s"__mf.$rightTime"), rdt) - lt
    val tol = lit(toleranceMicros)
    // null distance (no match on that side, or a null left time) makes
    // the condition null => treated as false by `when`
    val bOk = db.isNotNull && db <= tol
    val fOk = df.isNotNull && df <= tol
    val chosen = when(bOk && (!fOk || db <= df), col("__mb"))
      .when(fOk, col("__mf"))
    m.withColumn("__m", chosen)
      .select(left.columns.toSeq.map(c => col(s"__l.$c").as(c))
        ++ payload.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Range (interval) join: every left row paired with every right
    * interval containing its `leftTime` (`start <= t <= end`, both
    * inclusive), inner-join semantics. Rows whose interval is inverted
    * (`end < start`) are dropped.
    *
    * The naive formulation is a theta-join — with no (or a hot) equality
    * key Spark plans it as a cartesian, O(|L|·|R|) per key. This is the
    * standard BUCKETED form instead: both sides key on
    * floor(time / bucketSeconds) — each interval explodes over the
    * buckets it covers — and the containment predicate runs only inside
    * an equi-join on (keys, bucket). A (left, right) pair shares exactly
    * one bucket (the left row's), so no post-join dedup is needed. Join
    * cost is governed by per-bucket density; pick `bucketSeconds` near
    * the typical interval length, so each interval lands in O(1) buckets
    * while buckets stay small.
    */
  def range(left: DataFrame, leftTime: String,
      right: DataFrame, startCol: String, endCol: String,
      keys: Seq[String] = Nil, bucketSeconds: Long = 3600): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val payload = right.columns.filterNot(keys.contains).toSeq
    val collide = left.columns.toSet.intersect(payload.toSet)
    require(collide.isEmpty,
      s"right payload columns collide with left: ${collide.mkString(", ")}")
    val g = bucketSeconds * 1000000L // micros
    val lb = left.withColumn("__b", floor(unix_micros(col(leftTime)) / g))
    val rb = right
      .where(col(endCol) >= col(startCol)) // inverted interval: no bucket span
      .withColumn("__b", explode(sequence(
        floor(unix_micros(col(startCol)) / g),
        floor(unix_micros(col(endCol)) / g))))
    lb.join(rb, keys :+ "__b")
      .where(col(leftTime) >= col(startCol) && col(leftTime) <= col(endCol))
      .select(left.columns.toSeq.map(col) ++ payload.map(col): _*)
  }

  /** Skew-safe inner equi-join, result identical to
    * `left.join(right, keys)`: the (skewed) left side salts its key with
    * hash-of-row mod `saltFactor`, the right side replicates once per salt
    * value, and the join runs on (keys, salt) — one hot key spreads over
    * `saltFactor` reducers instead of funneling into a single task.
    *
    * AQE's skew handling splits oversized sort-merge partitions and covers
    * the common cases; explicit salting is the remaining tool when a
    * single key's rows must not co-locate at all (e.g. the hot key alone
    * exceeds executor memory, or the join strategy AQE picked can't be
    * split). Cost: the right side is materialized `saltFactor` times —
    * keep the factor modest and the right side the smaller input.
    */
  def salted(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val l = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(saltFactor)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Bloom-pruned semi join: keep the fact rows whose `factKey` appears
    * in `dim`'s `dimKey` set, with a Bloom-filter pre-filter ahead of the
    * exact semi join.
    *
    * At 100 TB the expensive part of a selective semi join is not the
    * join — it's shuffling the whole fact table to get there. The bitmap
    * ([[graft.functions.Sketches.bloomBitmap]]) costs one tiny aggregate
    * over the dim keys, ships to every task as a literal (sketch-sized:
    * ~1 MiB for 2^23 bits), and its probe is a codegen'd filter AT THE
    * SCAN, so only rows that might match — true matches plus the
    * ~(1-e^(-kn/m))^k false-positive sliver — ever enter the shuffle.
    * The exact semi join then removes the false positives, so the result
    * is EXACT regardless of bloom sizing; m/k only tune how much shuffle
    * survives. This is Spark's own runtime bloom-filter rewrite
    * (spark.sql.optimizer.runtime.bloomFilter.*) made explicit and
    * declarative, for the shapes the optimizer won't infer — a
    * pre-filtered dim, a non-equi downstream use, or a filter reused
    * across several fact scans.
    */
  def bloomSemi(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, mBits: Int = 1 << 23, k: Int = 5): DataFrame = {
    val bits = graft.functions.Sketches.bloomBitmap(dim, col(dimKey), mBits, k)
    val pruned = fact.where(
      graft.functions.Sketches.bloomMightContain(col(factKey), bits, k))
    val dimKeys = dim.select(col(dimKey).as("__bk")).distinct()
    pruned.join(dimKeys, pruned(factKey) === dimKeys("__bk"), "leftsemi")
  }

  /** Interval OVERLAP join: every (left interval, right interval) pair
    * that overlaps — `lStart <= rEnd AND rStart <= lEnd`, bounds
    * inclusive — within the same `keys`. The interval-vs-interval
    * generalization of [[range]]'s point-vs-interval containment
    * (meeting/room conflicts, session-vs-outage attribution, overlap
    * dedup of time spans). Inverted intervals are dropped from both
    * sides.
    *
    * Same bucketed anti-cartesian design as [[range]]: BOTH sides
    * explode over floor(time / bucketSeconds) buckets, the overlap
    * predicate runs only inside an equi-join on (keys, bucket). An
    * overlapping pair shares EVERY bucket its intersection covers, so
    * the join keeps a pair only in its CANONICAL bucket — the bucket of
    * max(lStart, rStart), the intersection's first — making the output
    * duplicate-free by construction (no distinct pass, nothing rides a
    * second shuffle). Pick `bucketSeconds` near the typical interval
    * length: each interval lands in O(1) buckets while buckets stay
    * small.
    */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      keys: Seq[String] = Nil, bucketSeconds: Long = 3600): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val payload = right.columns.filterNot(keys.contains).toSeq
    val collide = left.columns.toSet.intersect(payload.toSet)
    require(collide.isEmpty,
      s"right payload columns collide with left: ${collide.mkString(", ")}")
    val g = bucketSeconds * 1000000L // micros
    // cast: NTZ-inferred parquet timestamps reach unix_micros as UTC
    def um(c: String) = unix_micros(col(c).cast("timestamp"))
    def buckets(df: DataFrame, s: String, e: String) = df
      .where(col(e) >= col(s))
      .withColumn("__b", explode(sequence(
        floor(um(s) / g), floor(um(e) / g))))
    buckets(left, lStart, lEnd).join(buckets(right, rStart, rEnd),
        keys :+ "__b")
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd)
        && col("__b") === floor(greatest(um(lStart), um(rStart)) / g))
      .select(left.columns.toSeq.map(col) ++ payload.map(col): _*)
  }
}
