package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture maintenance: upsert merge and SCD type-2 history.
  *
  * The batch-lakehouse counterpart of `MERGE INTO`: a base snapshot plus
  * a change feed (upserts and deletes) resolve to the next snapshot, and
  * an append-only change log resolves to validity intervals. Both are
  * single-shuffle-on-key plans — the key partitioning is the only data
  * movement, every decision is local to a key group after that, and AQE
  * handles hot-key skew. At 100 TB the win over rewrite-everything is
  * that the shuffle carries (key, version) decisions, not the full-width
  * rows, until the final resolution.
  */
object Cdc {

  /** Latest-wins merge of `changes` into `base`.
    *
    * `base` rows carry implicit version 0; `changes` rows carry
    * `versionCol` (> 0) and `opCol` ('U' upsert / 'D' delete). Per key,
    * the highest (version, op) wins — op breaks exact version ties in
    * favor of the change feed's delete, making replayed feeds idempotent.
    * A winning 'D' removes the key from the snapshot.
    *
    * The version contract is ENFORCED in-plan: a change row whose version
    * is null or <= 0 raises at execution time. Without the check, a
    * version-0 'U' change ties the implicit base row (0,'U') exactly and
    * the row_number winner becomes layout-dependent, while a null version
    * silently loses to base under the descending null ordering — both are
    * out-of-contract feeds that must fail loudly, not produce
    * nondeterministic output.
    *
    * Plan: union (schema-aligned, narrow) then ONE shuffle on `keyCol`
    * for the per-key window; the filter afterwards is narrow. Columns
    * beyond the key travel through untouched, so the output schema equals
    * the base schema.
    */
  def upsert(base: DataFrame, changes: DataFrame, keyCol: String,
      versionCol: String, opCol: String): DataFrame = {
    val dataCols = base.columns.filter(_ != keyCol)
    require(changes.columns.contains(versionCol), s"changes needs $versionCol")
    require(changes.columns.contains(opCol), s"changes needs $opCol")
    val reserved = Seq("__v", "__op", "__rn").filter(base.columns.contains)
    require(reserved.isEmpty,
      s"base columns collide with upsert internals: ${reserved.mkString(", ")}")
    val b = base.select(col(keyCol) +: dataCols.map(col) :+
      lit(0L).as("__v") :+ lit("U").as("__op"): _*)
    val v = col(versionCol).cast("long")
    val vChecked = when(v.isNotNull && v > 0, v)
      .otherwise(raise_error(concat(
        lit(s"Cdc.upsert: $versionCol must be > 0 (base rows own version 0), got "),
        coalesce(col(versionCol).cast("string"), lit("null")))).cast("long"))
    val c = changes.select(col(keyCol) +: dataCols.map(col) :+
      vChecked.as("__v") :+ col(opCol).as("__op"): _*)
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__v").desc, col("__op").asc) // 'D' < 'U': delete wins ties
    b.unionByName(c)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col("__op") =!= "D")
      .select(keyCol, dataCols: _*)
  }

  /** Derive the change feed BETWEEN two snapshots of a keyed table — the
    * inverse of [[upsert]]: applying the derived feed to `old` reproduces
    * `next` exactly. This is the Delta "change data feed" / Iceberg
    * incremental-scan primitive for stores that only keep snapshots: the
    * diff, not the snapshots, is what downstream incremental consumers
    * (index refresh, cache invalidation, training-set deltas) want to
    * ship. Output one row per CHANGED key: (key, data..., op) with op
    * 'I' (key only in `next`), 'U' (in both, any data column differs,
    * null-safely), 'D' (key only in `old`); I/U rows carry `next`'s
    * data, D rows carry `old`'s last-known data. Unchanged keys emit
    * nothing — the feed is minimal by construction.
    *
    * Both inputs must be snapshots (unique on `keyCol`); duplicate keys
    * raise at execution time rather than producing a fabricated diff.
    *
    * Plan: ONE full-outer sort-merge join on the key (both sides
    * key-partitioned, AQE skew-safe), then a narrow per-row classify —
    * no window, no second shuffle. At 100 TB the shuffle is the
    * unavoidable cost of an exact diff; everything after it is local.
    */
  def derive(old: DataFrame, next: DataFrame, keyCol: String): DataFrame = {
    val dataCols = old.columns.filter(_ != keyCol).toSeq
    require(next.columns.toSet == old.columns.toSet,
      s"snapshots must share a schema: old has ${old.columns.mkString(",")}, " +
        s"next has ${next.columns.mkString(",")}")
    def uniq(df: DataFrame, side: String) = {
      val k = col(keyCol)
      val dup = count(lit(1)).over(Window.partitionBy(keyCol))
      df.withColumn("__dup", dup)
        .withColumn(keyCol,
          when(col("__dup") === 1, k).otherwise(raise_error(concat(
            lit(s"Cdc.derive: $side snapshot has duplicate key "),
            k.cast("string"))).cast(df.schema(keyCol).dataType)))
        .drop("__dup")
    }
    val o = uniq(old, "old").select(col(keyCol).as("__ko") +:
      dataCols.map(c => col(c).as(s"__o_$c")): _*)
    val n = uniq(next, "next").select(col(keyCol).as("__kn") +:
      dataCols.map(c => col(c).as(s"__n_$c")): _*)
    val changed = dataCols.map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, col("__ko") === col("__kn"), "full_outer")
      .withColumn("op",
        when(col("__ko").isNull, lit("I"))
          .when(col("__kn").isNull, lit("D"))
          .when(changed, lit("U")))
      .where(col("op").isNotNull)
      .select(coalesce(col("__kn"), col("__ko")).as(keyCol) +:
        dataCols.map(c =>
          when(col("op") === "D", col(s"__o_$c"))
            .otherwise(col(s"__n_$c")).as(c)) :+ col("op"): _*)
  }

  /** SCD type-2 validity intervals from an append-only change log.
    *
    * Input: one row per observation (`keyCol`, `tsCol`, `stateCol`).
    * Output: one row per STATE RUN — consecutive observations with the
    * same state collapse — with `valid_from`, `valid_to` (null while
    * current) and `is_current`. Standard islands construction: `lag` to
    * mark state changes, running sum to number the runs, then per-run
    * min(ts) and `lead` for the exclusive upper bound.
    *
    * Plan: the lag, sum and lead windows all share ONE partitioning on
    * `keyCol` — Catalyst reuses a single sort-shuffle for all three
    * (guarded in PlanGuardSpec); the run aggregation is the only other
    * exchange and it is on (key, run), a strict refinement computable
    * without re-shuffling under AQE.
    */
  def scd2(log: DataFrame, keyCol: String, tsCol: String,
      stateCol: String): DataFrame = {
    val byTs = Window.partitionBy(keyCol).orderBy(col(tsCol), col(stateCol))
    val runs = log
      // a NULL observation time cannot anchor an interval — and it would
      // also diverge between engines (Spark windows order NULLS FIRST,
      // DuckDB NULLS LAST), so it is excluded by contract, not by luck
      .where(col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol), col(stateCol))
      .withColumn("__chg",
        when(lag(col(stateCol), 1).over(byTs).isNull ||
          lag(col(stateCol), 1).over(byTs) =!= col(stateCol), 1L)
          .otherwise(0L))
      .withColumn("__run", sum(col("__chg")).over(
        byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val spans = runs.groupBy(col(keyCol), col("__run"))
      .agg(min(col(tsCol)).as("valid_from"),
        min(col(stateCol)).as(stateCol)) // state is constant within a run
    // state tie-break: two runs of one key CAN share a valid_from when
    // observations carry equal timestamps — the chain must still be total
    val byFrom = Window.partitionBy(keyCol)
      .orderBy(col("valid_from"), col(stateCol))
    spans
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byFrom))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(stateCol), col("valid_from"),
        col("valid_to"), col("is_current"))
  }
}
