package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative data-quality operators: a one-pass rule engine (the
  * "assertions over a table" workload every warehouse grows) and blocked
  * record-linkage scoring (fuzzy entity resolution across noisy
  * attributes — the Fellegi–Sunter shape with deterministic arithmetic).
  */
object DataQuality {

  /** Evaluate `rules` — (name, boolean condition expected TRUE) — in ONE
    * scan: each rule becomes a conditional-sum aggregate, so the whole
    * report is a single map-side-combined global aggregation regardless
    * of rule count; the per-rule rows are exploded from that one result
    * row. A NULL condition counts as a VIOLATION (a rule that cannot
    * evaluate has not passed — the conservative reading).
    *
    * Output: (rule_name, n_violations, n_rows, violation_rate), one row
    * per rule in the given order. The rate is a single long/long double
    * division — exact and engine-portable.
    */
  def checkRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "checkRules needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      s"rule names must be distinct, got ${rules.map(_._1).mkString(", ")}")
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map {
      case ((_, cond), i) =>
        sum(when(!coalesce(cond, lit(false)), 1L).otherwise(0L)).as(s"__v$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perRule = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule_name"), col(s"__v$i").as("n_violations"),
        col("__n").as("n_rows"))
    }
    one.select(explode(array(perRule: _*)).as("r"))
      .select(col("r.rule_name"), col("r.n_violations"), col("r.n_rows"),
        (col("r.n_violations").cast("double") / col("r.n_rows"))
          .as("violation_rate"))
  }

  /** Blocked record-linkage scoring: candidate pairs share `blockCol`
    * (id_a < id_b); the match score is a weighted sum of per-field
    * agreement — Jaro-Winkler similarity (rounded to 6 dp, the native
    * kernel's cross-engine contract) for `fuzzyFields`, 0/1 equality for
    * `exactFields` — summed IN THE LISTED ORDER, so the IEEE addition
    * sequence is fixed and any engine replays the score bit-for-bit.
    * Pairs scoring below `minScore` are dropped.
    *
    * Shape at scale: one shuffle keyed on the block; quadratic only
    * WITHIN a block, and blocks larger than `maxBlock` are dropped
    * entirely (the [[Dedup.editDistancePairs]] maxBlock rationale: one
    * degenerate block otherwise contributes O(maxBlock²) pairs alone).
    * Blocking-key choice is the recall/cost dial, as in every linkage
    * system.
    */
  def linkageScore(df: DataFrame, idCol: String, blockCol: String,
      fuzzyFields: Seq[(String, Double)], exactFields: Seq[(String, Double)],
      minScore: Double, maxBlock: Int = 1024): DataFrame = {
    require(fuzzyFields.nonEmpty || exactFields.nonEmpty,
      "linkageScore needs at least one scored field")
    require(maxBlock >= 2, s"maxBlock must be >= 2, got $maxBlock")
    val cols = (Seq(idCol, blockCol) ++ fuzzyFields.map(_._1)
      ++ exactFields.map(_._1)).distinct.map(col)
    val base = df.select(cols: _*)
    val sized = base.withColumn("__bn",
      count(lit(1)).over(Window.partitionBy(col(blockCol))))
    val kept = sized.where(col("__bn") <= maxBlock).drop("__bn")
    // Threshold algebra: an exact field whose weight is indispensable —
    // every OTHER term at its maximum cannot reach minScore — must match,
    // so its equality moves into the JOIN KEY and multiplies the blocking
    // (results identical: a mismatch on such a field could never score).
    // On the gate's weights (0.7 name + 0.3 segment, min 0.95) this cuts
    // candidates ~5x — measured 7.6 s -> ~2 s at sf0.1.
    val totalW = fuzzyFields.map(_._2).sum + exactFields.map(_._2).sum
    val mandatory = exactFields.collect {
      case (f, w) if totalW - w < minScore => f
    }
    val joinCond = (Seq(col(s"a.$blockCol") === col(s"b.$blockCol"),
      col(s"a.$idCol") < col(s"b.$idCol")) ++
      mandatory.map(f => col(s"a.$f") === col(s"b.$f"))).reduce(_ && _)
    val joined = kept.as("a").join(kept.as("b"), joinCond)
    val terms: Seq[Column] =
      fuzzyFields.map { case (f, w) =>
        lit(w) * round(graft.functions.TextFunctions.jaroWinkler(
          col(s"a.$f"), col(s"b.$f")), 6)
      } ++ exactFields.map { case (f, w) =>
        lit(w) * when(col(s"a.$f") === col(s"b.$f"), 1.0).otherwise(0.0)
      }
    val score = terms.reduceLeft(_ + _)
    joined.select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        round(score, 6).as("score"))
      .where(col("score") >= minScore)
  }
}
