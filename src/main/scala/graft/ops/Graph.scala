package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph operators over edge tables (SURVEY §2.3 north-star family).
  * PageRank complements the dedup module's connected components: CC finds
  * duplicate clusters, PageRank ranks nodes by link structure — the
  * classic web-corpus quality prior for training-data curation.
  *
  * Determinism contract: all rank arithmetic is fixed-point LONG math —
  * ranks are scaled to 1e12, per-edge contributions use exact integer
  * division (floor, positive operands), and per-node accumulation is a
  * SUM of longs, exact and order-insensitive — so a DuckDB replay with
  * `//` produces bit-identical ranks after any shuffle order.
  *
  * Scale shape: edges are deduplicated and joined with out-degrees ONCE
  * and cached by the caller if iterating many times; each iteration is
  * one hash join ranks⨝edges on src (both sides hash-partitioned on the
  * join key) plus one map-side-combined SUM keyed dst. Rank state is one
  * row per node — never collected to the driver. Like
  * [[Dedup.connectedComponents]], long chains of iterations should
  * checkpoint to truncate lineage; at 3 fixed iterations the plan is
  * shallow enough not to need it.
  */
object Graph {

  /** Rank fixed-point scale: 1e12 (12 decimal digits). */
  val RankScale = 1000000000000L

  /** Exact integer division a div b for non-negative operands, staying in
    * long space: (a - a mod b) is an exact multiple of b and <= ~1e15, so
    * the double division below is exact. Matches DuckDB's `//`.
    */
  private def ldiv(a: Column, b: Column): Column =
    ((a - a % b) / b).cast("long")

  /** Directed edge table supplier->customer derived from the TPC-H-ish
    * star: one edge per (supplier, customer) pair that ever shared an
    * order line. Node ids are prefixed ("s123" / "c45") so the two id
    * spaces cannot collide.
    */
  def supplierCustomerEdges(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("c"), col("o_custkey")).as("dst"))
      .distinct()

  /** Fixed-iteration PageRank with damping `dampNum/dampDen` (default
    * 0.85). Dangling nodes (no out-edges) contribute nothing — their
    * mass leaks, the standard simplification; ranks remain a strict
    * total order signal. Output: (node, rank_fp, rank) for every node.
    *
    * rank_fp(v) = (init * (dampDen-dampNum)) div dampDen
    *            + Σ_{u→v} (rank_fp(u) * dampNum) div (outdeg(u) * dampDen)
    * with init = RankScale div N, all in exact long arithmetic.
    */
  def pagerank(edges: DataFrame, iters: Int = 3,
      dampNum: Long = 850, dampDen: Long = 1000): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampNum > 0 && dampDen > dampNum,
      s"need 0 < dampNum < dampDen, got $dampNum/$dampDen")
    val e = edges.select(col("src"), col("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("od"))
    val n = nodes.agg(count(lit(1)).as("n_nodes"))
    // uniform start: every node at RankScale div N
    val init = nodes.crossJoin(broadcast(n))
      .select(col("node"), ldiv(lit(RankScale), col("n_nodes")).as("r"))
    val eo = e.join(outdeg, "src") // (src, dst, od)
    var ranks = init
    for (_ <- 1 to iters) {
      val contrib = eo
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          ldiv(col("r") * dampNum, col("od") * dampDen).as("c"))
        .groupBy("node").agg(sum("c").as("cs"))
      ranks = init
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (ldiv(col("r") * (dampDen - dampNum), lit(dampDen))
            + coalesce(col("cs"), lit(0L))).as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_fp"),
      (col("r").cast("double") / RankScale).as("rank"))
  }
}
