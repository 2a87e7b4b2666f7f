package graft.ops

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // a -> b, a -> c, b -> c: c should out-rank b, b out-rank a.
  private def edges = Seq(
    ("a", "b"), ("a", "c"), ("b", "c")
  ).toDF("src", "dst")

  test("ranks order by in-link mass; every node gets a row") {
    val r = Graph.pagerank(edges, iters = 3)
      .as[(String, Long, Double)].collect()
      .map(t => t._1 -> t._2).toMap
    assert(r.keySet == Set("a", "b", "c"))
    assert(r("c") > r("b"))
    assert(r("b") > r("a"))
  }

  test("rank_fp is exact long arithmetic: replayable by hand") {
    // N=3, init = 1e12/3 = 333333333333; base = init*150 div 1000.
    val init = 1000000000000L / 3
    val base = init * 150 / 1000
    // iter1: a gets base; b gets base + (init*850) div (2*1000);
    // c gets base + (init*850) div (2*1000) + (init*850) div 1000.
    val r1a = base
    val r1b = base + init * 850 / 2000
    // iter2 recomputes from r1.
    val r2b = base + r1a * 850 / 2000
    val r = Graph.pagerank(edges, iters = 2)
      .as[(String, Long, Double)].collect().map(t => t._1 -> t._2).toMap
    assert(r("b") == r2b, s"got ${r("b")}, want $r2b")
  }

  test("dangling nodes keep the base rank only") {
    val e = Seq(("x", "y")).toDF("src", "dst")
    val r = Graph.pagerank(e, iters = 3)
      .as[(String, Long, Double)].collect().map(t => t._1 -> t._2).toMap
    val init = 1000000000000L / 2
    assert(r("x") == init * 150 / 1000)
    assert(r("y") > r("x"))
  }

  test("duplicate input edges count once") {
    val dup = Seq(("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"))
      .toDF("src", "dst")
    val rDup = Graph.pagerank(dup, iters = 2)
      .as[(String, Long, Double)].collect().map(t => t._1 -> t._2).toMap
    val rRef = Graph.pagerank(edges, iters = 2)
      .as[(String, Long, Double)].collect().map(t => t._1 -> t._2).toMap
    assert(rDup == rRef)
  }

  test("supplierCustomerEdges builds prefixed distinct pairs") {
    val li = Seq((100L, 7L), (100L, 7L), (101L, 8L))
      .toDF("l_orderkey", "l_suppkey")
    val ord = Seq((100L, 42L), (101L, 42L)).toDF("o_orderkey", "o_custkey")
    val e = Graph.supplierCustomerEdges(li, ord)
      .as[(String, String)].collect().toSet
    assert(e == Set(("s7", "c42"), ("s8", "c42")))
  }

  test("total mass never exceeds the scale (leak-only, no creation)") {
    val total = Graph.pagerank(edges, iters = 3)
      .agg(org.apache.spark.sql.functions.sum("rank_fp"))
      .as[Long].collect().head
    assert(total <= Graph.RankScale)
  }
}
