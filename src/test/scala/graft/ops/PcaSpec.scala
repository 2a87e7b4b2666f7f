package graft.ops

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // points along y = 2x with a touch of structure: first component must
  // align with (1, 2)/sqrt(5)
  private def line = Seq.tabulate(40) { i =>
    val x = (i - 20) / 10.0
    (i.toLong, Array(x, 2 * x))
  }.toDF("vec_id", "embedding")

  test("covariance: hand-computed entries on a tiny corpus") {
    // vectors (1,0), (0,1), (-1,0), (0,-1): means 0, var 0.5, cov 0
    val df = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)),
      (3L, Array(-1.0, 0.0)), (4L, Array(0.0, -1.0)))
      .toDF("vec_id", "embedding")
    val c = Pca.covariance(df, dim = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c((0L, 0L)) == 0.5)
    assert(c((1L, 1L)) == 0.5)
    assert(c((0L, 1L)) == 0.0)
  }

  test("covariance is layout-independent and non-zero-mean correct") {
    val df = Seq.tabulate(30)(i => (i.toLong,
      Array(1.0 + i % 5, 2.0 + i % 3, (i % 7).toDouble)))
      .toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      Pca.covariance(d, dim = 3).orderBy("i", "j").collect().toSeq
    assert(run(df) == run(df.repartition(11)))
    // against a direct two-pass computation
    val rows = Seq.tabulate(30)(i =>
      Array(1.0 + i % 5, 2.0 + i % 3, (i % 7).toDouble))
    val n = rows.size.toDouble
    val mean = Array.tabulate(3)(d => rows.map(_(d)).sum / n)
    val expect = (rows.map(r => (r(0) - mean(0)) * (r(1) - mean(1))).sum / n)
    val got = run(df).collect {
      case r if r.getLong(0) == 0L && r.getLong(1) == 1L => r.getDouble(2)
    }.head
    assert(math.abs(got - expect) < 1e-4, s"cov(0,1): $got vs $expect")
    graft.util.Caches.unpersistAll()
  }

  test("covariance rejects a wrong-length vector loudly") {
    val df = Seq((1L, Array(1.0, 2.0)), (2L, Array(1.0)))
      .toDF("vec_id", "embedding")
    val e = intercept[org.apache.spark.SparkException] {
      Pca.covariance(df, dim = 2).collect()
    }
    assert(e.getMessage != null)
  }

  test("principalComponents: first component of a line is (1,2)/sqrt(5)") {
    val pc = Pca.principalComponents(Pca.covariance(line, dim = 2),
      dim = 2, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val s5 = math.sqrt(5.0)
    assert(math.abs(pc((0L, 0L)) - 1 / s5) < 1e-4)
    assert(math.abs(pc((0L, 1L)) - 2 / s5) < 1e-4)
    // second component orthogonal: (-2, 1)/sqrt(5) up to sign convention
    val dot = pc((0L, 0L)) * pc((1L, 0L)) + pc((0L, 1L)) * pc((1L, 1L))
    assert(math.abs(dot) < 1e-3, s"components must be orthogonal, dot=$dot")
    // sign convention: largest-|loading| entry positive
    assert(pc((0L, 1L)) > 0)
    graft.util.Caches.unpersistAll()
  }

  test("project: plan-literal dot products, narrow plan, 6dp") {
    val comps = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val df = Seq((1L, Array(0.25, -0.5))).toDF("vec_id", "embedding")
    val out = Pca.project(df, comps)
    val r = out.head
    assert(r.getDouble(2) == 0.25 && r.getDouble(3) == -0.5)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("primitive HALF_UP quantizer equals BigDecimal over edge cases") {
    val qm = classOf[Pca.type].getDeclaredMethod("q", classOf[Double])
    qm.setAccessible(true)
    def q(x: Double): Long =
      qm.invoke(Pca, java.lang.Double.valueOf(x)).asInstanceOf[Long]
    def ref(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val edge = Seq(0.0, 0.5, -0.5, 1.5, -1.5, 2.5, -2.5,
      0.49999999999999994, -0.49999999999999994, 1048576.5, -1048576.5,
      3.0000000000000004, 1e7 + 0.5, -(1e7 + 0.5))
    edge.foreach(x => assert(q(x) == ref(x), s"mismatch at $x"))
    val rnd = new scala.util.Random(7)
    (1 to 20000).foreach { _ =>
      val x = (rnd.nextDouble() - 0.5) * 2e7
      assert(q(x) == ref(x), s"mismatch at $x")
    }
  }

  test("determinism: same components from any layout") {
    def comps(d: org.apache.spark.sql.DataFrame) =
      Pca.principalComponents(Pca.covariance(d, dim = 2), dim = 2, k = 1)
        .collect().map(_.getDouble(2)).toSeq
    assert(comps(line) == comps(line.repartition(7)))
    graft.util.Caches.unpersistAll()
  }
}
