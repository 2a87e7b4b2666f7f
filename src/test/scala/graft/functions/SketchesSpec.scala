package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("KMV is exact below k") {
    val df = (1 to 100).toDF("v")
    val r = Sketches.kmvDistinct(df, col("v"), k = 256).head()
    assert(r.getAs[Long]("exact_distinct") == 100L)
    assert(r.getAs[Double]("kmv_estimate") == 100.0)
  }

  test("KMV estimates within ~3/sqrt(k) above k") {
    val df = (1 to 20000).toDF("v")
    val r = Sketches.kmvDistinct(df, col("v"), k = 256).head()
    val est = r.getAs[Double]("kmv_estimate")
    val err = math.abs(est - 20000.0) / 20000.0
    assert(err < 3.0 / math.sqrt(256), s"estimate $est err $err")
  }

  test("KMV is deterministic across runs") {
    val df = spark.read.parquet(s"$sf001/lineitem.parquet")
    val a = Sketches.kmvDistinct(df, col("l_partkey"), 64).head()
    val b = Sketches.kmvDistinct(df, col("l_partkey"), 64).head()
    assert(a == b)
  }
}
