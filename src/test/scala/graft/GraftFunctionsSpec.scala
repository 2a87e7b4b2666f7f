package graft

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._

/** The SQL registration surface for the native expressions: registered
  * functions must be callable from `spark.sql` and agree with the Column
  * API formulations.
  */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions evaluate and match the Column API") {
    GraftFunctions.register(spark)
    Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("id", "text").createOrReplaceTempView("fn_docs")

    val viaSql = spark.sql("""
      SELECT minhash_sig(transform(split(text, ' '),
               w -> CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT) % 1000000007), 8) AS sig,
             simhash_bits(transform(split(text, ' '),
               w -> CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT)), 60) AS sh
      FROM fn_docs""").head()
    val viaApi = spark.table("fn_docs").select(
      T.minhashSig(T.shingleHashes(split($"text", " ")), 8).as("sig"),
      T.simhash60($"text").as("sh")).head()
    assert(viaSql.getSeq[Long](0) == viaApi.getSeq[Long](0))
    // note: simhash via SQL above hashes ALL words; the API distincts first —
    // on this all-distinct sentence they must agree
    assert(viaSql.getLong(1) == viaApi.getLong(1))
  }

  test("dot_product and sign_bits from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql("""
      SELECT dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
                         array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
             size(sign_bits(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), 16)) AS nb
      """).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getInt(1) == 16)
  }

  test("extensions class injects the same builders") {
    // builder-time route: smoke the injector against a fresh extensions bag
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
    assert(GraftFunctions.all.map(_._1).toSet ==
      Set("minhash_sig", "sign_bits", "simhash_bits", "dot_product",
        "jaro_winkler_sim", "char_entropy", "hilbert_index",
        "hilbert_index_n", "perceptual_hash", "sorted_intersect",
        "sorted_jaccard"))
  }

  test("sorted_jaccard from SQL matches the set formulation") {
    GraftFunctions.register(spark)
    val r = spark.sql("""
      SELECT sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
             sorted_jaccard(array(1L, 2L), array(1L, 2L)) AS eq,
             sorted_jaccard(array(1L), array(2L)) AS disj
      """).head()
    assert(r.getDouble(0) == 0.5) // |{2,3}| / |{1,2,3,4}|
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 0.0)
  }

  test("char_entropy, hilbert and perceptual_hash from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql("""
      SELECT char_entropy('ab') AS e,
             hilbert_index(0L, 1L, 3) AS h2,
             hilbert_index_n(array(0L, 1L, 0L), 2) AS h3,
             perceptual_hash(encode('abc', 'UTF-8')) AS ph
      """).head()
    assert(r.getDouble(0) == 0.693147) // round(ln 2, 6dp)
    // (0,1) is one unit step from the 2-D curve origin (0,0) -> d = 1
    assert(r.getLong(1) == 1L)
    // any valid Hilbert index on the 4x4x4 grid is in [0, 64)
    assert(r.getLong(2) >= 0L && r.getLong(2) < 64L)
    assert(r.getLong(3) == graft.functions.ExprKernels
      .perceptualHash60("abc".getBytes("UTF-8")))
  }

  test("non-literal k is rejected with a clear message") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array(1L), CAST(rand()*4 AS INT))").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("native expressions stay inside WholeStageCodegen") {
    import graft.functions.{TextFunctions => T, VectorFunctions => V}
    import org.apache.spark.sql.functions.col
    // parquet-backed input so the projection cannot constant-fold away
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val embs = spark.read.parquet(s"$sf001/embeddings.parquet")
    val grams = T.hashedWordNgrams(col("text"), 3)
    // NOTE: simhash60 is deliberately absent here — its word-hash step is
    // a `transform` higher-order function, and Spark HOFs are themselves
    // CodegenFallback; the native kernels must not share its fate
    val qText = docs.select(
      T.minhashSig(grams, 8).as("mh"),
      T.simhash60FromHashes(grams).as("sh"),
      T.jaroWinkler(col("text"), col("source")).as("jw"))
    val qVec = embs.select(V.dot(col("embedding"), col("embedding")).as("dp"))
    // the round-8 contract: no CodegenFallback eviction — the projections
    // carrying every kernel compile into a WholeStageCodegen stage
    Seq("text" -> qText, "vector" -> qVec).foreach { case (tag, q) =>
      // the `*(n)` prefix marks operators compiled into a WholeStageCodegen
      // stage; before round 8 these projections rendered un-starred. The
      // stage NUMBER is layout-dependent (AQE, extra scan stages, Spark
      // upgrades renumber), so match any starred Project.
      val plan = q.queryExecution.executedPlan.toString
      assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
        s"$tag: projection not codegen'd:\n$plan")
    }
    assert(qText.head.getAs[scala.collection.Seq[Long]]("mh").length == 8)
    assert(qVec.where(col("dp") < 0).isEmpty) // self-dot is non-negative
  }

  test("generated and interpreted paths agree bit-for-bit") {
    GraftFunctions.register(spark)
    import graft.functions.Expressions._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    // evaluate each expression INTERPRETED (direct eval) and compare with
    // the codegen'd result from a real query over the same input
    val hashes = Array(7L, 123456789L, 999999999L)
    val mhInterp = MinHashSig(Literal(new GenericArrayData(hashes),
      ArrayType(LongType, containsNull = false)), 8)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray.toSeq
    val shInterp = SimHashBits(Literal(new GenericArrayData(hashes),
      ArrayType(LongType, containsNull = false)), 60).eval(null)
    val jwInterp = JaroWinklerSim(Literal("martha"), Literal("marhta"))
      .eval(null)
    val viaSql = spark.sql(
      "SELECT minhash_sig(array(7L, 123456789L, 999999999L), 8) AS mh, " +
        "simhash_bits(array(7L, 123456789L, 999999999L), 60) AS sh, " +
        "jaro_winkler_sim('martha', 'marhta') AS jw").head
    assert(viaSql.getAs[scala.collection.Seq[Long]]("mh").toList == mhInterp.toList)
    assert(viaSql.getAs[Long]("sh") == shInterp)
    assert(viaSql.getAs[Double]("jw") == jwInterp)
  }
}
