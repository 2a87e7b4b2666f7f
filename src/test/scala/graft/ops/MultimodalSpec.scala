package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("attach produces binary payload + struct metadata schema") {
    val docs = Seq((1L, "hello", "en", 5L)).toDF("doc_id", "text", "lang", "n_chars")
    val mm = Multimodal.attach(docs, "doc_id", "text", Seq("lang", "n_chars"))
    val sch = mm.schema
    assert(sch("payload").dataType == BinaryType)
    assert(sch("meta").dataType.isInstanceOf[StructType])
    val row = mm.head()
    assert(new String(row.getAs[Array[Byte]]("payload"), "UTF-8") == "hello")
    assert(row.getAs[org.apache.spark.sql.Row]("meta").getAs[String]("lang") == "en")
  }

  test("payload meta: byte length + digest, no decode needed") {
    val docs = Seq((1L, "hello", "en", 5L)).toDF("doc_id", "text", "lang", "n_chars")
    val mm = Multimodal.attach(docs, "doc_id", "text", Seq("lang"))
    val r = Multimodal.payloadMeta(mm).head()
    assert(r.getAs[Long]("byte_len") == 5L)
    assert(r.getAs[String]("digest") ==
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824") // sha256("hello")
  }

  test("decodeAll is distributed, deterministic, and stable per payload") {
    implicit val s: SparkSession = spark
    val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(20)
    val mm = Multimodal.attach(docs, "doc_id", "text", Seq("lang"))
    val d1 = Multimodal.decodeAll(mm, Multimodal.MediaDecoder.deterministicFake).collect()
    val d2 = Multimodal.decodeAll(mm, Multimodal.MediaDecoder.deterministicFake).collect()
    assert(d1.length == 20)
    val m1 = d1.map(d => d.doc_id -> d).toMap
    d2.foreach { d =>
      val e = m1(d.doc_id)
      assert(e.width == d.width && e.height == d.height
        && e.features.toSeq == d.features.toSeq)
    }
    d1.foreach { d =>
      assert(d.width == (d.byte_len % 317).toInt + 1)
      assert(d.features.length == 8)
    }
  }

  test("media near-dup is pure composition: decoded features into the similarity stack") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val df = Seq(
      (1L, "identical media payload bytes"),
      (2L, "identical media payload bytes"), // byte-identical -> cosine 1.0
      (3L, "some other clip entirely, different length and content")
    ).toDF("doc_id", "text")
    val mm = Multimodal.attach(df, "doc_id", "text", Seq("doc_id"))
    val decoded = Multimodal.decodeAll(mm, Multimodal.MediaDecoder.deterministicFake).toDF()
    val pairs = Similarity.nearDupPairs(Multimodal.featureVectors(decoded),
        threshold = 0.99, nBits = 16, b = 4, r = 4)
      .select($"vec_a", $"vec_b", $"cosine").as[(Long, Long, Double)]
      .collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0),
      s"byte-identical payloads must pair at cosine 1.0: ${pairs.toSeq}")
  }

  test("phashPairs: identical payloads at hamming 0, unrelated ones absent") {
    val df = Seq(
      (1L, "identical media payload bytes rendered here"),
      (2L, "identical media payload bytes rendered here"),
      (3L, "a completely different clip with other bytes and another length entirely")
    ).toDF("doc_id", "text")
    val mm = Multimodal.attach(df, "doc_id", "text", Seq("doc_id"))
    val pairs = Multimodal.phashPairs(mm, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.contains((1L, 2L, 0L)),
      s"byte-identical payloads must pair at hamming 0: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated payload must not pair: $pairs")
    // the hash itself: 60-bit, deterministic, empty payload -> 0
    import graft.functions.ExprKernels
    val h = ExprKernels.perceptualHash60("abc".getBytes("UTF-8"))
    assert(h == ExprKernels.perceptualHash60("abc".getBytes("UTF-8")))
    assert((h >> 60) == 0L)
    assert(ExprKernels.perceptualHash60(Array.emptyByteArray) == 0L)
    graft.util.Caches.unpersistAll()
  }

  test("attachTyped prepends the declared magic; validate accepts it") {
    val df = Seq((1L, "hello", "png"), (2L, "world", "jpeg"),
      (3L, "abc", "wav")).toDF("doc_id", "text", "fmt")
    val typed = Multimodal.attachTyped(df, "doc_id", "text", "fmt")
    val out = Multimodal.validatePayloads(typed).orderBy("doc_id").collect()
    assert(out.forall(_.getBoolean(3)), "own magic must validate")
    assert(out.map(_.getLong(2)).toSeq == Seq(9L, 9L, 7L)) // text + 4
  }

  test("validate rejects wrong or unknown formats and short payloads") {
    val df = Seq((1L, "hello", "png"), (2L, "x", "gif"))
      .toDF("doc_id", "text", "fmt")
    val typed = Multimodal.attachTyped(df, "doc_id", "text", "fmt")
    // declare doc 1 as jpeg (payload carries png magic), keep doc 2's
    // unknown format (attachTyped gave it a NULL magic -> null payload)
    import org.apache.spark.sql.functions._
    val declared = typed.withColumn("format",
      when(col("doc_id") === 1L, lit("jpeg")).otherwise(col("format")))
    val out = Multimodal.validatePayloads(declared)
      .orderBy("doc_id").collect()
    assert(!out(0).getBoolean(3), "png payload declared jpeg must fail")
    assert(!out(1).getBoolean(3), "unknown format must fail")
    // a NULL payload under a KNOWN format quarantines (false, not null)
    val nullPayload = Seq((9L, "png"))
      .toDF("doc_id", "format")
      .withColumn("payload",
        org.apache.spark.sql.functions.lit(null).cast("binary"))
    val v = Multimodal.validatePayloads(nullPayload).head
    assert(!v.isNullAt(3) && !v.getBoolean(3))
  }

  test("validation stays a narrow codegen'd pass") {
    val df = Seq((1L, "hello", "png")).toDF("doc_id", "text", "fmt")
    val plan = Multimodal.validatePayloads(
      Multimodal.attachTyped(df, "doc_id", "text", "fmt"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must not shuffle:\n$plan")
  }
}
