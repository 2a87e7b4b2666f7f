package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Multimodal column support (SURVEY §2.3): media rides through the engine
  * as an opaque `binary` payload plus typed metadata; decode/feature
  * extraction runs per-partition behind a pluggable decoder.
  *
  * Design for 100 TB: payloads NEVER pass through a driver or a Python
  * round-trip — the decode path is `mapPartitions` over the binary column
  * (one JVM pass, batch-friendly), and everything before/after it is plain
  * columnar Spark. Real image/audio codecs are not available in this
  * environment, so [[MediaDecoder.deterministicFake]] derives stable fake
  * dimensions/features from the payload bytes; the Spark-side plumbing
  * (schema, partitioning, batch shape) is the real, tested artifact and a
  * codec drops in behind the same trait.
  */
object Multimodal {

  /** A decoded media record: fixed, engine-friendly schema. */
  final case class Decoded(
      doc_id: Long,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Float])

  /** Pluggable per-payload decoder. Implementations must be serializable
    * (executed inside tasks) and deterministic for a given payload.
    */
  trait MediaDecoder extends Serializable {
    def decode(id: Long, payload: Array[Byte]): Decoded
  }

  object MediaDecoder {

    /** Deterministic stand-in for a real codec: dimensions and features are
      * pure functions of the payload bytes. A production decoder (JPEG
      * probe, audio resample, video frame-sample) replaces exactly this.
      */
    val deterministicFake: MediaDecoder = new MediaDecoder {
      override def decode(id: Long, payload: Array[Byte]): Decoded = {
        val n = payload.length.toLong
        val feat = Array.tabulate(8) { i =>
          // stable per-payload feature: byte sums over strided slices
          var s = 0L; var j = i
          while (j < payload.length) { s += payload(j) & 0xff; j += 8 }
          (s % 1009).toFloat
        }
        Decoded(id, n, (n % 317).toInt + 1, ((n * 7919) % 211).toInt + 1,
          (n % 7).toInt + 1, feat)
      }
    }
  }

  /** Wrap a text corpus as a multimodal table: opaque binary payload +
    * struct metadata. (With real media the payload comes off the source as
    * binary already; this adapter exists so the pipeline is exercisable on
    * the synthetic corpus.)
    */
  def attach(df: DataFrame, idCol: String, textCol: String,
      metaCols: Seq[String]): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(metaCols.map(col): _*).as("meta"))

  /** Columnar payload metadata — no decode needed, stays in codegen:
    * byte length + content digest (the dedup/key column for binary blobs).
    */
  def payloadMeta(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      length(col("payload")).cast("long").as("byte_len"),
      sha2(col("payload"), 256).as("digest"))

  /** Magic-byte prefixes for the container formats the validator knows.
    * (Real ingestion adds rows here; the mechanism is format-agnostic.)
    */
  val Magics: Map[String, Array[Byte]] = Map(
    "png" -> Array(0x89, 'P', 'N', 'G').map(_.toByte),
    "jpeg" -> Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte),
    "wav" -> "RIFF".getBytes("US-ASCII").toIndexedSeq.toArray)

  /** [[attach]] with a declared container format: the payload is the
    * format's magic-byte header followed by the UTF-8 text bytes — the
    * synthetic stand-in for media that arrives with a container header,
    * so header validation is exercisable end-to-end.
    */
  def attachTyped(df: DataFrame, idCol: String, textCol: String,
      formatCol: String): DataFrame = {
    val magic = Magics.foldLeft(lit(null).cast("binary")) {
      case (els, (f, bytes)) =>
        when(col(formatCol) === f, lit(bytes)).otherwise(els)
    }
    df.select(
      col(idCol).as("doc_id"),
      col(formatCol).as("format"),
      concat(magic, encode(col(textCol), "UTF-8")).as("payload"))
  }

  /** Header validation / corrupt-payload quarantine: checks each payload's
    * leading bytes against the magic of its DECLARED format — the ingest
    * screen that keeps a truncated upload or a mislabeled container out of
    * the decode stage (where a real codec would throw mid-job instead of
    * at a quarantine row).
    *
    * Output: (doc_id, format, byte_len, valid). An undeclared/unknown
    * format is invalid (never silently passed). Pure narrow codegen'd
    * byte work — `substring` on the binary column against plan-literal
    * hex — no decode, no shuffle; at 100 TB this is scan-bound and the
    * payload never leaves its partition.
    */
  def validatePayloads(df: DataFrame): DataFrame = {
    val valid = Magics.foldLeft(lit(false)) { case (els, (f, bytes)) =>
      when(col("format") === f,
        hex(substring(col("payload"), 1, bytes.length)) ===
          bytes.map(b => f"$b%02X").mkString).otherwise(els)
    }
    // coalesce: a NULL payload (or NULL format) must QUARANTINE, not
    // propagate SQL null through the comparison into a null verdict
    df.select(col("doc_id"), col("format"),
      length(col("payload")).cast("long").as("byte_len"),
      coalesce(valid, lit(false)).as("valid"))
  }

  /** Frame sampling: one output row per kept frame (every `everyN`-th,
    * starting at frame 1) — the columnar explode pattern a video pipeline
    * uses to turn clip rows into frame rows without ever materializing
    * payloads on the driver. Operates on the DECODED table so the frame
    * count always comes from whatever [[MediaDecoder]] produced it — never
    * from a parallel re-derivation that could disagree with the decoder.
    */
  def frameSample(decoded: DataFrame, everyN: Int): DataFrame =
    decoded
      .select(col("doc_id"), col("byte_len"),
        col("n_frames").cast("long").as("n_frames"))
      .select(col("doc_id"), col("byte_len"),
        explode(filter(sequence(lit(1L), col("n_frames")),
          i => (i - 1) % everyN === 0)).as("frame_idx"))
      .withColumn("frame_hash",
        (col("byte_len") * 31 + col("frame_idx")) % 1000000007L)

  /** Integer aspect-preserving resize metadata: scale the fake decoded
    * dimensions to fit `maxDim`, exact integer arithmetic only (engine-
    * portable: floor((d * maxDim) / longest)).
    */
  def resizeMeta(decoded: DataFrame, maxDim: Int): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val needs = longest > maxDim
    // floor() so both engines take the integer-division branch (a bare
    // double cast truncates in Spark but ROUNDS in DuckDB)
    decoded.select(col("doc_id"), col("width"), col("height"),
      when(needs, floor(col("width").cast("long") * maxDim / longest))
        .otherwise(col("width")).cast("long").as("resized_w"),
      when(needs, floor(col("height").cast("long") * maxDim / longest))
        .otherwise(col("height")).cast("long").as("resized_h"))
  }

  /** Decoded feature vectors shaped for the similarity stack:
    * (vec_id, embedding). Media near-dup is then pure composition —
    * `Similarity.nearDupPairs(featureVectors(decoded), …)` runs the same
    * sign-LSH machinery over perceptual features that it runs over text
    * embeddings (MultimodalSpec exercises exactly that).
    */
  def featureVectors(decoded: DataFrame): DataFrame =
    decoded.select(col("doc_id").as("vec_id"), col("features").as("embedding"))

  /** 60-bit perceptual average-hash per payload — one narrow codegen'd
    * pass ([[graft.functions.Expressions.PerceptualHash]]); at 100 TB
    * this is a pure map over the binary scan, and the hash column is
    * what ships to the dedup join, never the payload.
    */
  def perceptualHashes(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.Expressions.PerceptualHash(
          org.apache.spark.sql.GraftColumnBridge.expression(col("payload"))))
        .as("simhash"))

  /** Media near-dup pairs by perceptual-hash Hamming distance — aHash +
    * banded Hamming join, the standard image-dedup recipe, riding
    * [[Dedup.fingerprintPairs]]'s pigeonhole banding (recall-complete at
    * `maxHamming`, so the result EQUALS the all-pairs filter). Output
    * (doc_a, doc_b, hamming).
    */
  def phashPairs(df: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 4096): DataFrame =
    Dedup.fingerprintPairs(perceptualHashes(df), maxHamming, maxBucket)

  /** Distributed decode: one `mapPartitions` pass over (id, payload).
    * Partitioning is preserved; no shuffle, no driver collection.
    */
  def decodeAll(df: DataFrame, decoder: MediaDecoder)(
      implicit spark: SparkSession): Dataset[Decoded] = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => decoder.decode(id, payload) })
  }
}
