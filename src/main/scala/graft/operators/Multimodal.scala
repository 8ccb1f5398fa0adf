package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract stages
  * (north-star extensions, SURVEY.md §7.6).
  *
  * The decode step is STUBBED — this container has no image/audio
  * codecs — with a deterministic fake that derives "decoded" metadata
  * purely from the payload bytes. Everything around it is the real
  * Spark plumbing a production pipeline needs: binary columns flow
  * through parquet scans untouched by projection pruning, the decode
  * runs as a typed `mapPartitions` (one iterator pass per partition,
  * the Scala analog of `mapInPandas` batch processing — the shape a
  * JNI/FFI codec call wants), and downstream aggregation is ordinary
  * codegen'd SQL.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, modality: String, byte_len: Long,
                           width: Int, height: Int, n_frames: Int,
                           checksum: Long)

  /** Wrap a document table as a media table: the text bytes stand in
    * for an encoded payload; modality assigned round-robin so every
    * branch is exercised.
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("payload"))

  /** STUB decode (deterministic fake): a real implementation would
    * call an image/audio codec here (e.g. via JNI) on each payload.
    * The fake decodes the payload as UTF-8 and derives metadata from
    * the CODEPOINT stream — byte-based arithmetic would silently
    * diverge from character-based oracles on any non-ASCII document
    * (found in review; the corpus's zh branch makes that real).
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, Long) = {
    val s = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
    val cps = s.codePoints().toArray
    val len = cps.length
    var checksum = 0L
    var i = 0
    while (i < len) { checksum = (checksum * 31 + cps(i)) % 1000000007L; i += 1 }
    val width = 64 + len % 256
    val height = 64 + (len * 7) % 256
    val frames = 1 + len % 8
    (width, height, frames, checksum)
  }

  /** Decode + feature-extract over the media table. `mapPartitions`
    * keeps one decoder instance per partition (decoder init is the
    * expensive part with a real codec) and streams rows through it.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("modality"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        // Real pipeline: initialize the codec once per partition here.
        rows.map { r =>
          val (w, h, f, cs) = decodeStub(r.payload)
          MediaFeatures(r.doc_id, r.modality, r.payload.length.toLong, w, h, f, cs)
        }
      }
  }

  /** Resize stage (stub): compute target dimensions for a bounding-box
    * resize to `maxDim` (aspect-preserving, integer arithmetic; a real
    * implementation would transform the payload here). No-op for
    * frames already inside the box.
    */
  def withResize(features: Dataset[MediaFeatures], maxDim: Int): DataFrame =
    features.toDF()
      .withColumn("long_side", greatest(col("width"), col("height")))
      .withColumn("resized_w",
        when(col("long_side") <= maxDim, col("width"))
          .otherwise((col("width") * maxDim / col("long_side")).cast("int")))
      .withColumn("resized_h",
        when(col("long_side") <= maxDim, col("height"))
          .otherwise((col("height") * maxDim / col("long_side")).cast("int")))
      .drop("long_side")

  /** Frame sampling: explode each video row into one row per sampled
    * frame (stride-sampled). With a real codec the frame payload would
    * be decoded here; the stub derives a deterministic frame checksum.
    * The plumbing is the real thing: a generator expression expanding
    * rows scan-side, no shuffle.
    */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int = 2): DataFrame =
    features.toDF()
      .filter(col("modality") === "video")
      .select(col("doc_id"), col("n_frames"), col("checksum"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
      .withColumn("frame_checksum",
        pmod(col("checksum") + col("frame_idx") * 2654435761L, lit(1000000007L)))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"), col("frame_checksum"))

  /** Per-modality statistics over the extracted features — ordinary
    * hash aggregation downstream of the decode stage.
    */
  def modalityStats(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF().groupBy(col("modality"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("byte_len")).as("total_bytes"),
        sum(col("width")).as("sum_width"),
        sum(col("height")).as("sum_height"),
        sum(col("n_frames")).as("sum_frames"),
        sum(col("checksum") % 1000L).as("checksum_probe"))

  /** MM4 — exact media dedup: identical binary payloads collapse to
    * one kept asset (min doc_id) regardless of modality tag or where
    * the bytes were crawled. The media twin of the text exact-dedup:
    * one hash aggregate keyed on the payload digest, no decode step
    * needed — content-addressing works on bytes. At 100 TB the md5
    * runs scan-side and only digests (16 B/row) shuffle, never the
    * payloads themselves.
    */
  def mediaDedup(media: DataFrame): DataFrame =
    media.groupBy(md5(col("payload")).as("payload_md5"))
      .agg(count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("kept_doc_id"))

  /** Bit j of the signature as a power-of-two literal; bit 63 is
    * Long.MinValue and is added LAST in the ascending fold, so the
    * running sum never leaves the long range (ANSI-safe, and the same
    * arithmetic the oracle's list_sum performs in HUGEINT before its
    * exact BIGINT cast).
    */
  private[graft] val SigPowers: Seq[Long] = Seq.tabulate(64)(1L << _)

  /** One 16-bit band region per mask; the mask value itself is the
    * band id, so the candidate join keys on (mask, sig & mask).
    */
  private[graft] val BandMasks: Seq[Long] =
    Seq(0xFFFFL, 0xFFFF0000L, 0xFFFF00000000L, 0xFFFF000000000000L)

  /** MM5 — perceptual near-duplicate detection (aHash, the
    * average-hash of classic image dedup): 64 "pixels" from the
    * decoded payload, each thresholded against the mean to one bit of
    * a 64-bit signature; near-dups are signature pairs within Hamming
    * distance 3, found via 4×16-bit LSH bands (pigeonhole: ≤3
    * differing bits leave at least one band intact, so banding loses
    * nothing at the chosen radius). The complement of [[mediaDedup]]:
    * md5 catches byte-exact copies, the perceptual hash catches
    * near-identical media whose bytes differ.
    *
    * The pixel extraction is the STUB decode: pixel j = a codepoint
    * polynomial hash (mod 256) of the j-th length/64 window — a real
    * codec would average the j-th tile of the decoded bitmap; the
    * signature/banding/Hamming plumbing downstream is exactly the
    * production shape and is what the oracle checks.
    *
    * Scale: signatures are one scan-side projection; the explode
    * factor is 4 bands; quadratic work is confined to same-band-key
    * buckets (the d4 LSH argument) and the Hamming verify is one
    * codegen'd bit_count per candidate.
    */
  def perceptualDedup(media: DataFrame): DataFrame = {
    // Native one-pass signature (functions.AHash64). The composable
    // HOF form was correct but Catalyst's inferred isnotnull(key)
    // pushdown duplicated the whole lambda tree below the projection
    // with its mean sub-aggregate re-inlined per element — O(64·len)
    // interpreted work per row (31 s at sf0.1 vs 0.5 s now).
    val s = media.select(col("doc_id"),
      graft.functions.AHashFunctions.ahash64(col("payload").cast("string")).as("sig"))
    val banded = s.select(col("doc_id"), col("sig"),
        explode(typedLit(BandMasks)).as("mask"))
      .withColumn("key", col("sig").bitwiseAND(col("mask")))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.mask") === col("b.mask") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("int"))
      .filter(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
