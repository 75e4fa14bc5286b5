package graft.operators

import graft.functions.HashOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns plus typed metadata — the layout a
  * 100 TB training pipeline actually uses (payload stays columnar,
  * predicate/metadata pruning works, only matched rows' bytes are read).
  *
  * The decode step (JPEG/PNG/audio codecs) requires native libraries not
  * present in this container, so `decodeStub` is a clearly-marked
  * DETERMINISTIC FAKE: it derives a fixed-shape feature vector from the
  * bytes. Everything around it — the schema, the per-partition batched
  * execution, the resize/frame-sample signatures, the partitioning — is
  * real and tested; swapping the stub for a JNI codec changes one function.
  */
object Multimodal {

  /** One media row: payload + metadata. The metadata travels in columns so
    * scans can prune on it without touching bytes. */
  case class MediaRecord(media_id: Long, kind: String, width: Int,
                         height: Int, payload: Array[Byte])

  case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
                           checksum: Long, feature: Array[Float])

  /** Wrap a text table into a synthetic media table (payload = UTF-8
    * bytes) — the test harness's stand-in for real image bytes. */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      (when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio")
        .otherwise("video")).as("kind"),
      (pmod(col(idCol), lit(640)) + 32).cast("int").as("width"),
      (pmod(col(idCol), lit(480)) + 32).cast("int").as("height"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB — stands in for the real codec. Deterministic: feature[i] is a
    * mixed hash of the payload bytes and i, scaled to [-1, 1]. */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    var h = HashOps.FnvOffset
    var i = 0
    while (i < payload.length) { h ^= (payload(i) & 0xffL); h *= HashOps.FnvPrime; i += 1 }
    Array.tabulate(dim) { d =>
      (HashOps.mix64(h ^ d.toLong).toDouble / Long.MaxValue.toDouble).toFloat
    }
  }

  /** Batched per-partition feature extraction. `mapPartitions` (not `map`)
    * so a real decoder can amortize codec/model initialization once per
    * partition — the Scala analog of pandas-batched UDF execution. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 16)
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: initialize decoder/model HERE, once per partition
      it.map { m =>
        val feat = decodeStub(m.payload, dim)
        var crc = HashOps.FnvOffset
        var i = 0
        while (i < m.payload.length) { crc ^= (m.payload(i) & 0xffL); crc *= HashOps.FnvPrime; i += 1 }
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, crc, feat)
      }
    }
  }

  /** Resize signature (stub): real impl rescales pixels; here it just
    * re-tags metadata — the plumbing (column update, no payload copy on
    * the Spark side) is what's exercised. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("width", lit(w)).withColumn("height", lit(h))

  /** Aspect-preserving fit-within-box resize metadata: no upscaling; the
    * binding side (decided in exact integer arithmetic: width binds iff
    * w·maxH ≥ h·maxW) maps to the box edge, the other side scales by the
    * same ratio with floor. Pure column math — at scale this annotates
    * billions of rows without touching payload bytes; the real resampler
    * consumes (out_w, out_h) per row afterwards. */
  def resizeMeta(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("width").cast("long")
    val h = col("height").cast("long")
    val fits = w <= maxW && h <= maxH
    val widthBinds = w * maxH >= h * maxW
    media
      .withColumn("out_w",
        when(fits, w).otherwise(
          when(widthBinds, lit(maxW.toLong))
            .otherwise(floor(w * maxH / h).cast("long"))))
      .withColumn("out_h",
        when(fits, h).otherwise(
          when(widthBinds, floor(h * maxW / w).cast("long"))
            .otherwise(lit(maxH.toLong))))
  }

  /** Per-frame feature extraction for video rows: frame-sample then decode
    * each (media, frame) — the stub varies the feature by frame number the
    * way a real decoder would vary it by frame content. One generator +
    * one mapPartitions pass, no shuffle. */
  def extractFrameFeatures(media: Dataset[MediaRecord], framesPerVideo: Int,
                           dim: Int = 16)
                          (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.filter(_.kind == "video")
      .flatMap { m =>
        (0 until framesPerVideo).iterator.map { f =>
          // real impl: decode frame f's pixels; stub: payload hash ⊕ frame
          val feat = decodeStub(m.payload :+ f.toByte, dim)
          (m.media_id, f, feat)
        }
      }
      .toDF("media_id", "frame_no", "feature")
  }

  /** Frame sampling for video rows: emit `n` (media_id, frame_no) rows per
    * video — posexplode keeps it one shuffle-free generator. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("kind"),
        posexplode(sequence(lit(0), lit(n - 1))).as(Seq("frame_idx", "frame_no")))
      .select(col("media_id"), col("kind"), col("frame_no"))
}
