package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media travel as opaque `binary` columns with
  * a typed metadata struct; decode / feature-extract / resize / frame-sample
  * run as partition-local batch transforms (the Scala analogue of
  * `mapInPandas`: one iterator of rows in, one out, arrow-friendly shapes).
  *
  * The actual codec calls are STUBBED behind [[StubCodec]] (no image/audio
  * libraries in this environment) with a deterministic fake that derives
  * plausible metadata from the bytes — the Spark-side plumbing (schema,
  * batching, partitioning, binary hygiene) is real and tested.
  */
object Multimodal {

  /** Typed metadata carried alongside each media blob. */
  case class MediaMeta(kind: String, byteLen: Long, width: Int, height: Int,
                       channels: Int, sampleRateHz: Int, nFrames: Int)

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])
  case class DecodedRow(media_id: Long, kind: String, byteLen: Long,
                        width: Int, height: Int, channels: Int,
                        sampleRateHz: Int, nFrames: Int, features: Array[Float])

  /** Deterministic fake codec: everything is a pure function of the bytes,
    * so tests are stable. Replace with real decoders (javacv / ffmpeg /
    * javax.imageio) by swapping this object — the pipeline shape does not
    * change.
    */
  object StubCodec {
    def decode(kind: String, bytes: Array[Byte]): MediaMeta = {
      val h = bytes.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b)
      kind match {
        case "image" =>
          MediaMeta(kind, bytes.length, 64 + (math.abs(h) % 960).toInt,
            64 + (math.abs(h >> 7) % 540).toInt, 3, 0, 1)
        case "audio" =>
          MediaMeta(kind, bytes.length, 0, 0, if (h % 2 == 0) 1 else 2,
            16000, (bytes.length / 32).max(1))
        case _ => // video
          MediaMeta(kind, bytes.length, 640, 360, 3, 0,
            (bytes.length / 1024).max(1).toInt)
      }
    }

    /** Fixed-width feature vector (fake embedding) from the bytes. */
    def features(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        out(i % dim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Decode a binary media column into metadata + features. Partition-local
    * (`mapPartitions`): no shuffle, codec state amortized per partition the
    * way a real decoder pool would be.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (e.g. native decoder handle)
      rows.map { r =>
        val m = StubCodec.decode(r.kind, r.bytes)
        DecodedRow(r.media_id, r.kind, m.byteLen, m.width, m.height,
          m.channels, m.sampleRateHz, m.nFrames,
          StubCodec.features(r.bytes))
      }
    }
  }

  /** Frame sampling plan for video rows: one output row per sampled frame
    * index (every `stride`-th frame) — the explode happens on small
    * metadata, not on decoded frames, so the shuffle stays narrow.
    */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded.filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("nFrames") - 1, lit(0)),
          lit(stride))))
      .select(col("media_id"), col("frame_idx"))

  /** Resize request plumbing: records the target size next to the metadata;
    * the per-row pixel work would run inside the same mapPartitions as
    * [[decode]] in a real deployment.
    */
  def resizePlan(decoded: DataFrame, w: Int, h: Int): DataFrame =
    decoded.filter(col("kind") === "image")
      .select(col("media_id"), col("width"), col("height"),
        lit(w).as("target_w"), lit(h).as("target_h"),
        (col("width").cast("double") / w).as("scale_x"),
        (col("height").cast("double") / h).as("scale_y"))

  /** ViT-style patch tokenization plan: the `patch`×`patch` grid each
    * image resolves to (ceil division — edge patches are padded), its
    * token count, and the padding the preprocessor must add. Pure
    * metadata arithmetic, map-side; the pixel-space patch extraction
    * runs next to [[decode]]'s codec in the same partition-local batch,
    * consuming exactly this layout.
    */
  def patchPlan(images: DataFrame, patch: Int): DataFrame = {
    require(patch > 0, "patch size must be positive")
    def ceilDiv(c: org.apache.spark.sql.Column) =
      floor((c + lit(patch - 1)).cast("double") / patch).cast("int")
    images.select(col("media_id"), col("width"), col("height"),
        ceilDiv(col("width")).as("n_cols"),
        ceilDiv(col("height")).as("n_rows"))
      .withColumn("n_patches", col("n_cols") * col("n_rows"))
      .withColumn("pad_x", col("n_cols") * patch - col("width"))
      .withColumn("pad_y", col("n_rows") * patch - col("height"))
  }

  /** Build a media table from any table with a string payload (used by
    * tests and queries: the harness has no binary columns, so text bytes
    * stand in for media bytes — the plumbing is identical).
    */
  def fromText(docs: DataFrame, idCol: String, textCol: String,
               kind: String): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("media_id"), lit(kind).as("kind"),
        encode(col(textCol), "UTF-8").as("bytes"))
      .as[MediaRow]
  }
}
