package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video carried as opaque `binary`
  * columns with typed metadata, processed in partition-batched passes —
  * the Scala analogue of a Python `mapInPandas` pipeline (same batch
  * shape: the codec is invoked per batch of rows inside a partition,
  * never per driver-side row).
  *
  * The container has no image/audio codecs, so the decode step is a
  * SEAM: [[Codec]] is the boundary a real deployment implements with
  * its native library; [[FakeCodec]] is the deterministic stand-in
  * (byte-histogram "features", arithmetic "frames") that keeps every
  * piece of Spark plumbing — schema, binary encoding, partition
  * batching, explode shape — real and testable, and lets the DuckDB
  * oracle verify the full path bit-for-bit.
  *
  * Scale posture: all operators are narrow mapPartitions/projections
  * over the media table (no shuffle); feature vectors are fixed-width
  * arrays so downstream joins/ANN shuffle compact rows, and frame
  * explosion multiplies rows inside the partition (no repartition
  * needed until a downstream op asks for one).
  */
object Multimodal {

  /** media row: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** The codec seam. Real deployments bind an image/audio library
    * here; everything above this interface is production plumbing. */
  trait Codec extends Serializable {
    /** binary payload → fixed-width feature vector */
    def features(bytes: Array[Byte]): Array[Long]
    /** binary payload → sampled frame byte-ranges (offset, length) */
    def frames(bytes: Array[Byte], frameSize: Int): Seq[(Int, Int)]
  }

  /** Deterministic stand-in codec: 16-bin histogram of the high
    * nibble of each byte; frames = fixed-size byte slices. */
  object FakeCodec extends Codec {
    override def features(bytes: Array[Byte]): Array[Long] = {
      val h = new Array[Long](16)
      var i = 0
      while (i < bytes.length) { h((bytes(i) & 0xff) >> 4) += 1; i += 1 }
      h
    }
    override def frames(bytes: Array[Byte], frameSize: Int): Seq[(Int, Int)] = {
      val n = (bytes.length + frameSize - 1) / frameSize
      (0 until n).map(f => (f * frameSize, math.min(frameSize, bytes.length - f * frameSize)))
    }
  }

  /** Deterministic media fixture derived from `documents` (the
    * container ships no binary corpora): payload = UTF-8 text bytes,
    * metadata synthesized from doc fields. Clearly a fixture builder —
    * a real pipeline reads its own media table. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")).as("kind"),
      col("text").cast(BinaryType).as("bytes"),
      struct(
        lit("raw").as("format"),
        (col("n_chars") % 1920).cast(IntegerType).as("width"),
        (col("n_chars") % 1080).cast(IntegerType).as("height"),
        (col("n_chars") * 10L).as("duration_ms")).as("meta"))

  /** Feature extraction: partition-batched codec invocation (the
    * mapInPandas shape — one codec call per row inside the partition
    * iterator, no driver round-trip). Output: media_id + 16 longs. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      codec: Codec = FakeCodec): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) => (id, codec.features(bytes)) }
      }
      .toDF("media_id", "features")
  }

  /** Frame sampling: one output row per sampled frame, exploded
    * inside the partition. Output: media_id, frame_id, off, len. */
  def sampleFrames(spark: SparkSession, media: DataFrame, frameSize: Int,
      codec: Codec = FakeCodec): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          codec.frames(bytes, frameSize).zipWithIndex.map {
            case ((off, len), f) => (id, f.toLong, off.toLong, len.toLong)
          }
        }
      }
      .toDF("media_id", "frame_id", "off", "len")
  }

  /** Per-frame feature vectors for video rows: frames are sampled
    * AND featurized in one partition-local codec pass — the slice is
    * featurized while the payload bytes are in hand, so no join back
    * to the media table and no payload bytes in the output (fixed
    * 16-long vectors per frame). Output: media_id, frame_id,
    * features. */
  def frameFeatures(spark: SparkSession, media: DataFrame, frameSize: Int,
      codec: Codec = FakeCodec): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          codec.frames(bytes, frameSize).zipWithIndex.map {
            case ((off, len), f) =>
              (id, f.toLong,
                codec.features(java.util.Arrays.copyOfRange(bytes, off, off + len)))
          }
        }
      }
      .toDF("media_id", "frame_id", "features")
  }

  /** VAD-style energy segmentation over audio rows — the
    * silence-removal pre-pass an audio corpus runs before
    * transcription/training: fixed windows of `window` bytes (full
    * windows only), per-window energy = Σ byte² as Long (max
    * 255²·window ≪ 2⁶³ — no overflow at any window size that fits an
    * Int), a window is voiced iff energy ≥ threshold, segments =
    * maximal voiced runs. One partition-local pass with the payload
    * bytes in hand (the q28 codec discipline); output is 4 longs per
    * media row — the payload never leaves the map task. A real
    * deployment swaps the byte² energy for the codec's PCM frame
    * energy behind the same seam. */
  def energySegments(spark: SparkSession, media: DataFrame,
      window: Int = 64, threshold: Long = 628000L): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val nw = bytes.length / window
          var nv = 0L; var nseg = 0L; var prev = false
          var j = 0
          while (j < nw) {
            var e = 0L; var i = j * window; val end = i + window
            while (i < end) { val b = bytes(i) & 0xff; e += b.toLong * b; i += 1 }
            val v = e >= threshold
            if (v) { nv += 1; if (!prev) nseg += 1 }
            prev = v; j += 1
          }
          (id, nw.toLong, nv, nseg)
        }
      }
      .toDF("media_id", "n_windows", "n_voiced", "n_segments")
  }

  /** "Resize": new payload + updated metadata — with the fake codec a
    * byte-truncation; the real codec would re-encode. Shows the
    * binary-in/binary-out transform shape. */
  def resize(media: DataFrame, maxBytes: Int): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      expr(s"substring(bytes, 1, $maxBytes)").as("bytes"),
      struct(
        col("meta.format").as("format"),
        least(col("meta.width"), lit(64)).cast(IntegerType).as("width"),
        least(col("meta.height"), lit(64)).cast(IntegerType).as("height"),
        col("meta.duration_ms").as("duration_ms")).as("meta"))
}
