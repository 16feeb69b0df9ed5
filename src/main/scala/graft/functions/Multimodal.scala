package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star): image/audio/video as
  * opaque `binary` columns with typed metadata.
  *
  * The Spark-side shape is real and tested — schema, partitioning,
  * batched per-partition processing — while the actual media decode is
  * STUBBED (this container has no image/audio codecs): `decodeStub`
  * derives deterministic fake features from the bytes. Swapping in a
  * real decoder (JNI/ONNX/etc.) changes only the function body, not
  * the pipeline shape.
  *
  * Design for 100 TB: media rows are processed with `mapPartitions`
  * (one decoder init per partition, streamed batches — the Scala
  * analogue of `mapInPandas`), binary payloads never enter a shuffle
  * (feature extraction projects them away first), and metadata columns
  * stay columnar for pushdown.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      payload: Array[Byte],
      meta_width: Int,
      meta_height: Int,
      meta_duration_ms: Long,
  )

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Float], // stub embedding
  )

  /** STUB decode — deterministic fake standing in for a codec:
    * features are a hash-derived vector of the payload. Marked clearly;
    * replace with a real decoder off-container.
    */
  def decodeStub(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    var h = 1125899906842597L // FNV-ish rolling
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      h = h * 31 + (payload(i) & 0xff)
      out(i % dim) += ((h % 1000L).toFloat / 1000f)
      i += 1
    }
    out
  }

  private def checksum(payload: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < payload.length) { h = h * 131 + (payload(i) & 0xff); i += 1 }
    h
  }

  /** Batched per-partition feature extraction: decoder state (here,
    * nothing; in reality a codec/model handle) is initialized once per
    * partition and streamed over the rows — the Scala analogue of a
    * `mapInPandas` batch UDF.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          n_bytes = r.payload.length.toLong,
          checksum = checksum(r.payload),
          feature = decodeStub(r.payload),
        )
      }
    }
  }

  /** "Frame sampling" on the opaque payload: every `stride`-th byte
    * window — the plumbing shape of video frame extraction (explode to
    * one row per frame, payload sliced per frame).
    */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int, frameLen: Int)
      : DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val n = math.max(0, (r.payload.length - frameLen) / stride + 1)
      (0 until math.min(n, 16)).map { f =>
        val off = f * stride
        (r.media_id, f, r.payload.slice(off, off + frameLen))
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }

  /** STUB resize — deterministic byte-domain downsample standing in
    * for an image resize: keeps every `factor`-th byte and scales the
    * metadata dimensions accordingly. The pipeline shape (narrow
    * per-row transform, metadata kept consistent with payload) is what
    * a real resize kernel slots into.
    */
  def resizeStub(media: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val down = r.payload.zipWithIndex.collect {
        case (b, i) if i % factor == 0 => b
      }
      r.copy(
        payload = down,
        meta_width = math.max(1, r.meta_width / factor),
        meta_height = math.max(1, r.meta_height / factor),
      )
    }
  }

  /** Build a deterministic media table from the documents fixture
    * (text bytes as payload) — exercises the full pipeline without
    * codecs.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("doc_id"), lit(1920)) + 1).cast("int").as("meta_width"),
      (pmod(col("doc_id"), lit(1080)) + 1).cast("int").as("meta_height"),
      (col("n_chars") * 40).as("meta_duration_ms"),
    ).as[MediaRecord]
  }

  /** Columnar metadata + payload-size profile (no decode needed —
    * stays fully codegen'd; the query the catalog/pushdown layer
    * answers without touching payload bytes).
    */
  def mediaProfile(media: Dataset[MediaRecord]): DataFrame =
    media.toDF().groupBy(col("kind")).agg(
      count(lit(1)).as("n"),
      sum(length(col("payload")).cast("long")).as("total_bytes"),
      max(col("meta_width")).as("max_width"),
      max(col("meta_duration_ms")).as("max_duration_ms"))
}
