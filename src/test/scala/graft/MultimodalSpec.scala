package graft

import org.apache.spark.sql.functions._

import graft.functions.Multimodal

/** Multimodal plumbing: schema shape, per-partition batch decode stub,
  * resize, frame sampling — all deterministic, no codecs.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val media = Multimodal.mediaFromDocuments(spark, docs)

  test("media table: binary payload + typed metadata, kinds partitioned") {
    val rows = media.limit(10).collect()
    assert(rows.forall(_.payload.nonEmpty))
    assert(media.select("kind").distinct().count() == 3)
    assert(media.count() == docs.count())
  }

  test("extractFeatures: deterministic stub features, payload projected away") {
    val feats = Multimodal.extractFeatures(media)
    val again = Multimodal.extractFeatures(media)
    assert(feats.select("media_id", "checksum").exceptAll(
      again.select("media_id", "checksum")).isEmpty)
    val f = feats.filter($"media_id" === 0L).head()
    assert(f.feature.length == 8)
    assert(f.n_bytes > 0)
  }

  test("resizeStub halves payload and dimensions consistently") {
    val resized = Multimodal.resizeStub(media.limit(20), factor = 2)
    val joined = media.limit(20).select($"media_id", $"meta_width".as("w0"),
        length($"payload").as("len0"))
      .join(resized.select($"media_id", $"meta_width".as("w1"),
        length($"payload").as("len1")), Seq("media_id"))
    assert(joined.filter($"len1" > ($"len0" + 1) / 2).count() == 0)
    assert(joined.filter($"w1" =!= greatest(expr("w0 div 2"), lit(1))).count() == 0)
  }

  test("sampleFrames yields bounded per-frame slices with ordinals") {
    val frames = Multimodal.sampleFrames(media.limit(10), stride = 64, frameLen = 32)
    assert(frames.filter(length($"frame_bytes") > 32).count() == 0)
    val perDoc = frames.groupBy("media_id").count()
    assert(perDoc.filter($"count" > 16).count() == 0) // cap respected
    assert(frames.filter($"frame_no" < 0).count() == 0)
  }
}
