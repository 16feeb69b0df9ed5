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

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("real image decode: dims + channel means from an actual PNG") {
    // solid red 16x8 → feature = [w, h, aspect, luma, r, g, b, nonzero]
    val (w0, h0, feat) = Multimodal.decodeImage(pngBytes(16, 8, 0xff0000)).get
    assert((w0, h0) == (16, 8))
    assert(feat(0) == 16f && feat(1) == 8f && feat(2) == 2f)
    assert(feat(4) == 1f && feat(5) == 0f && feat(6) == 0f) // pure red
    assert(feat(7) == 1f) // every pixel non-black
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
  }

  test("extractFeatures takes the real decode path for image payloads") {
    val recs = Seq(
      Multimodal.MediaRecord(1L, "image", pngBytes(10, 10, 0x00ff00), 10, 10, 0L),
      Multimodal.MediaRecord(2L, "audio", Array[Byte](1, 2, 3), 0, 0, 10L),
    ).toDS()
    val byId = Multimodal.extractFeatures(recs).collect()
      .map(f => f.media_id -> f).toMap
    assert(byId(1L).feature(0) == 10f && byId(1L).feature(5) == 1f) // real dims, green
    assert(byId(2L).feature.length == 8) // stub arm still works
  }

  test("resize really rescales image payloads (decode of output confirms)") {
    val recs = Seq(
      Multimodal.MediaRecord(1L, "image", pngBytes(32, 16, 0x123456), 32, 16, 0L),
    ).toDS()
    val out = Multimodal.resize(recs, factor = 4).head()
    assert(out.meta_width == 8 && out.meta_height == 4)
    val (w1, h1, _) = Multimodal.decodeImage(out.payload).get
    assert((w1, h1) == (8, 4)) // the payload itself was re-encoded at 8x4
  }

  test("sampleFrames yields bounded per-frame slices with ordinals") {
    val frames = Multimodal.sampleFrames(media.limit(10), stride = 64, frameLen = 32)
    assert(frames.filter(length($"frame_bytes") > 32).count() == 0)
    val perDoc = frames.groupBy("media_id").count()
    assert(perDoc.filter($"count" > 16).count() == 0) // cap respected
    assert(frames.filter($"frame_no" < 0).count() == 0)
  }

  test("withRealImages: image payloads become decodable PNGs; features carry true dims") {
    val real = Multimodal.withRealImages(media.limit(30))
    val imgs = real.filter($"kind" === "image").collect()
    assert(imgs.nonEmpty)
    for (r <- imgs) {
      val (w, h, _) = Multimodal.decodeImage(r.payload)
        .getOrElse(fail(s"image payload ${r.media_id} not decodable"))
      assert((w, h) == (r.meta_width, r.meta_height))
    }
    // the feature vector's first two entries are the DECODED dims —
    // proof the query path measures real raster work, not the stub
    val feats = Multimodal.extractFeatures(real)
      .filter($"kind" === "image").collect()
    for (f <- feats) {
      val rec = imgs.find(_.media_id == f.media_id).get
      assert(f.feature(0) == rec.meta_width.toFloat
        && f.feature(1) == rec.meta_height.toFloat)
    }
    // determinism: regeneration is bit-identical (checksums equal)
    val again = Multimodal.extractFeatures(Multimodal.withRealImages(media.limit(30)))
    assert(Multimodal.extractFeatures(real).select("media_id", "checksum")
      .exceptAll(again.select("media_id", "checksum")).isEmpty)
  }

  test("sampleFrames on real images emits decodable raster strips") {
    val real = Multimodal.withRealImages(media.limit(30))
      .filter($"kind" === "image")
    val frames = Multimodal.sampleFrames(real, stride = 64, frameLen = 32)
      .collect()
    assert(frames.nonEmpty)
    val dims = real.collect().map(r => r.media_id -> r.meta_width).toMap
    for (f <- frames) {
      val (w, _, _) = Multimodal.decodeImage(f.getAs[Array[Byte]]("frame_bytes"))
        .getOrElse(fail(s"frame of ${f.getLong(0)} not a decodable PNG strip"))
      assert(w == dims(f.getLong(0))) // full-width horizontal strips
    }
    // strip count = min(maxFrames=16 default, image height), exactly
    val heights = real.collect().map(r => r.media_id -> r.meta_height).toMap
    for ((id, fs) <- frames.groupBy(_.getLong(0)))
      assert(fs.length == math.min(16, heights(id)))
  }

  test("real audio decode: rate, frame count, and descriptors from an actual WAV") {
    val wav = Multimodal.syntheticWav(seed = 11L, ms = 250)
    val (rate, frames, feat) = Multimodal.decodeAudio(wav)
      .getOrElse(fail("synthetic WAV not decodable"))
    assert(rate == 8000f)
    assert(frames == 2000L) // 250 ms at 8 kHz
    assert(feat(0) == 8f && math.abs(feat(1) - 0.25f) < 1e-6) // kHz + duration s
    assert(feat(2) > 0.1f && feat(2) < 0.9f) // tone+noise RMS, sane range
    assert(feat(3) > 0f && feat(3) < 1f)     // zero-crossing rate
    assert(math.abs(feat.slice(4, 8).sum - 1f) < 1e-3) // energy quarters sum to 1
    // determinism: regeneration decodes to identical features
    assert(Multimodal.decodeAudio(Multimodal.syntheticWav(11L, 250))
      .get._3.toSeq == feat.toSeq)
    // non-audio bytes refuse cleanly
    assert(Multimodal.decodeAudio("not a wav".getBytes).isEmpty)
  }

  test("extractFeatures takes the real decode path for audio payloads") {
    val real = Multimodal.withRealMedia(media.limit(30))
    val auds = real.filter($"kind" === "audio").collect()
    assert(auds.nonEmpty)
    val feats = Multimodal.extractFeatures(real)
      .filter($"kind" === "audio").collect()
    for (f <- feats) {
      val rec = auds.find(_.media_id == f.media_id).get
      assert(f.feature(0) == 8f) // decoded sample rate, not a byte hash
      assert(math.abs(f.feature(1) - rec.meta_duration_ms / 1000f) < 1e-3)
    }
  }

  test("resize really resamples audio payloads (decode of output confirms)") {
    val wav = Multimodal.syntheticWav(seed = 5L, ms = 200) // 1600 frames @ 8 kHz
    val (resampled, newRate) = Multimodal.resampleAudio(wav, 2)
      .getOrElse(fail("resample refused a synthetic WAV"))
    assert(newRate == 4000f)
    val (rate, frames, feat) = Multimodal.decodeAudio(resampled)
      .getOrElse(fail("resampled output not decodable"))
    assert(rate == 4000f && frames == 800L)
    assert(math.abs(feat(1) - 0.2f) < 1e-3) // duration preserved: 200 ms
    // via the Dataset surface: audio rows keep their duration metadata
    val rec = Multimodal.MediaRecord(3L, "audio", wav, 0, 0, 200L)
    val out = Multimodal.resize(Seq(rec).toDS(), 2).head()
    assert(out.meta_duration_ms == 200L)
    assert(Multimodal.decodeAudio(out.payload).get._1 == 4000f)
  }

  test("sampleFrames golden: fixed synthetic PNG yields byte-stable strips") {
    // Pins the whole decode→slice→re-encode path: any change to the
    // synthetic raster generator, the strip geometry, or the PNG
    // encoder configuration shows up as a digest mismatch here (the
    // oracle cannot see frame BYTES — media_frames is rows-only).
    val rec = Multimodal.MediaRecord(7L, "image",
      Multimodal.syntheticPng(7L, 10, 9), 10, 9, 0L)
    val frames = Multimodal
      .sampleFrames(Seq(rec).toDS(), stride = 64, frameLen = 32, maxFrames = 4)
      .orderBy("frame_no").collect()
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    def digest(b: Array[Byte]): String = java.security.MessageDigest
      .getInstance("MD5").digest(b).map("%02x".format(_)).mkString
    val got = frames.map(f => digest(f.getAs[Array[Byte]]("frame_bytes"))).toSeq
    val expected = Seq(
      "da55b6f989f1c4bafabc63e359a779e7", "97b14c6f408b1ebea6b53fa05ae064e1",
      "940ec80eda64cdaaeb8a5a87d1c93ddd", "4680f522d37ffb47a195fe9d5f093918")
    assert(got == expected, s"golden frame digests drifted: $got")
  }

  test("audio golden: fixed synthetic WAV yields byte-stable container and PCM") {
    // The PCM symmetric twin of the PNG golden above: pins the WAV
    // generator, the RIFF container encoder, the AudioSystem decode
    // path, and the decimating resampler at the BYTE level — the
    // strongest check available where the oracle cannot run
    // (media_features/media_frames are rows-only for audio payloads).
    def digest(b: Array[Byte]): String = java.security.MessageDigest
      .getInstance("MD5").digest(b).map("%02x".format(_)).mkString
    val wav = Multimodal.syntheticWav(seed = 11L, ms = 250)
    val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav)).readAllBytes()
    val (resampled, _) = Multimodal.resampleAudio(wav, 2).get
    val got = Seq(digest(wav), digest(pcm), digest(resampled))
    val expected = Seq(
      "b8f684ffa6c70a83b331b3930793f7d3", "f467d584d2155fe115cdcada0746a32f",
      "df460317f41f78fb5fc6b1336bfdac96")
    assert(got == expected, s"golden audio digests drifted: $got")
    // the container round-trips: PCM re-wrapped at the same format is
    // byte-identical to the generator's own output
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val rewrapped = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2L),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    assert(digest(rewrapped) == got.head)
  }

  test("pHash: re-encode invariant, resize-proximate on structured images, far for unrelated") {
    // a STRUCTURED image (smooth gradient + a block) — pHash's
    // low-frequency claim is about real image content, not noise
    def structuredPng(shift: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) {
        val base = ((x + shift) * 255 / 64) & 0xff
        val block = if (x > 40 && y > 30) 200 else 0
        val v = math.min(255, base / 2 + block)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val a = structuredPng(0)
    val h = Multimodal.pHash(a).get
    // lossless re-encode (factor-1 resize keeps the raster) → identical
    val reenc = Multimodal.resizeImage(a, 1).get._1
    assert(Multimodal.pHash(reenc).get == h)
    // half-size downscale preserves the low-frequency structure
    val half = Multimodal.resizeImage(a, 2).get._1
    val dNear = java.lang.Long.bitCount(h ^ Multimodal.pHash(half).get)
    assert(dNear <= 10, s"resized variant drifted $dNear bits")
    // unrelated noise rasters sit far away
    val noise = Multimodal.pHash(Multimodal.syntheticPng(9L, 64, 48)).get
    val dFar = java.lang.Long.bitCount(h ^ noise)
    assert(dFar > 15, s"unrelated image only $dFar bits away")
    // non-image payloads refuse, not garbage
    assert(Multimodal.pHash("not an image".getBytes).isEmpty)
  }

  test("audioFingerprint: invariant under uniform gain, far for unrelated, refuses non-audio") {
    def scaled(payload: Array[Byte], num: Int, den: Int): Array[Byte] = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      val bytes = ais.readAllBytes()
      var i = 0
      while (i < bytes.length / 2) {
        val v = ((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
        val s = (v * num / den).toShort
        bytes(2 * i) = (s & 0xff).toByte
        bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val out = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, bytes.length / 2)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(out,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    val wav = Multimodal.syntheticWav(5L, ms = 200)
    val h = Multimodal.audioFingerprint(wav).get
    // halved gain: energy-delta signs survive (integer truncation can
    // flip only near-tied frames)
    val dGain = java.lang.Long.bitCount(
      h ^ Multimodal.audioFingerprint(scaled(wav, 1, 2)).get)
    assert(dGain <= 4, s"gain change drifted $dGain bits")
    // unrelated signal sits far away
    val other = Multimodal.audioFingerprint(Multimodal.syntheticWav(6L, 200)).get
    val dFar = java.lang.Long.bitCount(h ^ other)
    assert(dFar > 12, s"unrelated audio only $dFar bits away")
    assert(Multimodal.audioFingerprint("not audio".getBytes).isEmpty)
  }

  test("banded Hamming pairs ≡ all-pairs at r = 10 (the media near-dup path)") {
    // adversarial 64-bit fixture: seed hashes with planted neighbors at
    // distances straddling the radius (10 in, 11 out), bits flipped in
    // ONE band (band-collision stress) and SPREAD across bands, plus
    // sign-bit values (shiftrightunsigned discipline) and pseudo-random
    // unrelated fill — then prove the pigeonhole candidates + verify
    // reproduce the exact all-pairs answer bit for bit.
    def flipLow(h: Long, k: Int): Long = (0 until k).foldLeft(h)((a, i) => a ^ (1L << i))
    def flipSpread(h: Long, k: Int): Long =
      (0 until k).foldLeft(h)((a, i) => a ^ (1L << ((i * 6 + 1) % 64)))
    val seed = 0x9e3779b97f4a7c15L
    val rnd = (0 until 40).map(i => seed * (i + 1) ^ (seed >>> (i % 23)))
    val planted = Seq(
      -1L, flipLow(-1L, 10),                 // dist 10, one-band burst, sign bit
      0x8000000000000000L, flipSpread(0x8000000000000000L, 11), // dist 11: out
      42L, flipSpread(42L, 10),              // dist 10 spread over bands
      42L ^ (1L << 63), 0L, 1L)              // near-misc fill
    val hashes = (rnd ++ planted).zipWithIndex
      .map { case (h, i) => (i.toLong, h) }.toDF("media_id", "fp")
    val exact = hashes.select($"media_id".as("a_id"), $"fp".as("a_h"))
      .join(hashes.select($"media_id".as("b_id"), $"fp".as("b_h")),
        $"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        bit_count($"a_h".bitwiseXOR($"b_h")).cast("long").as("hamming"))
      .filter($"hamming" <= 10)
    val banded = graft.functions.Dedup
      .bandedHammingPairs(hashes, "media_id", "fp", maxHamming = 10)
    assert(banded.exceptAll(exact).isEmpty && exact.exceptAll(banded).isEmpty,
      "banded candidate generation diverged from the all-pairs reference")
    assert(exact.count() >= 2, "fixture planted no in-radius pairs — test is vacuous")
  }

  test("alignmentGate: hand-computed pair-swap cosines, wrap-around negatives, gate flags") {
    // image docs are doc_id % 3 == 0; towers: caption = embedding,
    // image = adjacent-pair swap. Hand-picked vectors:
    //   0: (2,2,4,4)   swap-invariant  → cos_true = 1  (kept)
    //   3: (1,-1,1,-1) swap-negated    → cos_true = -1
    //   6: (1,0,0,0)   swap-orthogonal → cos_true = 0
    val docs = Seq(0L, 3L, 6L).map(i => (i, "img doc", "en", "web", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val emb = Seq(
      (0L, Seq(2f, 2f, 4f, 4f)),
      (3L, Seq(1f, -1f, 1f, -1f)),
      (6L, Seq(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val got = Multimodal.alignmentGate(spark, docs, emb,
        buckets = 1, threshold = 0.1)
      .as[(Long, Long, Long, Double, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(0L, 3L, 6L))
    // single bucket → successor chain 0→3→6→0 (wrap)
    assert(got(0L)._3 == 3L && got(3L)._3 == 6L && got(6L)._3 == 0L)
    assert(math.abs(got(0L)._4 - 1.0) < 1e-9)
    assert(math.abs(got(3L)._4 + 1.0) < 1e-9)
    assert(got(6L)._4 == 0.0)
    assert(got(0L)._7 && !got(3L)._7 && !got(6L)._7)
    // negatives: swap(0)·emb(3) = 0; swap(3)·emb(6) = −1e6 over
    // 2000·1000 → −0.5; swap(6)·emb(0) = 2e6 over 1000·√4e7
    assert(got(0L)._5 == 0.0 && got(0L)._6 == 1.0)
    assert(math.abs(got(3L)._5 + 0.5) < 1e-9)
    assert(math.abs(got(6L)._5 - 0.316228) < 1e-6)
  }
}
