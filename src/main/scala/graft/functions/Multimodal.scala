package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star): image/audio/video as
  * opaque `binary` columns with typed metadata.
  *
  * The Spark-side shape is real and tested — schema, partitioning,
  * batched per-partition processing. IMAGE decode/resize is REAL
  * (`javax.imageio` ships PNG/JPEG/GIF/BMP with the JDK); audio/video
  * decode is STUBBED (no such codecs in this container): `decodeStub`
  * derives deterministic fake features from the bytes. Swapping in a
  * real A/V decoder (JNI/ONNX/etc.) changes only the function body,
  * not the pipeline shape.
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

  /** REAL image decode via `javax.imageio` (PNG/JPEG/GIF/BMP decoders
    * ship with the JDK — no container codecs needed): returns
    * (width, height, 8-dim feature vector) or None when the payload is
    * not a decodable image. Features: pixel dims, aspect, mean
    * luma/R/G/B (normalized), fraction of non-black pixels — all
    * deterministic functions of the decoded raster.
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0.0; var sg = 0.0; var sb = 0.0; var nz = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            if ((p & 0xffffff) != 0) nz += 1
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        val luma = (0.299 * sr + 0.587 * sg + 0.114 * sb) / n
        Some((w, h, Array(
          w.toFloat, h.toFloat, (w.toDouble / h).toFloat,
          (luma / 255.0).toFloat, (sr / n / 255.0).toFloat,
          (sg / n / 255.0).toFloat, (sb / n / 255.0).toFloat,
          (nz / n).toFloat)))
      }
    } catch { case _: Exception => None }

  /** REAL image resize via `java.awt` scaling + PNG re-encode: shrink
    * by `factor` (bilinear), or None when the payload is not a
    * decodable image.
    */
  def resizeImage(payload: Array[Byte], factor: Int): Option[(Array[Byte], Int, Int)] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val tw = math.max(1, img.getWidth / factor)
        val th = math.max(1, img.getHeight / factor)
        val out = new java.awt.image.BufferedImage(
          tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, tw, th, null)
        } finally g.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", baos)
        Some((baos.toByteArray, tw, th))
      }
    } catch { case _: Exception => None }

  /** REAL audio decode via `javax.sound.sampled` (WAV/AIFF/AU PCM
    * decoders ship with the JDK — no container codecs needed): returns
    * (sampleRateHz, nFrames, 8-dim feature vector) for 16-bit mono PCM
    * payloads, None otherwise. Features: sample rate (kHz), duration
    * (s), RMS amplitude and zero-crossing rate (the classic cheap
    * audio descriptors), and coarse 4-quarter energy envelope — all
    * deterministic functions of the decoded samples.
    */
  def decodeAudio(payload: Array[Byte]): Option[(Float, Long, Array[Float])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.isBigEndian) None
      else {
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        if (n == 0) None
        else {
          var sumSq = 0.0
          var zc = 0L
          var prev = 0
          val quarters = new Array[Double](4)
          var i = 0
          while (i < n) {
            val v = ((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
            sumSq += v.toDouble * v
            if (i > 0 && ((v >= 0) != (prev >= 0))) zc += 1
            quarters(math.min(3, i * 4 / n)) += math.abs(v.toDouble)
            prev = v
            i += 1
          }
          val rate = fmt.getSampleRate
          val totalAbs = math.max(1.0, quarters.sum)
          Some((rate, n.toLong, Array(
            rate / 1000f,
            n.toFloat / rate,
            (math.sqrt(sumSq / n) / 32768.0).toFloat,
            zc.toFloat / n,
            (quarters(0) / totalAbs).toFloat, (quarters(1) / totalAbs).toFloat,
            (quarters(2) / totalAbs).toFloat, (quarters(3) / totalAbs).toFloat)))
        }
      }
    } catch { case _: Exception => None }

  /** Gain-invariant audio fingerprint (the Haitsma–Kalker energy-delta
    * shape): the decoded PCM stream splits into 64 equal frames; bit i
    * is set iff frame i's energy exceeds frame i−1's. Energy-DELTA
    * signs survive uniform gain (both sides of every comparison scale
    * together) — the property a volume-normalized audio dedup needs,
    * and the audio analog of [[pHash]]'s median-threshold bits. None
    * for non-PCM payloads (same 16-bit mono LE contract as
    * [[decodeAudio]]).
    */
  def audioFingerprint(payload: Array[Byte]): Option[Long] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.isBigEndian) None
      else {
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        if (n < 64) None
        else {
          val frames = new Array[Double](64)
          var i = 0
          while (i < n) {
            val v = ((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
            frames(math.min(63, i * 64 / n)) += v.toDouble * v
            i += 1
          }
          var h = 0L
          var f = 1
          while (f < 64) {
            if (frames(f) > frames(f - 1)) h |= (1L << (f - 1))
            f += 1
          }
          Some(h)
        }
      }
    } catch { case _: Exception => None }

  /** STUB decode — deterministic fake standing in for the codecs this
    * container lacks (video only, now that image AND audio take real
    * JDK decode paths): features are a hash-derived vector of the
    * payload.
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

  /** Perceptual hash (pHash, the DCT variant): decode → 32×32
    * bilinear grayscale → 2-D DCT-II → the 8×8 low-frequency block
    * minus the DC term → bit i set iff coefficient i exceeds the
    * median of the 63. Near-identical images (re-encoded, resized,
    * lightly edited) land within a few Hamming bits; unrelated images
    * land near 31 — the image-side analog of SimHash text near-dup,
    * joinable with the same pigeonhole banding. None when the payload
    * doesn't decode as an image.
    */
  /** cos((2i+1)·u·π/64) for the 8 DCT frequencies over 32 positions —
    * shared, immutable, computed once per JVM.
    */
  private val DctCos: Array[Array[Double]] =
    Array.tabulate(8, 32)((u, i) => math.cos((2 * i + 1) * u * math.Pi / 64.0))

  def pHash(payload: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val S = 32
        val small = new java.awt.image.BufferedImage(
          S, S, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = small.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, S, S, null)
        } finally g.dispose()
        val gray = Array.ofDim[Double](S, S)
        var y = 0
        while (y < S) {
          var x = 0
          while (x < S) {
            val p = small.getRGB(x, y)
            gray(y)(x) = 0.299 * ((p >> 16) & 0xff) +
              0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
            x += 1
          }
          y += 1
        }
        // 8×8 low-frequency DCT-II block, SEPARABLE with precomputed
        // cosine tables: rows then columns is 8·32·32 + 8·8·32
        // multiply-adds instead of 131k libm cos() calls per image
        // (the naive form made media_phash the most expensive bench
        // query at 10s/sf0.1; this runs in the decode's noise)
        val temp = Array.ofDim[Double](8, S)
        var u = 0
        while (u < 8) {
          var xx = 0
          while (xx < S) {
            var s = 0.0
            var yy = 0
            while (yy < S) { s += gray(yy)(xx) * DctCos(u)(yy); yy += 1 }
            temp(u)(xx) = s
            xx += 1
          }
          u += 1
        }
        val coef = new Array[Double](64)
        u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            var s = 0.0
            var xx = 0
            while (xx < S) { s += temp(u)(xx) * DctCos(v)(xx); xx += 1 }
            coef(u * 8 + v) = s
            v += 1
          }
          u += 1
        }
        val ac = coef.drop(1) // DC carries only global brightness
        val median = ac.sorted.apply(ac.length / 2)
        var h = 0L
        var i = 0
        while (i < ac.length) {
          if (ac(i) > median) h |= (1L << i)
          i += 1
        }
        Some(h)
      }
    } catch { case _: Exception => None }

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
      // per-partition decoder init would go here (ImageIO is static)
      rows.map { r =>
        val feat =
          if (r.kind == "image") decodeImage(r.payload).map(_._3)
            .getOrElse(decodeStub(r.payload))
          else if (r.kind == "audio") decodeAudio(r.payload).map(_._3)
            .getOrElse(decodeStub(r.payload))
          else decodeStub(r.payload)
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          n_bytes = r.payload.length.toLong,
          checksum = checksum(r.payload),
          feature = feat,
        )
      }
    }
  }

  /** Deterministic synthetic PNG: a `w`×`h` raster whose pixels come
    * from a splitmix64 stream seeded by `seed`, encoded with the JDK's
    * real PNG writer. Fixture-building only — it exists so the
    * driver-visible media queries exercise the REAL decode path
    * (`javax.imageio`) instead of falling back to the byte stub on
    * undecodable text payloads.
    */
  def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var z = seed
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        z += 0x9e3779b97f4a7c15L
        var s = z
        s = (s ^ (s >>> 30)) * 0xbf58476d1ce4e5b9L
        s = (s ^ (s >>> 27)) * 0x94d049bb133111ebL
        img.setRGB(x, y, ((s ^ (s >>> 31)) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Deterministic synthetic WAV: 16-bit mono PCM at 8 kHz — a
    * seed-keyed tone plus splitmix noise, written through the JDK's
    * real WAV encoder. Fixture-building only, same role as
    * [[syntheticPng]]: it exists so the audio queries exercise the
    * REAL decode path (`javax.sound.sampled`).
    */
  def syntheticWav(seed: Long, ms: Int): Array[Byte] = {
    val rate = 8000f
    val n = math.max(1, (rate * ms / 1000).toInt)
    val freq = 220.0 + (seed % 7) * 110.0
    val samples = new Array[Byte](n * 2)
    var z = seed
    var i = 0
    while (i < n) {
      z += 0x9e3779b97f4a7c15L
      var s = z
      s = (s ^ (s >>> 30)) * 0xbf58476d1ce4e5b9L
      s = (s ^ (s >>> 27)) * 0x94d049bb133111ebL
      val noise = ((s ^ (s >>> 31)) % 6000L).toInt
      val tone = (StrictMath.sin(2 * math.Pi * freq * i / rate) * 12000).toInt
      val v = math.max(-32768, math.min(32767, tone + noise))
      samples(2 * i) = (v & 0xff).toByte
      samples(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Replace image-kind payloads with REAL (synthetic, deterministic)
    * PNG rasters sized from the media id, metadata updated to the true
    * dimensions. Other payloads pass through untouched. Narrow map —
    * the payload never shuffles.
    */
  def withRealImages(media: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.kind == "image") {
        val w = (r.media_id % 24 + 8).toInt
        val h = (r.media_id % 16 + 8).toInt
        r.copy(payload = syntheticPng(r.media_id, w, h),
          meta_width = w, meta_height = h)
      } else r
    }
  }

  /** Replace audio-kind payloads with REAL (synthetic, deterministic)
    * PCM WAVs timed from the media id, metadata updated to the true
    * duration. Narrow map.
    */
  def withRealAudio(media: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.kind == "audio") {
        val ms = (r.media_id % 400 + 100).toInt
        r.copy(payload = syntheticWav(r.media_id, ms),
          meta_duration_ms = ms.toLong)
      } else r
    }
  }

  /** Both real-payload rewrites: image rasters + PCM audio. Video is
    * the one remaining documented stub (the JDK ships no video codec).
    */
  def withRealMedia(media: Dataset[MediaRecord]): Dataset[MediaRecord] =
    withRealAudio(withRealImages(media))

  /** Frame sampling. IMAGE payloads take the real path: decode the
    * raster, slice it into up to `maxFrames` horizontal strips (capped
    * by the image height — a strip is at least one pixel row), and
    * re-encode each strip as PNG — actual raster work per frame, the
    * shape video frame-grabbing has once a codec exists. `stride` and
    * `frameLen` do not apply on the image path (strips are geometry-,
    * not byte-, addressed). Non-image (or undecodable) payloads keep
    * the byte-window stub: every `stride`-th `frameLen`-byte slice.
    */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int, frameLen: Int,
      maxFrames: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val imageFrames =
        if (r.kind != "image") None
        else try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          if (img == null) None
          else {
            val strips = math.min(maxFrames, img.getHeight)
            val hs = img.getHeight / strips
            Some((0 until strips).map { f =>
              val baos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(
                img.getSubimage(0, f * hs, img.getWidth, hs), "png", baos)
              (r.media_id, f, baos.toByteArray)
            })
          }
        } catch { case _: Exception => None }
      imageFrames.getOrElse {
        val n = math.max(0, (r.payload.length - frameLen) / stride + 1)
        (0 until math.min(n, maxFrames)).map { f =>
          val off = f * stride
          (r.media_id, f, r.payload.slice(off, off + frameLen))
        }
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }

  /** REAL audio downsample: decode PCM, keep every `factor`-th sample
    * (decimation — the honest "resize" of the audio domain; a
    * production pipeline would low-pass first), re-encode as WAV at
    * `rate / factor`. Duration is preserved; returns the new payload
    * and sample rate, or None for non-PCM payloads.
    */
  def resampleAudio(payload: Array[Byte], factor: Int): Option[(Array[Byte], Float)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.isBigEndian) None
      else {
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        val keep = (n + factor - 1) / factor
        if (keep == 0) None
        else {
          val out = new Array[Byte](keep * 2)
          var i = 0
          while (i < keep) {
            out(2 * i) = bytes(2 * i * factor)
            out(2 * i + 1) = bytes(2 * i * factor + 1)
            i += 1
          }
          val newRate = fmt.getSampleRate / factor
          val ofmt = new javax.sound.sampled.AudioFormat(newRate, 16, 1, true, false)
          val oais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(out), ofmt, keep.toLong)
          val baos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(oais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
          Some((baos.toByteArray, newRate))
        }
      }
    } catch { case _: Exception => None }

  /** Narrow per-row resize: image payloads go through the REAL
    * [[resizeImage]] (decode → bilinear scale → PNG re-encode, metadata
    * updated to the actual output raster); audio payloads through the
    * REAL [[resampleAudio]] (decode → decimate → WAV re-encode,
    * duration preserved); remaining payloads (video) fall back to the
    * byte-domain stub downsample.
    */
  def resize(media: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val real =
        if (r.kind == "image")
          resizeImage(r.payload, factor).map { case (bytes, w, h) =>
            r.copy(payload = bytes, meta_width = w, meta_height = h)
          }
        else if (r.kind == "audio")
          resampleAudio(r.payload, factor).map { case (bytes, _) =>
            r.copy(payload = bytes) // duration unchanged: fewer samples, lower rate
          }
        else None
      real.getOrElse {
        val down = r.payload.zipWithIndex.collect {
          case (b, i) if i % factor == 0 => b
        }
        r.copy(
          payload = down,
          meta_width = math.max(1, r.meta_width / factor),
          meta_height = math.max(1, r.meta_height / factor))
      }
    }
  }

  /** STUB resize — deterministic byte-domain downsample standing in
    * for the codecs this container lacks: keeps every `factor`-th byte
    * and scales the metadata dimensions accordingly. Image payloads
    * should use [[resize]], which decodes for real.
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

  /** CLIP-score alignment gate for image–caption pairs (Radford et
    * al. 2021; the LAION curation filter, Schuhmann et al. 2022) with
    * an in-bucket hard-negative control — the screen a multimodal
    * training pipeline runs before admitting a pair: score the true
    * (image, caption) pair, score the image against a DIFFERENT
    * caption, keep pairs above threshold and audit the margin (a
    * corpus whose true scores don't beat its shuffled-negative scores
    * has no usable alignment signal).
    *
    * Encoder stand-in (the module's STUB policy — no vision/text
    * model ships in this container): the caption tower is the
    * document's embedding; the image tower is the PAIR-SWAP
    * permutation of it (adjacent components exchanged). The
    * permutation is norm-preserving and fixed, so the true-pair score
    * is a nontrivial deterministic function of the vector — not 1 —
    * and every downstream piece (quantized-integer scoring, gating,
    * margin) exercises the real code path a real encoder would feed.
    *
    * Negative draw: images are salted-md5-hashed into `buckets`
    * groups and each takes its bucket-successor's caption (wrapping)
    * — the distributed analogue of in-batch negatives. All windows
    * partition by bucket: no global sort, no single-partition
    * window, scale-safe. A size-1 bucket pairs with itself (margin
    * 0, flagged by `neg_id = media_id`).
    *
    * Determinism: quantized integer dots over md5-salted buckets;
    * cosines are the one fixed tree of
    * [[Similarity.cosineFromInts]]; oracle-replayable bit-for-bit.
    */
  def alignmentGate(spark: SparkSession, docs: DataFrame,
      embeddings: DataFrame, buckets: Int = 16,
      threshold: Double = 0.1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    require(buckets >= 1, "buckets must be >= 1")
    graft.plans.GraftFunctions.register(spark)
    val media = mediaFromDocuments(spark, docs).toDF()
      .filter(col("kind") === lit("image")).select(col("media_id"))
    val q = embeddings.select(col("vec_id"),
      Similarity.quantized(col("embedding")).as("qv"))
    val b = (conv(substring(md5(concat(lit("mm:"),
        col("media_id").cast("string")).cast("binary")), 1, 16), 16, 10)
      .cast(DecimalType(20, 0)) % buckets).cast("long")
    val imgs = media.join(q, media("media_id") === q("vec_id"))
      .select(col("media_id"), col("qv"),
        call_function("graft_norm_sq", col("qv")).as("nsq"), b.as("b"))
    val wb = Window.partitionBy("b").orderBy("media_id")
    val paired = imgs.withColumn("neg_id",
      coalesce(lead(col("media_id"), 1).over(wb),
        min(col("media_id")).over(Window.partitionBy("b"))))
    val negs = imgs.select(col("media_id").as("neg_id"),
      col("qv").as("nqv"), col("nsq").as("nnsq"))
    val scored = paired.join(negs, Seq("neg_id"))
      // image tower: adjacent-pair swap (0-based index i ↔ i^1);
      // norm-preserving, so the image side reuses nsq
      .withColumn("pv", expr("transform(qv, (x, i) -> qv[i ^ 1])"))
      .withColumn("cos_true", Similarity.cosineFromInts(
        call_function("graft_dot", col("pv"), col("qv")),
        col("nsq"), col("nsq")))
      .withColumn("cos_neg", Similarity.cosineFromInts(
        call_function("graft_dot", col("pv"), col("nqv")),
        col("nsq"), col("nnsq")))
    scored.select(col("media_id"), col("b"), col("neg_id"),
      round(col("cos_true"), 6).as("cos_true"),
      round(col("cos_neg"), 6).as("cos_neg"),
      round(col("cos_true") - col("cos_neg"), 6).as("margin"),
      (col("cos_true") >= threshold).as("kept"))
  }
}
