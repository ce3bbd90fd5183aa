package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed by partition-batched functions.
  *
  * The codec step is REAL (r4): image payloads are true PNG bytes decoded
  * with `javax.imageio.ImageIO`, audio payloads are true WAV (PCM) bytes
  * decoded with `javax.sound.sampled.AudioSystem` — both ship in the JDK.
  * Payload generation is deterministic from `media_id`, so the decoded
  * features (width/height/corner pixel, sample-rate/frame-count/duration)
  * are independently predictable by the SQL oracle: a hash match proves
  * the encode→decode round trip, not just plumbing.
  *
  * Scale shape: generation and decode both run inside `mapPartitions`
  * (the Scala analogue of `mapInPandas` Arrow batches) with per-partition
  * codec setup and no driver collect; video stays an opaque byte stream
  * consumed by the partition-preserving frame sampler.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType),
    StructField("payload", BinaryType),
    StructField("meta_source", StringType)))

  /** Deterministic image geometry/color for a media id (mirrored by the
    * oracle SQL in TrainSql.mm_decode). */
  private[operators] def imgWidth(id: Long): Int = 4 + (id % 29).toInt
  private[operators] def imgHeight(id: Long): Int = 4 + (id * 7 % 23).toInt
  private[operators] def imgRgb(id: Long): Int = ((id * 2654435761L) & 0xFFFFFF).toInt
  /** Deterministic audio shape: 8 kHz 8-bit mono PCM, 0.1–0.3 s. */
  private[operators] val sampleRate = 8000
  private[operators] def audioFrames(id: Long): Int = 800 + (id % 1600).toInt

  // NOT `private`: the encoder's generated deserializer instantiates this
  // from janino-compiled code, which cannot see object-private classes —
  // Spark then silently falls back to interpreted projections
  final case class MediaRow(media_id: Long, media_type: String,
      payload: Array[Byte], meta_source: String)

  /** Build a media table from the documents fixture: image rows carry real
    * PNG bytes, audio rows real WAV bytes (both generated per partition
    * from the media id), video rows the utf-8 text bytes (an opaque stream
    * for the frame sampler). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions { batch =>
        // per-partition codec setup; no ImageIO disk cache on executors
        javax.imageio.ImageIO.setUseCache(false)
        batch.map { case (id, text, source) =>
          id % 3 match {
            case 0 => MediaRow(id, "image", pngBytes(id), source)
            case 1 => MediaRow(id, "audio", wavBytes(id), source)
            case _ => MediaRow(id, "video", text.getBytes("UTF-8"), source)
          }
        }
      }.toDF()
  }

  private def pngBytes(id: Long): Array[Byte] = {
    val (w, h, rgb) = (imgWidth(id), imgHeight(id), imgRgb(id))
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def wavBytes(id: Long): Array[Byte] = {
    val n = audioFrames(id)
    val pcm = new Array[Byte](n)
    var i = 0
    while (i < n) { pcm(i) = (((id + i) * 31) & 0xFF).toByte; i += 1 }
    wavFromPcm(pcm)
  }

  /** Encode unsigned-8-bit mono PCM as a real WAV container (lossless —
    * the decode side reads the identical sample bytes back). */
  private def wavFromPcm(pcm: Array[Byte]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
      sampleRate.toFloat, 8, 1, 1, sampleRate.toFloat, false)
    val stream = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Decoded-features row. Image fields null for audio/video, audio fields
    * null for image/video; video is pass-through (opaque bytes). */
  final case class Decoded(media_id: Long, media_type: String,
      width: Option[Long], height: Option[Long], rgb0: Option[Long],
      sample_rate: Option[Long], n_audio_frames: Option[Long],
      duration_ms: Option[Double])

  /** Partition-batched REAL decode: one pass per partition, `ImageIO` for
    * PNG (true width/height + top-left pixel), `AudioSystem` for WAV
    * (format sample-rate, frame count, duration). */
  def decode(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val ds: Dataset[Decoded] = media
      .select(col("media_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        javax.imageio.ImageIO.setUseCache(false)
        batch.map { case (id, typ, bytes) =>
          typ match {
            case "image" =>
              val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              Decoded(id, typ,
                width = Some(img.getWidth.toLong),
                height = Some(img.getHeight.toLong),
                rgb0 = Some((img.getRGB(0, 0) & 0xFFFFFF).toLong),
                sample_rate = None, n_audio_frames = None, duration_ms = None)
            case "audio" =>
              val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              try {
                val frames = in.getFrameLength
                val rate = in.getFormat.getSampleRate.toLong
                Decoded(id, typ, None, None, None,
                  sample_rate = Some(rate),
                  n_audio_frames = Some(frames),
                  duration_ms = Some(frames * 1000.0 / rate))
              } finally in.close()
            case _ =>
              Decoded(id, typ, None, None, None, None, None, None)
          }
        }
      }
    ds.toDF()
  }

  final case class Resized(media_id: Long, width: Long, height: Long,
      rgb0: Long, n_colors: Long)

  /** REAL image resize (r6): decode PNG → `Graphics2D.drawImage` with
    * bilinear interpolation to `w`×`h` → re-extract features. Runs the
    * full decode→transform→featurize loop a vision-data pipeline runs per
    * image, inside `mapPartitions` with per-partition codec setup. The
    * fixture images are solid-color, so every resized pixel must equal the
    * source color exactly regardless of interpolation — which is what
    * makes the gate oracle-exact: width/height are the target box and
    * rgb0/n_colors are id-predictable. */
  def resize(spark: SparkSession, media: DataFrame, w: Int = 3, h: Int = 3): DataFrame = {
    import spark.implicits._
    media.filter(col("media_type") === "image")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        javax.imageio.ImageIO.setUseCache(false)
        batch.map { case (id, bytes) =>
          val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          val dst = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, w, h, null)
          } finally g.dispose()
          val colors = scala.collection.mutable.Set.empty[Int]
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { colors += (dst.getRGB(x, y) & 0xFFFFFF); x += 1 }
            y += 1
          }
          Resized(id, w.toLong, h.toLong,
            (dst.getRGB(0, 0) & 0xFFFFFF).toLong, colors.size.toLong)
        }
      }.toDF()
  }

  /** Deterministic STRUCTURED grayscale pixel value for the perceptual-
    * dedup fixtures (the solid-color images above hash to all-zero
    * gradients — useless for dHash). Groups of 7: ids ≡0 (mod 3) carry
    * the group's base gradient verbatim (exact-duplicate class), ≡1 the
    * base plus a handful of id-salted +60 bumps (near-duplicate class —
    * a few hash bits flip), ≡2 a transposed-coefficient gradient (a
    * genuinely different image). Pure integer arithmetic on
    * (id, x, y) — the DuckDB oracle replays it bit for bit
    * (TrainSql.mm_phash_dedup). */
  private[operators] def grayVal(id: Long, x: Int, y: Int): Int = {
    val g = (id % 7).toInt
    val base =
      if (id % 3 == 2) (g * 37 + 11 + x * 29 + y * 13) % 180
      else (g * 37 + x * 13 + y * 29) % 180
    val noise =
      if (id % 3 == 1 && (x * 31 + y * 17 + id) % 89 == 0) 60 else 0
    base + noise
  }

  private[operators] val grayW = 18
  private[operators] val grayH = 16

  /** Gray-gradient media table for perceptual dedup: every doc becomes
    * one real 18×16 PNG whose pixels are [[grayVal]] (r = g = b). Same
    * per-partition codec discipline as [[mediaFromDocuments]]. */
  def grayMediaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { batch =>
      javax.imageio.ImageIO.setUseCache(false)
      batch.map { id =>
        val img = new java.awt.image.BufferedImage(
          grayW, grayH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < grayH) {
          var x = 0
          while (x < grayW) {
            val v = grayVal(id, x, y)
            img.setRGB(x, y, v * 0x010101)
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        MediaRow(id, "image", out.toByteArray, "docs")
      }
    }.toDF()
  }

  final case class Hashed(media_id: Long, width: Long, height: Long,
      dhash: Option[Long])

  /** 64-bit difference hash (dHash) per image — the standard perceptual
    * fingerprint (Krawetz's "kind of like that" recipe): decode, reduce
    * to a 9×8 grid of integer box-average luma cells, emit bit
    * cy·8+cx = 1 iff cell(cx+1, cy) > cell(cx, cy). Integer arithmetic
    * end to end (per-pixel floor luma (299r+587g+114b)/1000, floor box
    * mean over the floor-boundary grid ⌊cx·W/9⌋..⌊(cx+1)·W/9⌋) so the
    * hash is engine-reproducible and oracle-replayable — no float
    * resize kernel in the contract. Images under 9×8 get a null hash
    * (no grid; they drop out of pairing). Runs in `mapPartitions` like
    * [[decode]] — per-partition codec setup, no driver collect; the
    * hash is 8 bytes/image, the shape a billion-image dedup ships
    * around instead of pixels. */
  def dHash(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.filter(col("media_type") === "image")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        javax.imageio.ImageIO.setUseCache(false)
        batch.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          val (w, h) = (img.getWidth, img.getHeight)
          if (w < 9 || h < 8) Hashed(id, w.toLong, h.toLong, None)
          else {
            val cells = Array.ofDim[Long](8, 9)
            var cy = 0
            while (cy < 8) {
              val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
              var cx = 0
              while (cx < 9) {
                val x0 = cx * w / 9; val x1 = (cx + 1) * w / 9
                var sum = 0L
                var y = y0
                while (y < y1) {
                  var x = x0
                  while (x < x1) {
                    val rgb = img.getRGB(x, y)
                    sum += (299L * ((rgb >> 16) & 0xFF) +
                      587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)) / 1000L
                    x += 1
                  }
                  y += 1
                }
                cells(cy)(cx) = sum / ((y1 - y0).toLong * (x1 - x0))
                cx += 1
              }
              cy += 1
            }
            var hash = 0L
            var b = 0
            while (b < 64) {
              if (cells(b / 8)(b % 8 + 1) > cells(b / 8)(b % 8))
                hash |= (1L << b)
              b += 1
            }
            Hashed(id, w.toLong, h.toLong, Some(hash))
          }
        }
      }.toDF()
  }

  /** Perceptual near-duplicate pairs over [[dHash]] output — the image
    * analogue of [[Dedup.minhashLshPairs]]' banded inverted index: the
    * 64-bit hash splits into `bands` equal slices, images equi-join on
    * (band index, band value) — candidates are band collisions, NEVER
    * all pairs — and an exact popcount-of-xor Hamming filter keeps
    * pairs ≤ `maxHamming`. EXACT by pigeonhole while
    * `maxHamming < bands`: ≤ maxHamming differing bits cannot touch
    * every band, so some band matches verbatim and the pair IS a
    * candidate (the same argument as MinHash banding, but exact rather
    * than probabilistic — Hamming balls are band-coverable). Null
    * hashes (undersized images) drop out. Output: (media_a, media_b,
    * hamming), a < b. Scale: one shuffle on the band keys; collision
    * fan-out is bounded by duplicate-group sizes exactly like the text
    * LSH family. */
  def phashPairs(hashes: DataFrame, maxHamming: Int = 3, bands: Int = 4,
      idCol: String = "media_id", hashCol: String = "dhash"): DataFrame = {
    require(bands >= 1 && 64 % bands == 0,
      s"bands must divide 64 (got $bands)")
    require(maxHamming >= 0 && maxHamming < bands,
      s"maxHamming ($maxHamming) must be < bands ($bands) — the " +
        "pigeonhole exactness guarantee needs one untouched band")
    val bw = 64 / bands
    val mask = if (bw == 64) -1L else (1L << bw) - 1L
    val banded = hashes.filter(col(hashCol).isNotNull)
      .select(col(idCol).as("_id"), col(hashCol).as("_h"),
        posexplode(array((0 until bands).map(b =>
          shiftrightunsigned(col(hashCol), b * bw)
            .bitwiseAND(lit(mask))): _*)))
      .toDF("_id", "_h", "_band", "_bv")
    banded.select(col("_id").as("media_a"), col("_h").as("_ha"),
        col("_band"), col("_bv"))
      .join(banded.select(col("_id").as("media_b"), col("_h").as("_hb"),
        col("_band"), col("_bv")), Seq("_band", "_bv"))
      .filter(col("media_a") < col("media_b"))
      .select(col("media_a"), col("media_b"),
        bit_count(col("_ha").bitwiseXOR(col("_hb"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Deterministic STRUCTURED amplitude for the audio-dedup fixtures —
    * the 1-D analogue of [[grayVal]] (the constant-byte [[wavBytes]]
    * clips hash to degenerate energy profiles). Groups of 7: ids ≡0
    * (mod 3) carry the group's base amplitude pattern verbatim
    * (exact-duplicate class), ≡1 the base plus rare id-salted +40
    * bumps (near-duplicate class — a handful of energy windows shift,
    * flipping a few hash bits), ≡2 a different-coefficient pattern (a
    * genuinely different clip). Pure integer arithmetic on (id, i);
    * the DuckDB oracle replays it bit for bit (TrainSql
    * `mm_ahash_dedup`). Amplitude stays < 120, so the unsigned sample
    * 128+m never clips. */
  private[operators] def toneAmp(id: Long, i: Int): Int = {
    val g = (id % 7).toInt
    val base =
      if (id % 3 == 2) (g * 37 + 11 + i * 29) % 80
      else (g * 37 + i * 13) % 80
    val bump = if (id % 3 == 1 && (i * 31 + id) % 997 == 0) 40 else 0
    base + bump
  }

  /** 65 energy windows of exactly [[toneWin]] samples each — the fixture
    * length divides evenly so the oracle's window grouping is `i // 24`. */
  private[operators] val toneWin = 24
  private[operators] val toneFrames = 65 * toneWin

  /** Audio fixture for perceptual dedup: every doc becomes one real WAV
    * clip of [[toneFrames]] unsigned-8-bit samples `128 + toneAmp(id, i)`.
    * Same per-partition batch discipline as [[mediaFromDocuments]]. */
  def toneMediaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { batch =>
      batch.map { id =>
        val pcm = new Array[Byte](toneFrames)
        var i = 0
        while (i < toneFrames) {
          pcm(i) = (128 + toneAmp(id, i)).toByte
          i += 1
        }
        MediaRow(id, "audio", wavFromPcm(pcm), "docs")
      }
    }.toDF()
  }

  final case class AudioHashed(media_id: Long, n_frames: Long,
      ahash: Option[Long])

  /** 64-bit audio fingerprint per clip — the temporal-energy difference
    * hash (the sign-of-band-energy-difference recipe of Haitsma &
    * Kalker's robust audio fingerprint, reduced to one band over time
    * and integer arithmetic so the hash is engine-reproducible and
    * oracle-replayable): decode the WAV, split the clip into 65 equal
    * time windows (floor boundaries ⌊j·n/65⌋, like [[dHash]]'s grid),
    * per-window integer mean absolute deviation from the 8-bit midpoint
    * e_j = ⌊Σ|s−128| / len⌋, emit bit j = 1 iff e_{j+1} > e_j. Clips
    * under 65 samples get a null hash and drop out of pairing. Runs in
    * `mapPartitions` — per-partition codec use, no driver collect; 8
    * bytes/clip is what a billion-clip dedup ships, not waveforms.
    * Pairing reuses [[phashPairs]] (`hashCol = "ahash"`) — the banded
    * Hamming join is modality-blind. */
  def aHash(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.filter(col("media_type") === "audio")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val pcm = try in.readAllBytes() finally in.close()
          val n = pcm.length
          if (n < 65) AudioHashed(id, n.toLong, None)
          else {
            val e = new Array[Long](65)
            var j = 0
            while (j < 65) {
              val i0 = j * n / 65; val i1 = (j + 1) * n / 65
              var sum = 0L
              var i = i0
              while (i < i1) {
                sum += math.abs((pcm(i) & 0xFF) - 128).toLong
                i += 1
              }
              e(j) = sum / (i1 - i0)
              j += 1
            }
            var hash = 0L
            var b = 0
            while (b < 64) {
              if (e(b + 1) > e(b)) hash |= (1L << b)
              b += 1
            }
            AudioHashed(id, n.toLong, Some(hash))
          }
        }
      }.toDF()
  }

  /** Deterministic segment text for the video-dedup fixtures — the clip
    * analogue of [[grayVal]]/[[toneAmp]]. Groups of 7, five 256-byte
    * frames per clip: ids ≡0 (mod 3) carry the group's five base frames
    * verbatim (exact-duplicate class, Jaccard 1 within the class), ≡1
    * share four base frames but replace frame 2 with an id-unique one
    * (near-duplicate class — Jaccard 4/6 vs the base and vs each
    * other), ≡2 five id-unique frames (a genuinely different clip,
    * Jaccard 0 vs everything). Pure ASCII string arithmetic on (id, s);
    * the DuckDB oracle replays it byte for byte (TrainSql
    * `mm_video_dedup`). */
  private[operators] def clipSegment(id: Long, s: Int): String = {
    val base =
      if (id % 3 == 2) s"d${id}x$s"
      else if (id % 3 == 1 && s == 2) s"a$id"
      else s"g${id % 7}s$s"
    "q" * (256 - base.length) + base
  }

  /** Video fixture for frame-set dedup: every doc becomes one "video"
    * payload of five 256-byte [[clipSegment]] frames — the frame
    * boundaries line up with [[frameSample]]'s fixed windows. */
  def clipMediaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { batch =>
      batch.map { id =>
        val payload = (0 until 5).map(clipSegment(id, _)).mkString
          .getBytes("UTF-8")
        MediaRow(id, "video", payload, "docs")
      }
    }.toDF()
  }

  /** Video near-duplicate pairs by frame-fingerprint-set Jaccard — the
    * video analogue of the text family's n-gram Jaccard, over
    * [[frameSample]] output (or any (id, frame-hash) table): two clips
    * are near-dups when their DISTINCT frame-hash sets overlap by
    * ≥ `minJaccard`. EXACT, not approximate: candidates come from an
    * inverted-index equi-join on the frame hash — a pair sharing zero
    * frames has Jaccard 0 < minJaccard (hence the > 0 guard) and is
    * correctly never considered, so the join enumerates exactly the
    * pairs that can pass. Scale: one shuffle on frame hashes;
    * candidate fan-out is bounded by per-frame duplication-group
    * sizes (the LSH-family contract — a frame shared by k clips costs
    * k², never |clips|²). Output: (media_a, media_b, n_common,
    * jaccard), a < b; jaccard is an exactly-rounded binary64 ratio of
    * two small integers, so engines agree bit-for-bit. */
  def videoDupPairs(frames: DataFrame, minJaccard: Double = 0.6,
      idCol: String = "media_id", hashCol: String = "frame_md5"): DataFrame = {
    require(minJaccard > 0,
      s"minJaccard ($minJaccard) must be > 0 — the inverted-index join " +
        "only sees pairs sharing at least one frame (Jaccard > 0)")
    val fr = frames.select(col(idCol).as("_id"), col(hashCol).as("_h"))
      .distinct()
    val sz = fr.groupBy(col("_id")).agg(count(lit(1)).as("_n"))
    fr.select(col("_id").as("media_a"), col("_h"))
      .join(fr.select(col("_id").as("media_b"), col("_h")), Seq("_h"))
      .filter(col("media_a") < col("media_b"))
      .groupBy(col("media_a"), col("media_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sz.select(col("_id").as("media_a"), col("_n").as("_na")),
        Seq("media_a"))
      .join(sz.select(col("_id").as("media_b"), col("_n").as("_nb")),
        Seq("media_b"))
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("_na") + col("_nb") - col("n_common")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("media_a"), col("media_b"), col("n_common"),
        col("jaccard"))
  }

  /** Frame sampling for "video" payloads: fixed-size byte windows exploded
    * to (media_id, frame_idx, frame_bytes) rows — the partition-preserving
    * explode a real frame sampler would use. */
  def frameSample(media: DataFrame, frameBytes: Int = 256, maxFrames: Int = 5): DataFrame =
    media.filter(col("media_type") === "video")
      .withColumn("n_frames",
        least(ceil(length(col("payload")).cast("double") / frameBytes).cast("long"), lit(maxFrames.toLong)))
      // zero-byte payloads have no frames: sequence(0, -1) would yield
      // [0, -1] (inferred step -1), not an empty array
      .filter(col("n_frames") > 0)
      .select(col("media_id"), col("n_frames"), col("payload"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("frame_md5",
        md5(expr(s"substring(payload, CAST(frame_idx * $frameBytes + 1 AS INT), $frameBytes)")))
      .select(col("media_id"), col("frame_idx"), col("n_frames"), col("frame_md5"))
}
