package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media as
  * opaque `binary` columns with typed metadata, processed per-partition
  * through a pluggable decoder.
  *
  * The Spark-side contract (schema, partitioning, batch shape) is real
  * and tested. The IMAGE codec is real — `ImageDecoder` /
  * `ImageResizer` wrap the JDK's javax.imageio (PNG/JPEG/BMP/GIF, no
  * external jars) — and so is the AUDIO codec for the container
  * formats the JDK ships (`AudioDecoder` wraps javax.sound.sampled:
  * WAV/AIFF/AU, 8/16-bit PCM). Only VIDEO remains STUBBED
  * (`FakeFrameSampler`; compressed audio like mp3/ogg also falls back)
  * — this container genuinely has no codecs for those, so the fakes
  * are deterministic placeholders with the same signature a JNI/FFI
  * decoder would have. `JdkDecoder` routes each modality to its real
  * codec where one exists.
  *
  * Scale design: rows carry bytes, so operations must be
  * partition-local (mapPartitions — one decoder instance per task, no
  * shuffle of binary payloads) and metadata-only plans must never touch
  * the `data` column (columnar parquet prunes it away — asserted in
  * MultimodalSpec).
  */
object Multimodal {

  /** One media row: opaque payload + metadata. `data` is last so
    * metadata-only projections prune the heavy column. */
  case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      mime: String,
      width: Int,
      height: Int,
      duration_ms: Long,
      data: Array[Byte])

  case class MediaFeature(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Float])

  /** Decoder boundary: the real implementation would wrap an image/
    * audio codec; tasks get one instance per partition. */
  trait Decoder extends Serializable {
    def decode(kind: String, bytes: Array[Byte]): Array[Float]
  }

  /** REAL image decoder via the JDK (`javax.imageio` ships with every
    * JRE — PNG/JPEG/BMP/GIF need no external jars): decodes the
    * payload to a BufferedImage and emits an 8-bin normalized
    * luminance histogram as the feature — deterministic, row-local,
    * one decoder per task. Non-image kinds fall back to [[FakeDecoder]]
    * (audio/video codecs genuinely are not in this container).
    * An image payload ImageIO cannot parse throws — corrupt media
    * should be quarantined upstream, not silently fingerprinted. */
  object ImageDecoder extends Decoder {
    override def decode(kind: String, bytes: Array[Byte]): Array[Float] = {
      if (kind != "image") FakeDecoder.decode(kind, bytes)
      else {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(img != null, s"undecodable image payload (${bytes.length} bytes)")
        val hist = new Array[Float](8)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            hist(lum >> 5) += 1f
            x += 1
          }
          y += 1
        }
        val n = (img.getWidth.toLong * img.getHeight).toFloat
        hist.map(_ / n)
      }
    }
  }

  /** REAL audio decoder via the JDK (`javax.sound.sampled` ships with
    * every JRE — WAV/AIFF/AU container parsing and 8/16-bit PCM need
    * no external jars): decodes the payload and emits an 8-segment
    * RMS-energy envelope as the feature — the audio twin of
    * [[ImageDecoder]]'s luminance histogram. Deterministic, row-local,
    * one decoder per task. Non-audio kinds fall back to
    * [[FakeDecoder]]; an audio payload the JDK cannot parse (or a
    * compressed codec like mp3 — genuinely absent from this container)
    * throws, like the image path: corrupt media is quarantined
    * upstream, not silently fingerprinted. */
  object AudioDecoder extends Decoder {
    override def decode(kind: String, bytes: Array[Byte]): Array[Float] = {
      if (kind != "audio") FakeDecoder.decode(kind, bytes)
      else {
        import javax.sound.sampled.{AudioFormat, AudioSystem}
        val ais = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          val enc = fmt.getEncoding
          require(enc == AudioFormat.Encoding.PCM_SIGNED ||
            enc == AudioFormat.Encoding.PCM_UNSIGNED,
            s"unsupported audio encoding $enc (PCM only)")
          val bits = fmt.getSampleSizeInBits
          require(bits == 8 || bits == 16,
            s"unsupported sample width $bits (8/16-bit PCM only)")
          val raw = ais.readAllBytes()
          val n = raw.length / (bits / 8)
          require(n > 0, "empty audio payload")
          val unsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED
          val big = fmt.isBigEndian
          val sumSq = new Array[Double](8)
          val cnt = new Array[Long](8)
          var i = 0
          while (i < n) {
            val v: Double =
              if (bits == 8) {
                val b = raw(i) & 0xff
                (if (unsigned) b - 128 else raw(i).toInt) / 128.0
              } else {
                val off = i * 2
                val s =
                  if (big) ((raw(off) << 8) | (raw(off + 1) & 0xff)).toShort
                  else ((raw(off + 1) << 8) | (raw(off) & 0xff)).toShort
                (if (unsigned) (s & 0xffff) - 32768 else s.toInt) / 32768.0
              }
            val seg = (i.toLong * 8 / n).toInt
            sumSq(seg) += v * v
            cnt(seg) += 1
            i += 1
          }
          Array.tabulate(8)(s =>
            if (cnt(s) == 0) 0f
            else math.sqrt(sumSq(s) / cnt(s)).toFloat)
        } finally ais.close()
      }
    }
  }

  /** Routes each modality to its REAL JDK codec where one exists
    * (image → javax.imageio, audio → javax.sound.sampled) and to the
    * declared fake where none does (video). The default decoder a
    * production pipeline in this container should use. */
  object JdkDecoder extends Decoder {
    override def decode(kind: String, bytes: Array[Byte]): Array[Float] =
      kind match {
        case "image" => ImageDecoder.decode(kind, bytes)
        case "audio" => AudioDecoder.decode(kind, bytes)
        case _ => FakeDecoder.decode(kind, bytes)
      }
  }

  /** Deterministic stand-in: fixed-length feature derived from byte
    * content — stable across runs/partitions so tests can assert.
    * The image and (PCM) audio halves of the boundary have REAL
    * implementations ([[ImageDecoder]], [[AudioDecoder]]); this fake
    * remains for video and for synthetic-payload tests. The lanes are
    * INTEGER byte sums (exact in f32 below 2²⁴ bytes of payload), so
    * an independent engine can reproduce the feature bit-for-bit —
    * the t59 gate recomputes it in DuckDB per byte position. */
  object FakeDecoder extends Decoder {
    override def decode(kind: String, bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](8)
      var i = 0
      while (i < bytes.length) {
        acc(i % 8) += (bytes(i) & 0xff)
        i += 1
      }
      acc
    }
  }

  /** Per-partition feature extraction: decoder instantiated once per
    * task, binary never shuffled. */
  def extractFeatures(media: Dataset[MediaRecord],
      decoder: Decoder = FakeDecoder): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val f = decoder.decode(r.kind, r.data)
        var cs = 0L
        var i = 0
        while (i < r.data.length) { cs = cs * 31 + (r.data(i) & 0xff); i += 1 }
        MediaFeature(r.media_id, r.kind, r.data.length.toLong, cs, f)
      }
    }
  }

  /** One sampled video frame: parent id + frame index + event time +
    * payload (last, for pruning). */
  case class FrameRecord(
      media_id: Long,
      frame_idx: Int,
      ts_ms: Long,
      width: Int,
      height: Int,
      frame: Array[Byte])

  /** Frame extractor boundary — a real implementation wraps a video
    * codec seek+decode; the stub slices the payload deterministically
    * so tests can assert content provenance. */
  trait FrameSampler extends Serializable {
    def frameAt(bytes: Array[Byte], tsMs: Long): Array[Byte]
  }

  object FakeFrameSampler extends FrameSampler {
    override def frameAt(bytes: Array[Byte], tsMs: Long): Array[Byte] =
      if (bytes.isEmpty) bytes
      else {
        val off = (tsMs % math.max(bytes.length, 1)).toInt
        Array(bytes(off), bytes((off + 1) % bytes.length))
      }
  }

  /** Sample one frame every `everyMs` from each video row — the
    * one-to-many flatMap shape of frame extraction. Partition-local
    * (one sampler per task); the expansion happens BEFORE any shuffle,
    * and each output row carries only its own frame bytes, so a
    * 2-hour video never rides a shuffle whole. */
  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long,
      sampler: FrameSampler = FakeFrameSampler): Dataset[FrameRecord] = {
    require(everyMs > 0)
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { r =>
        // every non-empty video yields at least frame 0 at ts=0 — a
        // clip shorter than the cadence must not vanish from the
        // frame corpus
        val n = math.max(if (r.duration_ms > 0) 1 else 0,
          (r.duration_ms / everyMs).toInt)
        (0 until n).iterator.map { i =>
          val ts = i * everyMs
          FrameRecord(r.media_id, i, ts, r.width, r.height,
            sampler.frameAt(r.data, ts))
        }
      }
    }
  }

  /** Resize boundary — real implementation wraps an image resampler;
    * the stub length-scales the payload deterministically. */
  trait Resizer extends Serializable {
    def resize(bytes: Array[Byte], fromW: Int, fromH: Int,
        toW: Int, toH: Int): Array[Byte]
  }

  /** REAL image resampler via the JDK: decode (ImageIO), scale with
    * bilinear Graphics2D drawImage, re-encode as PNG (lossless — the
    * resized payload round-trips bit-stable). Throws on undecodable
    * payloads, like [[ImageDecoder]]. */
  object ImageResizer extends Resizer {
    override def resize(bytes: Array[Byte], fromW: Int, fromH: Int,
        toW: Int, toH: Int): Array[Byte] = {
      import java.awt.RenderingHints
      import java.awt.image.BufferedImage
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"undecodable image payload (${bytes.length} bytes)")
      val out = new BufferedImage(toW, toH, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, toW, toH, null)
      } finally g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      baos.toByteArray
    }
  }

  object FakeResizer extends Resizer {
    override def resize(bytes: Array[Byte], fromW: Int, fromH: Int,
        toW: Int, toH: Int): Array[Byte] = {
      val n = math.max(1,
        (bytes.length.toLong * toW * toH /
          math.max(fromW.toLong * fromH, 1)).toInt)
      Array.tabulate(n)(i => bytes(i % math.max(bytes.length, 1)))
    }
  }

  /** Resize every image to (toW, toH): payload transformed in place,
    * metadata updated — partition-local, non-image rows pass through
    * untouched. */
  def resizeImages(media: Dataset[MediaRecord], toW: Int, toH: Int,
      resizer: Resizer = FakeResizer): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        if (r.kind != "image") r
        else r.copy(width = toW, height = toH,
          data = resizer.resize(r.data, r.width, r.height, toW, toH))
      }
    }
  }

  /** Metadata-only stats — must read zero bytes of `data` from parquet
    * (column pruning), the property that makes 100TB media tables
    * queryable. */
  def metadataStats(media: DataFrame): DataFrame =
    media.groupBy("kind")
      .agg(count(lit(1)).as("n"),
        avg(col("width") * col("height")).as("avg_pixels"),
        sum("duration_ms").as("total_duration_ms"))

  /** Write partitioned by kind so per-modality scans prune files. */
  def write(media: Dataset[MediaRecord], path: String): Unit =
    media.write.mode("overwrite").partitionBy("kind").parquet(path)
}
