package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media as
  * opaque `binary` columns with typed metadata, processed per-partition
  * through a pluggable decoder.
  *
  * The Spark-side contract (schema, partitioning, batch shape) is real
  * and tested; the codec itself is STUBBED — this container has no
  * image/audio libraries, so `FakeDecoder` is a deterministic
  * placeholder with the same signature a JNI/FFI decoder would have.
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

  /** Deterministic stand-in: fixed-length feature derived from byte
    * content — stable across runs/partitions so tests can assert. */
  object FakeDecoder extends Decoder {
    override def decode(kind: String, bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](8)
      var i = 0
      while (i < bytes.length) {
        acc(i % 8) += (bytes(i) & 0xff) / 255.0f
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
