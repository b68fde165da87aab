package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video ride as opaque `binary`
  * columns with typed metadata. The Spark side — schema, partitioning,
  * per-partition batch processing — is real; the codec itself is STUBBED
  * (no image/audio libraries in this container) with a deterministic fake
  * that hashes the payload into a feature vector. Swap `decodeStub` for a
  * real decoder (e.g. a JNI codec or `mapInPandas` + PIL on PySpark) to go
  * to production. */
object MediaOps {

  case class MediaMeta(media_ref: String, kind: String, bytes: Array[Byte])
  case class MediaFeatures(media_ref: String, kind: String, n_bytes: Long,
                           width: Int, height: Int, feature: Array[Float])

  /** Stub "decoded dimensions" from the payload hash — public so the
    * by-construction oracle can be built from the same formula. */
  def stubDims(bytes: Array[Byte]): (Int, Int) = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    (64 + math.floorMod(h, 64).toInt, 64 + math.floorMod(h >> 8, 64).toInt)
  }

  /** STUB decoder: deterministic pseudo-decode. A real implementation
    * returns decoded dimensions + an embedding; this fake derives both from
    * the payload hash so tests are stable. */
  private def decodeStub(kind: String, bytes: Array[Byte], dim: Int): (Int, Int, Array[Float]) = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val (w, ht) = stubDims(bytes)
    val feat = new Array[Float](dim)
    var k = 0
    var s = h
    while (k < dim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      feat(k) = ((s >>> 40).toInt % 1000) / 1000.0f
      k += 1
    }
    (w, ht, feat)
  }

  /** Feature extraction over the media dimension: salted repartition (same
    * skew treatment as extraction) then per-partition batch decode. */
  def featurize(media: DataFrame, dim: Int = 16, numPartitions: Int = 0)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions else spark.sessionState.conf.numShufflePartitions
    media.select(col("media_ref"), col("kind"), col("bytes"))
      .withColumn("salt", pmod(xxhash64(col("media_ref")), lit(parts)))
      .repartition(parts, col("salt"))
      .drop("salt")
      .as[MediaMeta]
      .mapPartitions { it =>
        // per-partition reused scratch would live here for a real codec
        it.map { m =>
          val (w, h, feat) = decodeStub(m.kind, m.bytes, dim)
          MediaFeatures(m.media_ref, m.kind, m.bytes.length.toLong, w, h, feat)
        }
      }
  }
}
