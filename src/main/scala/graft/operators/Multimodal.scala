package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing for training-data pipelines: image/audio/video
 * payloads travel as opaque `binary` columns beside a typed metadata
 * struct. The Spark-side mechanics — schema convention, magic-byte type
 * sniffing, batched per-partition decode plumbing, partition sizing — are
 * real and tested; the pixel/sample DECODE ITSELF IS A DETERMINISTIC STUB
 * (no image/audio codecs in this environment), clearly marked below, with
 * the exact seam where a real codec (javax.imageio / ffmpeg JNI) drops in.
 *
 * Everything before the decode stays in whole-stage codegen (built-ins
 * only); the decode runs via `mapPartitions` — the JVM analogue of a
 * vectorized Python `mapInPandas` — so each task amortizes codec setup
 * across a whole batch instead of paying it per row.
 */
object Multimodal {

  /** Metadata struct carried beside every binary payload column. */
  val metadataType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("content_hash", LongType)))

  /**
   * Sniff media type from magic bytes + attach the metadata struct —
   * pure built-ins (hex prefix compare), no UDF, stays in codegen.
   */
  def withMetadata(df: DataFrame, binCol: String, metaCol: String = "meta"): DataFrame = {
    val prefix = upper(hex(substring(col(binCol), 1, 12)))
    val mime =
      when(prefix.startsWith("89504E47"), "image/png")
        .when(prefix.startsWith("FFD8FF"), "image/jpeg")
        .when(prefix.startsWith("47494638"), "image/gif")
        .when(prefix.startsWith("52494646") && substring(prefix, 17, 8) === "57415645", "audio/wav")
        .when(substring(prefix, 9, 8) === "66747970", "video/mp4") // ....ftyp
        .when(prefix.startsWith("4F676753"), "audio/ogg")
        .otherwise("application/octet-stream")
    df.withColumn(metaCol, struct(
      mime.as("mime"),
      length(col(binCol)).cast(LongType).as("n_bytes"),
      xxhash64(col(binCol)).as("content_hash")))
  }

  /** Feature row produced by the decode stage. */
  val featureType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /**
   * Batched decode / feature-extraction over a binary column.
   *
   * Plumbing (real): per-partition iteration in fixed-size batches; one
   * "codec" initialization per partition, not per row; output schema is
   * the input schema + a typed feature struct; input partition count is
   * preserved so upstream `repartition` controls task granularity.
   *
   * Decode (STUB): `decodeStub` fabricates deterministic pseudo-features
   * from the payload bytes. Replace ONLY that function with a real codec
   * (e.g. ImageIO.read for images) — every other line stays.
   */
  def decodeFeatures(df: DataFrame, binCol: String,
                     featCol: String = "feat", batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(featCol, featureType))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // REAL CODEC SEAM: initialize the decoder once per partition here.
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          Row.fromSeq(r.toSeq :+ decodeStub(bytes))
        }
      }
    }(enc)
  }

  /**
   * STUB decode — deterministic fake standing in for a codec call.
   * Produces plausible dimensions and an 8-float signature derived from
   * the byte content, so downstream plumbing (similarity over features,
   * grouping by dimensions) is exercised with stable values.
   */
  private[operators] def decodeStub(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.isEmpty) return Row(0, 0, 0, Array.empty[Float])
    val h = scala.util.hashing.MurmurHash3.bytesHash(bytes, 42)
    val width = 64 + math.abs(h % 1024)
    val height = 64 + math.abs((h / 1024) % 1024)
    val feature = Array.tabulate(8) { i =>
      (scala.util.hashing.MurmurHash3.bytesHash(bytes, i) % 1000) / 1000.0f
    }
    Row(width, height, 3, feature)
  }

  /**
   * Frame/chunk sampling plan for long media: rows whose payload exceeds
   * `chunkBytes` are exploded into (chunk_index, offset, length) plan rows
   * — pure built-ins; the actual chunk decode would go through
   * [[decodeFeatures]] on the sliced payload.
   */
  def chunkPlan(df: DataFrame, binCol: String, chunkBytes: Int = 1 << 20): DataFrame = {
    val n = ceil(length(col(binCol)).cast(DoubleType) / chunkBytes).cast(IntegerType)
    df.withColumn("chunk_index", explode(sequence(lit(0), greatest(n, lit(1)) - 1)))
      .withColumn("chunk_offset", col("chunk_index").cast(LongType) * chunkBytes)
      .withColumn("chunk_length",
        least(lit(chunkBytes.toLong),
          length(col(binCol)).cast(LongType) - col("chunk_offset")))
  }
}
