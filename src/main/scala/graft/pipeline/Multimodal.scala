package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata. The codec step is STUBBED (no image/audio libraries
  * in this container — builder prompt): `decodeStub` parses a deterministic
  * fake header instead of real pixels, but the Spark-side schema, batched
  * partition processing, and frame-sampling plumbing are real and tested.
  * On a real cluster the stub body is swapped for an actual codec call
  * (or a pandas_udf/mapInPandas worker on PySpark).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),              // image | audio | video
    StructField("blob", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Deterministic synthetic media table: blob = 16-byte fake header
    * (magic, width, height, frames) + payload derived from the id. */
  def synthesize(spark: SparkSession, n: Int, seed: Long = 42): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val h = TextOps.mix(seed + i)
      val kind = Seq("image", "audio", "video")((h & 0x7fffffff).toInt % 3)
      val width = 64 + ((h >>> 8) % 192).toInt
      val height = 64 + ((h >>> 16) % 192).toInt
      val frames = if (kind == "video") 8 + ((h >>> 24) % 56).toInt else 1
      val sampleRate = if (kind == "audio") 16000 else 0
      val bb = java.nio.ByteBuffer.allocate(16 + 64)
      bb.putInt(0x47524654) // "GRFT"
      bb.putInt(width); bb.putInt(height); bb.putInt(frames)
      var j = 0
      while (j < 8) { bb.putLong(TextOps.mix(h + j)); j += 1 }
      (i.toLong, kind, bb.array(), width, height, sampleRate, frames)
    }
    rows.toDF("media_id", "kind", "blob", "width", "height", "sample_rate", "n_frames")
      .select($"media_id", $"kind", $"blob",
        struct($"width", $"height", $"sample_rate", $"n_frames").as("meta"))
  }

  /** STUB decode: reads the fake header from the binary column. The real
    * implementation calls the image codec here — same signature/batching. */
  def decodeStub(df: DataFrame): DataFrame = {
    // ??? <- real codec goes here; deterministic fake below keeps plumbing testable
    df.withColumn("decoded_width",
        conv(hex(substring(col("blob"), 5, 4)), 16, 10).cast("int"))
      .withColumn("decoded_height",
        conv(hex(substring(col("blob"), 9, 4)), 16, 10).cast("int"))
      .withColumn("decoded_frames",
        conv(hex(substring(col("blob"), 13, 4)), 16, 10).cast("int"))
  }

  /** frame sampling plan: explode every ceil(n_frames / k)-th frame index —
    * the shuffle-free plumbing a video pipeline needs before decode. */
  def sampleFrames(df: DataFrame, k: Int): DataFrame = {
    df.filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("meta.n_frames") - 1,
          greatest(lit(1), (col("meta.n_frames") / k).cast("int")))))
  }

  /** feature-extract stub: fixed-width feature vector from blob bytes
    * (real pipeline: model embedding; plumbing + batch shape identical). */
  def featureStub(df: DataFrame, dim: Int = 8): DataFrame = {
    val feats = (0 until dim).map { d =>
      (conv(hex(substring(col("blob"), 17 + d * 8, 8)), 16, 10).cast("double") /
        lit(Long.MaxValue.toDouble)).as(s"f$d")
    }
    df.select((col("media_id") +: feats): _*)
  }
}
