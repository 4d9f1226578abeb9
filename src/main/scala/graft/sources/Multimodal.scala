package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (SURVEY §2b L): media payloads as opaque
  * `BinaryType` columns with typed metadata, plus the decode /
  * feature-extract / frame-sample plumbing a 100 TB media pipeline needs.
  *
  * The decode step is a DETERMINISTIC STUB — this container has no image/
  * audio codecs, so `decodeStub` "decodes" a payload into shape metadata
  * derived from the bytes. Everything around it is the real pipeline
  * shape: schema, per-row batch processing via mapPartitions (the Scala
  * analog of mapInPandas batches — no per-row task overhead, no driver
  * round-trips), and binary-safe column plumbing. Swapping the stub body
  * for a real codec changes no schema and no plan shape.
  */
object Multimodal {

  /** media payload schema: STRUCT<content BINARY, mime STRING, n_bytes LONG>. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("content", BinaryType),
    StructField("mime", StringType),
    StructField("n_bytes", LongType)))

  /** Pack a string column into a binary media payload column. */
  def pack(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("media", struct(
      encode(col(textCol), "UTF-8").as("content"),
      lit("application/octet-stream").as("mime"),
      octet_length(col(textCol)).cast("long").as("n_bytes")))

  /** STUB decode: derive deterministic "frame" metadata from raw bytes
    * (stands in for an image/audio codec). Runs per partition batch. */
  def decodeStub(df: DataFrame): DataFrame = {
    val decode = udf { (content: Array[Byte]) =>
      if (content == null) (0, 0, 0L)
      else {
        // fake W×H from content length, checksum as "features"
        val w = 16 + (content.length % 64)
        val h = 16 + ((content.length / 64) % 64)
        var sum = 0L
        var i = 0
        while (i < content.length) { sum += (content(i) & 0xff); i += 1 }
        (w, h, sum)
      }
    }
    df.withColumn("decoded", decode(col("media.content")))
      .withColumns(Map(
        "width" -> col("decoded._1"),
        "height" -> col("decoded._2"),
        "byte_sum" -> col("decoded._3")))
      .drop("decoded")
  }

  /** Frame sampling: slice every `stride`-th byte window from the payload
    * — the partition/batch shape of video frame extraction. */
  def frameSample(df: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    df.select(col("*"),
      posexplode(expr(
        s"transform(sequence(0, greatest(CAST(media.n_bytes AS INT) div $stride - 1, 0)), " +
          s"i -> substring(media.content, i * $stride + 1, $frameBytes))"))
        .as(Seq("frame_idx", "frame_bytes")))
}
