package graft.functions

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal-column handling: image/audio/video payloads ride along as
  * opaque `binary` columns with typed metadata extracted Spark-side.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub — but the Spark plumbing around it
  * (binary column schema, per-partition batch iteration, typed output
  * rows) is the real at-scale shape: swap [[fakeDecode]] for a JNI/
  * Pandas-UDF decoder and nothing else changes.
  */
object MultimodalFunctions {

  /** Typed metadata row produced by the decode stage. */
  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int)

  /** STUB decoder: a real deployment decodes image bytes here (pillow /
    * opencv behind mapInPandas in PySpark, or a JVM ImageIO/JNI decoder).
    * Deterministic fake dimensions derived from the payload bytes so the
    * pipeline is testable without codecs. */
  def fakeDecode(bytes: Array[Byte]): (Int, Int) =
    if (bytes.length < 2) (1, 1)
    else (1 + (bytes(0) & 0xff) % 64, 1 + (bytes(1) & 0xff) % 64)

  /** Per-partition decode pass — the mapInPandas batch shape in Scala:
    * one iterator per partition, streaming rows through the decoder, no
    * driver involvement, linear in partitions. */
  def decodeImages(spark: SparkSession, ds: Dataset[(Long, Array[Byte])]): Dataset[MediaMeta] = {
    import spark.implicits._
    ds.mapPartitions(_.map { case (id, bytes) =>
      val (w, h) = fakeDecode(bytes)
      MediaMeta(id, bytes.length, w, h)
    })
  }
}
