package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators whose Spark-side shape (schema, partitioning, batch iteration)
  * is real while the actual codec is a STUB (this container ships no
  * image/audio libraries — the decode is a clearly-marked deterministic
  * fake; swap `FakeCodec` for a real decoder in production).
  *
  * The driver testdata has no binary table, so payloads are synthesized
  * deterministically from the documents table (UTF-8 bytes of text stand in
  * for encoded media). Metadata extraction (q45) is honest SQL-comparable
  * work; decode/frame-sample (q46) is rows-only.
  */
object Multimodal {

  private def docs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")

  type Q = (SparkSession, String) => DataFrame

  /** STUB codec — deterministic fake standing in for image/audio decode. */
  object FakeCodec {
    /** "Decode" a payload into (width, height, channels): derived from
      * byte statistics; a real implementation would call the codec here. */
    def decodeMeta(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      (256 + (n % 512), 256 + ((n / 7) % 512), 3)
    }

    /** "Sample frames": every stride-th 16-byte slice as a frame digest. */
    def sampleFrames(payload: Array[Byte], stride: Int): Seq[Long] = {
      (0 until payload.length by math.max(stride, 1)).take(8).map { off =>
        var h = 0xcbf29ce484222325L
        var i = off
        while (i < math.min(off + 16, payload.length)) {
          h ^= payload(i).toLong & 0xff; h *= 0x100000001b3L; i += 1
        }
        h
      }
    }
  }

  val queries: Map[String, Q] = Map(
    // --- binary payload + metadata columns; SQL-comparable byte lengths
    "q45_media_meta" -> ((s, d) => {
      docs(s, d)
        .select(col("doc_id"),
          col("text").cast("binary").as("payload"),
          col("lang").as("media_kind"))
        .select(col("doc_id"), col("media_kind"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          substring(hex(col("payload")), 1, 8).as("magic"))
        .orderBy(col("doc_id"))
    }),

    // --- decode + frame-sample through the stub codec (rows-only check):
    //     the real part is the distributed shape — typed Dataset map over
    //     binary payloads, one row per sampled frame
    "q46_media_frames" -> ((s, d) => {
      import s.implicits._
      docs(s, d).select(col("doc_id"), col("text").cast("binary"))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, payload) =>
          val (w, h, c) = FakeCodec.decodeMeta(payload)
          FakeCodec.sampleFrames(payload, stride = 64).zipWithIndex.map {
            case (digest, idx) => (id, w, h, c, idx, digest)
          }
        }
        .toDF("doc_id", "width", "height", "channels", "frame_idx", "frame_digest")
        .orderBy(col("doc_id"), col("frame_idx"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q45_media_meta" ->
      """SELECT doc_id, lang AS media_kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  substr(upper(hex(encode(text))), 1, 8) AS magic
        |FROM documents ORDER BY doc_id""".stripMargin
    // q46_media_frames: stub codec — rows-only check
  )
}
