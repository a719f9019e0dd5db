package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, processed by a batched per-partition "decode" stage — the
  * Spark-side shape of an image/audio feature-extraction pipeline.
  *
  * The real decode (image resize, audio frame-sample, …) would call a
  * native library unavailable in this environment, so [[decodeStub]] is a
  * deterministic fake: it consumes raw bytes in fixed-size batches (the
  * batch shape a vectorized decoder needs) and emits per-payload features.
  * Everything around it — binary column, schema, partitioning, batched
  * iteration, typed output — is real and oracle-checked (the features are
  * byte arithmetic DuckDB can replay on the UTF-8 text).
  */
object Multimodal {
  private type Q = (SparkSession, String) => DataFrame

  final case class Payload(doc_id: Long, bin: Array[Byte])
  final case class Features(doc_id: Long, byte_len: Long, checksum: Long,
    head_byte: Int, n_chunks: Long)
  private implicit val encPayload: Encoder[Payload] = Encoders.product[Payload]
  private implicit val encFeatures: Encoder[Features] = Encoders.product[Features]

  /** Batched decode stub: iterates payloads in batches of 64 (a vectorized
    * decoder's natural unit), emits deterministic byte-level features.
    */
  def decodeStub(batch: Seq[Payload]): Seq[Features] =
    batch.map { p =>
      var sum = 0L
      var i = 0
      while (i < p.bin.length) { sum += (p.bin(i) & 0xFF); i += 1 }
      Features(p.doc_id, p.bin.length.toLong, sum % 997,
        if (p.bin.isEmpty) -1 else p.bin(0) & 0xFF,
        (p.bin.length.toLong + 255) / 256)
    }

  /** M1 — binary ingest → batched decode → typed features. */
  private val decode: Q = (s, dir) => {
    val payloads = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin"))
      .as[Payload](encPayload)
    payloads.mapPartitions { it =>
      it.grouped(64).flatMap(g => decodeStub(g.toSeq))
    }(encFeatures).toDF()
  }

  val queries: Map[String, Q] = Map("m01_multimodal_decode" -> decode)

  /** The corpus is ASCII, so UTF-8 bytes == character codes and DuckDB can
    * replay the byte features with `ascii`/`octet_length`.
    */
  val oracle: Map[String, String] = Map(
    "m01_multimodal_decode" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  CAST(list_reduce(list_prepend(0,
        |         list_transform(generate_series(1, len(text)), i -> ascii(substr(text, i, 1)))),
        |       (a, x) -> a + x) % 997 AS BIGINT) AS checksum,
        |  CASE WHEN len(text) = 0 THEN -1 ELSE ascii(substr(text, 1, 1)) END AS head_byte,
        |  CAST((octet_length(encode(text)) + 255) // 256 AS BIGINT) AS n_chunks
        |FROM documents""".stripMargin)
}
