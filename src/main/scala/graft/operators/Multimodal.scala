package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2.F).
  *
  * Media payloads are opaque `binary` columns with typed, columnar
  * metadata (so Catalyst can prune/push down on metadata without ever
  * touching bytes). The decode step — which would call an image/audio
  * codec in production — is a DETERMINISTIC STUB (the codec libraries
  * are not in this container); everything around it (schema, typed
  * Dataset, partition-batched execution, feature shape) is real.
  *
  * Scale notes: payloads never hit the driver; decode runs
  * `mapPartitions` so a real codec would amortize per-batch init
  * (model load, JNI handles) across each partition's rows.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte],
      media_type: String, width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, media_type: String,
      n_bytes: Long, byte_sum: Long, mean_byte: Double,
      feat_0: Double, feat_1: Double)

  /** Synthesize a media table from documents: payload = utf8 bytes of
    * the text (stand-in for image bytes), metadata derived
    * deterministically from doc_id.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(array(lit("image/png"), lit("image/jpeg"), lit("audio/wav")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      (pmod(col("doc_id"), lit(64)) * 16 + 64).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) * 16 + 64).cast("int").as("height"))

  /** STUB decode: in production this would be a codec call per payload
    * (e.g. JPEG → pixel tensor). Deterministic fake: byte statistics +
    * two derived "features". Runs partition-batched over the typed
    * Dataset — the real pipeline shape.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init would go here (codec/model handle)
      rows.map { r =>
        val bytes = r.payload
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
        val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
        MediaFeatures(r.doc_id, r.media_type, bytes.length.toLong, sum, mean,
          // stubbed "embedding" features: deterministic projections
          math.round(mean * r.width / 256.0 * 1e6) / 1e6,
          math.round(sum.toDouble / (r.height + 1) * 1e6) / 1e6)
      }
    }
  }
}

/** Registry: binary plumbing is engine-specific (binary payload +
  * typed Dataset) → rows-only driver checks; exactness is covered by
  * ScalaTest specs against hand-computed byte stats.
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_binary_ingest" -> ((s, d) => {
      val m = Multimodal.mediaTable(Tables.documents(s, d))
      m.select(col("doc_id"), col("media_type"), col("width"), col("height"),
        length(col("payload")).as("payload_bytes"))
    }),
    "m2_feature_extract" -> ((s, d) =>
      Multimodal.extractFeatures(s, Multimodal.mediaTable(Tables.documents(s, d))).toDF())
  )

  val oracles: Map[String, String] = Map(
    // m1 is actually SQL-expressible (payload = utf8 text bytes):
    "m1_binary_ingest" ->
      """SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg' ELSE 'audio/wav' END AS media_type,
           CAST((doc_id % 64) * 16 + 64 AS INT) AS width,
           CAST((doc_id % 48) * 16 + 64 AS INT) AS height,
           CAST(octet_length(encode(text)) AS INT) AS payload_bytes
         FROM documents"""
  )
}
