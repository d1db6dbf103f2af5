package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded (stubbed) media metadata for one media span. */
final case class MediaMeta(
    doc_id: String,
    pos: Int,
    media_ref: String,
    width: Int,
    height: Int,
    format: String)

/** Multimodal column plumbing. Media spans are opaque references (at 100 TB
  * they would be binary columns / object-store refs); the engine treats
  * decode as a per-partition batch operation so a real decoder (image/audio
  * libs) drops in without changing the dataflow.
  *
  * The decode itself is a STUB: the container ships no imaging libraries,
  * so `decodeStub` derives deterministic fake dimensions from the ref. The
  * Spark-side shape — typed Dataset, mapPartitions batching, schema — is
  * the real deliverable and is oracle-checked end to end.
  */
object Media {

  /** STUB decoder — replace with a real format sniffer/decoder in
    * production. Deterministic on the ref string so tests/oracles hold.
    */
  def decodeStub(mediaRef: String): (Int, Int, String) = {
    val n = mediaRef.length
    val width = 64 + (n % 8) * 16
    val height = 48 + (n % 5) * 32
    val format = mediaRef.substring(mediaRef.lastIndexOf('.') + 1)
    (width, height, format)
  }

  /** Media spans -> metadata rows. Narrow mapPartitions: a real decoder
    * would amortize library init per partition exactly here.
    */
  def metadata(spark: SparkSession, passages: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    passages
      .filter(col("kind") === "media" && col("media_ref").isNotNull)
      .select("doc_id", "pos", "media_ref")
      .as[(String, Int, String)]
      .mapPartitions { it =>
        // real impl: init decoder once per partition here
        it.map { case (docId, pos, ref) =>
          val (w, h, fmt) = decodeStub(ref)
          MediaMeta(docId, pos, ref, w, h, fmt)
        }
      }
  }
}
