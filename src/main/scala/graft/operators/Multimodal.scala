package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media asset: opaque payload bytes + typed metadata. The binary
 * column is the 100 TB-scale contract — images/audio/video ride through
 * the engine as `BINARY` with schema'd metadata, never decoded until a
 * feature-extraction stage asks. */
case class Asset(
    asset_id: Long,
    media_type: String,
    payload: Array[Byte],
    meta_chars: Long,
    meta_lang: String)

/** Output of the (stubbed) decode/feature stage. */
case class AssetFeatures(
    asset_id: Long,
    n_bytes: Long,
    checksum: String,
    width: Long,
    height: Long,
    frames: Long)

/**
 * Multimodal-column plumbing (SURVEY.md §7.2-M7): treat media as opaque
 * `BINARY` columns with typed metadata; run decode / feature-extract /
 * frame-sample per partition in batches.
 *
 * The container has no image/audio codecs, so [[decodeStub]] is a
 * clearly-marked deterministic fake — but everything AROUND it is the real
 * Spark shape a production decoder would plug into:
 *  - assets are a typed `Dataset[Asset]` (binary payload + metadata
 *    columns), built here from `documents` (text bytes standing in for
 *    media bytes);
 *  - feature extraction is `mapPartitions` over the typed Dataset — the
 *    Scala analog of `mapInPandas`: one iterator per partition, so a real
 *    decoder would amortize codec/model setup per partition, exactly the
 *    batch shape that matters at scale, and the narrow (no-shuffle)
 *    dependency keeps it pipelined with the scan;
 *  - [[features]] (the oracle-checked query) computes the SAME values as
 *    pure Column expressions, proving the stub's arithmetic is
 *    engine-portable and giving the driver a DuckDB-checkable surface.
 */
object Multimodal {

  /** Documents → typed media assets: payload = UTF-8 bytes of `text`
   * (deterministic stand-in for image bytes), metadata carried alongside. */
  def assets(docs: DataFrame): Dataset[Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      lit("text/plain").as("media_type"),
      col("text").cast("binary").as("payload"),
      col("n_chars").as("meta_chars"),
      col("lang").as("meta_lang")).as[Asset]
  }

  /** STUB decoder: a real implementation would decode `payload` with an
   * image/audio codec here. This deterministic fake derives pseudo
   * dimensions from the byte length so the plumbing (schema, batching,
   * partition-local execution) is fully exercised and test-checkable. */
  def decodeStub(a: Asset): AssetFeatures = {
    val n = a.payload.length.toLong
    AssetFeatures(
      asset_id = a.asset_id,
      n_bytes = n,
      checksum = md5Hex(a.payload),
      width = 64L + n % 640L,
      height = 64L + n % 480L,
      frames = 1L + n % 16L)
  }

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** Partition-batched feature extraction — the `mapInPandas` analog. The
   * iterator-in/iterator-out shape is where a real decoder would hoist
   * per-partition setup (codec contexts, model weights). */
  def extractFeatures(as: Dataset[Asset]): Dataset[AssetFeatures] = {
    val spark = as.sparkSession
    import spark.implicits._
    as.mapPartitions { it: Iterator[Asset] =>
      // per-partition setup would go here (open codec, load model, ...)
      it.map(decodeStub)
    }
  }

  /** Column-expression twin of [[extractFeatures]] over the same assets —
   * identical values, DuckDB-expressible, used as the driver oracle for
   * the multimodal path. */
  def features(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      octet_length(col("text").cast("binary")).cast("bigint").as("n_bytes"),
      md5(col("text").cast("binary")).as("checksum"))
      .withColumn("width", lit(64L) + col("n_bytes") % 640L)
      .withColumn("height", lit(64L) + col("n_bytes") % 480L)
      .withColumn("frames", lit(1L) + col("n_bytes") % 16L)

  def featuresSql(table: String): String =
    s"""SELECT doc_id AS asset_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       | md5(text) AS checksum,
       | 64 + CAST(octet_length(encode(text)) AS BIGINT) % 640 AS width,
       | 64 + CAST(octet_length(encode(text)) AS BIGINT) % 480 AS height,
       | 1 + CAST(octet_length(encode(text)) AS BIGINT) % 16 AS frames
       |FROM $table""".stripMargin
}
