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

/** Output of the (stubbed) decode/feature stage. `resized_w/h` are the
 * fit-within-[[Multimodal.ResizeTarget]] dimensions (aspect preserved,
 * integer arithmetic); `sampled_frames` the stride-sampled frame indices
 * (up to [[Multimodal.FrameSampleK]], dash-joined for engine-portable
 * comparison). */
case class AssetFeatures(
    asset_id: Long,
    n_bytes: Long,
    checksum: String,
    width: Long,
    height: Long,
    frames: Long,
    resized_w: Long,
    resized_h: Long,
    sampled_frames: String)

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

  /** Fit-within resize target (longest side) and frame-sample count. */
  val ResizeTarget = 224L
  val FrameSampleK = 4

  /** Fit-within resize: scale so max(w, h) == [[ResizeTarget]] (never
   * upscale), aspect preserved with floor arithmetic — the integer core a
   * real resampler would share. */
  private[operators] def resize(w: Long, h: Long): (Long, Long) = {
    val side = math.max(w, h)
    if (side <= ResizeTarget) (w, h)
    else (w * ResizeTarget / side, h * ResizeTarget / side)
  }

  /** Evenly-strided distinct frame indices: floor(i · frames / k),
   * i = 0..k−1 — the standard uniform temporal sample. */
  private[operators] def sampleFrames(frames: Long): Seq[Long] =
    (0 until FrameSampleK).map(i => i * frames / FrameSampleK).distinct

  /** STUB decoder: a real implementation would decode `payload` with an
   * image/audio codec here. This deterministic fake derives pseudo
   * dimensions from the byte length so the plumbing (schema, batching,
   * partition-local execution) is fully exercised and test-checkable;
   * resize and frame-sampling run on the fake dimensions with the real
   * integer arithmetic. */
  def decodeStub(a: Asset): AssetFeatures = {
    val n = a.payload.length.toLong
    val w = 64L + n % 640L
    val h = 64L + n % 480L
    val frames = 1L + n % 16L
    val (rw, rh) = resize(w, h)
    AssetFeatures(
      asset_id = a.asset_id,
      n_bytes = n,
      checksum = md5Hex(a.payload),
      width = w,
      height = h,
      frames = frames,
      resized_w = rw,
      resized_h = rh,
      sampled_frames = sampleFrames(frames).mkString("-"))
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
   * the multimodal path. All arithmetic is exact BIGINT (DIV, %); the
   * frame sample is sorted-distinct before stringifying so both engines
   * agree independent of their list_distinct ordering. */
  def features(docs: DataFrame): DataFrame = {
    val side = greatest(col("width"), col("height"))
    docs.select(
      col("doc_id").as("asset_id"),
      octet_length(col("text").cast("binary")).cast("bigint").as("n_bytes"),
      md5(col("text").cast("binary")).as("checksum"))
      .withColumn("width", lit(64L) + col("n_bytes") % 640L)
      .withColumn("height", lit(64L) + col("n_bytes") % 480L)
      .withColumn("frames", lit(1L) + col("n_bytes") % 16L)
      .withColumn("resized_w",
        when(side <= ResizeTarget, col("width"))
          .otherwise(expr(s"width * $ResizeTarget DIV greatest(width, height)")))
      .withColumn("resized_h",
        when(side <= ResizeTarget, col("height"))
          .otherwise(expr(s"height * $ResizeTarget DIV greatest(width, height)")))
      .withColumn("sampled_frames", expr(
        s"concat_ws('-', transform(array_sort(array_distinct(" +
          s"transform(sequence(0, ${FrameSampleK - 1}), i -> CAST(i AS BIGINT) * frames DIV $FrameSampleK))), " +
          "x -> CAST(x AS STRING)))"))
  }

  /** Exact BINARY-payload deduplication — the first pass of any
   * multimodal ingest (the same image/clip arrives from thousands of
   * pages): group assets by payload checksum, keep the smallest
   * asset_id as keeper, report the duplicate mass. Output
   * (checksum, n_assets, keeper_id, n_bytes) for checksums seen > once.
   *
   * Shape: md5 rides the scan projection (no payload ever shuffles —
   * only the 32-hex digest + id), then one partial-capable hash
   * aggregate on the digest; at 100 TB of media the exchange carries
   * digests, not bytes, which is the entire point of checksum-first
   * dedup. Collision risk at md5's 2⁻⁶⁴ scale is the industry-accepted
   * trade for a first pass (byte-verify the tiny duplicate set if the
   * stakes demand it). */
  def payloadDedup(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id").as("asset_id"),
        md5(col("text").cast("binary")).as("checksum"),
        octet_length(col("text").cast("binary")).cast("bigint").as("n_bytes"))
      .groupBy(col("checksum"))
      .agg(count(lit(1)).as("n_assets"),
        min(col("asset_id")).as("keeper_id"),
        max(col("n_bytes")).as("n_bytes"))
      .filter(col("n_assets") > 1)

  def payloadDedupSql(table: String): String =
    s"""SELECT md5(text) AS checksum, count(*) AS n_assets,
       | min(doc_id) AS keeper_id,
       | max(CAST(octet_length(encode(text)) AS BIGINT)) AS n_bytes
       |FROM $table
       |GROUP BY 1 HAVING count(*) > 1""".stripMargin

  def featuresSql(table: String): String = {
    val nb = "CAST(octet_length(encode(text)) AS BIGINT)"
    s"""SELECT doc_id AS asset_id, $nb AS n_bytes,
       | md5(text) AS checksum,
       | 64 + $nb % 640 AS width,
       | 64 + $nb % 480 AS height,
       | 1 + $nb % 16 AS frames,
       | CASE WHEN greatest(64 + $nb % 640, 64 + $nb % 480) <= $ResizeTarget
       |      THEN 64 + $nb % 640
       |      ELSE (64 + $nb % 640) * $ResizeTarget // greatest(64 + $nb % 640, 64 + $nb % 480) END AS resized_w,
       | CASE WHEN greatest(64 + $nb % 640, 64 + $nb % 480) <= $ResizeTarget
       |      THEN 64 + $nb % 480
       |      ELSE (64 + $nb % 480) * $ResizeTarget // greatest(64 + $nb % 640, 64 + $nb % 480) END AS resized_h,
       | array_to_string([CAST(x AS VARCHAR) for x in
       |   list_sort(list_distinct([i * (1 + $nb % 16) // $FrameSampleK for i in range(0, $FrameSampleK)]))], '-') AS sampled_frames
       |FROM $table""".stripMargin
  }
}
