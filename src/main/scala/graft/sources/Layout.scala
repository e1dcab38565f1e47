package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * File-layout maintenance — the two operations every long-lived 100 TB
 * parquet estate runs on a schedule, next to [[Partitioned]] (pruning)
 * and [[Bucketing]] (exchange elimination):
 *
 *  - [[compact]]: streaming sinks, incremental appends, and
 *    over-parallel writes leave thousands of KB-sized files per
 *    directory; every later scan then pays a task launch + footer read
 *    per file (and the driver a listing per query). Rewriting to
 *    ~target-sized files restores scan throughput.
 *  - [[zorderBy]]: parquet row-group min/max stats prune scans only
 *    when the data is CLUSTERED on the filtered column; sorting on one
 *    column destroys locality on every other. Interleaving the bits of
 *    two quantized sort keys (a Z-order / Morton curve — the layout
 *    behind Delta's OPTIMIZE ZORDER) gives BOTH columns bounded
 *    per-file ranges, so point/range filters on either prune files.
 */
object Layout {

  /** Default compaction target — a healthy parquet file size (row-group
   * sized, large enough that scan time dominates open cost). */
  val TargetFileBytes: Long = 128L << 20

  /** Rewrite the parquet directory at `inPath` into ~`targetBytes`
   * files at `outPath`. The file count derives from a driver-side
   * filesystem stat of the INPUT bytes (no data pass, no count job);
   * `repartition` (round-robin) balances rows evenly regardless of the
   * input's skewed file sizes. Returns the partition count chosen. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long = TargetFileBytes): Int = {
    val hp = new Path(inPath)
    val bytes = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(hp).getLength
    val parts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath).repartition(parts)
      .write.mode("overwrite").parquet(outPath)
    parts
  }

  /** Bits per dimension for [[zorderBy]]'s quantization: 2¹⁶ cells per
   * axis — far more resolution than any realistic file count needs,
   * still only 32 bits of z-value. */
  val ZBits = 16

  /** Morton interleave of two already-quantized non-negative ints
   * (each < 2^[[ZBits]]): bit i of `qx` lands at 2i, of `qy` at 2i+1.
   * Pure unrolled shift/mask Column arithmetic — codegen'd, no UDF. */
  private[sources] def interleave(qx: Column, qy: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(qx, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(qy, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Write `df` to `outPath` clustered on the Z-order curve of two
   * numeric columns. Quantization is min/max normalization to 2^[[ZBits]]
   * cells — `floor((x−min)·2^bits / span)` in double space, exact while
   * `(x−min)·2^bits` stays under 2⁵³ (any id/measure column; quantized
   * CELL boundaries are layout hints, not query answers, so the envelope
   * is about stability, not correctness). The min/max pair comes from one
   * O(1)-row driver aggregate. The write is `repartitionByRange` on the
   * z-value (contiguous curve segments per file — the clustering
   * guarantee) with an in-partition z sort so row groups inside each
   * file are clustered too.
   *
   * Both columns then show bounded per-file ranges: a filter on EITHER
   * prunes most files via parquet stats, where a plain sort on one
   * column leaves the other's per-file range at full width (asserted
   * quantitatively in `LayoutSpec`). */
  def zorderBy(df: DataFrame, colA: String, colB: String, outPath: String,
               files: Int): Unit = {
    require(files >= 1, "files must be >= 1")
    val Array(minA, maxA, minB, maxB) =
      df.agg(min(col(colA)).cast("long"), max(col(colA)).cast("long"),
        min(col(colB)).cast("long"), max(col(colB)).cast("long"))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val levels = 1L << ZBits
    def quant(c: Column, lo: Long, hi: Long): Column =
      floor(((c.cast("long") - lo) * levels).cast("double") / lit((hi - lo + 1).toDouble))
        .cast("long")
    val z = interleave(quant(col(colA), minA, maxA), quant(col(colB), minB, maxB))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outPath)
  }
}
