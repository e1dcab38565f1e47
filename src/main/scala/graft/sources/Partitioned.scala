package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, countDistinct}

/**
 * Hive-style partitioned parquet storage — the scan-elimination leg of
 * the layout toolkit next to [[Bucketing]] (exchange elimination): a
 * corpus laid out as `path/lang=en/...` lets every language-filtered
 * query skip the other languages' bytes entirely (partition pruning
 * happens at PLAN time from directory names — 0 files of the excluded
 * partitions are opened, vs parquet row-group stats which still read
 * footers). At 100 TB with ~30 languages, a `lang = 'en'`-filtered job
 * scans ~'en''s share of the bytes, not 100 TB.
 *
 * The failure mode the guard below exists for: partitioning on a
 * HIGH-cardinality column (doc_id, user_id) explodes into millions of
 * tiny directories/files — a metastore/listing DoS and a small-files
 * catastrophe that only shows up in production listings. Partition
 * columns must be low-cardinality dimensions (language, source, date).
 */
object Partitioned {

  /** Ceiling on distinct partition-directory combinations [[write]]
   * accepts. Generous for any sane dimension (langs × sources × dates)
   * while catching an id-column mistake at write time, when it is
   * cheap, instead of at the first production directory listing. */
  val MaxPartitions = 100000L

  /** Write `df` as hive-style partitioned parquet under `path`.
   * The cardinality guard costs one partial-agg count-distinct over the
   * partition columns — O(combinations) rows shuffled, negligible next
   * to the write itself. */
  def write(df: DataFrame, path: String, partitionCols: Seq[String],
            maxPartitions: Long = MaxPartitions): Unit = {
    require(partitionCols.nonEmpty, "at least one partition column")
    val n = df.agg(countDistinct(col(partitionCols.head),
      partitionCols.tail.map(col): _*)).head().getLong(0)
    require(n <= maxPartitions,
      s"refusing to write $n distinct ${partitionCols.mkString("(", ",", ")")} " +
        s"partitions (> $maxPartitions): partition columns must be " +
        "low-cardinality dimensions, not ids")
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }

  /** Read a [[write]] layout back. Partition columns come back as
   * directory-derived columns; any filter on them prunes at plan time
   * (asserted in `PartitionedSpec` via the scan's numFiles metric). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
