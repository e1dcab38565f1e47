package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Central loaders for the shared parquet tables (TESTDATA.md). One place
 * owns the physical-type quirks so every operator sees identical values to
 * the DuckDB oracle. */
object Tables {

  /** Schema-adaptive `events` loader. The physical encoding of `events.ts`
   * is a data-generator choice, not a contract (the reference never
   * hard-codes serdes either — `LeftJoinOnTimeoutBuilder.java:70-77` takes
   * them from the caller), and it has in fact drifted across testdata
   * generations: TIMESTAMP(NANOS) (read as epoch-nanos BIGINT under
   * `spark.sql.legacy.parquet.nanosAsLong=true`, which every graft entry
   * point sets at session BUILD) → TIMESTAMP(MICROS, isAdjustedToUTC=false)
   * (read as TIMESTAMP_NTZ). Branch on the loaded schema so both — and a
   * plain UTC TIMESTAMP — normalize to one session type, TIMESTAMP, with
   * values identical to DuckDB's native parquet read:
   *   - BIGINT (legacy nanos-as-long): truncate nanos → micros, exactly
   *     DuckDB's nanos handling;
   *   - TIMESTAMP_NTZ: reinterpret the wall-clock as a UTC instant (the
   *     session timezone is pinned to UTC at build in every entry point),
   *     which is bit-identical to DuckDB's naive read;
   *   - TIMESTAMP: already the target type, pass through. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val df = s.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts resolved as unsupported type $other; expected BIGINT (legacy nanos), TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }

  /** Small single-file tables arrive as ONE scan partition (one parquet
   * row group = one task — Spark's byte-range file splits cannot divide a
   * row group), which serializes every downstream per-row computation —
   * signature hashing, quantized dot products — onto a single core. Fan
   * out to the cluster's parallelism when the table is small. The guard is
   * a driver-side filesystem metadata stat (length of the parquet file):
   * on a real multi-TB input it short-circuits to a no-op without ever
   * touching RDD lineage (an earlier `df.rdd.getNumPartitions` probe paid
   * RDD planning on every table load). */
  private val FanOutMaxBytes = 256L << 20
  /** Per-partition byte target for the fan-out. These tables are CPU-bound
   * per row (signature hashing, quantized dot products), not IO-bound, so
   * the target is far below a scan-split size: ~16 KB of compressed
   * parquet ≈ 150 documents or 400 vectors — several milliseconds of
   * hashing per task, comfortably above task overhead. A flat
   * `repartition(defaultParallelism)` previously spread a 60 KB table
   * over 32 near-empty partitions, paying 32 task launches for work that
   * fits in 4. */
  private val FanOutTargetBytes = 16L << 10
  private def fanOut(s: SparkSession, path: String): DataFrame = {
    val df = s.read.parquet(path)
    val hp = new org.apache.hadoop.fs.Path(path)
    val bytes = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
      .getContentSummary(hp).getLength
    if (bytes >= FanOutMaxBytes) df // real input: scan splits parallelize
    else {
      val parts = math.min(s.sparkContext.defaultParallelism.toLong,
        (bytes + FanOutTargetBytes - 1) / FanOutTargetBytes).toInt
      if (parts <= 1) df else df.repartition(parts)
    }
  }

  def documents(s: SparkSession, dir: String): DataFrame =
    fanOut(s, s"$dir/documents.parquet")

  def embeddings(s: SparkSession, dir: String): DataFrame =
    fanOut(s, s"$dir/embeddings.parquet")

  def orders(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")

  def customer(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/customer.parquet")

  def supplier(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/supplier.parquet")

  def part(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/part.parquet")

  def nation(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/nation.parquet")

  def region(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/region.parquet")
}
