package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Co-located (bucketed) storage for repeated large-to-large equi-joins —
 * the third leg of the join-scale toolkit next to broadcast (small dims)
 * and AQE skew splitting (hot keys).
 *
 * A fact table joined on the same key every day should not pay its
 * shuffle every day: writing both sides bucketed (and in-bucket sorted)
 * on the join key makes the sort-merge join exchange-free — each task
 * zips bucket i of both tables. At 100 TB that converts the dominant
 * repeated cost (a full-corpus exchange per run) into a one-off cost at
 * write time, amortized across every later join, aggregation, or
 * `dropDuplicates` on the bucket key.
 *
 * Constraints the helper enforces (the conditions under which Spark
 * elides the exchange): identical bucket count on both sides, the join
 * key IS the bucket key, and one file per bucket (`repartition` by the
 * key before the write — multiple files per bucket would also force a
 * per-task sort).
 */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed AND in-bucket sorted
   * on `key`, one file per bucket. */
  def writeBucketed(df: DataFrame, key: String, buckets: Int, table: String): Unit =
    df.repartition(buckets, df(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join two tables previously written by [[writeBucketed]] with
   * the SAME bucket count on their respective keys. Plans as a
   * sort-merge join with NO shuffle exchange on either side (asserted in
   * `BucketingSpec`).
   *
   * Each side is bound ONCE: building the join condition from fresh
   * `spark.table()` calls relied on the catalog's relation cache handing
   * back identical attribute ids — a cache invalidation between calls
   * fails analysis with a missing attribute. A self-join needs alias
   * disambiguation the binding below deliberately doesn't attempt, so it
   * is rejected up front instead of failing analysis as ambiguous. */
  def bucketedJoin(spark: SparkSession, leftTable: String, leftKey: String,
                   rightTable: String, rightKey: String): DataFrame = {
    require(leftTable != rightTable,
      s"bucketedJoin: self-join on '$leftTable' needs explicit aliases; " +
        "bind spark.table twice with .alias and join on qualified columns")
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
