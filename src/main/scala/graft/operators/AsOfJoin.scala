package graft.operators

import java.time.Duration

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join (backward): for each left row, attach the LATEST right row
 * with `r.ts ≤ l.ts` (same key) within a lookback horizon; left rows with
 * no eligible right get a NULL right value — the temporal cousin of the
 * reference's left-join-on-timeout (SURVEY.md §2.2 lists as-of among the
 * joins the reference lacks; it's a staple of event/feature alignment in
 * training pipelines).
 *
 * Implementation is the union+window shape, NOT a join: tag both sides,
 * union, and carry the last non-null right value forward inside a
 * (key, ts)-sorted window. ONE shuffle + sort over |L|+|R| rows — a
 * join-based formulation would shuffle both sides AND explode every
 * in-horizon pair before picking the max, quadratic in band density.
 * Ties (equal key+ts): rights sort before lefts (a right at exactly
 * l.ts is visible), and among equal-ts rights the greatest value wins —
 * mirrored in the oracle's ORDER BY r.ts DESC, r.value DESC.
 */
object AsOfJoin {

  /** lhs/rhs: (key, value, ts). Output (key, lvalue, rvalue, ts), rvalue
   * nullable, one row per left row. */
  def backward(lhs: DataFrame, rhs: DataFrame, horizon: Duration): DataFrame = {
    val tagged = lhs.select(col("key"), col("value"), col("ts"), lit(1).as("side"))
      .unionByName(rhs.select(col("key"), col("value"), col("ts"), lit(0).as("side")))
    val w = Window.partitionBy("key")
      .orderBy(col("ts"), col("side"), col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hMs = horizon.toMillis
    tagged
      .withColumn("rv", when(col("side") === 0, col("value")))
      .withColumn("rts", when(col("side") === 0, col("ts")))
      .withColumn("last_rv", last(col("rv"), ignoreNulls = true).over(w))
      .withColumn("last_rts", last(col("rts"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(
        col("key"),
        col("value").as("lvalue"),
        when(col("last_rts") >= expr(s"ts - INTERVAL $hMs MILLISECONDS"), col("last_rv"))
          .as("rvalue"),
        col("ts"))
  }

  /** Oracle: correlated latest-right subquery with the same tie-break. */
  def backwardSql(lhsSql: String, rhsSql: String, horizon: Duration): String = {
    val hMs = horizon.toMillis
    s"""SELECT l.key AS key, l.value AS lvalue,
       | (SELECT r.value FROM ($rhsSql) r
       |  WHERE r.key = l.key AND r.ts <= l.ts
       |    AND r.ts >= l.ts - INTERVAL $hMs MILLISECOND
       |  ORDER BY r.ts DESC, r.value DESC LIMIT 1) AS rvalue,
       | l.ts AS ts
       |FROM ($lhsSql) l""".stripMargin
  }
}
