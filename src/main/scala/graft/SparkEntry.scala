package graft

import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ljot.{LeftJoinOnTimeout, LeftJoinOnTimeoutConfig}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * Every operator from SURVEY.md §2 is exposed as a named batch query over
 * the shared parquet tables, with an ANSI-SQL oracle for the driver's
 * DuckDB compare. Column names are aliased identically on both sides (the
 * compare sorts columns by name before hashing). */
object SparkEntry {

  /** Join band D for the flagship left-join-on-timeout queries. */
  private val D = Duration.ofMinutes(5)
  private val ljotCfg = LeftJoinOnTimeoutConfig(D, Duration.ofMinutes(15))

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
   * reader rejects. Read it as epoch-nanos long
   * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds —
   * exactly what DuckDB's parquet reader does natively, so the oracle sees
   * identical values. */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** lhs/rhs of the flagship query: purchases left-joined to errors by user
   * within ±D (FIXTURES.md §2). value = event_id as string — mirrors the
   * reference's opaque string values (`LeftJoinOnTimeoutTest.java:201-208`)
   * with deterministic cross-engine formatting. */
  private def eventsSide(s: SparkSession, dir: String, eventType: String): DataFrame =
    events(s, dir)
      .filter(col("event_type") === eventType)
      .select(col("user_id").as("key"),
              col("event_id").cast("string").as("value"),
              col("ts"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.ljotEvents(spark, "/root/testdata/sf0.001")

  object Queries {
    /** O5: the novel operator, batch restatement — left-join-on-timeout of
     * purchase events to error events per user within ±D. */
    def ljotEvents(s: SparkSession, dir: String): DataFrame =
      LeftJoinOnTimeout(
        eventsSide(s, dir, "purchase"),
        eventsSide(s, dir, "error"),
        LeftJoinOnTimeout.testJoiner, ljotCfg)

    /** O4: windowed interval equi-join, inner form. */
    def intervalJoinInner(s: SparkSession, dir: String): DataFrame =
      LeftJoinOnTimeout.innerJoin(
        eventsSide(s, dir, "purchase"),
        eventsSide(s, dir, "error"),
        LeftJoinOnTimeout.testJoiner, ljotCfg)

    /** The anti-join (timeout-only) branch in isolation: lefts with NO
     * in-window right — semantically NOT EXISTS (SURVEY.md §2.1-O5). */
    def timeoutOnly(s: SparkSession, dir: String): DataFrame = {
      val l = eventsSide(s, dir, "purchase")
        .select(col("key").as("lkey"), col("value").as("lvalue"), col("ts").as("lts"))
      val r = eventsSide(s, dir, "error")
        .select(col("key").as("rkey"), col("ts").as("rts"))
      val dMs = D.toMillis
      l.join(r,
          col("lkey") === col("rkey") &&
            col("rts") >= expr(s"lts - INTERVAL $dMs MILLISECONDS") &&
            col("rts") <= expr(s"lts + INTERVAL $dMs MILLISECONDS"),
          "left_anti")
        .select(col("lkey").as("key"),
                concat(col("lvalue"), lit("+")).as("joined"),
                col("lts").as("ts"))
    }
  }

  private val dMin = D.toMinutes

  private def eventsSideSql(eventType: String): String =
    s"SELECT user_id AS key, CAST(event_id AS VARCHAR) AS value, ts " +
      s"FROM events WHERE event_type = '$eventType'"

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ljot_events"         -> ((s, d) => Queries.ljotEvents(s, d)),
    "interval_join_inner" -> ((s, d) => Queries.intervalJoinInner(s, d)),
    "timeout_only"        -> ((s, d) => Queries.timeoutOnly(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
   * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "ljot_events" ->
      s"""SELECT l.key AS key, concat(l.value, '+', coalesce(r.value, '')) AS joined, l.ts AS ts
         |FROM (${eventsSideSql("purchase")}) l
         |LEFT JOIN (${eventsSideSql("error")}) r
         |ON l.key = r.key AND r.ts BETWEEN l.ts - INTERVAL $dMin MINUTE AND l.ts + INTERVAL $dMin MINUTE""".stripMargin,
    "interval_join_inner" ->
      s"""SELECT l.key AS key, concat(l.value, '+', r.value) AS joined, l.ts AS ts
         |FROM (${eventsSideSql("purchase")}) l
         |JOIN (${eventsSideSql("error")}) r
         |ON l.key = r.key AND r.ts BETWEEN l.ts - INTERVAL $dMin MINUTE AND l.ts + INTERVAL $dMin MINUTE""".stripMargin,
    "timeout_only" ->
      s"""SELECT l.key AS key, concat(l.value, '+') AS joined, l.ts AS ts
         |FROM (${eventsSideSql("purchase")}) l
         |WHERE NOT EXISTS (SELECT 1 FROM (${eventsSideSql("error")}) r
         |  WHERE r.key = l.key AND r.ts BETWEEN l.ts - INTERVAL $dMin MINUTE AND l.ts + INTERVAL $dMin MINUTE)""".stripMargin,
  )
}
