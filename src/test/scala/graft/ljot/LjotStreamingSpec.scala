package graft.ljot

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

case class Rec(key: Long, value: String, ts: Timestamp)

/** Streaming semantics via MemoryStream — replaces the reference's
 * embedded-Kafka integration layer (`LeftJoinOnTimeoutTest.java:38-95`,
 * SURVEY.md §5 layer-1 mapping). The watermark sentinel records play the
 * role of the reference's 100 ms timeout gap: they advance event time past
 * `l.ts + D` so the left-outer join emits the null-padded rows
 * (SURVEY.md §7.4-5). */
class LjotStreamingSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // D = 100 s band, R = 300 s retention — ref long-window config
  // (`LeftJoinOnTimeoutTest.java:184-188`)
  private val cfg = LeftJoinOnTimeoutConfig(
    Duration.ofSeconds(100), Duration.ofSeconds(300))
  private val D = cfg.joinWindow.toMillis
  private val R = cfg.retention.toMillis
  private val base = 1000000000L // epoch ms base for event times

  private def rec(k: Long, v: String, ts: Long) = Rec(k, v, new Timestamp(ts))

  /** Sentinel far enough ahead to push the min-watermark past every
   * interesting left's expiry: wm = maxEventTs − R must exceed ts + D. */
  private def sentinelTs: Long = base + 2 * (D + R)

  private def startQuery(out: DataFrame, name: String,
                         checkpoint: Option[String] = None): StreamingQuery = {
    val w = out.writeStream.format("memory").queryName(name).outputMode("append")
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** Sorted output rows, excluding the watermark sentinels (keys >= 90). */
  private def collected(name: String): Seq[(Long, String, Long)] =
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
      .filter(_._1 < 90L)
      .toSeq.sorted

  test("streaming inner interval join matches batch semantics") {
    val l = MemoryStream[Rec]; val r = MemoryStream[Rec]
    val out = LeftJoinOnTimeout.innerJoin(l.toDF(), r.toDF(),
      LeftJoinOnTimeout.testJoiner, cfg)
    val q = startQuery(out, "inner_out")
    try {
      l.addData(rec(1, "left_1", base + 1), rec(1, "left_2", base + 20))
      r.addData(rec(1, "right", base + 1))
      q.processAllAvailable()
      assert(collected("inner_out") ===
        Seq((1L, "left_1+right", base + 1), (1L, "left_2+right", base + 20)))
    } finally q.stop()
  }

  test("left-outer: in-window pairs join, expired lefts emit timeout rows") {
    val l = MemoryStream[Rec]; val r = MemoryStream[Rec]
    val out = LeftJoinOnTimeout(l.toDF(), r.toDF(),
      LeftJoinOnTimeout.testJoiner, cfg)
    val q = startQuery(out, "outer_out")
    try {
      l.addData(rec(1, "left_1", base + 1), rec(2, "lonely", base + 5))
      r.addData(rec(1, "right", base + 1))
      q.processAllAvailable()
      // watermark still at min(maxEvent) − R → no null rows yet; the joined
      // pair may already be visible (inner part emits eagerly)
      l.addData(rec(98, "wm", sentinelTs))
      r.addData(rec(99, "wm", sentinelTs))
      q.processAllAvailable()
      q.processAllAvailable()
      assert(collected("outer_out") ===
        Seq((1L, "left_1+right", base + 1), (2L, "lonely+", base + 5)))
    } finally q.stop()
  }

  test("full-outer: both sides' orphans emit once the watermark clears them") {
    val l = MemoryStream[Rec]; val r = MemoryStream[Rec]
    val out = LeftJoinOnTimeout.fullOuterJoin(l.toDF(), r.toDF(), cfg)
    val q = startQuery(out, "full_out")
    try {
      l.addData(rec(1, "l1", base + 1), rec(2, "l_orphan", base + 5))
      r.addData(rec(1, "r1", base + 1), rec(3, "r_orphan", base + 9))
      q.processAllAvailable()
      l.addData(rec(98, "wm", sentinelTs))
      r.addData(rec(99, "wm", sentinelTs))
      q.processAllAvailable()
      q.processAllAvailable()
      val rows = spark.table("full_out").collect()
        .map(x => (x.getLong(0), Option(x.getString(1)), Option(x.getString(2))))
        .filter(_._1 < 90L).toSeq.sorted
      assert(rows === Seq(
        (1L, Some("l1"), Some("r1")),
        (2L, Some("l_orphan"), None),
        (3L, None, Some("r_orphan"))).sorted)
    } finally q.stop()
  }

  test("property: streaming left-outer == batch restatement on randomized " +
       "inputs, 5 seeds (SURVEY.md §5)") {
    // the streaming analog of LjotBatchSpec's randomized property: same
    // inputs through MemoryStream in multiple micro-batches, watermark
    // sentinels standing in for the reference's timeout gap. Event times
    // stay within one retention span of each other so the moving watermark
    // neither drops late rows nor evicts join state early — the regime in
    // which streaming and batch semantics must agree exactly.
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      def randRows(n: Int): List[(Long, String, Long)] =
        List.fill(n)((1L + rnd.nextInt(4), "v" + (100 + rnd.nextInt(900)),
          base + rnd.nextLong(R - D)))
      val ls = randRows(30); val rs = randRows(30)

      val lStream = MemoryStream[Rec]; val rStream = MemoryStream[Rec]
      val out = LeftJoinOnTimeout(lStream.toDF(), rStream.toDF(),
        LeftJoinOnTimeout.testJoiner, cfg)
      val name = s"prop_out_$seed"
      val q = startQuery(out, name)
      try {
        val lChunks = ls.grouped(10).toSeq; val rChunks = rs.grouped(10).toSeq
        lChunks.zipAll(rChunks, Nil, Nil).foreach { case (lc, rc) =>
          if (lc.nonEmpty) lStream.addData(lc.map(t => rec(t._1, t._2, t._3)))
          if (rc.nonEmpty) rStream.addData(rc.map(t => rec(t._1, t._2, t._3)))
          q.processAllAvailable()
        }
        lStream.addData(rec(98, "wm", sentinelTs))
        rStream.addData(rec(99, "wm", sentinelTs))
        q.processAllAvailable()
        q.processAllAvailable()

        import spark.implicits._
        val batch = LeftJoinOnTimeout(
          ls.map { case (k, v, t) => Rec(k, v, new Timestamp(t)) }.toDF(),
          rs.map { case (k, v, t) => Rec(k, v, new Timestamp(t)) }.toDF(),
          LeftJoinOnTimeout.testJoiner, cfg)
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
          .toSeq.sorted
        assert(collected(name) === batch, s"seed $seed diverged")
      } finally q.stop()
    }
  }

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `f` with the given state-store provider (None = session default),
   * restoring the previous setting afterwards — the conf is read at query
   * START, so per-test scoping is sound. */
  private def withStateProvider[T](cls: Option[String])(f: => T): T = cls match {
    case None => f
    case Some(c) =>
      val old = spark.conf.getOption(ProviderKey)
      spark.conf.set(ProviderKey, c)
      try f finally old match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None    => spark.conf.unset(ProviderKey)
      }
  }

  test("restore: checkpoint restart completes pending timeouts") {
    restoreScenario()
  }

  test("restore under the RocksDB state store: the stream-stream join's " +
       "watermark state recovers from the disk-backed provider") {
    // the configuration a production cluster actually runs the headline
    // operator with (keyed join state outgrows the executor heap at
    // 100 TB scale) — same schedule/kill/restart/fire contract as above
    withStateProvider(Some(RocksDbProvider)) { restoreScenario() }
  }

  private def restoreScenario(): Unit = {
    // mirrors shouldLeftJoinOnTimeoutAfterRestoration
    // (`LeftJoinOnTimeoutTest.java:131-153`): schedule, kill, restart, fire
    // memory sink can't recover from a checkpoint — use a file sink
    val ckpt = Files.createTempDirectory("ljot_ckpt").toString
    val outDir = Files.createTempDirectory("ljot_restore_out").toString
    val l = MemoryStream[Rec]; val r = MemoryStream[Rec]
    def plan = LeftJoinOnTimeout(l.toDF(), r.toDF(),
      LeftJoinOnTimeout.testJoiner, cfg)
    def start(): StreamingQuery = plan.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    try {
      l.addData(rec(1, "left", base + 1), rec(2, "left", base + 1))
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start()
    try {
      l.addData(rec(98, "wm", sentinelTs))
      r.addData(rec(99, "wm", sentinelTs))
      q2.processAllAvailable()
      q2.processAllAvailable()
      val rows = spark.read.parquet(outDir).collect()
        .map(x => (x.getLong(0), x.getString(1), x.getTimestamp(2).getTime))
        .filter(_._1 < 90L).toSeq.sorted
      assert(rows === Seq((1L, "left+", base + 1), (2L, "left+", base + 1)))
    } finally q2.stop()
  }
}
