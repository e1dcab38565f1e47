package graft

import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ljot.{LeftJoinOnTimeout, LeftJoinOnTimeoutConfig}

/** Streaming-throughput measurement for the flagship operator: drives N
 * left + N right events through the idiomatic streaming
 * left-join-on-timeout (stream-stream left-outer join with watermark
 * state) via MemoryStream → noop sink and reports events/second.
 *
 * The reference publishes no throughput numbers (BASELINE.md §ref) — its
 * integration test only bounds small event counts under 30 s against an
 * embedded broker. This main records OUR side of the comparison on the
 * same machine the batch bench runs on. MemoryStream excludes broker
 * I/O, exactly as the reference's TopologyTestDriver-style in-process
 * harness would; the number measures the join engine, not the network.
 *
 * Emits one JSON line, and appends to SPARK_GRAFT_STREAM_OUT when set. */
object StreamBench {
  case class Ev(key: Long, value: String, ts: Timestamp)

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_STREAM_EVENTS", "500000").toInt
    val chunk = sys.env.getOrElse("SPARK_GRAFT_STREAM_CHUNK", "125000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // state-store ops pay a fixed per-partition commit per micro-batch;
      // 8 partitions beats 32 at MemoryStream batch sizes (the cluster
      // dial is partitions ∝ state size, not cores)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", SparkLocal.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // join band 60 s, retention 180 s; events 1 ms apart over 10k keys →
    // every left finds in-window rights, state stays watermark-bounded
    val cfg = LeftJoinOnTimeoutConfig(Duration.ofSeconds(60), Duration.ofSeconds(180))
    val base = 1000000000000L

    def run(): Double = {
      val l = MemoryStream[Ev]
      val r = MemoryStream[Ev]
      val out = LeftJoinOnTimeout(l.toDF(), r.toDF(), LeftJoinOnTimeout.testJoiner, cfg)
      val q = out.writeStream.format("noop").outputMode("append").start()
      try {
        val t0 = System.nanoTime()
        var i = 0
        while (i < n) {
          val m = math.min(chunk, n - i)
          l.addData((0 until m).map(j =>
            Ev((i + j) % 10000, s"l${i + j}", new Timestamp(base + i + j))))
          r.addData((0 until m).map(j =>
            Ev((i + j) % 10000, s"r${i + j}", new Timestamp(base + i + j))))
          q.processAllAvailable()
          i += m
        }
        (2.0 * n) / ((System.nanoTime() - t0) / 1e9)
      } finally q.stop()
    }

    run() // warm-up: state store init, codegen, JIT
    val eps = run()
    val json = f"""{"metric":"stream_ljot_events_per_sec","value":${eps}%.0f,"unit":"events/sec","events":${2 * n},"micro_batches":${2 * n / chunk}}"""
    println(json)
    sys.env.get("SPARK_GRAFT_STREAM_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
