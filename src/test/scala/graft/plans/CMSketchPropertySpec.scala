package graft.plans

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM property tests of the Count-Min sketch buffer — the object
 * the VALUE-checked `cm_error_audit` rests on. The load-bearing
 * property is LINEARITY: the finished grid is the pointwise sum of the
 * exact token frequencies grouped by bucket, so any partition of the
 * stream into sub-sketches under any merge tree yields a grid
 * BIT-IDENTICAL to the sequential one — that is what lets the DuckDB
 * oracle rebuild the sketch's interior state relationally and
 * hash-check the estimates themselves (the other sketches' audits can
 * only pin guarantee bounds). Never-undercount and mass conservation
 * ride along, and the bucket function is pinned to its SQL mirror. */
class CMSketchPropertySpec extends AnyFunSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  private def zipfStream(rnd: Random, vocab: Int, n: Int): Seq[String] = {
    val weights = (0 until vocab).map(i => 1.0 / (i + 1))
    val total = weights.sum
    Seq.fill(n) {
      var u = rnd.nextDouble() * total
      var i = 0
      while (u > weights(i) && i < vocab - 1) { u -= weights(i); i += 1 }
      s"tok$i"
    }
  }

  test("bucket function matches its SQL mirror: hexVal8 of md5-hex slice i, mod width") {
    val rnd = new Random(7)
    for (_ <- 1 to 200) {
      val tok = rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString.toLowerCase
      val width = 2 + rnd.nextInt(1000)
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = md5hex(tok)
      for (i <- 0 until 4) {
        val viaHex = java.lang.Long.parseLong(hex.substring(8 * i, 8 * i + 8), 16) % width
        assert(CMSketch.bucket(digest, i, width).toLong === viaHex,
          s"tok=$tok i=$i width=$width")
      }
    }
  }

  test("linearity: any partition + any merge tree is bit-identical to the sequential grid") {
    for (seed <- 1 to 40) {
      val rnd = new Random(seed)
      val depth = 1 + rnd.nextInt(4)
      val width = 2 + rnd.nextInt(300)
      val n = 50 + rnd.nextInt(2000)
      val items = zipfStream(rnd, vocab = 20 + rnd.nextInt(200), n = n)

      val sequential = new CMSketch(depth, width)
      items.foreach(sequential.add)

      val chunks = items.grouped(math.max(1, n / (1 + rnd.nextInt(8)) + 1)).toVector
      val sketches = chunks.map { c =>
        val sk = new CMSketch(depth, width); c.foreach(sk.add); sk
      }.toBuffer
      if (sketches.isEmpty) sketches += new CMSketch(depth, width)
      while (sketches.size > 1) {
        val i = rnd.nextInt(sketches.size)
        val a = sketches.remove(i)
        val j = rnd.nextInt(sketches.size)
        sketches(j) = sketches(j).merge(a)
      }
      val merged = sketches.head
      assert(merged.n === n, s"seed=$seed: n is the exact stream length")
      assert(merged.counters.sameElements(sequential.counters),
        s"seed=$seed: merged grid must be BIT-identical to the sequential grid")
    }
  }

  test("never undercounts, each grid row conserves the stream mass, and the " +
       "grid equals the frequency relation grouped by bucket") {
    for (seed <- 41 to 60) {
      val rnd = new Random(seed)
      val depth = 1 + rnd.nextInt(4)
      val width = 2 + rnd.nextInt(300)
      val n = 50 + rnd.nextInt(2000)
      val items = zipfStream(rnd, vocab = 20 + rnd.nextInt(200), n = n)
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap

      val sk = new CMSketch(depth, width)
      items.foreach(sk.add)

      // the relational reconstruction the oracle SQL performs
      val rebuilt = new Array[Long](depth * width)
      exact.foreach { case (tok, cnt) =>
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        for (i <- 0 until depth)
          rebuilt(i * width + CMSketch.bucket(digest, i, width)) += cnt
      }
      assert(sk.counters.sameElements(rebuilt),
        s"seed=$seed: grid = exact frequencies grouped by bucket (linearity)")

      for (i <- 0 until depth) {
        val rowSum = (0 until width).map(b => sk.counters(i * width + b)).sum
        assert(rowSum === n.toLong, s"seed=$seed row=$i: mass conservation")
      }

      exact.foreach { case (tok, cnt) =>
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val est = (0 until depth)
          .map(i => sk.counters(i * width + CMSketch.bucket(digest, i, width))).min
        assert(est >= cnt, s"seed=$seed tok=$tok: Count-Min never undercounts")
      }
    }
  }
}
