package graft.plans

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM property tests of the Misra-Gries sketch buffer — the object
 * the hash-checked `mg_heavy_hitters` closure rests on. The load-bearing
 * property is CANDIDATE COMPLETENESS under any merge tree: for any
 * multiset of tokens, any partition of it into sub-sketches, and any
 * merge order over them, every token whose true frequency strictly
 * exceeds n/(k+1) is PRESENT in the merged sketch (Agarwal et al. 2012's
 * merge preserves est ≥ true − n/(k+1), so such a token's counter stays
 * positive). That is exactly what lets the exact re-count join recover
 * the deterministic heavy-hitter set from the order-dependent sketch —
 * if one qualifying candidate could vanish under some shuffle-fetch
 * order, the oracle hash would flake. The error-bound and
 * underestimate-only invariants ride along. */
class MGSketchPropertySpec extends AnyFunSuite {

  private def freshSketch(k: Int, items: Seq[String]): MGSketch = {
    val sk = new MGSketch(k)
    items.foreach(sk.add)
    sk
  }

  /** Zipf-ish stream over `vocab` tokens: token i drawn with weight
   * ~1/(i+1), so a few tokens are heavy and the long tail forces
   * constant eviction churn at small k. */
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

  test("random partitions + random merge trees never lose a certified-range " +
       "candidate, never overestimate, and keep the n/(k+1) bound") {
    for (seed <- 1 to 40) {
      val rnd = new Random(seed)
      val k = 2 + rnd.nextInt(12)
      val n = 50 + rnd.nextInt(2000)
      val items = zipfStream(rnd, vocab = 4 * k + rnd.nextInt(100), n = n)
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val chunks = items.grouped(math.max(1, n / (1 + rnd.nextInt(8)) + 1)).toVector
      var sketches = chunks.map(c => freshSketch(k, c)).toBuffer
      if (sketches.isEmpty) sketches += new MGSketch(k)
      while (sketches.size > 1) {
        val i = rnd.nextInt(sketches.size)
        val a = sketches.remove(i)
        val j = rnd.nextInt(sketches.size)
        sketches(j) = sketches(j).merge(a)
      }
      val sk = sketches.head
      assert(sk.n === n, s"seed=$seed: n is the exact stream length")
      assert(sk.counts.size <= k, s"seed=$seed: state bounded at k=$k")
      val bound = n.toLong / (k + 1)
      sk.counts.foreach { case (tok, est) =>
        val truth = exact.getOrElse(tok, 0L)
        assert(est <= truth, s"seed=$seed: overestimate $tok est=$est truth=$truth")
        assert(truth - est <= bound,
          s"seed=$seed: bound violated $tok est=$est truth=$truth bound=$bound")
      }
      // completeness: the property the exact-recount closure needs
      exact.foreach { case (tok, truth) =>
        if (truth > bound)
          assert(sk.counts.contains(tok),
            s"seed=$seed k=$k n=$n: candidate $tok (freq $truth > $bound) lost")
      }
    }
  }
}
