package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Recall property for the derived-(R, B) banded near-dup across CORPUS
 * SIZES: the shared test data only reaches R=2 (500 vectors), so this
 * spec plants near-dup pairs into random corpora at sizes that derive
 * R=2 AND R=3, asserting the banding recalls ≥ 0.85 of the brute-force
 * pairs and stays a subset (same verify threshold) at every size. A
 * plane-indexing bug between the canonical pool and the band slices
 * would fail the deeper-R case immediately. */
class EmbNearDupPropertySpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  /** `n` random vectors with `nPairs` planted near-dups (small relative
   * perturbation keeps cosine ≈ 0.97, far above the 0.4 threshold;
   * unplanted random 64-dim pairs sit near cosine 0). */
  private def corpus(seed: Int, n: Int, nPairs: Int): Seq[(Long, Array[Float])] = {
    val rnd = new Random(seed)
    def vec(): Array[Float] = Array.fill(VectorOps.Dim)(rnd.nextFloat() * 2f - 1f)
    val base = (0 until n - nPairs).map(i => (i.toLong, vec()))
    val planted = (0 until nPairs).map { j =>
      val (_, v) = base(rnd.nextInt(base.size))
      val w = v.map(x => x + (rnd.nextFloat() * 0.1f - 0.05f))
      ((n - nPairs + j).toLong, w)
    }
    base ++ planted
  }

  test("derived banding recalls planted near-dups at R=2 and R=3 sizes (3 seeds)") {
    // 300 -> ceil(300/256)=2 -> R=2; 1500 -> ceil(1500/256)=6 -> R=3
    for (n <- Seq(300, 1500); seed <- 1 to 3) {
      assert(VectorOps.nearDupRowsFor(n) === (if (n == 300) 2 else 3))
      val emb = corpus(seed, n, nPairs = 20)
        .toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      val brute = VectorOps.embeddingNearDupBrute(emb)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = VectorOps.embeddingNearDup(emb)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.subsetOf(brute), s"n=$n seed=$seed: non-verified pair emitted")
      assert(brute.size >= 20, s"n=$n seed=$seed: planted pairs missing from brute")
      val recall = (got & brute).size.toDouble / brute.size
      assert(recall >= 0.85, s"n=$n seed=$seed: recall $recall (${brute.size} brute pairs)")
    }
  }
}
