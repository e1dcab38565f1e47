package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.sources.Tables

/** Spectral-audit family: power-iteration PCA, residual outliers, and
 * the analytic LSH banding curve. The PCA/residual checks compare the
 * distributed plans against an INDEPENDENT sequential BigInt
 * re-implementation of the exact integer recipe — same spec contract,
 * no shared code — so a silent overflow/rounding divergence in either
 * side fails value-for-value. */
class SpectralOpsSpec extends AnyFunSuite with SparkTestHarness {

  private val dir = "/root/testdata/sf0.001"
  private val Fx = BigInt(1048576)

  /** Sequential mirror of the exact fixed-point recipe. */
  private def pcaRef(vecs: Seq[Array[Float]])
      : (Array[Long], Array[Long], Array[Long]) = {
    val dim = VectorOps.Dim
    val n = BigInt(vecs.length)
    val q = vecs.map(_.map(x => math.floor(x.toDouble * 1048576.0).toLong))
    val s = Array.tabulate(dim)(j => q.iterator.map(v => BigInt(v(j))).sum)
    val m = s.map(x => ((x.abs / n) * x.signum).toLong)
    def matVec(v: Array[Long]): Array[BigInt] = {
      val k = (0 until dim).map(j => BigInt(m(j)) * v(j)).sum
      val t = q.map(qi => (0 until dim).map(j => BigInt(qi(j)) * v(j)).sum - k)
      val tSum = t.sum
      Array.tabulate(dim) { j =>
        q.iterator.zip(t.iterator).map { case (qi, ti) => BigInt(qi(j)) * ti }.sum -
          BigInt(m(j)) * tSum
      }
    }
    def normalize(w: Array[BigInt]): Array[Long] = {
      val wm = w.iterator.map(_.abs).max.max(BigInt(1))
      w.map(x => ((x.abs * Fx / wm) * x.signum).toLong)
    }
    val v1 = normalize(matVec(Array.fill(dim)(1L)))
    val v2 = normalize(matVec(v1))
    (m, v1, v2)
  }

  private def collectVecs(): Seq[(Long, Array[Float])] =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq

  test("emb_pca_power matches the sequential BigInt mirror value-for-value") {
    val vecs = collectVecs()
    val (m, v1, v2) = pcaRef(vecs.map(_._2))
    val got = VectorOps.embPcaPower(Tables.embeddings(spark, dir))
      .orderBy(col("dim")).collect()
    assert(got.length === VectorOps.Dim)
    got.foreach { r =>
      val d = r.getLong(0).toInt
      assert(r.getLong(1) === m(d), s"mean_q dim $d")
      assert(r.getLong(2) === v1(d), s"v1_fx dim $d")
      assert(r.getLong(3) === v2(d), s"v2_fx dim $d")
    }
    // normalization contract: the arg-max component is exactly ±2^20
    assert(got.map(r => math.abs(r.getLong(3))).max === 1048576L)
  }

  test("emb_pca_power finds a planted dominant direction") {
    import spark.implicits._
    val dim = VectorOps.Dim
    // 40 vectors spread along dim 3 (amplitude ±1), tiny fixed jitter on
    // dim 7 — the principal direction is unambiguously e3
    val rows = (0 until 40).map { i =>
      val v = Array.fill(dim)(0.0f)
      v(3) = if (i % 2 == 0) (0.5f + i * 0.01f) else -(0.5f + i * 0.01f)
      v(7) = 0.01f * (i % 3)
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val out = VectorOps.embPcaPower(df).orderBy(col("dim")).collect()
    val v2 = out.map(_.getLong(3))
    assert(math.abs(v2(3)) === 1048576L, "dominant component is dim 3 at full scale")
    assert(v2.zipWithIndex.filter(_._2 != 3).map(x => math.abs(x._1)).max <
      1048576L / 10, "off-axis components stay an order below")
  }

  /** Sequential mirror of the deflated second-component recipe. */
  private def pca2Ref(vecs: Seq[Array[Float]]): Array[Long] = {
    val dim = VectorOps.Dim
    val (m, _, v2) = pcaRef(vecs)
    val q = vecs.map(_.map(x => math.floor(x.toDouble * 1048576.0).toLong))
    def matVec(u: Array[Long]): Array[BigInt] = {
      val k = (0 until dim).map(j => BigInt(m(j)) * u(j)).sum
      val t = q.map(qi => (0 until dim).map(j => BigInt(qi(j)) * u(j)).sum - k)
      val tSum = t.sum
      Array.tabulate(dim) { j =>
        q.iterator.zip(t.iterator).map { case (qi, ti) => BigInt(qi(j)) * ti }.sum -
          BigInt(m(j)) * tSum
      }
    }
    def normalize(w: Array[BigInt]): Array[Long] = {
      val wm = w.iterator.map(_.abs).max.max(BigInt(1))
      w.map(x => ((x.abs * Fx / wm) * x.signum).toLong)
    }
    // division-free deflation on the NORMALIZED iterate:
    // w' = (v·v)·wn − (v·wn)·v — exact integers end to end
    def pass(u: Array[Long]): Array[Long] = {
      val wn = normalize(matVec(u))
      val vw = (0 until dim).map(j => BigInt(v2(j)) * wn(j)).sum
      val vv = (0 until dim).map(j => BigInt(v2(j)) * v2(j)).sum
      normalize(Array.tabulate(dim)(j => vv * wn(j) - vw * v2(j)))
    }
    pass(pass(Array.fill(dim)(1L)))
  }

  test("emb_pca_topk matches the sequential BigInt deflation mirror") {
    val vecs = collectVecs()
    val (m, _, v2) = pcaRef(vecs.map(_._2))
    val u2 = pca2Ref(vecs.map(_._2))
    val got = VectorOps.embPcaTopk(Tables.embeddings(spark, dir))
      .orderBy(col("dim")).collect()
    assert(got.length === VectorOps.Dim)
    got.foreach { r =>
      val d = r.getLong(0).toInt
      assert(r.getLong(1) === m(d), s"mean_q dim $d")
      assert(r.getLong(2) === v2(d), s"pc1_fx dim $d")
      assert(r.getLong(3) === u2(d), s"pc2_fx dim $d")
    }
    // the deflated iterate is near-orthogonal to pc1: |v·u| ≤ a few
    // fx-ulps per component (truncation only — deflation itself is exact)
    val vDotU = (0 until VectorOps.Dim)
      .map(j => BigInt(v2(j)) * u2(j)).sum.abs
    val vNorm = math.sqrt((0 until VectorOps.Dim).map(j => BigInt(v2(j)) * v2(j)).sum.toDouble)
    val uNorm = math.sqrt((0 until VectorOps.Dim).map(j => BigInt(u2(j)) * u2(j)).sum.toDouble)
    assert(vDotU.toDouble / (vNorm * uNorm) < 0.01,
      "second component must be near-orthogonal to the first")
  }

  test("emb_pca_topk separates two planted directions") {
    import spark.implicits._
    val dim = VectorOps.Dim
    // dominant spread on dim 3 (±1 amplitude), secondary on dim 7 (±0.3),
    // independent sign patterns so neither collapses into the other
    val rows = (0 until 48).map { i =>
      val v = Array.fill(dim)(0.0f)
      v(3) = (if (i % 2 == 0) 1 else -1) * (0.8f + (i % 5) * 0.05f)
      v(7) = (if ((i / 2) % 2 == 0) 1 else -1) * (0.25f + (i % 3) * 0.02f)
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val out = VectorOps.embPcaTopk(df).orderBy(col("dim")).collect()
    val pc1 = out.map(_.getLong(2))
    val pc2 = out.map(_.getLong(3))
    assert(math.abs(pc1(3)) === 1048576L, "pc1 is the planted dominant dim 3")
    assert(math.abs(pc2(7)) === 1048576L, "pc2 is the planted secondary dim 7")
    assert(pc2.zipWithIndex.filter(_._2 != 7).map(x => math.abs(x._1)).max <
      1048576L / 10, "pc2 off-axis components stay an order below")
  }

  test("pca_residual_outliers matches the sequential mirror and its invariants") {
    val vecs = collectVecs()
    val (m, _, v2) = pcaRef(vecs.map(_._2))
    val den = (0 until VectorOps.Dim).map(j => BigInt(v2(j)) * v2(j)).sum.max(BigInt(1))
    val mm = (0 until VectorOps.Dim).map(j => BigInt(m(j)) * m(j)).sum
    val kv = (0 until VectorOps.Dim).map(j => BigInt(m(j)) * v2(j)).sum
    val scored = vecs.map { case (id, emb) =>
      val q = emb.map(x => math.floor(x.toDouble * 1048576.0).toLong)
      val n2 = q.map(x => BigInt(x) * x).sum
      val qm = (0 until VectorOps.Dim).map(j => BigInt(q(j)) * m(j)).sum
      val cv = (0 until VectorOps.Dim).map(j => BigInt(q(j)) * v2(j)).sum - kv
      val c2 = n2 - 2 * qm + mm
      val resid = c2 - (cv * cv / den)
      (id, c2.toLong, resid.toLong)
    }
    val expect = scored.sortBy { case (id, _, r) => (-r, id) }.take(VectorOps.PcaResidK)
    val got = VectorOps.pcaResidualOutliers(Tables.embeddings(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === math.min(VectorOps.PcaResidK, vecs.length))
    got.zip(expect).foreach { case ((id, c2, resid, share), (eid, ec2, eresid)) =>
      assert(id === eid); assert(c2 === ec2); assert(resid === eresid)
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("label_spectral_drift matches the sequential mirror per label") {
    val emb = Tables.embeddings(spark, dir)
    val rows = emb.select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
      .sortBy(_._1).toSeq
    val (m, _, v2) = pcaRef(rows.map(_._3))
    val kv = (0 until VectorOps.Dim).map(j => BigInt(m(j)) * v2(j)).sum
    val byLabel = rows.groupBy(_._2).map { case (lab, rs) =>
      val projs = rs.map { case (_, _, e) =>
        val q = e.map(x => math.floor(x.toDouble * 1048576.0).toLong)
        ((0 until VectorOps.Dim).map(j => BigInt(q(j)) * v2(j)).sum - kv).toLong
      }
      val sp = projs.map(BigInt(_)).sum
      lab -> (rs.length.toLong, ((sp.abs / rs.length) * sp.signum).toLong,
        projs.min, projs.max)
    }
    val got = VectorOps.labelSpectralDrift(emb).collect()
    assert(got.length === byLabel.size)
    got.foreach { r =>
      val (n, mean, mn, mx) = byLabel(r.getInt(0))
      assert(r.getLong(1) === n); assert(r.getLong(2) === mean)
      assert(r.getLong(3) === mn); assert(r.getLong(4) === mx)
    }
  }

  test("lsh_band_curve: exact fixed-point S-curve, monotone, pinned endpoints") {
    val emb = Tables.embeddings(spark, dir)
    val out = VectorOps.lshBandCurve(emb).orderBy(col("s_num")).collect()
    assert(out.length === 32)
    val n = emb.count()
    val r = VectorOps.nearDupRowsFor(n)
    val b = VectorOps.NearDupBandTable(r)
    out.foreach { row =>
      assert(row.getLong(2) === r.toLong); assert(row.getLong(3) === b.toLong)
    }
    val det = out.map(_.getLong(5))
    det.sliding(2).foreach(w => assert(w(0) <= w(1), "monotone in similarity"))
    assert(det.last === 1048576L, "p=1 detects with certainty (2^20 exact)")
    assert(det.head < 1048576L / 100, "p=1/32 is a miss at any sane banding")
    // cross-check one interior point against BigInt pow with the SAME
    // square-and-multiply truncation order
    def fxPow(base: BigInt, e: Int): BigInt =
      Integer.toBinaryString(e).drop(1).foldLeft(base) { (acc, bit) =>
        val sq = (acc * acc) >> 20
        if (bit == '1') (sq * base) >> 20 else sq
      }
    val s16 = out(15) // s_num = 16 → s_fx = 2^19
    val pBand = fxPow(BigInt(16L * 32768L), r)
    assert(s16.getLong(4) === pBand.toLong)
    assert(s16.getLong(5) === (Fx - fxPow(Fx - pBand, b)).toLong)
  }
}
