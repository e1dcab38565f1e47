package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness
import graft.sources.Tables

/** minhash_sig_audit: the bounded-sample signature audit that carries
 * the minhash family's fourth-decade gate. Checked against an
 * independent MessageDigest mirror (min over shingles of
 * md5(j ':' shingle)) — no shared code with the native MinHashSig. */
class MinhashSigAuditSpec extends AnyFunSuite with SparkTestHarness {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  test("sampled signatures match the sequential md5 mirror") {
    val docs = Tables.documents(spark, dir)
    val sampled = TextDedup.minhashSigAudit(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(sampled.nonEmpty)
    val ids = sampled.map(_._1).distinct
    assert(ids.forall(id => id % TextDedup.SigAuditStride == 0 &&
      id < TextDedup.SigAuditStride * TextDedup.SigAuditBudget))
    // independent shingling: whitespace-ish tokens via the same public
    // shingleDf output would share code — recompute the minima only,
    // taking the shingle sets from the audited relation's own input
    val shingles = TextDedup.shingleDf(
        docs.filter(col("doc_id") % TextDedup.SigAuditStride === 0 &&
          col("doc_id") < TextDedup.SigAuditStride * TextDedup.SigAuditBudget))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(ids.toSet === shingles.keySet)
    sampled.foreach { case (id, j, sig) =>
      val expect = shingles(id).iterator.map(s => md5hex(s"$j:$s")).min
      assert(sig === expect, s"doc $id j $j")
    }
    // every sampled doc carries a full K-length signature
    val perDoc = sampled.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    perDoc.foreach { case (id, js) =>
      assert(js === (1L to TextDedup.MinHashK.toLong), s"doc $id")
    }
  }
}
