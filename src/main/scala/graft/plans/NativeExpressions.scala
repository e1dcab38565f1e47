package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the two hot loops where composed
 * higher-order built-ins are too slow. Both compute EXACTLY the same
 * values as the built-in compositions they replace (and as the mirrored
 * DuckDB oracle SQL), so swapping them in changes nothing but speed.
 *
 * Why they exist: Spark's higher-order functions (`transform`,
 * `aggregate`, `zip_with`) evaluate their lambda as an interpreted
 * expression tree per element — ~µs-scale per element. The minhash
 * signature does K·|shingles| md5 calls per document and the quantized
 * dot product 64 multiply-adds per pair; at millions of elements the
 * interpreter overhead dominates the actual work by ~100×.
 */

/**
 * `LongDot(a, b)` = Σ a[i]·b[i] over two ARRAY<BIGINT> columns — the
 * quantized-vector dot product (`VectorOps`). Whole-stage-codegen'd tight
 * loop (no per-element virtual calls); equivalent to
 * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,x) -> acc+x)`.
 * Elements are assumed non-null (quantized vectors are built from
 * non-null floats).
 */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}

/**
 * `MinHashSig(shingles, k)`: per-document minhash signature —
 * sig_j = min over shingles of md5(j ":" shingle) as a lowercase hex
 * string, j = 1..k. Value-identical to
 * `transform(sequence(1,k), j -> array_min(transform(sh, s -> md5(concat(j,':',s)))))`
 * and to the relational DuckDB oracle, but one native pass with a reused
 * MessageDigest instead of k·|sh| interpreted lambda evaluations.
 *
 * CodegenFallback is deliberate: the expression is called once per ROW
 * (not per element), so the fallback's boxing overhead is amortized over
 * the K·|shingles| digest loop it replaces.
 */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[String](k)
    val prefixes = Array.tabulate(k)(j => s"${j + 1}:".getBytes(StandardCharsets.UTF_8))
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).getBytes
      var j = 0
      while (j < k) {
        md.reset()
        md.update(prefixes(j))
        md.update(s)
        val h = hex(md.digest())
        if (mins(j) == null || h.compareTo(mins(j)) < 0) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(m)))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/**
 * `WordShingles(text, n)`: lowercase, tokenize on `[^a-z0-9]+`, emit the
 * DISTINCT n-word shingles (space-joined, first-occurrence order).
 * Value-identical to the
 * `array_distinct(transform(sequence(...), i -> concat_ws(' ', element_at(toks,i)...)))`
 * composition over `filter(split(lower(text),'[^a-z0-9]+'), t -> t != '')`
 * — but ONE native pass. The composed form was pathological: Catalyst's
 * project-collapsing inlines the tokenize expression into the shingle
 * lambda, re-running regex `split` per element_at per position (~380
 * re-tokenizations per document, observed dominating the dedup runtime).
 */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  @transient private lazy val sep = java.util.regex.Pattern.compile("[^a-z0-9]+")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    val toks = sep.split(text).filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/**
 * `CharGramSeq(text, n, sampleNibbleMax)`: normalize (lowercase,
 * tokenize, re-join with single spaces), emit the DISTINCT n-char windows
 * whose md5's first hex nibble is < `sampleNibbleMax` (content-defined
 * sampling — shift-invariant, see `TextDedup.SampleHexMax`), in
 * first-occurrence order. Value-identical to building all windows with
 * `transform(sequence(...), i -> substr(nt, i, n))`, exploding, filtering
 * `instr('0123456789abcdef', substring(md5(gr),1,1)) <= sampleNibbleMax`
 * and taking DISTINCT (doc, gram) — but sampling and per-doc dedup happen
 * in the same native pass, so the downstream explode+shuffle sees ~1/4 of
 * the grams and needs no global distinct. `sampleNibbleMax = 16` disables
 * sampling.
 */
case class CharGramSeq(child: Expression, n: Int, sampleNibbleMax: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_gram_seq"

  @transient private lazy val sep = java.util.regex.Pattern.compile("[^a-z0-9]+")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    val nt = sep.split(text).filter(_.nonEmpty).mkString(" ")
    if (nt.length < n) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= nt.length - n) {
      val g = nt.substring(i, i + n)
      if (sampleNibbleMax >= 16 || !seen.contains(g)) {
        if (sampleNibbleMax >= 16 ||
            ((md.digest(g.getBytes(StandardCharsets.UTF_8))(0) >> 4) & 0xf) < sampleNibbleMax) {
          seen.add(g)
        }
        md.reset()
      }
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharGramSeq =
    copy(child = newChild)
}

/**
 * `SimHash64(text)`: 64-char '0'/'1' SimHash string over the token
 * multiset — bit_j is the sign of Σ_tokens (±1 by bit j of md5(token)).
 * Value-identical to the `aggregate`/`zip_with` composition in
 * `TextDedup.simhashStr` (bit j of the hex string = bit (7−j%8) of md5
 * byte j/8), one native pass: md5 once per token, 64 integer adds per
 * token, instead of ~tokens·64 interpreted lambda evaluations per row.
 */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash64"

  @transient private lazy val sep = java.util.regex.Pattern.compile("[^a-z0-9]+")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    val md = MessageDigest.getInstance("MD5")
    val sums = new Array[Int](64)
    val toks = sep.split(text)
    var t = 0
    while (t < toks.length) {
      if (toks(t).nonEmpty) {
        val d = md.digest(toks(t).getBytes(StandardCharsets.UTF_8))
        var j = 0
        while (j < 64) {
          sums(j) += 2 * ((d(j >> 3) >> (7 - (j & 7))) & 1) - 1
          j += 1
        }
        md.reset()
      }
      t += 1
    }
    val out = new Array[Char](64)
    var j = 0
    while (j < 64) { out(j) = if (sums(j) > 0) '1' else '0'; j += 1 }
    UTF8String.fromString(new String(out))
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
