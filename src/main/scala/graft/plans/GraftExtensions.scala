package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SQL surface for the native expressions: register as
 * `spark.sql.extensions=graft.plans.GraftExtensions` at session build
 * (cluster deployments), or call [[GraftFunctions.register]] on a live
 * session (tests, notebooks). After registration the engine's hot-loop
 * kernels are callable from plain SQL:
 *
 *   SELECT long_dot(qa, qb), minhash_sig(shingles), word_shingles(text),
 *          char_gram_seq(text), simhash64(text) ...
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** (name, info, builder) for every SQL-exposed native function. Arity
   * beyond the first argument is fixed to the engine defaults used by the
   * dedup operators (word trigrams, 16-char grams with 1-in-4 sampling,
   * K=12 minhash). */
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("long_dot",
      info("long_dot", "long_dot(a, b) - exact integer dot product of two ARRAY<BIGINT>"),
      (es: Seq[Expression]) => LongDot(es(0), es(1))),
    ("minhash_sig",
      info("minhash_sig", "minhash_sig(shingles) - K=12 md5-hex minhash signature"),
      (es: Seq[Expression]) => MinHashSig(es(0), 12)),
    ("word_shingles",
      info("word_shingles", "word_shingles(text) - distinct word trigram shingles"),
      (es: Seq[Expression]) => WordShingles(es(0), 3)),
    ("char_gram_seq",
      info("char_gram_seq", "char_gram_seq(text) - sampled distinct 16-char grams"),
      (es: Seq[Expression]) => CharGramSeq(es(0), 16, 4)),
    ("simhash64",
      info("simhash64", "simhash64(text) - 64-bit SimHash as a '0'/'1' string"),
      (es: Seq[Expression]) => SimHash64(es(0))),
  )

  /** Register into a LIVE session (extensions can only be injected at
   * session build; this covers the getOrCreate-already-happened case). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, inf, builder) =>
      org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, name, inf, builder)
    }
}
