package graft

import graft.expressions.{BloomHits, CosineVec, DftMagQ, DotVec, MinHashPolySig, MinHashSig, SimHash64, SimHashPoly, WeightSum, WinnowFps, WordNGrams, WordPiece}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of the native kernel expressions.
  *
  * Two routes, same builders:
  *  - [[GraftFunctions.register]] — imperative, call once per session
  *    (what the query layer does; works on sessions the caller created);
  *  - [[GraftExtensions]] — `spark.sql.extensions=graft.GraftExtensions`
  *    injection for externally-configured sessions.
  */
object GraftFunctions {

  private val fns: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("simhash64", "64-bit SimHash of a token array",
      (es: Seq[Expression]) => SimHash64(es.head)),
    ("dot_vec", "dot product of two float vectors (double)",
      (es: Seq[Expression]) => DotVec(es(0), es(1))),
    ("cosine_vec", "one-pass cosine similarity of two float vectors",
      (es: Seq[Expression]) => CosineVec(es(0), es(1))),
    ("word_ngrams", "space-joined word n-grams of a token array",
      (es: Seq[Expression]) => WordNGrams(es(0), es(1))),
    ("minhash_sig", "k-family MinHash signature of a shingle array",
      (es: Seq[Expression]) => MinHashSig(es(0), es(1))),
    ("minhash_poly", "k-family MinHash over the portable polynomial hash",
      (es: Seq[Expression]) => MinHashPolySig(es(0), es(1))),
    ("simhash_poly", "62-bit SimHash over the portable polynomial hash",
      (es: Seq[Expression]) => SimHashPoly(es.head)),
    ("bloom_hits", "count of grams with both portable-hash bits set in a Bloom word table",
      (es: Seq[Expression]) => BloomHits(es(0), es(1))),
    ("weight_sum", "sum of hashed-bucket weights over a gram array (linear model apply)",
      (es: Seq[Expression]) => WeightSum(es(0), es(1))),
    ("winnow_fps", "distinct winnowing fingerprints (k-gram window minima) of a string",
      (es: Seq[Expression]) => WinnowFps(es(0), es(1), es(2))),
    ("wordpiece", "greedy longest-match subword tokenization of each word against a vocab",
      (es: Seq[Expression]) => WordPiece(es(0), es(1))),
    ("dft_mag_q", "floor-quantized DFT magnitude spectrum of a dense trace",
      (es: Seq[Expression]) => DftMagQ(es.head)))

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = fns.foreach { case (name, usage, builder) =>
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft.expressions", name, usage),
      builder)
  }

  private[graft] def injectAll(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.expressions", name, usage), builder))
    }
}

/** `spark.sql.extensions=graft.GraftExtensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.injectAll(ext)
}
