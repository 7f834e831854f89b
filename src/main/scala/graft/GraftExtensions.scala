package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions._

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql` users get the same
  * codegen'd hot loops as the DataFrame API:
  *
  *   minhash_sig(shingles, numHashes)
  *   lsh_band_keys(signature, bands, rowsPerBand)
  *   cosine_sim(a, b)
  *   lsh_sign_bits(vec, bits)
  *   char_ngrams(text, n)
  *   fingerprint(tokens)
  *
  * Activate with
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * or programmatically via `SparkSession.builder.withExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def lit(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"expected integer literal argument, got $other")
  }

  /** Post-hoc registration on an already-built session (the builder
    * path, `withExtensions`, only applies at session construction).
    */
  def registerOn(spark: org.apache.spark.sql.SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val g = org.apache.spark.sql.graftglue.Glue
    g.registerFunction(classic, "minhash_sig",
      args => MinHashSigExpr(args(0), lit(args(1))))
    g.registerFunction(classic, "lsh_band_keys",
      args => BandKeysExpr(args(0), lit(args(1)), lit(args(2))))
    g.registerFunction(classic, "cosine_sim",
      args => CosineSimExpr(args(0), args(1)))
    g.registerFunction(classic, "lsh_sign_bits",
      args => LshSignBitsExpr(args(0), lit(args(1))))
    g.registerFunction(classic, "char_ngrams",
      args => CharNgramsExpr(args(0), lit(args(1))))
    g.registerFunction(classic, "fingerprint",
      args => FingerprintExpr(args(0)))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashSigExpr(args(0), lit(args(1)))))
    ext.injectFunction((
      new FunctionIdentifier("lsh_band_keys"),
      new ExpressionInfo(classOf[BandKeysExpr].getName, "lsh_band_keys"),
      (args: Seq[Expression]) => BandKeysExpr(args(0), lit(args(1)), lit(args(2)))))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSimExpr(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("lsh_sign_bits"),
      new ExpressionInfo(classOf[LshSignBitsExpr].getName, "lsh_sign_bits"),
      (args: Seq[Expression]) => LshSignBitsExpr(args(0), lit(args(1)))))
    ext.injectFunction((
      new FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNgramsExpr].getName, "char_ngrams"),
      (args: Seq[Expression]) => CharNgramsExpr(args(0), lit(args(1)))))
    ext.injectFunction((
      new FunctionIdentifier("fingerprint"),
      new ExpressionInfo(classOf[FingerprintExpr].getName, "fingerprint"),
      (args: Seq[Expression]) => FingerprintExpr(args(0))))
  }
}
