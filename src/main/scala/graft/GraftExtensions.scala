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
  *   jaccard_sim(a, b)
  *   nearest_centroids(vec, array(array(...), ...), k)
  *   sparse_dot(indices, values, array(w0, w1, ...))
  *   hashed_bow(tokens, dim)
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

  /** Fold a constant array<array<double|float>> argument (e.g.
    * `array(array(1.0d, 0.0d), ...)`) into the centroid matrix
    * `NearestCentroidsExpr` ships with the plan.
    */
  private def centroidMatrix(e: Expression): Array[Array[Double]] = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    require(e.foldable, s"nearest_centroids needs a constant centroid matrix, got $e")
    val rowType = e.dataType match {
      case ArrayType(t: ArrayType, _) => t
      case t => throw new IllegalArgumentException(
        s"nearest_centroids needs array<array<double|float>> centroids, got $t")
    }
    e.eval(null).asInstanceOf[ArrayData]
      .toObjectArray(rowType)
      .map { row =>
        val ad = row.asInstanceOf[ArrayData]
        rowType.elementType match {
          case DoubleType => ad.toDoubleArray()
          case FloatType => ad.toFloatArray().map(_.toDouble)
          case t => throw new IllegalArgumentException(
            s"centroid elements must be double|float, got $t")
        }
      }
  }

  /** Fold a constant array<double|float> argument into the dense weight
    * vector `SparseDotExpr` ships with the plan.
    */
  private def weightVector(e: Expression): Array[Double] = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    require(e.foldable, s"sparse_dot needs a constant weight vector, got $e")
    e.dataType match {
      case ArrayType(DoubleType, _) =>
        e.eval(null).asInstanceOf[ArrayData].toDoubleArray()
      case ArrayType(FloatType, _) =>
        e.eval(null).asInstanceOf[ArrayData].toFloatArray().map(_.toDouble)
      case t => throw new IllegalArgumentException(
        s"sparse_dot weights must be array<double|float>, got $t")
    }
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
    g.registerFunction(classic, "jaccard_sim",
      args => JaccardExpr(args(0), args(1)))
    g.registerFunction(classic, "intersect_count",
      args => IntersectCountExpr(args(0), args(1)))
    g.registerFunction(classic, "winnow_fps",
      args => WinnowFpsExpr(args(0), lit(args(1)), lit(args(2))))
    g.registerFunction(classic, "nearest_centroids",
      args => NearestCentroidsExpr(args(0), centroidMatrix(args(1)), lit(args(2))))
    g.registerFunction(classic, "sparse_dot",
      args => SparseDotExpr(args(0), args(1), weightVector(args(2))))
    g.registerFunction(classic, "hashed_bow",
      args => HashedBowExpr(args(0), lit(args(1))))
    // optimizer rules + planner strategies: post-hoc sessions get them
    // via the experimental seam (idempotent — skip if already there)
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[graft.plans.BandJoinRule.type]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BandJoinRule
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[graft.plans.RangeJoinRule.type]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RangeJoinRule
    if (!spark.experimental.extraStrategies.exists(
        _.isInstanceOf[graft.plans.AsOfJoinStrategy.type]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRule)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
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
    ext.injectFunction((
      new FunctionIdentifier("jaccard_sim"),
      new ExpressionInfo(classOf[JaccardExpr].getName, "jaccard_sim"),
      (args: Seq[Expression]) => JaccardExpr(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("intersect_count"),
      new ExpressionInfo(classOf[IntersectCountExpr].getName, "intersect_count"),
      (args: Seq[Expression]) => IntersectCountExpr(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFpsExpr].getName, "winnow_fps"),
      (args: Seq[Expression]) => WinnowFpsExpr(args(0), lit(args(1)), lit(args(2)))))
    ext.injectFunction((
      new FunctionIdentifier("nearest_centroids"),
      new ExpressionInfo(classOf[NearestCentroidsExpr].getName, "nearest_centroids"),
      (args: Seq[Expression]) =>
        NearestCentroidsExpr(args(0), centroidMatrix(args(1)), lit(args(2)))))
    ext.injectFunction((
      new FunctionIdentifier("sparse_dot"),
      new ExpressionInfo(classOf[SparseDotExpr].getName, "sparse_dot"),
      (args: Seq[Expression]) => SparseDotExpr(args(0), args(1), weightVector(args(2)))))
    ext.injectFunction((
      new FunctionIdentifier("hashed_bow"),
      new ExpressionInfo(classOf[HashedBowExpr].getName, "hashed_bow"),
      (args: Seq[Expression]) => HashedBowExpr(args(0), lit(args(1)))))
  }
}
