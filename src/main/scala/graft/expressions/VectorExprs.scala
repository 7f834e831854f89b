package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.{Glue => ExpressionUtils}
import org.apache.spark.sql.types._

/** Native vector expressions for the similarity operators. The
  * composable `aggregate(zip_with(...))` formulation evaluates its
  * lambda per element interpreted (higher-order functions are not
  * codegen'd), which dominates ANN runtimes: candidate-pairs ×
  * dimensions interpreted evals. Each expression here is one compiled
  * loop per row, emitted into WholeStageCodegen via a static call.
  */
object VectorExprs {
  /** Cosine similarity of two numeric arrays (double result; 0.0 when
    * either norm is 0 — matching graft.ops.Similarity.cosine).
    */
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Random-hyperplane LSH sign bits of a vector packed into a long.
    * Plane components are derived from XXH64(plane, dim) mapped to
    * [-1, 1) — deterministic everywhere, no RNG state.
    */
  def lshSignBits(vec: Column, bits: Int): Column =
    ExpressionUtils.column(LshSignBitsExpr(ExpressionUtils.expression(vec), bits))

  /** Indices (0-based) of the `k` nearest centroids by cosine (desc,
    * ties by index). The centroid matrix rides inside the expression as
    * a plan reference object — it reaches executors with the task
    * binary (broadcast semantics), so assignment is a pure map: no
    * corpus×centroids explode, no per-vector window.
    * `l2 = true` ranks by squared Euclidean distance instead (asc) —
    * the PQ-codebook metric, where subvector magnitudes carry signal.
    */
  def nearestCentroids(vec: Column, centroids: Array[Array[Double]], k: Int,
                       l2: Boolean = false): Column =
    ExpressionUtils.column(NearestCentroidsExpr(ExpressionUtils.expression(vec), centroids, k, l2))

  /** Sparse dot product Σ x(i)·w(b(i)) over parallel (indices, values)
    * arrays against a plan-shipped dense weight vector — the margin of
    * a linear model over hashed sparse features as ONE compiled loop
    * per row. Replaces `aggregate(zip_with(b, x, …))`, whose lambdas
    * evaluate interpreted per element. Out-of-range indices contribute
    * 0 (a hashed feature space never produces them; dropping beats
    * null-poisoning the whole margin).
    */
  def sparseDot(indices: Column, values: Column, weights: Array[Double]): Column =
    ExpressionUtils.column(SparseDotExpr(
      ExpressionUtils.expression(indices), ExpressionUtils.expression(values), weights))

  /** Hashed bag-of-words features of a token array as one compiled
    * pass: struct<b: array<int>, x: array<double>> with buckets
    * ascending, x L1-normalized token shares, plus the bias slot
    * (bucket = dim, x = 1.0) last. Bucket = pmod(xxhash64(token), dim)
    * — identical to the composable explode → groupBy(bucket) → join
    * norms → sort_array pivot it replaces, but with ZERO shuffles: at
    * corpus scale feature extraction becomes a pure scan instead of
    * shuffling docs × tokens rows three times. `portable = true` swaps
    * the token hash for the md5-derived 48-bit family (q187's oracle
    * leg) so the SAME zero-shuffle scan feeds the oracle-replayable
    * classifier (round 15: q84's fused feature path).
    */
  def hashedBow(tokens: Column, dim: Int, portable: Boolean = false): Column =
    ExpressionUtils.column(HashedBowExpr(ExpressionUtils.expression(tokens), dim, portable))

  /** Johnson–Lindenstrauss ±1 projection of a quantized vector as one
    * compiled pass: proj_k = Σ_j sign(j,k) · floor(x_j·10⁶), where
    * sign(j,k) = +1 when `conv(substr(md5(j || "_k"),1,8),16,10) % 2 = 0`
    * — the exact md5 matrix the composable posexplode → 16-conditional-
    * sum groupBy derived PER ELEMENT PER OUTPUT (dims × k md5 evals per
    * vector, plus a corpus×dims explode and a keyed shuffle, for what is
    * a fixed ±1 matrix). Signs are memoized per (j,k) process-wide.
    * NULL/empty arrays return NULL (the explode produced no rows for
    * them); an all-null element set returns a row of NULL sums (SQL sum
    * over empty input), matching the aggregate bit for bit
    * (JlProjectSpec pins it).
    */
  def jlProject(vec: Column, k: Int): Column =
    ExpressionUtils.column(JlProjectExpr(ExpressionUtils.expression(vec), k))

  /** Portable md5-Rademacher LSH sign bits in one compiled loop (see
    * [[PortableLshSigExpr]]); NULL for NULL or shorter-than-dim vectors.
    */
  def portableLshSig(vec: Column, bits: Int, dim: Int): Column =
    ExpressionUtils.column(PortableLshSigExpr(
      ExpressionUtils.expression(vec), bits, dim))

  /** Multi-probe LSH probe sequence (see [[PortableLshProbesExpr]]):
    * the home bucket plus `probes` single-bit flips in ascending
    * |plane-dot| margin order — NULL for NULL/short vectors.
    */
  def portableLshProbes(vec: Column, bits: Int, dim: Int, probes: Int): Column =
    ExpressionUtils.column(PortableLshProbesExpr(
      ExpressionUtils.expression(vec), bits, dim, probes))
}

case class CosineSimExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  private def ok(t: DataType): Boolean = t match {
    case ArrayType(DoubleType | FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim needs array<double|float>, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private lazy val leftIsFloat = left.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }
  private lazy val rightIsFloat = right.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimExpr.compute(a.asInstanceOf[ArrayData], leftIsFloat,
      b.asInstanceOf[ArrayData], rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.CosineSimExpr.compute($a, $leftIsFloat, $b, $rightIsFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na > 0 && nb > 0) dot / (math.sqrt(na) * math.sqrt(nb)) else 0.0
  }
}

case class LshSignBitsExpr(child: Expression, bits: Int)
  extends UnaryExpression {
  private def ok(t: DataType): Boolean = t match {
    case ArrayType(DoubleType | FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lsh_sign_bits needs array<double|float>, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_sign_bits"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    LshSignBitsExpr.compute(input.asInstanceOf[ArrayData], isFloat, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.LshSignBitsExpr.compute($c, $isFloat, $bits)")

  override protected def withNewChildInternal(newChild: Expression): LshSignBitsExpr =
    copy(child = newChild)
}

case class NearestCentroidsExpr(child: Expression,
                                centroids: Array[Array[Double]], k: Int,
                                l2: Boolean = false)
  extends UnaryExpression {
  private def ok(t: DataType): Boolean = t match {
    case ArrayType(DoubleType | FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids needs array<double|float>, got ${child.dataType}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    NearestCentroidsExpr.compute(input.asInstanceOf[ArrayData], isFloat, centroids, k, l2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.NearestCentroidsExpr.compute($c, $isFloat, $mat, $k, $l2)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsExpr =
    copy(child = newChild)
}

object NearestCentroidsExpr {
  /** Top-k centroid indices by cosine similarity (or, with `l2`, by
    * ascending squared Euclidean distance) — one compiled
    * centroids×dims loop per row with a size-k insertion select (k is
    * 1 for assignment, nProbe for probing; both tiny). Ties
    * break to the lower index; in cosine mode a zero-norm input scores
    * 0 against every centroid (CosineSimExpr semantics). L2 mode ranks
    * by -distance² so the same descending insertion select applies.
    */
  def compute(v: ArrayData, isFloat: Boolean,
              cents: Array[Array[Double]], k: Int,
              l2: Boolean = false): ArrayData = {
    val n = v.numElements()
    val x = new Array[Double](n)
    var nx = 0.0
    var i = 0
    while (i < n) {
      val xi = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      x(i) = xi; nx += xi * xi
      i += 1
    }
    val c = cents.length
    val kk = math.min(k, c)
    val topIdx = new Array[Int](kk)
    val topSim = new Array[Double](kk)
    var filled = 0
    var j = 0
    while (j < c) {
      val cv = cents(j)
      val m = math.min(n, cv.length)
      var dot = 0.0; var nc = 0.0
      var d = 0
      while (d < m) { dot += x(d) * cv(d); nc += cv(d) * cv(d); d += 1 }
      var dd = m
      while (dd < cv.length) { nc += cv(dd) * cv(dd); dd += 1 }
      val sim =
        if (l2) -(nx + nc - 2.0 * dot) // -‖x−c‖²: larger = nearer
        else if (nx > 0 && nc > 0) dot / (math.sqrt(nx) * math.sqrt(nc))
        else 0.0
      // insertion into the sorted top-k (desc sim; existing entries win ties)
      var pos = filled
      while (pos > 0 && topSim(pos - 1) < sim) pos -= 1
      if (pos < kk) {
        val last = math.min(filled, kk - 1)
        var s = last
        while (s > pos) { topSim(s) = topSim(s - 1); topIdx(s) = topIdx(s - 1); s -= 1 }
        topSim(pos) = sim; topIdx(pos) = j
        if (filled < kk) filled += 1
      }
      j += 1
    }
    val out = new Array[Any](filled)
    i = 0
    while (i < filled) { out(i) = topIdx(i); i += 1 }
    new GenericArrayData(out)
  }
}

case class SparseDotExpr(left: Expression, right: Expression,
                         weights: Array[Double])
  extends BinaryExpression {
  private def idxOk(t: DataType): Boolean = t match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }
  private def valOk(t: DataType): Boolean = t match {
    case ArrayType(DoubleType | FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (idxOk(left.dataType) && valOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sparse_dot needs (array<int>, array<double|float>), got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sparse_dot"

  private lazy val valFloat = right.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(b: Any, x: Any): Any =
    SparseDotExpr.compute(b.asInstanceOf[ArrayData],
      x.asInstanceOf[ArrayData], valFloat, weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weights, "double[]")
    defineCodeGen(ctx, ev, (b, x) =>
      s"graft.expressions.SparseDotExpr.compute($b, $x, $valFloat, $w)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SparseDotExpr =
    copy(left = newLeft, right = newRight)
}

object SparseDotExpr {
  /** Left-to-right accumulation in array order — bit-identical to the
    * `aggregate(zip_with(...), 0.0, _+_)` fold it replaces.
    */
  def compute(b: ArrayData, x: ArrayData, xFloat: Boolean,
              w: Array[Double]): Double = {
    val n = math.min(b.numElements(), x.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val bi = b.getInt(i)
      if (bi >= 0 && bi < w.length) {
        val xi = if (xFloat) x.getFloat(i).toDouble else x.getDouble(i)
        acc += xi * w(bi)
      }
      i += 1
    }
    acc
  }
}

object LshSignBitsExpr {
  /** Plane component for (plane b, dim i): XXH64 of the two ints mapped
    * to [-1, 1) — identical family to the composable version's
    * xxhash64(plane, dim)/Long.MaxValue.
    */
  def compute(v: ArrayData, isFloat: Boolean, bits: Int): Long = {
    val n = v.numElements()
    var sig = 0L
    var b = 0
    while (b < bits) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val h = XXH64.hashLong(b.toLong << 32 | i.toLong, 42L)
        proj += x * (h.toDouble / Long.MaxValue.toDouble)
        i += 1
      }
      if (proj > 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}

case class HashedBowExpr(child: Expression, dim: Int,
                         portable: Boolean = false)
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hashed_bow needs array<string>, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("b", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("x", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def prettyName: String = "hashed_bow"

  override def nullSafeEval(input: Any): Any =
    HashedBowExpr.compute(input.asInstanceOf[ArrayData], dim, portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.HashedBowExpr.compute($c, $dim, $portable)")

  override protected def withNewChildInternal(newChild: Expression): HashedBowExpr =
    copy(child = newChild)
}

object HashedBowExpr {
  /** Dense count pass over `dim` buckets (dim is a model hyperparam,
    * 64–1024 — a few KB on the stack), then the sorted sparse pivot:
    * bucket = pmod(XXH64(token bytes, seed 42), dim) — exactly Spark's
    * `pmod(xxhash64(tok), dim)` — x = count/totalTokens, buckets emitted
    * ascending with the bias slot (dim, 1.0) appended last, matching the
    * sort_array(struct(bucket, x)) order of the shuffle formulation.
    */
  // one digest per thread: MessageDigest is stateful and not
  // thread-safe, and per-token allocation would dominate the loop
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 48 bits of md5(bytes) as a non-negative long — the compiled
    * twin of `conv(substring(md5(s), 1, 12), 16, 10)` (the q187 oracle
    * family, TextAnalysis.portableHash48).
    */
  def md5Hash48(bytes: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(bytes)
    ((h(0) & 0xffL) << 40) | ((h(1) & 0xffL) << 32) | ((h(2) & 0xffL) << 24) |
      ((h(3) & 0xffL) << 16) | ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)
  }

  def compute(toks: ArrayData, dim: Int,
              portable: Boolean = false): org.apache.spark.sql.catalyst.InternalRow = {
    val cnt = new Array[Long](dim)
    var total = 0L
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      if (s != null) {
        val h =
          if (portable) md5Hash48(s.getBytes)
          else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        cnt((((h % dim) + dim) % dim).toInt) += 1L
        total += 1L
      }
      i += 1
    }
    var nz = 0
    i = 0
    while (i < dim) { if (cnt(i) > 0L) nz += 1; i += 1 }
    val bs = new Array[Any](nz + 1)
    val xs = new Array[Any](nz + 1)
    var j = 0
    i = 0
    while (i < dim) {
      if (cnt(i) > 0L) {
        bs(j) = i
        xs(j) = cnt(i).toDouble / total.toDouble
        j += 1
      }
      i += 1
    }
    bs(nz) = dim
    xs(nz) = 1.0
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(bs), new GenericArrayData(xs)))
  }
}

/** The portable (md5-derived Rademacher hyperplane) LSH signature as ONE
  * compiled loop per row — semantically identical to the unrolled
  * ±element_at Column formulation it replaces (see
  * graft.ops.Similarity.portableLshSignature): plane (k,i) contributes
  * +x_i when md5("hp:k:i")'s first-48-bit value is even, −x_i otherwise,
  * the per-plane dot folds STRICTLY in index order (bit-identical FP
  * across engines — the q41/q43/q71 oracle family), and a NULL or
  * shorter-than-dim vector yields NULL. The unrolled form was correct
  * but paid bits×dim expression nodes per evaluation site: q41 spent
  * seconds in codegen compilation alone and evaluated the projection on
  * both self-join sides. The sign matrix is derived once per (bits,dim)
  * per JVM and cached — no RNG state, nothing shipped.
  */
case class PortableLshSigExpr(child: Expression, bits: Int, dim: Int)
  extends UnaryExpression {
  require(bits >= 0 && bits <= 63, s"bits must be in [0, 63], got $bits")
  require(dim > 0, s"dim must be positive, got $dim")
  private def ok(t: DataType): Boolean = t match {
    case ArrayType(DoubleType | FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"portable_lsh_sig needs array<double|float>, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "portable_lsh_sig"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() < dim) null
    else java.lang.Long.valueOf(
      PortableLshSigExpr.compute(a, isFloat, bits, dim))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c.numElements() < $dim) { ${ev.isNull} = true; }
      else { ${ev.value} =
        graft.expressions.PortableLshSigExpr.compute($c, $isFloat, $bits, $dim); }
    """)

  override protected def withNewChildInternal(newChild: Expression): PortableLshSigExpr =
    copy(child = newChild)
}

/** Multi-probe LSH (Lv et al., VLDB 2007) probe sequence over the
  * portable md5-Rademacher plane family: the query's home bucket
  * followed by `probes` single-bit perturbations, flipped in ascending
  * |dot| margin order (the planes the query sits closest to are the
  * likeliest sign errors for a true near neighbor). One compiled loop
  * computes the per-plane dots (strict index-order fold — the exact
  * [[PortableLshSigExpr]] arithmetic, so home buckets agree
  * bit-for-bit), an insertion sort over ≤ 63 (margin, bit) pairs picks
  * the flip order with ties broken by bit index, and the output is the
  * (probes+1)-element array<long> of distinct buckets to search. Fully
  * deterministic — a DuckDB oracle replays margins, order, and flips.
  */
case class PortableLshProbesExpr(child: Expression, bits: Int, dim: Int,
                                 probes: Int)
  extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")
  require(dim > 0, s"dim must be positive, got $dim")
  require(probes >= 0 && probes <= bits,
    s"probes must be in [0, bits=$bits], got $probes")
  private def ok(t: DataType): Boolean = t match {
    case ArrayType(DoubleType | FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"portable_lsh_probes needs array<double|float>, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "portable_lsh_probes"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() < dim) null
    else PortableLshProbesExpr.compute(a, isFloat, bits, dim, probes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c.numElements() < $dim) { ${ev.isNull} = true; }
      else { ${ev.value} =
        graft.expressions.PortableLshProbesExpr.compute(
          $c, $isFloat, $bits, $dim, $probes); }
    """)

  override protected def withNewChildInternal(newChild: Expression): PortableLshProbesExpr =
    copy(child = newChild)
}

object PortableLshProbesExpr {
  def compute(a: ArrayData, isFloat: Boolean, bits: Int, dim: Int,
              probes: Int): ArrayData = {
    val signs = PortableLshSigExpr.signsFor(bits, dim)
    val dots = new Array[Double](bits)
    var sig = 0L
    var k = 0
    while (k < bits) {
      var dot = 0.0
      val off = k * dim
      var i = 0
      while (i < dim) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        dot += (if (signs(off + i) > 0) x else -x)
        i += 1
      }
      dots(k) = dot
      if (dot >= 0) sig |= (1L << k)
      k += 1
    }
    // insertion sort of bit indices by (|dot| asc, bit asc); bits <= 63
    val order = Array.tabulate(bits)(identity)
    var j = 1
    while (j < bits) {
      val b = order(j)
      val m = math.abs(dots(b))
      var p = j - 1
      while (p >= 0 && {
        val o = order(p)
        val mo = math.abs(dots(o))
        mo > m || (mo == m && o > b)
      }) { order(p + 1) = order(p); p -= 1 }
      order(p + 1) = b
      j += 1
    }
    val out = new Array[Long](probes + 1)
    out(0) = sig
    var q = 0
    while (q < probes) { out(q + 1) = sig ^ (1L << order(q)); q += 1 }
    new GenericArrayData(out)
  }
}

object PortableLshSigExpr {
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Byte]]()

  /** Flattened bits×dim Rademacher signs: +1 when the first 48 bits of
    * md5("hp:k:i") are even — the EXACT family the DuckDB oracles
    * re-derive (and the retired unrolled Column form used).
    */
  private[expressions] def signsFor(bits: Int, dim: Int): Array[Byte] =
    signCache.computeIfAbsent((bits, dim), { _ =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new Array[Byte](bits * dim)
      var k = 0
      while (k < bits) {
        var i = 0
        while (i < dim) {
          val hex = md.digest(s"hp:$k:$i".getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(12)
          out(k * dim + i) =
            if ((java.lang.Long.parseLong(hex, 16) & 1L) == 0L) 1 else -1
          i += 1
        }
        k += 1
      }
      out
    })

  def compute(a: ArrayData, isFloat: Boolean, bits: Int, dim: Int): Long = {
    val signs = signsFor(bits, dim)
    var sig = 0L
    var k = 0
    while (k < bits) {
      var dot = 0.0
      val off = k * dim
      var i = 0
      while (i < dim) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        dot += (if (signs(off + i) > 0) x else -x)
        i += 1
      }
      if (dot >= 0) sig |= (1L << k)
      k += 1
    }
    sig
  }
}

/** JL ±1 projection — see [[VectorExprs.jlProject]]. Input must be
  * array<double> (the operator casts); output struct has k nullable
  * long fields proj_0..proj_{k-1}.
  */
case class JlProjectExpr(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"jl_project needs array<double>, got $t")
  }
  override def dataType: DataType = StructType((0 until k).map(i =>
    StructField(s"proj_$i", LongType, nullable = true)))
  override def prettyName: String = "jl_project"
  // NULL/empty arrays yield NULL even on non-null input
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    JlProjectExpr.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.JlProjectExpr.compute($c, $k);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): JlProjectExpr =
    copy(child = newChild)
}

object JlProjectExpr {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  // memoized sign rows: signs(j) = packed bits for ALL 64 possible
  // outputs of position j (bit kk set = NEGATIVE sign) — always the
  // full 64, so a row cached under a small k serves any later k.
  // Grows on demand; reads are lock-free once published.
  @volatile private var signRows: Array[Long] = new Array[Long](0)
  private def signRow(j: Int): Long = {
    val cur = signRows
    if (j < cur.length) return cur(j)
    synchronized {
      val have = signRows
      if (j < have.length) return have(j)
      val next = java.util.Arrays.copyOf(have, math.max(j + 1, have.length * 2 + 8))
      val md = digests.get()
      var jj = have.length
      while (jj < next.length) {
        var bits = 0L
        var kk = 0
        while (kk < 64) {
          md.reset()
          val d = md.digest(s"${jj}_$kk".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // conv(substr(md5,1,8),16,10) % 2 == low bit of the 4th digest byte
          if ((d(3) & 1) == 1) bits |= (1L << kk)
          kk += 1
        }
        next(jj) = bits
        jj += 1
      }
      signRows = next
      next(j)
    }
  }

  def compute(v: ArrayData, k: Int): org.apache.spark.sql.catalyst.InternalRow = {
    require(k <= 64, s"jl_project supports k <= 64, got $k")
    val n = v.numElements()
    if (n == 0) return null
    val sums = new Array[Long](k)
    var any = false
    var j = 0
    while (j < n) {
      if (!v.isNullAt(j)) {
        any = true
        val xq = math.floor(v.getDouble(j) * 1000000.0).toLong
        val bits = signRow(j)
        var kk = 0
        while (kk < k) {
          if (((bits >> kk) & 1L) == 0L) sums(kk) += xq else sums(kk) -= xq
          kk += 1
        }
      }
      j += 1
    }
    val out = new Array[Any](k)
    if (any) { var kk = 0; while (kk < k) { out(kk) = sums(kk); kk += 1 } }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }
}
