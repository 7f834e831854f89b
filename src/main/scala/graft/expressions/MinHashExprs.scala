package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftglue.{Glue => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for MinHash — the hot loop of LSH dedup.
  *
  * The composable formulation (nested `transform`/`array_min` over
  * `xxhash64`) is semantically right but runs interpreted: Spark's
  * higher-order array functions evaluate their lambda per element on the
  * expression tree (no whole-stage codegen), so numHashes × shingles
  * interpreted evals per row dominate the runtime (~40 s for 5k docs ×
  * 32 hashes × ~300 shingles). These expressions do the same work in one
  * compiled pass per row: hash each shingle once (XXH64 over its UTF-8
  * bytes), then derive the per-family hash by re-seeding XXH64 on that
  * 64-bit base — ~100× less overhead, same LSH guarantees (the family
  * only needs pairwise-independent-ish mixing, not a specific hash).
  *
  * `doGenCode` emits a single static call, so the expression stays
  * inside WholeStageCodegen spans instead of forcing a fallback.
  */
object MinHashExprs {
  /** MinHash signature of a string array: array<long> of length `numHashes`. */
  def minhashSig(shingles: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashSigExpr(ExpressionUtils.expression(shingles), numHashes))

  /** Distinct character n-gram shingles of a string: array<string>. */
  def charNgrams(text: Column, n: Int): Column =
    ExpressionUtils.column(CharNgramsExpr(ExpressionUtils.expression(text), n))

  /** Oracle-PORTABLE MinHash signature (the q35 family): md5 per
    * shingle, Carter–Wegman slots `(h1 + k·h2) & 2^48−1` from the
    * digest's two 48-bit halves (h2 forced odd) — bit-identical to what
    * any md5-capable engine derives from the hex digest, at native
    * single-pass speed. See [[PortableMinHashSigExpr]].
    */
  def portableMinhashSig(shingles: Column, numHashes: Int): Column =
    ExpressionUtils.column(PortableMinHashSigExpr(
      ExpressionUtils.expression(shingles), numHashes))

  /** LSH band keys from a signature: array<long> of length `bands`,
    * hashing `rowsPerBand` consecutive signature slots per band.
    */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    ExpressionUtils.column(BandKeysExpr(ExpressionUtils.expression(signature), bands, rowsPerBand))

  /** Order-sensitive 64-bit rolling fingerprint of a token array. */
  def fingerprint(tokens: Column): Column =
    ExpressionUtils.column(FingerprintExpr(ExpressionUtils.expression(tokens)))

  /** Exact Jaccard similarity of two string-array shingle sets. */
  def jaccardSim(a: Column, b: Column): Column =
    ExpressionUtils.column(JaccardExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Distinct-intersection cardinality |A ∩ B| of two string arrays. */
  def intersectCount(a: Column, b: Column): Column =
    ExpressionUtils.column(IntersectCountExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Distinct winnowing-selected fingerprints of a string: array<long>. */
  def winnowFps(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowFpsExpr(ExpressionUtils.expression(text), k, w))
}

case class MinHashSigExpr(child: Expression, numHashes: Int)
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig needs array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSigExpr.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.MinHashSigExpr.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** The oracle-portable twin of [[MinHashSigExpr]]: md5 instead of
  * XXH64, Carter–Wegman slot derivation instead of re-seeding.
  * Slot k = `(h1 + k·h2) & 0xFFFFFFFFFFFF`, where h1 = the digest's
  * first 6 bytes as an unsigned 48-bit value (== hex chars 1–12 of
  * `md5(shingle)`) and h2 = bytes 6–11 forced odd (== hex chars 13–24
  * `| 1`) — exactly what an external engine derives from the hex
  * digest, so the signature sits under a cross-engine hash oracle
  * (Broder 1997's minwise family over a 2-universal base, Carter &
  * Wegman 1979). Always positive: signed and unsigned mins agree.
  *
  * This expression exists because BOTH composable formulations lose at
  * scale (round-11 measurements): `array(transform(...))` lambdas run
  * interpreted (20+ min at ×100), and the explode + groupBy rewrite is
  * codegen'd but pays a 1.5M-row explode/agg per sf0.1 corpus for what
  * is one in-row loop (3.3 s vs 1.2 s native). Same single-pass shape
  * as the XXH64 expression; md5 via a thread-local MessageDigest.
  */
case class PortableMinHashSigExpr(child: Expression, numHashes: Int)
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"portable_minhash_sig needs array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "portable_minhash_sig"

  override def nullSafeEval(input: Any): Any =
    PortableMinHashSigExpr.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.PortableMinHashSigExpr.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): PortableMinHashSigExpr =
    copy(child = newChild)
}

object PortableMinHashSigExpr {
  private val Mask48 = 0xFFFFFFFFFFFFL
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def u48(d: Array[Byte], off: Int): Long =
    ((d(off) & 0xFFL) << 40) | ((d(off + 1) & 0xFFL) << 32) |
      ((d(off + 2) & 0xFFL) << 24) | ((d(off + 3) & 0xFFL) << 16) |
      ((d(off + 4) & 0xFFL) << 8) | (d(off + 5) & 0xFFL)

  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val md = digests.get()
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      if (s != null) {
        md.reset()
        val d = md.digest(s.getBytes)
        val h1 = u48(d, 0)
        val h2 = u48(d, 6) | 1L
        var k = 0
        while (k < numHashes) {
          val h = (h1 + k * h2) & Mask48
          if (h < sig(k)) sig(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

object MinHashSigExpr {
  /** One compiled pass: per shingle one XXH64 over the bytes, then one
    * XXH64.hashLong re-seed per hash family; running min per family.
    */
  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      if (s != null) {
        val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var k = 0
        while (k < numHashes) {
          val h = XXH64.hashLong(base, k.toLong)
          if (h < sig(k)) sig(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

case class CharNgramsExpr(child: Expression, n: Int)
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"char_ngrams needs string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any =
    CharNgramsExpr.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.CharNgramsExpr.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramsExpr =
    copy(child = newChild)
}

object CharNgramsExpr {
  /** Distinct character (code-unit-aware) n-grams in first-seen order —
    * same contract as array_distinct(transform(sequence(...), substr))
    * but one compiled pass.
    */
  def compute(s: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((len - n + 1) * 2)
    var i = 0
    while (i <= len - n) {
      seen.add(str.substring(i, i + n))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) {
      out(j) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class BandKeysExpr(child: Expression, bands: Int, rowsPerBand: Int)
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"lsh_band_keys needs array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_band_keys"

  override def nullSafeEval(input: Any): Any =
    BandKeysExpr.compute(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.BandKeysExpr.compute($c, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): BandKeysExpr =
    copy(child = newChild)
}

case class FingerprintExpr(child: Expression)
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"fingerprint needs array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint"

  override def nullSafeEval(input: Any): Any =
    FingerprintExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.FingerprintExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): FingerprintExpr =
    copy(child = newChild)
}

object FingerprintExpr {
  /** Bit-for-bit the composable fold
    * `aggregate(tokens, 0L, (acc, t) => (acc << 5) ^ (acc >> 59) ^ xxhash64(t))`
    * (TextAnalysis.fingerprint's original formulation): << / >> are
    * Java's long shifts (arithmetic right), xxhash64 is XXH64 over the
    * token's UTF-8 bytes with Spark's default seed 42; a NULL token
    * contributes the seed, matching `xxhash64(NULL)`. One compiled loop
    * instead of tokens-per-row interpreted lambda evals.
    */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      val h =
        if (t == null) 42L
        else XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      acc = (acc << 5) ^ (acc >> 59) ^ h
      i += 1
    }
    acc
  }
}

object BandKeysExpr {
  /** Band key = chained XXH64.hashLong over the band's signature slots,
    * seeded by the band index (so identical sub-signatures in different
    * bands land in different buckets).
    */
  def compute(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = b.toLong
      var r = 0
      while (r < rowsPerBand) {
        val idx = b * rowsPerBand + r
        if (idx < sig.numElements()) h = XXH64.hashLong(sig.getLong(idx), h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Exact Jaccard over two string arrays treated as sets. The built-in
  * `array_intersect` route allocates and rebuilds a hash map per row
  * evaluation, which dominates candidate verification (27k pairs ≈ 3 s
  * at sf0.1); this computes |∩| in one compiled pass — smaller side into
  * an open-addressed probe of UTF8String hashes — with no per-row
  * SQL-level set machinery. Duplicates are collapsed (set semantics);
  * both-empty yields 1.0, matching the prior when(uni>0, …, 1.0) form.
  */
case class JaccardExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  private def ok(t: DataType): Boolean = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_sim needs array<string>, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.JaccardExpr.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardExpr =
    copy(left = newLeft, right = newRight)
}

object JaccardExpr {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val (small, big) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val ns = small.numElements()
    val nb = big.numElements()
    if (ns == 0 && nb == 0) return 1.0
    if (ns == 0) return 0.0
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](ns * 2)
    var i = 0
    while (i < ns) { set.add(small.getUTF8String(i)); i += 1 }
    val nsDistinct = set.size
    // distinct-count the big side while probing, so duplicated inputs
    // still get exact set semantics
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](nb * 2)
    var inter = 0
    i = 0
    while (i < nb) {
      val s = big.getUTF8String(i)
      if (seen.add(s) && set.contains(s)) inter += 1
      i += 1
    }
    val union = nsDistinct + seen.size - inter
    if (union > 0) inter.toDouble / union else 1.0
  }
}

/** Distinct |A ∩ B| of two string arrays in one compiled pass — the
  * count-only sibling of [[JaccardExpr]] for containment verification,
  * where `size(array_intersect(a, b))` would materialize the whole
  * intersected array per candidate pair just to take its length.
  * Duplicates collapse (set semantics), matching DuckDB's
  * `len(list_filter(list_distinct(a), x -> list_contains(b, x)))`.
  */
case class IntersectCountExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  private def ok(t: DataType): Boolean = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"intersect_count needs array<string>, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCountExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.IntersectCountExpr.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

object IntersectCountExpr {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val (small, big) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val ns = small.numElements()
    val nb = big.numElements()
    if (ns == 0) return 0L
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](ns * 2)
    var i = 0
    while (i < ns) { set.add(small.getUTF8String(i)); i += 1 }
    // remove on hit: duplicated big-side values count once, no second set
    var inter = 0L
    i = 0
    while (i < nb && !set.isEmpty) {
      if (set.remove(big.getUTF8String(i))) inter += 1
      i += 1
    }
    inter
  }
}

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken) in one
  * compiled pass per document: md5 every k-gram (first 8 hex chars →
  * long, the engine-portable hash [[graft.ops.Winnow]] standardizes
  * on), slide a w-window over the hash sequence, keep each full
  * window's minimum, and emit the DISTINCT selected set. The
  * composable form explodes every character position into a corpus-wide
  * (doc, pos, hash) table and runs a partitioned window over it — at
  * 100 TB that's shuffling ~|text| rows per document just to throw
  * away all but ~1/w of them. Here selection happens before anything
  * reaches an exchange: only (doc, fingerprint-array) rows exist.
  *
  * Exact-parity contract with the SQL/oracle form: hash =
  * first-8-hex-chars of md5 of the k-char substring; full windows only
  * (positions 1..P−w+1), except 0 < P < w degenerates to the single
  * global min. Character positions are UTF-16 code units, matching
  * [[CharNgramsExpr]]'s precedent (identical to code points on the
  * ASCII corpora these gates run on).
  */
case class WinnowFpsExpr(child: Expression, k: Int, w: Int)
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"winnow_fps needs string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowFpsExpr.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.WinnowFpsExpr.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFpsExpr =
    copy(child = newChild)
}

object WinnowFpsExpr {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: org.apache.spark.unsafe.types.UTF8String,
              k: Int, w: Int): ArrayData = {
    val str = s.toString
    val nPos = str.length - k + 1
    if (nPos <= 0) return new GenericArrayData(Array.empty[Any])
    val md = digest.get()
    val hs = new Array[Long](nPos)
    var p = 0
    while (p < nPos) {
      md.reset()
      val d = md.digest(
        str.substring(p, p + k).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 hex chars of the digest = first 4 bytes, big-endian,
      // read unsigned — exactly conv(substring(md5(g),1,8),16,10)
      hs(p) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      p += 1
    }
    // full windows only; 0 < nPos < w degenerates to one global window
    val lastStart = math.max(nPos - w, 0)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    p = 0
    while (p <= lastStart) {
      var m = hs(p)
      var j = p + 1
      val end = math.min(p + w, nPos)
      while (j < end) { if (hs(j) < m) m = hs(j); j += 1 }
      seen.add(m)
      p += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }
}
