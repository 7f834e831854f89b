package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftglue.{Glue => ExpressionUtils}
import org.apache.spark.sql.types._

/** Native one-pass computation of the Gopher repetition battery
  * ([[graft.ops.QualityRules.repetitionSignals]]). The composable
  * formulation explodes every line, paragraph AND word n-gram (n=2,3,4)
  * of every document into a corpus-wide (doc, kind, segment) stream —
  * the segment STRINGS are the groupBy key, so ~5 short strings per
  * token cross the wire per document, plus a per-doc window sort for
  * the `lead` gram construction. All ten output signals are per-doc
  * functions of that doc's text alone, so none of it needs an
  * exchange: this expression computes the full battery in one compiled
  * pass per row (segment/gram counting in per-row hash maps, memory
  * bounded by the largest single document — the same bound the keyed
  * hash aggregate already had).
  *
  * Exact-parity contract (RepetitionSignalsSpec pins it against the
  * retired composable formulation on random + degenerate inputs):
  * lines = split on `\n`, paragraphs on `\n{2,}` (Java regex, limit
  * −1), both Spark-trimmed (0x20 only) with blanks dropped; tokens =
  * `split(trim(text), "\\s+", -1)` INCLUDING any leading/trailing
  * empty token that non-space whitespace produces; grams join n
  * consecutive tokens with a single 0x20 (concat_ws parity); all
  * string lengths are code-point counts (Spark `length`); the top
  * gram rides the same packed key `count·2^32 + spaceFreeLen` with
  * ties to the larger space-free length; `wchars` counts code points
  * not in Java-regex `\s` = [ \t\n\x0B\f\r]. Returns NULL (no output
  * row) when the doc yields no line, paragraph or gram row — matching
  * the keyed aggregate, which simply never saw such a doc.
  */
object RepetitionExprs {
  def signals(text: Column): Column =
    ExpressionUtils.column(RepetitionSignalsExpr(ExpressionUtils.expression(text)))
}

case class RepetitionSignalsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"repetition_signals needs string, got $t")
  }
  override def dataType: DataType = RepetitionSignalsExpr.schema
  override def prettyName: String = "repetition_signals"
  // compute() returns null for no-signal docs even on non-null input,
  // so nullability must not be inherited from the child
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RepetitionSignalsExpr.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.RepetitionSignalsExpr.compute($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): RepetitionSignalsExpr =
    copy(child = newChild)
}

object RepetitionSignalsExpr {
  /** Field order mirrors the retired per-kind aggregate's pick() list. */
  val schema: StructType = StructType(Seq(
    StructField("wc", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = true),
    StructField("ld", LongType, nullable = true),
    StructField("lc", LongType, nullable = true),
    StructField("ldc", LongType, nullable = true),
    StructField("n_paras", LongType, nullable = true),
    StructField("pd", LongType, nullable = true),
    StructField("pc", LongType, nullable = true),
    StructField("pdc", LongType, nullable = true),
    StructField("g2m", LongType, nullable = true),
    StructField("g3m", LongType, nullable = true),
    StructField("g4m", LongType, nullable = true)))

  /** Spark `trim`: strips 0x20 (space) ONLY — not the Java String.trim
    * (≤ 0x20) contract.
    */
  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** Code points (Spark `length` on strings). */
  private def cp(s: String): Long = s.codePointCount(0, s.length).toLong

  /** Code points excluding 0x20 — `length(translate(v, " ", ""))`. */
  private def cpNoSpace(s: String): Long = {
    var i = 0
    var n = 0L
    while (i < s.length) {
      val c = s.codePointAt(i)
      if (c != 0x20) n += 1
      i += Character.charCount(c)
    }
    n
  }

  private val ParaSplit = java.util.regex.Pattern.compile("\n{2,}")
  private val TokSplit = java.util.regex.Pattern.compile("\\s+")

  /** Per-kind dup tally: n = Σc, d = Σ(c−1), ch = Σ len·c, dch = Σ len·(c−1). */
  private final class SegTally {
    val counts = new java.util.HashMap[String, Long]()
    var n = 0L
    def add(v: String): Unit = {
      counts.merge(v, 1L, java.lang.Long.sum _)
      n += 1
    }
    // (d, ch, dch)
    def finish(): (Long, Long, Long) = {
      var ch = 0L
      var dch = 0L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val len = cp(e.getKey)
        val c = e.getValue
        ch += len * c
        dch += len * (c - 1)
      }
      (n - counts.size(), ch, dch)
    }
  }

  def compute(t: org.apache.spark.unsafe.types.UTF8String): InternalRow = {
    val s = t.toString

    // wchars: code points not in Java-regex \s ([ \t\n\x0B\f\r])
    var wc = 0L
    var i = 0
    while (i < s.length) {
      val c = s.codePointAt(i)
      if (c != 0x20 && c != 0x09 && c != 0x0A && c != 0x0B && c != 0x0C && c != 0x0D)
        wc += 1
      i += Character.charCount(c)
    }

    val lines = new SegTally
    var li = 0
    var lstart = 0
    // split("\n", -1) is a plain scan on the literal separator
    while (li <= s.length) {
      if (li == s.length || s.charAt(li) == '\n') {
        val seg = trimSpaces(s.substring(lstart, li))
        if (seg.nonEmpty) lines.add(seg)
        lstart = li + 1
      }
      li += 1
    }

    val paras = new SegTally
    val pm = ParaSplit.split(s, -1)
    var pi = 0
    while (pi < pm.length) {
      val seg = trimSpaces(pm(pi))
      if (seg.nonEmpty) paras.add(seg)
      pi += 1
    }

    // grams over split(trim(text), "\s+", -1) — leading/trailing empty
    // tokens from non-space whitespace are REAL tokens here, matching
    // the posexplode formulation
    val toks = TokSplit.split(trimSpaces(s), -1)
    val gramTops = new Array[Long](3) // packed top key per n = 2,3,4; 0 = none
    var n = 2
    while (n <= 4) {
      if (toks.length >= n) {
        val m = new java.util.HashMap[String, Long]()
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j <= toks.length - n) {
          sb.setLength(0)
          var q = 0
          while (q < n) {
            if (q > 0) sb.append(' ')
            sb.append(toks(j + q))
            q += 1
          }
          m.merge(sb.toString, 1L, java.lang.Long.sum _)
          j += 1
        }
        var top = 0L
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val key = e.getValue * 4294967296L + cpNoSpace(e.getKey)
          if (key > top) top = key
        }
        gramTops(n - 2) = top
      }
      n += 1
    }

    val hasL = lines.n > 0
    val hasP = paras.n > 0
    val hasG = gramTops(0) > 0 || gramTops(1) > 0 || gramTops(2) > 0
    if (!hasL && !hasP && !hasG) return null

    def mass(top: Long): Any =
      if (top == 0L) null
      else java.lang.Long.valueOf((top >> 32) * (top % 4294967296L))

    val out = new Array[Any](12)
    out(0) = wc
    if (hasL) {
      val (d, ch, dch) = lines.finish()
      out(1) = lines.n; out(2) = d; out(3) = ch; out(4) = dch
    }
    if (hasP) {
      val (d, ch, dch) = paras.finish()
      out(5) = paras.n; out(6) = d; out(7) = ch; out(8) = dch
    }
    out(9) = mass(gramTops(0))
    out(10) = mass(gramTops(1))
    out(11) = mass(gramTops(2))
    new GenericInternalRow(out)
  }
}
