package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftglue.{Glue => ExpressionUtils}
import org.apache.spark.sql.types._

/** Native one-pass token/stopword/punctuation statistics — the quality
  * trio ([[graft.ops.TextAnalysis.wordSetRatio]] /
  * [[graft.ops.TextAnalysis.qualityScore]]) without the interpreted
  * higher-order `filter(toks, isInCollection)` lambda and without
  * re-splitting the text once per signal. The composable form pays a
  * per-token interpreted `ArrayFilter` eval plus two independent
  * regex splits (raw and lowered) per OUTPUT column; at the ×100 board
  * scale the quality-gated rows (q31 direct, q164/q186 through the
  * curation gate) spend tens of seconds re-tokenizing the same
  * document. One expression instance computes every signal in a
  * single compiled pass; identical instances in one projection
  * collapse under codegen subexpression elimination.
  *
  * Exact-parity contract (TextStatsSpec pins it against the composable
  * formulation): tokens = `split(trim(x), "\\s+", -1)` with Spark trim
  * (0x20 only) — the raw-text token count feeds the length score, the
  * `lower(x)` token stream feeds the stopword hits (Spark `lower` =
  * UTF8String.toLowerCase); `stop_ratio` = hits/tokens as an IEEE
  * double division (0.0 for an impossible empty split); `punct_ratio` =
  * (cp − |[A-Za-z0-9 ]|)/cp over code points; `quality` replays
  * min/max and the exact left-associated double arithmetic of the
  * composable `qualityScore`.
  */
object TextStatsExprs {
  def stats(text: Column, stopwords: Seq[String]): Column =
    ExpressionUtils.column(TextStatsExpr(ExpressionUtils.expression(text), stopwords))

  /** One-pass Gopher rule statistics ([[graft.ops.QualityRules.gopherRules]]):
    * the composable form pays an interpreted `aggregate`/`filter` lambda
    * per token PLUS a per-token `rlike` regex for the alpha-word count.
    */
  def gopherStats(text: Column, stopwords: Seq[String]): Column =
    ExpressionUtils.column(GopherStatsExpr(ExpressionUtils.expression(text), stopwords))
}

case class TextStatsExpr(child: Expression, stopwords: Seq[String])
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"text_stats needs string, got $t")
  }
  override def dataType: DataType = TextStatsExpr.schema
  override def prettyName: String = "text_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    TextStatsExpr.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the stop set once per generated class, not per row
    // raw type: Janino's generics support is unreliable for the cast
    // the reference-object accessor generates
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextStatsExpr.compute($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}

object TextStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_raw", IntegerType, nullable = false),
    StructField("stop_ratio", DoubleType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))

  private val TokSplit = java.util.regex.Pattern.compile("\\s+")

  /** Spark `trim`: strips 0x20 (space) ONLY. */
  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  def compute(t: org.apache.spark.unsafe.types.UTF8String,
              stop: java.util.HashSet[String]): InternalRow = {
    val raw = t.toString

    // punct_ratio: code points, class [A-Za-z0-9 ] (the regexp_replace
    // survivor class — ASCII, so one code unit each)
    var len = 0L
    var kept = 0L
    var i = 0
    while (i < raw.length) {
      val c = raw.codePointAt(i)
      len += 1
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == ' ') kept += 1
      i += Character.charCount(c)
    }
    val punct =
      if (len > 0) (len - kept).toDouble / len.toDouble else 0.0

    // raw token count (split of trim — never an empty ARRAY, an empty
    // string still yields one empty token, matching Spark split)
    val nRaw = TokSplit.split(trimSpaces(raw), -1).length

    // stopword hits over the LOWERED token stream (Spark lower)
    val lowToks = TokSplit.split(trimSpaces(t.toLowerCase.toString), -1)
    var hits = 0
    var j = 0
    while (j < lowToks.length) {
      if (stop.contains(lowToks(j))) hits += 1
      j += 1
    }
    val nLow = lowToks.length
    val stopRatio =
      if (nLow > 0) hits.toDouble / nLow.toDouble else 0.0

    // qualityScore's exact arithmetic, left-associated
    val lengthScore = math.min(nRaw.toDouble / 20.0, 1.0)
    val stopScore = math.min(stopRatio * 5.0, 1.0)
    val quality = math.max(0.0, math.min(1.0,
      lengthScore * 0.4 + stopScore * 0.4 + (1.0 - punct) * 0.2))

    new GenericInternalRow(Array[Any](nRaw, stopRatio, punct, quality))
  }
}

/** Native Gopher rule statistics: tokens of the LOWERED text (Spark
  * lower → trim → `\\s+` split, empty tokens counted like the
  * composable `size`), per-token code-point lengths, stopword hits,
  * contains-[a-z] hits, raw-text code points and symbol count
  * (complement of `[A-Za-z0-9\\s]`). Exact parity with the composable
  * `aggregate`/`filter`/`rlike`/`regexp_replace` battery is pinned by
  * TextStatsSpec.
  */
case class GopherStatsExpr(child: Expression, stopwords: Seq[String])
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"gopher_stats needs string, got $t")
  }
  override def dataType: DataType = GopherStatsExpr.schema
  override def prettyName: String = "gopher_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    GopherStatsExpr.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.GopherStatsExpr.compute($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherStatsExpr =
    copy(child = newChild)
}

object GopherStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_word_chars", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_sym", LongType, nullable = false)))

  private val TokSplit = java.util.regex.Pattern.compile("\\s+")

  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  def compute(t: org.apache.spark.unsafe.types.UTF8String,
              stop: java.util.HashSet[String]): InternalRow = {
    val raw = t.toString

    // raw-text char counts: total code points and symbol complement of
    // [A-Za-z0-9\s] (Java-regex \s = [ \t\n\x0B\f\r])
    var nChars = 0L
    var keptSym = 0L
    var i = 0
    while (i < raw.length) {
      val c = raw.codePointAt(i)
      nChars += 1
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == 0x20 || c == 0x09 || c == 0x0A ||
        c == 0x0B || c == 0x0C || c == 0x0D) keptSym += 1
      i += Character.charCount(c)
    }

    val toks = TokSplit.split(trimSpaces(t.toLowerCase.toString), -1)
    var nWordChars = 0L
    var nStop = 0L
    var nAlpha = 0L
    var j = 0
    while (j < toks.length) {
      val w = toks(j)
      nWordChars += w.codePointCount(0, w.length)
      if (stop.contains(w)) nStop += 1
      // rlike("[a-z]"): unanchored find of any ASCII lowercase letter
      var k = 0
      var found = false
      while (!found && k < w.length) {
        val ch = w.charAt(k)
        if (ch >= 'a' && ch <= 'z') found = true
        k += 1
      }
      if (found) nAlpha += 1
      j += 1
    }

    new GenericInternalRow(Array[Any](
      toks.length.toLong, nWordChars, nStop, nAlpha, nChars, nChars - keptSym))
  }
}
