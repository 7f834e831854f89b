package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WebTextSpec extends SparkSpec {

  private def one(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(WebText.htmlToText(col("h")).as("t"))
      .head().getString(0)
  }

  test("htmlToText strips tags, keeps content") {
    assert(one("<p>Hello <b>world</b></p>") == "Hello world")
  }

  test("htmlToText drops script/style/nav/footer bodies entirely") {
    val h = "<style>p{color:red}</style><script>var x='<p>hi</p>';" +
      "</script><nav>menu</nav><p>real</p><footer>legal</footer>"
    assert(one(h) == "real")
  }

  test("htmlToText is case-insensitive on boilerplate tags") {
    assert(one("<SCRIPT>x</SCRIPT><P>kept</P><Footer>no</fOOTER>") == "kept")
  }

  test("htmlToText drops comments including tag-shaped payloads") {
    assert(one("<!-- <p>ghost</p> -->body") == "body")
  }

  test("htmlToText decodes entities, amp last (no double decode)") {
    assert(one("a &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;x &amp;lt;") ==
      "a <tag> \"q\" 's' x &lt;")
  }

  test("htmlToText collapses whitespace across removed blocks") {
    assert(one("<div>a</div>\n\n<div>b</div>\t c") == "a b c")
  }

  test("sentenceSplit segments on terminator runs, keeps fragment") {
    import spark.implicits._
    val out = Seq("Hi there. How are you?? Fine... frag")
      .toDF("t").select(WebText.sentenceSplit(col("t")).as("s"))
      .head().getSeq[String](0)
    assert(out == Seq("Hi there.", "How are you??", "Fine...", "frag"))
  }

  test("sentenceSplit drops whitespace-only segments, handles empty") {
    import spark.implicits._
    val out = Seq("A.   ", "", "   ").toDF("t")
      .select(WebText.sentenceSplit(col("t")).as("s"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(out == Seq(Seq("A."), Seq.empty, Seq.empty))
  }

  test("mojibake count / non-ascii count / ascii ratio") {
    import spark.implicits._
    val damaged = "cafÃ© said â€™ twice" +
      " Ã©�"
    val row = Seq(damaged).toDF("t").select(
      WebText.mojibakeCount(col("t")).as("m"),
      WebText.nonAsciiCount(col("t")).as("n"),
      WebText.asciiRatio(col("t")).as("r")).head()
    // markers: 2x e-acute digraph, 1x quote trigraph, 1x replacement
    assert(row.getLong(0) == 4L)
    // non-ascii chars: 2 + 2 + 3 + 1 = 8
    assert(row.getLong(1) == 8L)
    val len = damaged.length
    assert(math.abs(row.getDouble(2) - (len - 8).toDouble / len) < 1e-12)
  }

  test("clean ascii text scores zero damage, ratio 1; empty ratio 1") {
    import spark.implicits._
    val rows = Seq("plain text.", "").toDF("t").select(
      WebText.mojibakeCount(col("t")).as("m"),
      WebText.asciiRatio(col("t")).as("r")).collect()
    assert(rows.forall(_.getLong(0) == 0L))
    assert(rows.forall(_.getDouble(1) == 1.0))
  }
  test("sentenceDedup: first occurrence wins, docs reassemble in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Alpha beta. Accept cookies. Gamma!"),
      (2L, "Accept cookies. Delta epsilon. Accept cookies."),
      (3L, "Delta epsilon. Zeta")).toDF("doc_id", "text")
    val out = WebText.sentenceDedup(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc 1: all three sentences first occurrences
    assert(out(1L) == (3L, 3L, m("Alpha beta. Accept cookies. Gamma!")))
    // doc 2: banner seen in doc 1; in-doc repeat also dropped
    assert(out(2L) == (3L, 1L, m("Delta epsilon.")))
    // doc 3: "Delta epsilon." taken by doc 2; fragment kept
    assert(out(3L) == (2L, 1L, m("Zeta")))
  }

  test("sentenceDedupText: clean is the pre-digest text (md5 agrees with " +
    "sentenceDedup) and carryCols ride the aggregation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "srcA", "Alpha beta. Accept cookies. Gamma!"),
      (2L, "srcB", "Accept cookies. Delta epsilon. Accept cookies."),
      (3L, "srcA", "Delta epsilon. Zeta")).toDF("doc_id", "source", "text")
    val out = WebText.sentenceDedupText(docs, "text", "doc_id",
      carryCols = Seq("source"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) == (("srcA", 3L, 3L, "Alpha beta. Accept cookies. Gamma!")))
    assert(out(2L) == (("srcB", 3L, 1L, "Delta epsilon.")))
    assert(out(3L) == (("srcA", 2L, 1L, "Zeta")))
    // a doc whose every sentence is a later copy reassembles to ''
    val all = Seq((1L, "Same line."), (2L, "Same line.")).toDF("doc_id", "text")
    val e = WebText.sentenceDedupText(all, "text", "doc_id")
      .where($"doc_id" === 2L).head()
    assert(e.getLong(2) == 0L && e.getString(3) == "")
  }

  test("sentenceDedup skew: 1e6 copies of one hot sentence collapse " +
    "map-side (no window, partial agg before the shuffle)") {
    import spark.implicits._
    // Every doc opens with the same boilerplate banner. The pre-r13
    // window form (`row_number() OVER (PARTITION BY sentence)`) would
    // route all 10^6 copies of the banner — full text attached —
    // through ONE window partition: an unbounded straggler AQE cannot
    // split (skew handling covers joins, not windows). The aggregate
    // form collapses the copies map-side, so the hot key reaches its
    // reducer as at most numShufflePartitions pre-combined rows.
    val docs = spark.range(1000000L).select(
      (col("id") + 1L).as("doc_id"),
      concat(lit("Accept all cookies. Doc "), col("id"),
        lit(" body.")).as("text"))
    val out = WebText.sentenceDedupText(docs, "text", "doc_id")
    val phys = out.queryExecution.executedPlan.toString
    assert(!phys.contains("Window"), "no window operator anywhere")
    // round-13 finding: the one-pass min(struct(id, idx)) form planned
    // as a keyed SortAggregate sorting the whole occurrence stream per
    // partition; the cascade form must be hash-only
    assert(!"SortAggregate\\(key=\\[[^\\]]".r.findFirstIn(phys).isDefined,
      "first-occurrence decision must stay hash-aggregable (no keyed " +
        "SortAggregate over the occurrence stream)")
    assert(phys.contains("partial_min(sent_idx"),
      "per-(digest, doc) first index must partial-aggregate before its Exchange")
    val agg = out.agg(
      count(lit(1)).as("docs"), sum("n_kept").as("kept"),
      sum(when(col("clean").startsWith("Accept all cookies."), 1L)
        .otherwise(0L)).as("banner_keepers")).head()
    assert(agg.getLong(0) == 1000000L)
    assert(agg.getLong(1) == 1000001L) // each doc's unique body + doc 1's banner
    assert(agg.getLong(2) == 1L)       // exactly the first doc keeps the banner
  }

  test("extractLinks pulls every href value, ignores src and text") {
    import spark.implicits._
    val h = "<a href=\"https://a.example.com/x\">a</a>" +
      "<img src=\"https://img.example.com/i.png\">" +
      "<a href=\"/rel\">b</a><a href=\"mailto:x@y.z\">c</a>"
    val got = Seq(h).toDF("h")
      .select(WebText.extractLinks(col("h")).as("l"))
      .head().getSeq[String](0)
    assert(got == Seq("https://a.example.com/x", "/rel", "mailto:x@y.z"))
  }

  test("nfcNormalize composes decomposed sequences, identity elsewhere") {
    import spark.implicits._
    val dec = "cafe\u0301 A\u030Angstro\u0308m" // e+acute, A+ring, o+umlaut
    val cmp = "caf\u00e9 \u00c5ngstr\u00f6m"    // the precomposed twin
    val rows = Seq(dec, cmp, "plain ascii", "", "\ud83d\ude00 ok")
      .toDF("t")
      .select(WebText.nfcNormalize(col("t")).as("n"), length(col("t")).as("l"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(rows(0)._1 == cmp)
    assert(rows(0)._2 == 16 && rows(0)._1.length == 13) // 3 marks folded
    assert(rows(1)._1 == cmp)            // precomposed: identity
    assert(rows(2)._1 == "plain ascii")  // ASCII fast path
    assert(rows(3)._1 == "")
    assert(rows(4)._1 == "\ud83d\ude00 ok") // supplementary untouched
    val nul = Seq[Option[String]](None).toDF("t")
      .select(WebText.nfcNormalize(col("t"))).head()
    assert(nul.isNullAt(0))
  }

  test("dehyphenate joins wrapped words, keeps real compounds") {
    import spark.implicits._
    val got = Seq("exam-\nple", "UTF-\nBased", "pre- \n  fix", "a-b")
      .toDF("t").select(WebText.dehyphenate(col("t")).as("d"))
      .collect().map(_.getString(0)).toSeq
    // uppercase continuation = likely compound: hyphen survives
    assert(got == Seq("example", "UTF-\nBased", "prefix", "a-b"))
  }

  test("reflowLines: single breaks to spaces, paragraph runs survive as one") {
    import spark.implicits._
    val got = Seq("a\nb", "a \n  b", "a\n\nb", "a\n\n\n\nb", "a\n \nb")
      .toDF("t").select(WebText.reflowLines(col("t")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("a b", "a b", "a\n\nb", "a\n\nb", "a\n\nb"))
  }

  test("resolveLink: absolute / protocol-relative / root-relative / junk") {
    import spark.implicits._
    val rows = Seq(
      "https://a.example.com/x", "HTTP://b.example.com/Y",
      "//cdn.example.net/z", "/page/1",
      "mailto:x@y.z", "javascript:void(0)", "#frag", "../up")
      .toDF("href")
      .select(WebText.resolveLink(col("href"),
        lit("host.example.org")).as("u"))
      .collect().map(r => Option(r.getString(0)))
    assert(rows.toSeq == Seq(
      Some("https://a.example.com/x"), Some("HTTP://b.example.com/Y"),
      Some("https://cdn.example.net/z"),
      Some("https://host.example.org/page/1"),
      None, None, None, None))
  }
}
