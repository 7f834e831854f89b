package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Distributed inverted-index construction with champion lists — the
  * retrieval-side counterpart of the BM25 scorer ([[TextAnalysis.bm25]]):
  * per term, document frequency, collection frequency, and the top-k
  * postings by term frequency ("champion lists" / impact-ordered index
  * pruning, Manning et al., IIR §7.1.3) serialized in rank order.
  *
  * Scale shape: ONE corpus scan. The term-frequency table shuffles once
  * keyed by (term, doc) behind a partial-agg pair, then a single
  * term-keyed aggregation computes df, cf, AND the champion list
  * together via a bounded-state typed Aggregator (a k-entry selection
  * buffer per term — the [[HeavyHitters.SpaceSaving]] surface on the
  * top-k-selection problem). No window pass, no second tokenize, and
  * stopword-grade terms cost O(postings·k) comparisons with O(k)
  * state — never a corpus-sized sort buffer. Map-side partial
  * aggregation means each upstream partition ships at most one k-entry
  * buffer per term it saw.
  */
object InvertedIndex {

  /** (df, cf, k-bounded champion entries) accumulated per term over
    * (doc, tf) inputs. Selection order: tf desc, doc asc.
    */
  final case class ChampionBuf(var df: Long, var cf: Long,
                               entries: ArrayBuffer[(Long, Long)])

  final class ChampionAgg(k: Int)
    extends Aggregator[(Long, Long), ChampionBuf, (Long, Long, String)] {

    override def zero: ChampionBuf = ChampionBuf(0L, 0L, ArrayBuffer.empty)

    /** True when posting (tfA, docA) ranks ahead of (tfB, docB). */
    private def beats(tfA: Long, docA: Long, tfB: Long, docB: Long): Boolean =
      tfA > tfB || (tfA == tfB && docA < docB)

    private def offer(b: ChampionBuf, doc: Long, tf: Long): Unit =
      if (b.entries.length < k) b.entries += ((doc, tf))
      else {
        // linear scan for the current worst: k is small, and O(k) with
        // zero allocation beats heap churn at these sizes
        var worst = 0
        var i = 1
        while (i < b.entries.length) {
          val (wd, wt) = b.entries(worst)
          val (cd, ct) = b.entries(i)
          if (beats(wt, wd, ct, cd)) worst = i
          i += 1
        }
        val (wd, wt) = b.entries(worst)
        if (beats(tf, doc, wt, wd)) b.entries(worst) = ((doc, tf))
      }

    override def reduce(b: ChampionBuf, in: (Long, Long)): ChampionBuf = {
      b.df += 1
      b.cf += in._2
      offer(b, in._1, in._2)
      b
    }

    override def merge(a: ChampionBuf, b: ChampionBuf): ChampionBuf = {
      a.df += b.df
      a.cf += b.cf
      b.entries.foreach { case (doc, tf) => offer(a, doc, tf) }
      a
    }

    override def finish(b: ChampionBuf): (Long, Long, String) = {
      val ordered = b.entries.sortWith { case ((da, ta), (db, tb)) =>
        beats(ta, da, tb, db)
      }
      (b.df, b.cf, ordered.map { case (d, t) => s"$d:$t" }.mkString(","))
    }

    override def bufferEncoder: Encoder[ChampionBuf] = Encoders.kryo[ChampionBuf]
    override def outputEncoder: Encoder[(Long, Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING)
  }

  /** Champion-list index over whitespace tokens of `textCol` (lowercased,
    * empty tokens dropped): one row per term with `df`, `cf`, and
    * `postings` = "doc:tf,doc:tf,…" ordered by (tf desc, doc asc),
    * capped at `k` entries. Terms with df < `minDf` are dropped.
    */
  def champion(df: DataFrame, textCol: Column, idCol: Column,
               k: Int, minDf: Long = 1L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tf = df
      .select(idCol.as("__doc"),
        explode(TextAnalysis.tokens(lower(textCol))).as("__t"))
      .where(length(col("__t")) > 0)
      .groupBy(col("__t"), col("__doc"))
      .agg(count(lit(1)).as("__tf"))
    val champ = udaf(new ChampionAgg(k))
    tf.groupBy(col("__t"))
      .agg(champ(col("__doc"), col("__tf")).as("__c"))
      .select(col("__t").as("term"),
        col("__c._1").as("df"), col("__c._2").as("cf"),
        col("__c._3").as("postings"))
      .where(col("df") >= minDf)
  }
  /** Exact positional phrase search: documents containing `phrase` as
    * CONSECUTIVE whitespace tokens, with occurrence count and first
    * position. Implemented index-free as windowed adjacency — one scan
    * plus one keyed shuffle (the per-document position window): the
    * token stream is the positional index, read in place. An
    * index-backed deployment intersects positional postings of the
    * phrase's rarest terms instead (same answers; pays off when the
    * corpus is static and queries are many) — this operator is the
    * one-pass form a curation run wants, linear in corpus tokens and
    * independent of phrase frequency.
    */
  def phraseSearch(df: DataFrame, textCol: String, idCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: empty phrase")
    val toks = df.select(col(idCol),
      posexplode(split(trim(lower(col(textCol))), "\\s+"))
        .as(Seq("pos", "w")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    val window = (1 until phrase.length).foldLeft(col("w")) { (acc, i) =>
      concat(acc, lit(" "), lead(col("w"), i).over(win))
    }
    toks.withColumn("__win", window)
      .where(col("__win") === phrase.mkString(" "))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_occurrences"),
        min(col("pos")).as("first_pos"))
  }
}
