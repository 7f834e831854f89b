package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Windows

/** Distributed model-evaluation metrics.
  *
  * AUC is the curation-pipeline metric: every quality classifier
  * (fastText-style, LogReg here) is judged by ranking quality before
  * its threshold is picked. The textbook formulation — rank all N rows,
  * sum positive ranks — plans as a single-partition global window. This
  * form aggregates BY SCORE first (one hash-agg), then runs the
  * distributed two-phase prefix sum over the per-score frame, so no
  * single task ever owns the full order.
  *
  * All arithmetic is integer (counts and doubled rank sums) until the
  * final division: the Mann-Whitney U with midrank tie handling is
  *   AUC = Σ_s pos(s) · (2·negBelow(s) + neg(s)) / (2 · P · N)
  * — exactly the average-rank formula, but order-independent and
  * engine-reproducible (same ppm discipline as QualityRules/Graph).
  */
object Eval {

  /** Exact ROC AUC of `scoreCol` against boolean `labelCol`.
    * Returns one row: (n_pos, n_neg, auc_num2, auc) where
    * auc = auc_num2 / (2·n_pos·n_neg) and auc_num2 is the exact integer
    * numerator — ties get midrank credit (1/2 per tied neg).
    * NULL labels and NULL scores are excluded (LogReg null-label
    * discipline, cf. ADVICE r4).
    */
  def aucExact(df: DataFrame, scoreCol: Column, labelCol: Column,
               roundTo: Int = 6): DataFrame = {
    val base = df.select(scoreCol.as("__score"), labelCol.as("__label"))
      .where(col("__score").isNotNull && col("__label").isNotNull)
    val perScore = base.groupBy(col("__score"))
      .agg(sum(when(col("__label"), 1L).otherwise(0L)).as("__np"),
        sum(when(col("__label"), 0L).otherwise(1L)).as("__nn"))
    // inclusive prefix sum of negatives in score order, distributed
    val cum = Windows.globalRunningSum(perScore, "__score", "__nn", "__cum_nn")
    cum.agg(
        sum(col("__np")).as("n_pos"),
        sum(col("__nn")).as("n_neg"),
        sum(col("__np") * (lit(2L) * (col("__cum_nn") - col("__nn")) + col("__nn")))
          .as("auc_num2"))
      .select(col("n_pos"), col("n_neg"), col("auc_num2"),
        graft.ops.Numeric.roundAway(
          col("auc_num2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), roundTo).as("auc"))
  }

  /** Calibration / reliability table: bucket an integer-ppm score into
    * `buckets` equal bins and report, per bin, the count, the mean
    * score, and the observed positive rate — the reliability diagram
    * behind "is this quality score a probability?" threshold choices.
    * A perfectly calibrated scorer has mean_score_ppm ≈ pos_rate_ppm in
    * every row.
    *
    * Takes the score in ppm (0..1e6) so binning and both means are
    * EXACT integer arithmetic end to end (the same discipline as the
    * metrics it usually consumes: q87's LM score, QualityRules ppm).
    * NULL scores/labels are excluded. One partial-agg shuffle bounded
    * by `buckets`.
    */
  def calibration(df: DataFrame, scorePpmCol: Column, labelCol: Column,
                  buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val base = df.select(scorePpmCol.cast("long").as("__s"),
        labelCol.as("__label"))
      .where(col("__s").isNotNull && col("__label").isNotNull)
    base
      .select(
        least(expr(s"__s * $buckets div 1000000"), lit(buckets - 1L))
          .as("bucket"),
        col("__s"), col("__label"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__label"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("__s")).as("__sum_s"))
      .select(col("bucket"), col("n"), col("n_pos"),
        expr("__sum_s div n").as("mean_score_ppm"),
        expr("n_pos * 1000000 div n").as("pos_rate_ppm"))
  }

  /** Precision/recall curve points at fixed ppm thresholds — the
    * threshold-picking table that follows AUC (ranking quality) and
    * calibration (probability quality): at each threshold t, predict
    * positive iff score ≥ t, report the exact confusion counts and
    * integer-ppm precision/recall. One pass: counts are conditional
    * sums per threshold over a broadcast threshold list (thresholds ×
    * rows is a projection, not a join explosion — the aggregation
    * reduces it behind a partial-agg pair bounded by #thresholds).
    */
  def prCurve(df: DataFrame, scorePpmCol: Column, labelCol: Column,
              thresholdsPpm: Seq[Long]): DataFrame = {
    require(thresholdsPpm.nonEmpty, "prCurve needs thresholds")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(scorePpmCol.cast("long").as("__s"),
        labelCol.as("__label"))
      .where(col("__s").isNotNull && col("__label").isNotNull)
    val th = broadcast(thresholdsPpm.toDF("threshold_ppm"))
    base.crossJoin(th)
      .groupBy(col("threshold_ppm"))
      .agg(
        sum(when(col("__s") >= col("threshold_ppm") && col("__label"), 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("__s") >= col("threshold_ppm") && !col("__label"), 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("__s") < col("threshold_ppm") && col("__label"), 1L)
          .otherwise(0L)).as("fn"))
      .select(col("threshold_ppm"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") === 0L, lit(null))
          .otherwise(expr("tp * 1000000 div (tp + fp)")).as("precision_ppm"),
        when(col("tp") + col("fn") === 0L, lit(null))
          .otherwise(expr("tp * 1000000 div (tp + fn)")).as("recall_ppm"))
  }

  /** Cohen's kappa between two boolean labelers — chance-corrected
    * agreement, the standard QA gate on weak/crowd label pipelines
    * (raw agreement flatters labelers that both say "yes" to
    * everything):
    *
    *   κ = (p_o − p_e) / (1 − p_e),  p_e = p_a⁺·p_b⁺ + p_a⁻·p_b⁻
    *
    * One aggregation produces the full 2×2 contingency; the float
    * division happens once at the end over exact integer counts
    * (rounded with the oracle-parity policy). Rows where either label
    * is NULL are excluded. Returns one row:
    * (n, n_both_pos, n_both_neg, n_only_a, n_only_b, po_ppm, kappa).
    */
  def cohenKappa(df: DataFrame, labelA: Column, labelB: Column,
                 roundTo: Int = 6): DataFrame = {
    val base = df.select(labelA.as("__a"), labelB.as("__b"))
      .where(col("__a").isNotNull && col("__b").isNotNull)
    base.agg(
        count(lit(1)).as("n"),
        sum(when(col("__a") && col("__b"), 1L).otherwise(0L)).as("n_both_pos"),
        sum(when(!col("__a") && !col("__b"), 1L).otherwise(0L)).as("n_both_neg"),
        sum(when(col("__a") && !col("__b"), 1L).otherwise(0L)).as("n_only_a"),
        sum(when(!col("__a") && col("__b"), 1L).otherwise(0L)).as("n_only_b"))
      .select(col("n"), col("n_both_pos"), col("n_both_neg"),
        col("n_only_a"), col("n_only_b"),
        expr("(n_both_pos + n_both_neg) * 1000000 div n").as("po_ppm"),
        graft.ops.Numeric.roundAway({
          val n = col("n").cast("double")
          val po = (col("n_both_pos") + col("n_both_neg")).cast("double") / n
          val paPos = (col("n_both_pos") + col("n_only_a")).cast("double") / n
          val pbPos = (col("n_both_pos") + col("n_only_b")).cast("double") / n
          val pe = paPos * pbPos + (lit(1.0) - paPos) * (lit(1.0) - pbPos)
          (po - pe) / (lit(1.0) - pe)
        }, roundTo).as("kappa"))
  }

  /** NDCG@k per query group — the ranked-retrieval quality metric
    * (Järvelin & Kekäläinen 2002) behind retriever / hard-negative
    * evaluation, complementing the set-level [[aucExact]] /
    * [[prCurve]]:
    *
    *   DCG@k  = Σ_{p ≤ k} (2^rel(p) − 1) / log2(p + 1)   (system order)
    *   IDCG@k = the same sum under the ideal (rel-descending) order
    *   NDCG@k = DCG@k / IDCG@k  (0 when IDCG is 0 — an all-irrelevant
    *            group has no ideal to normalize against)
    *
    * Both orders break ties by ascending id, so the ranking — and the
    * float result — is a pure function of the data. Float discipline
    * (the [[graft.ops.TextAnalysis.bm25]] trick): each group's ≤ k
    * discounted gains are folded IN POSITION ORDER via a sorted-array
    * aggregate, and log2 is computed as ln(x)/ln(2) — both choices so
    * an external engine replays the doubles bit-exactly. Rows with a
    * NULL id, score, or relevance are excluded. Caller contract for
    * that purity: ids must be UNIQUE within a query group (two rows
    * with the same id AND score but different relevance would make the
    * tie order — and the floats — partitioning-dependent). Relevance
    * may be graded and fractional; it is cast to double, not truncated.
    *
    * Scale shape: one hash exchange on the query key feeds both
    * row_number windows (the second ranking re-sorts the same
    * partitions, no second exchange); everything past the windows
    * carries at most k tiny structs per query. k is the only
    * per-group state — a query with a million candidates still folds
    * ten terms.
    */
  def ndcgAtK(df: DataFrame, queryCol: Column, idCol: Column,
              scoreCol: Column, relCol: Column, k: Int,
              roundTo: Int = 6): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(queryCol.as("query_id"), idCol.as("__id"),
        scoreCol.as("__score"), relCol.cast("double").as("__rel"))
      .where(col("__id").isNotNull && col("__score").isNotNull &&
        col("__rel").isNotNull)
    val byScore = Window.partitionBy(col("query_id"))
      .orderBy(col("__score").desc, col("__id").asc)
    val byRel = Window.partitionBy(col("query_id"))
      .orderBy(col("__rel").desc, col("__id").asc)
    val gain = pow(lit(2.0), col("__rel")) - lit(1.0)
    def disc(p: Column) = log(p.cast("double") + lit(1.0)) / log(lit(2.0))
    def tagged(p: Column) =
      when(p <= k, struct(p.as("p"), (gain / disc(p)).as("c")))
    val contribs = base
      .withColumn("__pos", row_number().over(byScore))
      .withColumn("__ipos", row_number().over(byRel))
      .select(col("query_id"),
        tagged(col("__pos")).as("__dc"), tagged(col("__ipos")).as("__ic"))
    def fold(c: Column) = aggregate(array_sort(collect_list(c)),
      lit(0.0), (acc, x) => acc + x("c"))
    contribs.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_docs"),
        fold(col("__dc")).as("__dcg"), fold(col("__ic")).as("__idcg"))
      .select(col("query_id"), col("n_docs"),
        graft.ops.Numeric.roundAway(col("__dcg"), roundTo).as("dcg"),
        graft.ops.Numeric.roundAway(col("__idcg"), roundTo).as("idcg"),
        graft.ops.Numeric.roundAway(
          when(col("__idcg") > 0, col("__dcg") / col("__idcg"))
            .otherwise(lit(0.0)), roundTo).as("ndcg"))
  }

}
