package graft.model

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Distributed logistic regression over hashed bag-of-words features —
  * the fastText-style quality classifier used to filter web corpora
  * (weak labels in, per-document quality score out).
  *
  * Scale shape (parameter-server-in-miniature): the MODEL is tiny (a
  * dim+1 double vector on the driver) while the DATA never leaves the
  * executors. The sparse (doc, bucket, x) rows are pivoted ONCE into a
  * doc-array frame — one row per doc with sorted bucket/x arrays — and
  * checkpointed; each gradient-descent iteration is then a single job:
  * the margin w·x is computed map-side against the plan-shipped weight
  * array (no per-doc shuffle), and the only exchange carries the
  * partially-aggregated per-bucket gradient (≤ dim+1 rows per
  * partition, ≤ dim+1 rows collected). At 100 TB the pivoted training
  * frame is the only big thing, and it is touched exactly `iters`
  * times, always as a scan + tiny agg — no driver-side row iteration.
  *
  * The bias is feature bucket `dim` (constant x=1 per doc), so one
  * aggregation computes every gradient component including the
  * intercept's.
  */
object LogReg {

  final case class Model(weights: Array[Double], dim: Int) {
    def bias: Double = weights(dim)
  }

  /** Sparse hashed features from whitespace tokens: one row per
    * (id, bucket) with x = tokenCount/docTokens (L1-normalized so long
    * docs don't dominate), plus the bias row (bucket=dim, x=1).
    */
  def hashedFeatures(df: DataFrame, textCol: String, idCol: String,
                     dim: Int): DataFrame = {
    val toks = df.select(col(idCol),
      explode(graft.ops.TextAnalysis.tokens(lower(col(textCol)))).as("__t"))
    val counts = toks
      .withColumn("bucket", pmod(xxhash64(col("__t")), lit(dim.toLong)).cast("int"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("__c"))
    val norms = counts.groupBy(col(idCol)).agg(sum(col("__c")).as("__n"))
    counts.join(norms, Seq(idCol))
      .select(col(idCol), col("bucket"),
        (col("__c").cast("double") / col("__n").cast("double")).as("x"))
      .unionByName(df.select(col(idCol), lit(dim).as("bucket"), lit(1.0).as("x")))
  }

  /** Pivot sparse (id, bucket, x) rows to one row per doc with sorted
    * parallel arrays — buckets are unique per doc, so the sort makes
    * every downstream float sum order-deterministic.
    */
  private def docFeatures(features: DataFrame, idCol: String): DataFrame =
    features.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("bucket"), col("x")))).as("__bx"))
      .select(col(idCol),
        col("__bx.bucket").as("__b"), col("__bx.x").as("__x"))

  /** Map-side margin w·x over the doc arrays: the weight vector rides in
    * the plan as an array literal, so no join and no shuffle.
    */
  private def marginCol(w: Array[Double]): Column = {
    // typedlit (ArrayType Literal), NOT array(lit...): a array-typed
    // Literal rides in the codegen reference table, so every iteration's
    // plan compiles to the SAME generated source and the codegen cache
    // hits — array(lit...) would inline 129 values and force a fresh
    // compile per GD step
    val wLit = typedlit(w.toIndexedSeq)
    aggregate(
      zip_with(col("__b"), col("__x"),
        (b, x) => x * element_at(wLit, b + 1)),
      lit(0.0), (acc, v) => acc + v)
  }

  /** GD loop over a pivoted-and-materialized doc frame with a __y label
    * column (no nulls). One job per iteration: map-side margin/residual,
    * explode to (bucket, g·x), partial-agg per bucket, collect ≤ dim+1
    * rows.
    */
  private def trainDocs(f: DataFrame, dim: Int, iters: Int, lr: Double,
                        l2: Double, nDocs: Double): Model = {
    val w = Array.fill(dim + 1)(0.0)
    for (_ <- 0 until iters) {
      // per-doc residual g = sigmoid(w·x) − y, then per-bucket gradient
      // sum over docs of g·x — partial aggregation collapses the explode
      // before the exchange, so the shuffle carries ≤ dim+1 rows/partition
      val g = (lit(1.0) / (lit(1.0) + exp(-marginCol(w))) - col("__y")).as("__g")
      val grads = f.select(col("__b"), col("__x"), g)
        .select(explode(zip_with(col("__b"), col("__x"),
          (b, x) => struct(b.as("bucket"), (x * col("__g")).as("gx")))).as("__e"))
        .groupBy(col("__e.bucket").as("bucket"))
        .agg(sum(col("__e.gx")).as("__gw"))
        .collect()
      grads.foreach { r =>
        val i = r.getInt(0)
        val reg = if (i == dim) 0.0 else l2 * w(i)
        w(i) -= lr * (r.getDouble(1) / nDocs + reg)
      }
    }
    Model(w, dim)
  }

  /** Batch gradient descent with L2 (not on the bias). `labels` is
    * (idCol, y) with y in {0,1}; NULL labels are dropped (an unlabeled
    * doc must neither poison a bucket's gradient with null sums nor
    * inflate nDocs and silently shrink the learning rate).
    * Deterministic given the data: zero init, fixed step count, sorted
    * per-doc arrays — no sampling, no shuffling-order dependence beyond
    * cross-doc float-sum rounding.
    */
  def train(features: DataFrame, labels: DataFrame, idCol: String, dim: Int,
            iters: Int = 12, lr: Double = 5.0, l2: Double = 1e-4): Model = {
    val lab = labels.where(col("y").isNotNull)
      .select(col(idCol), col("y").cast("double").as("__y"))
    // one materialized doc-array frame feeds every iteration — at
    // cluster scale this is the cached/checkpointed training set
    val f = docFeatures(features, idCol).join(lab, Seq(idCol))
      .localCheckpoint(false)
    val nDocs = math.max(f.count(), 1L).toDouble
    trainDocs(f, dim, iters, lr, l2, nDocs)
  }

  /** Score feature rows with a trained model: (idCol, score) with
    * score = sigmoid(w·x) ∈ (0,1). Map-side dot product over the doc
    * arrays — the one groupBy is the pivot itself.
    */
  def score(features: DataFrame, model: Model, idCol: String): DataFrame =
    scoreDocs(docFeatures(features, idCol), model, idCol)

  private def scoreDocs(f: DataFrame, model: Model, idCol: String): DataFrame =
    f.select(col(idCol),
      (lit(1.0) / (lit(1.0) + exp(-marginCol(model.weights)))).as("score"))

  /** End-to-end convenience: train on weak labels (NULL labels excluded
    * from training), score every doc. Pivots once; the checkpointed
    * doc-array frame feeds all `iters` gradient jobs and the final
    * scoring pass.
    */
  def trainScore(df: DataFrame, textCol: String, idCol: String,
                 label: Column, dim: Int = 128, iters: Int = 12,
                 lr: Double = 5.0): DataFrame = {
    val labels = df.select(col(idCol), label.cast("int").cast("double").as("__y"))
    val f = docFeatures(hashedFeatures(df, textCol, idCol, dim), idCol)
      .join(labels, Seq(idCol), "left")
      .localCheckpoint(false) // feeds every GD iteration + final scoring
    val train = f.where(col("__y").isNotNull)
    val nDocs = math.max(train.count(), 1L).toDouble
    val model = trainDocs(train, dim, iters, lr, l2 = 1e-4, nDocs = nDocs)
    scoreDocs(f, model, idCol)
  }
}
