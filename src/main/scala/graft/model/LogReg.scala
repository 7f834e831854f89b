package graft.model

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Distributed logistic regression over hashed bag-of-words features —
  * the fastText-style quality classifier used to filter web corpora
  * (weak labels in, per-document quality score out).
  *
  * Scale shape (parameter-server-in-miniature): the MODEL is tiny (a
  * dim+1 double vector on the driver) while the DATA never leaves the
  * executors. Each gradient-descent iteration is two hash aggregations
  * over the sparse feature rows — (doc, bucket, x) triples — plus a
  * collect of at most dim+1 partial-gradient rows. No per-row UDF: the
  * margin is a broadcast-join dot product and the sigmoid/gradient are
  * codegen'd column arithmetic. At 100 TB the feature frame is the only
  * big thing, and it is touched exactly `iters` times, always as a
  * scan+agg — no driver-side row iteration anywhere.
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

  /** Batch gradient descent with L2 (not on the bias). `labels` is
    * (idCol, y) with y in {0,1}. Deterministic given the data: zero
    * init, fixed step count — no sampling, no shuffling-order
    * dependence beyond float-sum rounding.
    */
  def train(features: DataFrame, labels: DataFrame, idCol: String, dim: Int,
            iters: Int = 12, lr: Double = 5.0, l2: Double = 1e-4): Model = {
    val spark = features.sparkSession
    import spark.implicits._
    // one materialized (doc, bucket, x, y) frame feeds every iteration —
    // at cluster scale this is the cached/checkpointed training set
    val f = features.join(labels, Seq(idCol))
      .select(col(idCol), col("bucket"), col("x"), col("y").cast("double"))
      .localCheckpoint(false)
    val nDocs = math.max(labels.count(), 1L).toDouble
    val w = Array.fill(dim + 1)(0.0)
    for (_ <- 0 until iters) {
      val wDf = broadcast(w.zipWithIndex
        .map { case (wv, i) => (i, wv) }.toSeq.toDF("bucket", "__w"))
      // per-doc residual g = sigmoid(w·x) − y  (bias lives in the dot
      // product via the bucket=dim feature row)
      val resid = f.join(wDf, Seq("bucket"))
        .groupBy(col(idCol))
        .agg(sum(col("x") * col("__w")).as("__m"), first(col("y")).as("__y"))
        .select(col(idCol),
          (lit(1.0) / (lit(1.0) + exp(-col("__m"))) - col("__y")).as("__g"))
      // per-bucket gradient: sum over docs of g·x — ≤ dim+1 rows collect
      val grads = f.join(resid, Seq(idCol))
        .groupBy(col("bucket")).agg(sum(col("__g") * col("x")).as("__gw"))
        .collect()
      grads.foreach { r =>
        val i = r.getInt(0)
        val reg = if (i == dim) 0.0 else l2 * w(i)
        w(i) -= lr * (r.getDouble(1) / nDocs + reg)
      }
    }
    Model(w, dim)
  }

  /** Score feature rows with a trained model: (idCol, score) with
    * score = sigmoid(w·x) ∈ (0,1). Broadcast-join dot product.
    */
  def score(features: DataFrame, model: Model, idCol: String): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    val wDf = broadcast(model.weights.zipWithIndex
      .map { case (wv, i) => (i, wv) }.toSeq.toDF("bucket", "__w"))
    features.join(wDf, Seq("bucket"))
      .groupBy(col(idCol)).agg(sum(col("x") * col("__w")).as("__m"))
      .select(col(idCol), (lit(1.0) / (lit(1.0) + exp(-col("__m")))).as("score"))
  }

  /** End-to-end convenience: train on weak labels, score every doc. */
  def trainScore(df: DataFrame, textCol: String, idCol: String,
                 label: Column, dim: Int = 128, iters: Int = 12,
                 lr: Double = 5.0): DataFrame = {
    val feat = hashedFeatures(df, textCol, idCol, dim)
      .localCheckpoint(false) // feeds every GD iteration + final scoring
    val labels = df.select(col(idCol), label.cast("int").as("y"))
    val model = train(feat, labels, idCol, dim, iters, lr)
    score(feat, model, idCol)
  }
}
