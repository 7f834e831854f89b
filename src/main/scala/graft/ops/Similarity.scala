package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector-similarity operators over embedding columns (Array[Float]).
  *
  * Brute-force top-k is the exact baseline: queries × corpus with a
  * broadcast query side, ranked per query. The scale path is
  * random-hyperplane LSH bucketing: candidates shuffle on bucket keys so
  * the comparison count is corpus/2^bits per query instead of corpus.
  */
object Similarity {

  /** Cosine similarity of two equal-length double arrays. Computed in
    * double (cast upstream) with sequential fold — deterministic.
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, v) => acc + v))
    when(na > 0 && nb > 0, dot / (na * nb)).otherwise(lit(0.0))
  }

  def toDoubleVec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Exact brute-force top-k cosine neighbors of `queries` within
    * `corpus` (self-matches by id excluded). Query side is broadcast —
    * corpus never shuffles; ranking is a per-query window.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      toDoubleVec(col(vecCol)).as("__qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), toDoubleVec(col(vecCol)).as("__cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 mapped to [-1, 1). No RNG state — reproducible anywhere.
    */
  private def planeComponent(plane: Column, dim: Column): Column =
    (xxhash64(plane, dim).cast("double") / lit(Long.MaxValue.toDouble))

  /** Random-hyperplane LSH signature: `bits` sign bits of projections,
    * packed into one long. Vectors in the same bucket are ANN candidates.
    */
  def lshSignature(vec: Column, bits: Int): Column =
    (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x * planeComponent(lit(b), i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Embedding-cosine near-duplicate pairs via LSH buckets: candidate
    * pairs share a hyperplane-sign bucket; exact cosine filters at
    * `threshold`. The dedup-flavored use of the ANN machinery — only
    * (bucket, id, vec) rows shuffle, never the cross product.
    */
  def embeddingNearDups(corpus: DataFrame, idCol: String, vecCol: String,
                        bits: Int, threshold: Double): DataFrame = {
    val sig = corpus.select(col(idCol), toDoubleVec(col(vecCol)).as("__v"))
      .withColumn("__bucket", lshSignature(col("__v"), bits))
    val a = sig.select(col("__bucket"), col(idCol).as("id_a"), col("__v").as("__va"))
    val b = sig.select(col("__bucket"), col(idCol).as("id_b"), col("__v").as("__vb"))
    a.join(b, Seq("__bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("__va"), col("__vb")).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** ANN via LSH buckets: exact cosine within each bucket only.
    * Recall < 1 by construction; `bits` trades recall for speed.
    */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
              bits: Int, k: Int): DataFrame = {
    val sig = corpus.select(col(idCol), toDoubleVec(col(vecCol)).as("__v"))
      .withColumn("__bucket", lshSignature(col("__v"), bits))
    val a = sig.select(col("__bucket"), col(idCol).as("query_id"), col("__v").as("__qv"))
    val b = sig.select(col("__bucket"), col(idCol).as("neighbor_id"), col("__v").as("__cv"))
    val scored = a.join(b, Seq("__bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("__qv"), col("__cv")).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
