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

  /** Cosine similarity of two equal-length numeric arrays. Native
    * expression (graft.expressions.CosineSimExpr): one compiled loop per
    * row with sequential accumulation — deterministic and ~100× less
    * per-element overhead than the interpreted
    * `aggregate(zip_with(...))` formulation.
    */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorExprs.cosineSim(a, b)

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

  /** Random-hyperplane LSH signature: `bits` sign bits of projections
    * against deterministic XXH64-derived planes, packed into one long.
    * Vectors in the same bucket are ANN candidates. Native expression —
    * one compiled bits×dims loop per row.
    */
  def lshSignature(vec: Column, bits: Int): Column =
    graft.expressions.VectorExprs.lshSignBits(vec, bits)

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

  /** IVF (inverted-file) ANN — the other standard scale path. Coarse
    * quantizer: `nCentroids` vectors chosen deterministically from the
    * corpus by id hash (k-means would sharpen cells; selection is
    * pluggable). Every vector is assigned to its nearest centroid (one
    * broadcast of the small centroid table — the corpus never
    * shuffles); queries probe their `nProbe` nearest cells, so each
    * query compares against ~corpus·nProbe/nCentroids vectors instead
    * of all of them.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, nCentroids: Int, nProbe: Int, k: Int): DataFrame = {
    val c = corpus.select(col(idCol), toDoubleVec(col(vecCol)).as("__v"))
    // deterministic coarse quantizer: the nCentroids corpus vectors with
    // the smallest xxhash64(id) (stable pseudo-random sample)
    val centroids = broadcast(
      c.withColumn("__h", xxhash64(col(idCol)))
        .orderBy(col("__h")).limit(nCentroids)
        .select(col(idCol).as("centroid_id"), col("__v").as("__cv")))
    // assign: nearest centroid per corpus vector
    val assigned = c.join(centroids)
      .withColumn("__sim", cosine(col("__v"), col("__cv")))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("__sim").desc, col("centroid_id"))))
      .where(col("__r") === 1)
      .select(col("centroid_id"), col(idCol).as("neighbor_id"), col("__v").as("__nv"))
    // probe: each query scans its nProbe nearest cells
    val q = queries.select(col(idCol).as("query_id"), toDoubleVec(col(vecCol)).as("__qv"))
    val probes = q.join(centroids)
      .withColumn("__sim", cosine(col("__qv"), col("__cv")))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("__sim").desc, col("centroid_id"))))
      .where(col("__r") <= nProbe)
      .select(col("query_id"), col("__qv"), col("centroid_id"))
    val scored = probes.join(assigned, Seq("centroid_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__nv")).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
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
