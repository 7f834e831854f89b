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

  // native Cast handles array<float>→array<double> inside codegen; the
  // transform(_.cast) form evaluates its lambda interpreted per element
  def toDoubleVec(c: Column): Column = c.cast("array<double>")

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

  /** Hard-negative mining for contrastive/retrieval training: for each
    * query vector, the top-k most-similar corpus vectors with a
    * DIFFERENT label (high-cosine impostors — the negatives that teach
    * a bi-encoder the most). Exact brute-force form, same plan shape as
    * [[bruteForceTopK]]: queries broadcast, corpus scans once, native
    * codegen cosine, per-query top-k window over the broadcast-join
    * output. Swap the corpus side to the LSH/IVF/PQ candidate
    * generators for the approximate scale path.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(labelCol).as("__qlabel"), toDoubleVec(col(vecCol)).as("__qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("__clabel"), toDoubleVec(col(vecCol)).as("__cv"))
    val scored = q.join(c,
        col("query_id") =!= col("neighbor_id") &&
          !(col("__qlabel") <=> col("__clabel")))
      .select(col("query_id"), col("neighbor_id"), col("__clabel").as("neg_label"),
        cosine(col("__qv"), col("__cv")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** k-NN label assignment (semi-supervised label bootstrapping): each
    * query vector takes the MAJORITY label of its k nearest labeled
    * neighbors by cosine (vote ties: smaller label wins). The
    * label-spreading step data pipelines run to grow a seed label set
    * before training a classifier. Exact form — swap the corpus side
    * to LSH/IVF/PQ candidates at scale, as with [[bruteForceTopK]].
    */
  def knnClassify(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, labelCol: String, k: Int): DataFrame = {
    val labeled = corpus.where(col(labelCol).isNotNull)
    val topk = bruteForceTopK(labeled, queries, idCol, vecCol, k)
      .join(labeled.select(col(idCol).as("neighbor_id"),
        col(labelCol).as("__nl")), Seq("neighbor_id"))
    topk.groupBy(col("query_id"), col("__nl"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("votes").desc, col("__nl").asc)))
      .where(col("__r") === 1)
      .select(col("query_id"), col("__nl").as("pred_label"), col("votes"))
  }

  /** Random-hyperplane LSH signature: `bits` sign bits of projections
    * against deterministic XXH64-derived planes, packed into one long.
    * Vectors in the same bucket are ANN candidates. Native expression —
    * one compiled bits×dims loop per row.
    */
  def lshSignature(vec: Column, bits: Int): Column =
    graft.expressions.VectorExprs.lshSignBits(vec, bits)

  /** Oracle-portable hyperplane signature: Rademacher (±1) planes whose
    * signs come from the md5 parity of `hp:bit:dim`, so any md5-capable
    * engine re-derives the SAME planes; the projection is a strict
    * left-fold in index order, so the double sum — and therefore every
    * sign bit — is bit-identical across engines (same IEEE ops in the
    * same order). ±1 components lose nothing vs Gaussian planes for
    * sign-LSH (the projection sign distribution is what matters) and
    * keep the arithmetic EXACT: negation is lossless where a float
    * multiply would round engine-specifically.
    *
    * The plane signs are row-INDEPENDENT: [[graft.expressions.PortableLshSigExpr]]
    * derives them once per (bits, dim) per JVM and runs ONE compiled
    * bits×dim loop per row with the same strict index-order fold. The
    * history of this hot path, worst to best: a lambda formulation
    * (`aggregate(zip_with(...))`) re-hashed every (row × bit × dim)
    * INTERPRETED (the round-11 ×100 board finding); an unrolled
    * ±element_at Column sum was codegen'd but carried bits×dim
    * expression NODES — seconds of janino compilation per plan, paid
    * per self-join side (q41: 3.46 s warm at sf0.1); the native
    * expression is 0.58 s. NULL or shorter-than-`dim` vectors yield a
    * NULL bucket (they drop out of bucket equi-joins, like the native
    * XXH64 family).
    */
  def portableLshSignature(vec: Column, bits: Int, dim: Int): Column = {
    require(dim > 0, s"portable signature needs an explicit dim, got $dim")
    require(bits >= 0, s"bits must be >= 0, got $bits")
    graft.expressions.VectorExprs.portableLshSig(vec, bits, dim)
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets: candidate
    * pairs share a hyperplane-sign bucket; exact cosine filters at
    * `threshold`. The dedup-flavored use of the ANN machinery — only
    * (bucket, id, vec) rows shuffle, never the cross product.
    */
  def embeddingNearDups(corpus: DataFrame, idCol: String, vecCol: String,
                        bits: Int, threshold: Double,
                        portableDim: Int = 0): DataFrame = {
    val sig0 = corpus.select(col(idCol), toDoubleVec(col(vecCol)).as("__v"))
      .withColumn("__bucket",
        if (portableDim > 0) portableLshSignature(col("__v"), bits, portableDim)
        else lshSignature(col("__v"), bits))
    // same measured reasoning as [[lshTopK]]: one snapshot beats two
    // evaluations of the signature loop across the self-join sides
    val sig = if (portableDim > 0) graft.core.Checkpoints.sessionCk(sig0) else sig0
    val a = sig.select(col("__bucket"), col(idCol).as("id_a"), col("__v").as("__va"))
    val b = sig.select(col("__bucket"), col(idCol).as("id_b"), col("__v").as("__vb"))
    a.join(b, Seq("__bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("__va"), col("__vb")).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** Nearest-centroid indices as a pure map-side expression — the
    * centroid matrix rides to executors inside the plan (broadcast
    * semantics). See graft.expressions.NearestCentroidsExpr.
    */
  def nearestCentroids(vec: Column, centroids: Array[Array[Double]], k: Int,
                       l2: Boolean = false): Column =
    graft.expressions.VectorExprs.nearestCentroids(vec, centroids, k, l2)

  /** Lloyd (spherical k-means) refinement of an initial centroid set.
    * Per iteration: assignment is the map-side nearest-centroid
    * expression (no corpus×centroids explode, no shuffle of vectors);
    * the update is one groupBy(cell) with per-dimension codegen'd sums
    * — partial aggregation collapses map-side, so only
    * nCentroids × dim doubles cross the wire; the new (unit-normalized)
    * means round-trip through the driver, the broadcast-scale object
    * k-means inherently iterates on. Cells that go empty keep their
    * previous centroid.
    */
  def trainCentroids(corpus: DataFrame, vecCol: String,
                     init: Array[Array[Double]], iters: Int,
                     normalize: Boolean = true,
                     l2Assign: Boolean = false): Array[Array[Double]] = {
    if (init.isEmpty || iters <= 0) return init
    val dim = init.head.length
    var cents = init
    var it = 0
    while (it < iters) {
      val sums = corpus
        // NULL vectors assign to a NULL cell; dropping them here keeps the
        // driver-side fold from NPE-ing on row.getInt of a null-cell group
        .where(col(vecCol).isNotNull)
        .select(nearestCentroids(col(vecCol), cents, 1, l2Assign).getItem(0).as("__cell"),
          col(vecCol))
        .groupBy(col("__cell"))
        .agg(count(lit(1)).as("__n"),
          (0 until dim).map(d => sum(element_at(col(vecCol), d + 1)).as(s"__s$d")): _*)
        .collect()
      val next = cents.map(_.clone())
      sums.foreach { row =>
        val cell = row.getInt(0)
        val cnt = row.getLong(1).toDouble
        val mean = Array.tabulate(dim)(d => row.getDouble(2 + d) / cnt)
        if (normalize) {
          // spherical k-means (IVF / SemDedup): unit-normalized means
          val norm = math.sqrt(mean.map(x => x * x).sum)
          if (norm > 0) next(cell) = mean.map(_ / norm)
        } else {
          // plain Lloyd (PQ codebooks): subvector norms carry signal,
          // normalizing them would distort the ADC dot products
          next(cell) = mean
        }
      }
      cents = next
      it += 1
    }
    cents
  }

  /** [[trainCentroids]] with DETERMINISTIC fixed-point accumulation —
    * the round-15 primitive that flips the Lloyd update from "parallel
    * float reduction no engine replays" to "order-free long sums the
    * DuckDB oracle re-derives bit-for-bit" ([[FixedPoint]] scaladoc for
    * the argument). Per iteration:
    *
    *   1. every vector element quantizes map-side to a long
    *      (`roundAway(v_d · 1e6)`) and the per-cell per-dim SUM runs in
    *      long arithmetic — associative, so partition order is moot;
    *   2. the driver computes mean_d = (s_d / 1e6) / n — two
    *      correctly-rounded divides on identical inputs everywhere;
    *   3. spherical mode re-quantizes the mean (`roundAway(mean_d·1e7)`)
    *      so the norm Σq² is ALSO exact long arithmetic, then
    *      c_d = q_d / sqrt(Σq²) — one divide + one sqrt, bit-identical
    *      across engines.
    *
    * Plan shape is identical to [[trainCentroids]]: assignment is the
    * map-side nearest-centroid expression, the update is one
    * hash-aggregate moving nCentroids × dim LONGS per partition (half
    * the bytes of the double path). Quantization error per element is
    * ≤ 5e-7 — noise relative to k-means' own convergence tolerance, and
    * the price of a bit-stable, rerun-reproducible index at 100 TB
    * (rebuilding an IVF index on the same corpus yields the same cells,
    * so incremental consumers don't see phantom churn).
    *
    * Saturation: |s_d| ≤ max|v|·1e6·rowsPerCell must stay below 2^63 —
    * at max|v| = 1e3 that is ~9e9 rows per cell; the mean re-quantize
    * bound is checked by [[FixedPoint.normalizeQ]].
    */
  def trainCentroidsFixed(corpus: DataFrame, vecCol: String,
                          init: Array[Array[Double]], iters: Int,
                          normalize: Boolean = true,
                          l2Assign: Boolean = false): Array[Array[Double]] = {
    if (init.isEmpty || iters <= 0) return init
    val dim = init.head.length
    var cents = init
    var it = 0
    while (it < iters) {
      val sums = corpus
        .where(col(vecCol).isNotNull)
        .select(nearestCentroids(col(vecCol), cents, 1, l2Assign).getItem(0).as("__cell"),
          col(vecCol))
        .groupBy(col("__cell"))
        .agg(count(lit(1)).as("__n"),
          (0 until dim).map(d => sum(
            FixedPoint.quantize(element_at(col(vecCol), d + 1), FixedPoint.RowScale))
            .as(s"__s$d")): _*)
        .collect()
      val next = cents.map(_.clone())
      sums.foreach { row =>
        val cell = row.getInt(0)
        val cnt = row.getLong(1).toDouble
        val mean = Array.tabulate(dim)(d =>
          (row.getLong(2 + d).toDouble / FixedPoint.RowScale) / cnt)
        if (normalize) {
          val q = mean.map(FixedPoint.quantizeD(_, FixedPoint.CellScale))
          FixedPoint.normalizeQ(q).foreach(next(cell) = _)
        } else next(cell) = mean
      }
      cents = next
      it += 1
    }
    cents
  }

  /** IVF (inverted-file) ANN — the other standard scale path. Coarse
    * quantizer: `nCentroids` seeded from a deterministic id-hash sample
    * of the corpus, then sharpened with `kmeansIters` Lloyd rounds
    * (spherical k-means — balanced cells keep probe economics honest).
    * Every vector is assigned to its nearest centroid by a map-side
    * native expression over the plan-shipped centroid matrix — the
    * corpus is never exploded against the centroid table and never
    * shuffles for assignment; queries probe their `nProbe` nearest
    * cells, so each query compares against ~corpus·nProbe/nCentroids
    * vectors instead of all of them.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, nCentroids: Int, nProbe: Int, k: Int,
              kmeansIters: Int = 2, portable: Boolean = false,
              fixedIters: Int = 0): DataFrame = {
    val c = corpus.select(col(idCol), toDoubleVec(col(vecCol)).as("__v"))
    // deterministic seed quantizer: the nCentroids corpus vectors with
    // the smallest hash of their id (stable pseudo-random sample).
    // `portable = true` swaps two pieces so the WHOLE query sits under
    // the exact-replay oracle: (a) the sample orders by md5(id) — a
    // hash DuckDB re-derives — instead of xxhash64; (b) the Lloyd
    // rounds either drop (fixedIters = 0, the round-12 q188 shape:
    // per-cell element sums are parallel float reductions with no
    // deterministic accumulation order, the one construct no oracle —
    // and no second run — replays bit-for-bit) or run under
    // [[trainCentroidsFixed]]'s order-free long accumulation
    // (fixedIters > 0, the round-15 q45 shape: the update becomes
    // exact integer sums DuckDB re-derives, so the SHARPENED quantizer
    // sits under the hash oracle too). The float k-means path remains
    // available for parity with conventional engines.
    val init: Array[Array[Double]] =
      (if (portable)
        c.where(col("__v").isNotNull)
          .withColumn("__h", md5(col(idCol).cast("string").cast("binary")))
      else c.withColumn("__h", xxhash64(col(idCol))))
        .orderBy(col("__h")).limit(nCentroids)
        .select(col("__v")).collect()
        .map(_.getSeq[Double](0).toArray)
    val cents =
      if (portable && fixedIters > 0) trainCentroidsFixed(c, "__v", init, fixedIters)
      else if (portable) init
      else trainCentroids(c, "__v", init, kmeansIters)
    // assign: pure projection — cell id per corpus vector, zero joins
    val assigned = c.select(
      nearestCentroids(col("__v"), cents, 1).getItem(0).as("centroid_id"),
      col(idCol).as("neighbor_id"), col("__v").as("__nv"))
    // probe: each query scans its nProbe nearest cells (tiny explode —
    // nProbe rows per query, on the small query side only)
    val q = queries.select(col(idCol).as("query_id"), toDoubleVec(col(vecCol)).as("__qv"))
    val probes = q.select(col("query_id"), col("__qv"),
      explode(nearestCentroids(col("__qv"), cents, nProbe)).as("centroid_id"))
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
              bits: Int, k: Int, portableDim: Int = 0): DataFrame = {
    val sig0 = corpus.select(col(idCol), toDoubleVec(col(vecCol)).as("__v"))
      .withColumn("__bucket",
        if (portableDim > 0) portableLshSignature(col("__v"), bits, portableDim)
        else lshSignature(col("__v"), bits))
    // materialize the signature once for the self-join (measured at ×100:
    // q41 20.3 vs 20.7 s, q43 38.1 vs 45.1 s — recomputing the native
    // loop per side loses to one narrow (id, bucket, vec) snapshot)
    val sig = if (portableDim > 0) graft.core.Checkpoints.sessionCk(sig0) else sig0
    val a = sig.select(col("__bucket"), col(idCol).as("query_id"), col("__v").as("__qv"))
    val b = sig.select(col("__bucket"), col(idCol).as("neighbor_id"), col("__v").as("__cv"))
    val scored = a.join(b, Seq("__bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("__qv"), col("__cv")).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Multi-probe LSH ANN (Lv et al., "Multi-Probe LSH", VLDB 2007):
    * each query searches its home bucket PLUS `probes` single-bit
    * perturbations, flipped in ascending |plane-dot| margin order — the
    * planes the query sits closest to are the likeliest sign disagreements
    * with a true near neighbor. Recall rises toward exhaustive as probes
    * grow WITHOUT more hash tables (the memory-bound alternative) and
    * without corpus-side cost: the corpus still carries one bucket per
    * vector; only the (small) query side fans out ×(probes+1).
    *
    * Portable plane family end-to-end ([[portableLshSignature]] +
    * [[graft.expressions.PortableLshProbesExpr]]), so bucket assignment,
    * margin order, flips, and the exact-cosine rerank all replay in a
    * DuckDB oracle. Probe buckets are distinct by construction (XOR of
    * distinct bits), so no candidate dedup pass is needed.
    *
    * Scale shape: corpus → one native-loop projection to (bucket, id,
    * vec); queries → (probes+1)-row explode; one keyed equi-join on
    * bucket (AQE broadcasts the exploded query side while it fits);
    * per-query top-k window. The corpus never self-joins and never
    * shuffles more than its bucket groups.
    */
  def multiProbeLshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, bits: Int, probes: Int, k: Int,
                        portableDim: Int): DataFrame = {
    val sig = corpus.select(col(idCol).as("neighbor_id"),
        toDoubleVec(col(vecCol)).as("__cv"))
      .withColumn("__bucket",
        portableLshSignature(col("__cv"), bits, portableDim))
      .where(col("__bucket").isNotNull)
    val qs = queries.select(col(idCol).as("query_id"),
        toDoubleVec(col(vecCol)).as("__qv"))
      .withColumn("__probe", explode(
        graft.expressions.VectorExprs.portableLshProbes(
          col("__qv"), bits, portableDim, probes)))
    val scored = qs.join(sig, col("__probe") === col("__bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Product-quantization ANN (Jégou, Douze, Schmid: "Product
    * Quantization for Nearest Neighbor Search", IEEE PAMI 2011 — the
    * faiss fine-quantizer). Split each dim-d vector into `m` subvectors;
    * per subspace, train `ksub` centroids with plain (non-spherical)
    * Lloyd under L2 — subvector magnitudes carry signal for the dot
    * product — seeded from the deterministic id-hash sample like
    * ivfTopK. Each corpus vector compresses to `m` small codes
    * (m bytes-ish vs 4·d for floats — the memory path that makes
    * billion-vector search fit a cluster).
    *
    * ADC (asymmetric distance computation) search: per query, the
    * m×ksub table of partial dot products ⟨q_s, c_sk⟩ is built once
    * driver-side (tiny) and shipped as literal arrays; each corpus row
    * is scored by m array lookups + adds over its codes — no float
    * vector math per row, pure codegen projection, no joins, no
    * explode. Queries must be a small batch (they are collected); the
    * corpus side only ever streams its (id, codes) pairs.
    *
    * Returns (query_id, rank, neighbor_id, sim): approximate cosine
    * (exact iff inputs are unit-norm, as embedding tables
    * conventionally are). Raw ADC quantizes away fine distinctions, so
    * `rerank > k` enables the standard refinement step (faiss
    * IndexRefineFlat): the top-`rerank` ADC shortlist per query — a
    * tiny frame — is broadcast back against the corpus for EXACT cosine
    * on just those candidates, and the final top-k ranks on that. The
    * corpus still never shuffles and is never scored exactly outside
    * the shortlist; recall comes back to near-exact at ~rerank/k × the
    * ADC cost, which is how production PQ deployments run.
    */
  /** Shared per-subspace PQ codebook Lloyd (plain L2, un-normalized —
    * subvector magnitudes carry ADC signal). All m subspaces per
    * iteration in ONE job: assignment is the map-side L2
    * nearest-centroid expression per subspace, the (subspace, cell)
    * explode shuffles only partial sums (m·ksub buffer rows per
    * partition), never the corpus. `fixed = true` runs the update on
    * [[FixedPoint]] long sums (order-free, oracle-replayable — the
    * round-15 primitive); `false` is the conventional float path.
    */
  private def trainBooks(sliced: DataFrame, m: Int, sub: Int,
                         init: Array[Array[Array[Double]]], iters: Int,
                         fixed: Boolean): Array[Array[Array[Double]]] = {
    var books = init
    var it = 0
    while (it < iters) {
      val pairs = sliced.select(explode(array((0 until m).map(s =>
        struct(lit(s).as("s"),
          nearestCentroids(col(s"__s$s"), books(s), 1, l2 = true)
            .getItem(0).as("cell"),
          col(s"__s$s").as("v"))): _*)).as("p"))
        .select(col("p.s"), col("p.cell"), col("p.v"))
      val sums = pairs.groupBy(col("s"), col("cell"))
        .agg(count(lit(1)).as("__n"),
          (0 until sub).map(d =>
            (if (fixed)
              sum(FixedPoint.quantize(element_at(col("v"), d + 1), FixedPoint.RowScale))
            else sum(element_at(col("v"), d + 1))).as(s"__d$d")): _*)
        .collect()
      val next = books.map(_.map(_.clone()))
      sums.foreach { row =>
        val (s, cell) = (row.getInt(0), row.getInt(1))
        val cnt = row.getLong(2).toDouble
        next(s)(cell) =
          if (fixed) Array.tabulate(sub)(d =>
            (row.getLong(3 + d).toDouble / FixedPoint.RowScale) / cnt)
          else Array.tabulate(sub)(d => row.getDouble(3 + d) / cnt)
      }
      books = next
      it += 1
    }
    books
  }

  /** Deterministic codebook seed sample: the `ksub` rows with the
    * smallest id hash — xxhash64 by default, md5 when `portable` (the
    * hash DuckDB re-derives; same swap as ivfTopK's quantizer seed).
    */
  private def seedHash(idCol: String, portable: Boolean): Column =
    if (portable) md5(col(idCol).cast("string").cast("binary"))
    else xxhash64(col(idCol))

  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, m: Int, ksub: Int, k: Int,
             kmeansIters: Int = 3, rerank: Int = 0,
             portable: Boolean = false): DataFrame = {
    val c = corpus.select(col(idCol), toDoubleVec(col(vecCol)).as("__v"))
      .where(col("__v").isNotNull)
    val dim = c.select(size(col("__v"))).limit(1).collect()(0).getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    // slice once, keep for: codebook training + encoding
    val sliced = c.select(
      col(idCol) +: (0 until m).map(s =>
        slice(col("__v"), s * sub + 1, sub).as(s"__s$s")): _*)
      .transform(graft.core.Checkpoints.sessionCk)
    // init: ONE deterministic hash-sample job seeds every subspace (the
    // same ksub corpus rows contribute their s-th subvector to book s)
    val initRows = sliced
      .withColumn("__h", seedHash(idCol, portable))
      .orderBy(col("__h")).limit(ksub)
      .select((0 until m).map(s => col(s"__s$s")): _*)
      .collect()
    val init: Array[Array[Array[Double]]] =
      Array.tabulate(m)(s => initRows.map(_.getSeq[Double](s).toArray))
    val books = trainBooks(sliced, m, sub, init, kmeansIters, fixed = portable)
    val encoded = sliced.select(col(idCol).as("neighbor_id"),
      array((0 until m).map(s =>
        nearestCentroids(col(s"__s$s"), books(s), 1, l2 = true).getItem(0)): _*)
        .as("__codes"))
      .transform(graft.core.Checkpoints.sessionCk) // scanned once by the ADC pass below
    // small-batch contract: queries fit the driver (same as ANN practice)
    val qRows = queries.select(col(idCol), toDoubleVec(col(vecCol)).as("__qv"))
      .collect()
      .map(r => (r.get(0), r.getSeq[Double](1).toArray))
    // per-query LUTs ride as ONE broadcast side — not one plan branch
    // per query (a q-way unionAll recompiles the corpus scan q times):
    // LUT(s)(j) = ⟨q_s, books(s)(j)⟩, m·ksub doubles per query
    val lutRows = qRows.map { case (qid, qv) =>
      val luts = Array.tabulate(m) { s =>
        val qs = qv.slice(s * sub, (s + 1) * sub)
        books(s).map(cent => qs.zip(cent).map { case (a, b) => a * b }.sum)
      }
      (qid, luts)
    }
    val spark0 = corpus.sparkSession
    import spark0.implicits._
    val qlut = lutRows.toSeq
      .map { case (qid, luts) => (qid.toString, luts.map(_.toSeq).toSeq) }
      .toDF("__qid_str", "__luts")
    val adc = (0 until m).map(s =>
      element_at(element_at(col("__luts"), s + 1), col("__codes").getItem(s) + 1))
      .reduce(_ + _)
    val scored = encoded.crossJoin(broadcast(qlut))
      .join(broadcast(queries.select(col(idCol).as("query_id"))
        .withColumn("__qid_str", col("query_id").cast("string"))), Seq("__qid_str"))
      .select(col("query_id"), col("neighbor_id"), adc.as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    val adcRanked = scored.where(col("query_id") =!= col("neighbor_id"))
      .withColumn("rank", row_number().over(w))
    if (rerank <= k) adcRanked.where(col("rank") <= k)
    else {
      // refinement: exact cosine on the tiny ADC shortlist only — the
      // shortlist broadcasts, the corpus side stays a pruned scan
      val short = adcRanked.where(col("rank") <= rerank)
        .select(col("query_id"), col("neighbor_id"))
      val qv = queries.select(col(idCol).as("query_id"),
        toDoubleVec(col(vecCol)).as("__qv"))
      val exact = broadcast(short)
        .join(c.select(col(idCol).as("neighbor_id"), col("__v").as("__cv")),
          Seq("neighbor_id"))
        .join(broadcast(qv), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosine(col("__qv"), col("__cv")).as("sim"))
      exact.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
    }
  }

  /** IVF+PQ composed ANN — the production billion-vector layout (faiss
    * IndexIVFPQ): a coarse quantizer prunes the search to `nProbe` of
    * `nCentroids` cells, and within cells vectors exist only as `m`
    * product-quantization codes over the RESIDUAL v − c(cell) (encoding
    * residuals instead of raw vectors is the faiss default — residual
    * magnitudes are smaller, so the same ksub codes quantize finer).
    * One shared codebook set across cells, trained with plain L2 Lloyd
    * like [[pqTopK]].
    *
    * ADC under inner product decomposes exactly:
    *   ⟨q,v⟩ = ⟨q,c⟩ + ⟨q,r⟩ ≈ ⟨q,c⟩ + Σ_s LUT_s[code_s],
    *   LUT_s[j] = ⟨q_s, book_s(j)⟩
    * so each probed row costs m array lookups + adds; ⟨q,c⟩ is computed
    * once per (query, probed cell) on the driver.
    *
    * Scale shape: the corpus NEVER shuffles — cell assignment is the
    * map-side nearest-centroid expression, the residual comes from a
    * broadcast join against the nCentroids-row cell table, codes are a
    * projection, and probing is a broadcast join of the tiny
    * (query × nProbe) LUT frame against the code table; only
    * (query_id, neighbor_id, sim) candidate rows reach the top-k
    * window's exchange. Queries are a small collected batch — the same
    * documented contract as [[pqTopK]]. `rerank > k` re-scores the ADC
    * shortlist with exact cosine (faiss IndexRefineFlat), restoring
    * near-exact recall while the corpus still only streams.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, nCentroids: Int, nProbe: Int,
                m: Int, ksub: Int, k: Int,
                coarseIters: Int = 2, pqIters: Int = 3,
                rerank: Int = 0, portable: Boolean = false): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCentroids,
      s"nProbe $nProbe out of range 1..$nCentroids")
    val c = corpus.select(col(idCol), toDoubleVec(col(vecCol)).as("__v"))
      .where(col("__v").isNotNull)
    val dim = c.select(size(col("__v"))).limit(1).collect()(0).getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    // coarse quantizer: deterministic id-hash sample + spherical Lloyd
    // (identical seeding to ivfTopK, so cells are comparable); portable
    // swaps md5 seed + fixed-point rounds so the WHOLE index replays
    // under the oracle (ivfTopK scaladoc)
    val init: Array[Array[Double]] = c
      .withColumn("__h", seedHash(idCol, portable))
      .orderBy(col("__h")).limit(nCentroids)
      .select(col("__v")).collect()
      .map(_.getSeq[Double](0).toArray)
    val cents =
      if (portable) trainCentroidsFixed(c, "__v", init, coarseIters)
      else trainCentroids(c, "__v", init, coarseIters)
    // residual per corpus vector: cell from the map-side expression, the
    // centroid array from a broadcast join against the nCentroids-row
    // cell table — the corpus side stays a streaming scan
    val spark0 = corpus.sparkSession
    import spark0.implicits._
    val centDf = broadcast(cents.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("__cell", "__cent"))
    val resid = c
      .withColumn("__cell",
        nearestCentroids(col("__v"), cents, 1).getItem(0))
      .join(centDf, Seq("__cell"))
      .select(col(idCol), col("__cell"),
        zip_with(col("__v"), col("__cent"), (a, b) => a - b).as("__r"))
    val sliced = resid.select(
      col(idCol) +: col("__cell") +: (0 until m).map(s =>
        slice(col("__r"), s * sub + 1, sub).as(s"__s$s")): _*)
      .transform(graft.core.Checkpoints.sessionCk) // feeds codebook training + encoding
    // shared residual codebooks: same one-job-per-iteration Lloyd as
    // pqTopK — only (subspace, cell) partial sums cross the wire
    val initRows = sliced
      .withColumn("__h", seedHash(idCol, portable))
      .orderBy(col("__h")).limit(ksub)
      .select((0 until m).map(s => col(s"__s$s")): _*)
      .collect()
    val bkInit: Array[Array[Array[Double]]] =
      Array.tabulate(m)(s => initRows.map(_.getSeq[Double](s).toArray))
    val books = trainBooks(sliced, m, sub, bkInit, pqIters, fixed = portable)
    val encoded = sliced.select(col(idCol).as("neighbor_id"), col("__cell"),
      array((0 until m).map(s =>
        nearestCentroids(col(s"__s$s"), books(s), 1, l2 = true).getItem(0)): _*)
        .as("__codes"))
      .transform(graft.core.Checkpoints.sessionCk) // scanned once per ADC pass
    // small-batch query contract: probe list, ⟨q,c⟩ terms, and LUTs are
    // all driver-built and ride as ONE broadcast (query × nProbe rows)
    val qRows = queries.select(col(idCol), toDoubleVec(col(vecCol)).as("__qv"))
      .collect()
      .map(r => (r.get(0), r.getSeq[Double](1).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    // two broadcasts, not one: LUTs keyed by query alone (each m×ksub
    // table ships ONCE), probe targets keyed by (query, cell) carrying
    // only the scalar ⟨q,c⟩ term — folding LUTs into the probe frame
    // would inflate the broadcast nProbe-fold for no information gain
    val lutRows = qRows.map { case (qid, qv) =>
      val luts = Array.tabulate(m) { s =>
        val qs = qv.slice(s * sub, (s + 1) * sub)
        books(s).map(cent => dot(qs, cent)).toSeq
      }.toSeq
      (qid.toString, luts)
    }
    val lutDf = broadcast(lutRows.toSeq.toDF("__qid_str", "__luts"))
    val probeRows = qRows.flatMap { case (qid, qv) =>
      // probe order mirrors nearestCentroids(l2=false): dot desc, cell asc
      cents.zipWithIndex
        .map { case (cent, cell) => (cell, dot(qv, cent)) }
        .sortBy { case (cell, d) => (-d, cell) }
        .take(nProbe)
        .map { case (cell, qdotc) => (qid.toString, cell, qdotc) }
    }
    val probeDf = broadcast(probeRows.toSeq
      .toDF("__qid_str", "__cell", "__qdotc"))
    val adc = col("__qdotc") + (0 until m).map(s =>
      element_at(element_at(col("__luts"), s + 1), col("__codes").getItem(s) + 1))
      .reduce(_ + _)
    val scored = encoded.join(probeDf, Seq("__cell"))
      .join(lutDf, Seq("__qid_str"))
      .join(broadcast(queries.select(col(idCol).as("query_id"))
        .withColumn("__qid_str", col("query_id").cast("string"))), Seq("__qid_str"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), adc.as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    val adcRanked = scored.withColumn("rank", row_number().over(w))
    if (rerank <= k) adcRanked.where(col("rank") <= k)
    else {
      val short = adcRanked.where(col("rank") <= rerank)
        .select(col("query_id"), col("neighbor_id"))
      val qv = queries.select(col(idCol).as("query_id"),
        toDoubleVec(col(vecCol)).as("__qv"))
      val exact = broadcast(short)
        .join(c.select(col(idCol).as("neighbor_id"), col("__v").as("__cv")),
          Seq("neighbor_id"))
        .join(broadcast(qv), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosine(col("__qv"), col("__cv")).as("sim"))
      exact.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
    }
  }

  /** SemDedup-style semantic dedup decision (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embedding space, then drop
    * near-identical vectors WITHIN each cluster — cosine pairs are only
    * computed against same-cluster vectors, so the quadratic term is
    * bounded by the largest cell, not the corpus. One decision row per
    * input vector: `rep_id` is the smallest same-cluster id with
    * cosine ≥ `threshold` (self if none), mirroring minhashDedup's
    * smallest-representative convention. Clustering uses the same
    * deterministic hash-sample seed + spherical Lloyd rounds as ivfTopK.
    * Cross-cluster near-dups are missed by construction — that is the
    * documented SemDedup trade-off (raise nClusters for speed, lower for
    * recall). NULL vectors keep themselves (never match anything).
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               nClusters: Int, threshold: Double,
               kmeansIters: Int = 2, portableDim: Int = 0): DataFrame = {
    val c = df.select(col(idCol), toDoubleVec(col(vecCol)).as("__v"))
    val nonNull = c.where(col("__v").isNotNull)
    // Cell assignment: k-means centroids by default (the SemDedup paper
    // shape); with portableDim > 0, the md5 Rademacher-plane buckets
    // instead (log2(nClusters) sign bits) — same cluster-scoped dedup
    // decision, but the cell function is engine-portable, so the whole
    // pair set sits under the exact-replay oracle. The portable path
    // also drops BOTH driver round-trips (init sample + Lloyd update):
    // assignment is a pure map-side codegen'd projection.
    val assigned = (if (portableDim > 0) {
      val bits = 31 - Integer.numberOfLeadingZeros(nClusters)
      require(nClusters == (1 << bits),
        s"portable semDedup needs a power-of-two nClusters, got $nClusters")
      nonNull.select(col(idCol),
        portableLshSignature(col("__v"), bits, portableDim).as("__cell"),
        col("__v"))
    } else {
      val init: Array[Array[Double]] = nonNull
        .withColumn("__h", xxhash64(col(idCol)))
        .orderBy(col("__h")).limit(nClusters)
        .select(col("__v")).collect()
        .map(_.getSeq[Double](0).toArray)
      val cents = trainCentroids(nonNull, "__v", init, kmeansIters)
      // map-side cell assignment; materialized once for the self-join
      nonNull.select(col(idCol),
        nearestCentroids(col("__v"), cents, 1).getItem(0).as("__cell"), col("__v"))
    }).transform(graft.core.Checkpoints.sessionCk)
    val pairs = assigned
      .join(assigned.select(col("__cell"), col(idCol).as("__cand"),
        col("__v").as("__cv")), Seq("__cell"))
      .where(col("__cand") < col(idCol))
      .select(col(idCol), col("__cand"),
        cosine(col("__v"), col("__cv")).as("__sim"))
      .where(col("__sim") >= threshold)
    val best = pairs.groupBy(col(idCol))
      .agg(min(struct(col("__cand"), col("__sim"))).as("__rep"))
    df.select(col(idCol)).join(best, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__rep.__cand"), col(idCol)).as("rep_id"),
        col("__rep.__sim").as("sim"),
        col("__rep").isNotNull.as("is_dup"))
  }
}
