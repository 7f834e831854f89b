package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted sampling without replacement — Efraimidis & Spirakis 2006
  * ("Weighted random sampling with a reservoir", IPL 97(5)): each row
  * draws key = −ln(u)/w (an Exp(w) variate); the k smallest keys per
  * group are a weighted sample without replacement.
  *
  * Determinism: u comes from the first 8 hex chars of
  * md5(id ‖ salt) — the [[TextAnalysis.hashBucket]] family — mapped to
  * the exact dyadic rational (v + 0.5) / 2^32 ∈ (0,1). No RNG state:
  * the sample is stable under re-runs, repartitioning, AND engine
  * migration (md5 and IEEE division agree everywhere; ln is the one
  * correctly-rounded-modulo-1ulp step, and keys are far apart with
  * probability 1). Changing the salt draws an independent sample.
  *
  * Scale shape: a group is often low-cardinality (languages, sources),
  * and a single `row_number` window over it funnels the whole corpus
  * through one task. The selection therefore runs in two phases:
  * per-(group, shard) local top-k over `shards` hash shards — parallel,
  * bounded state — then a global top-k over the ≤ shards·k survivors
  * per group. Top-k of the union of local top-ks IS the global top-k,
  * so the answer is bit-identical to the naive single window (which is
  * what the oracle runs).
  */
object Sampling {

  /** `k` rows per `groupCol`, P(row) ∝ `weightCol` (≥ 1 enforced),
    * without replacement; emits `rank` (1-based selection order — the
    * A-ES key order) alongside the input columns.
    */
  def weightedSample(df: DataFrame, groupCol: Column, weightCol: Column,
                     idCol: Column, k: Int, salt: String = "",
                     shards: Int = 32): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(shards > 0, s"shards must be positive, got $shards")
    val v = conv(substring(md5(concat(idCol.cast("string"), lit(salt))), 1, 8),
      16, 10).cast("long")
    val u = (v.cast("double") + 0.5) / 4294967296.0
    val key = -log(u) / greatest(weightCol, lit(1L)).cast("double")
    val keyed = df.withColumn("__key", key)
    val local = keyed
      .withColumn("__shard", pmod(xxhash64(idCol), lit(shards.toLong)))
      .withColumn("__r", row_number().over(
        Window.partitionBy(groupCol, col("__shard"))
          .orderBy(col("__key").asc, idCol.asc)))
      .where(col("__r") <= k)
      .drop("__r", "__shard")
    local
      .withColumn("rank", row_number().over(
        Window.partitionBy(groupCol).orderBy(col("__key").asc, idCol.asc)))
      .where(col("rank") <= k)
      .drop("__key")
  }

  /** Generic two-phase sharded top-k per group — the [[weightedSample]]
    * selection pattern factored out: per-(group, shard) local windows
    * bound any one task's state even when a single group holds the
    * whole corpus (stopword-grade index terms, a dominating domain),
    * then the global window ranks ≤ shards·k survivors per group.
    * `ord` must totally order rows (include a unique tiebreaker) and
    * `shardOn` must be non-null for the local prune to partition
    * evenly; the result is bit-identical to the naive single window.
    * Emits the surviving rows plus their 1-based `rank`.
    */
  def topKPerGroup(df: DataFrame, groupCol: Column, ord: Seq[Column],
                   shardOn: Column, k: Int, shards: Int = 32): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.withColumn("__shard", pmod(xxhash64(shardOn), lit(shards.toLong)))
      .withColumn("__r", row_number().over(
        Window.partitionBy(groupCol, col("__shard")).orderBy(ord: _*)))
      .where(col("__r") <= k)
      .drop("__shard", "__r")
      .withColumn("rank", row_number().over(
        Window.partitionBy(groupCol).orderBy(ord: _*)))
      .where(col("rank") <= k)
  }

  /** Deterministic mixture-interleave schedule (stride scheduling): give
    * every doc a global training position such that each source appears
    * in any prefix roughly proportionally to its weight — the "mix
    * sources at ratio without a shuffle-and-pray" ordering trainers
    * want. Source s's r-th doc (docs ordered by a deterministic md5
    * draw) gets key = (2r−1)·SCALE div (2·w_s) — the classic stride /
    * lottery-scheduling midpoint rule, in exact integer arithmetic
    * (DECIMAL(38,0) intermediate: r·SCALE overflows BIGINT at corpus
    * scale) — and the global order is (key, source, r).
    *
    * Scale shape: the per-source rank is a window partitioned by source
    * (shard it two-phase for a dominating source, as in
    * [[weightedSample]]); weights are a tiny rollup broadcast back; the
    * final global position is the two-phase range-partitioned row
    * number ([[Windows.globalRowNumber]]) — no single-task global sort.
    */
  def mixtureSchedule(df: DataFrame, sourceCol: Column, idCol: Column,
                      salt: String = ""): DataFrame = {
    val weights = df.groupBy(sourceCol.as("__s"))
      .agg(count(lit(1)).as("__w"))
    val ranked = df.select(idCol.as("__id"), sourceCol.as("__s"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("__s"))
          .orderBy(md5(concat(col("__id").cast("string"), lit(salt))).asc,
            col("__id").asc)))
      .join(broadcast(weights), Seq("__s"))
      .withColumn("__key",
        expr("""CAST((2 * CAST(__r AS DECIMAL(38,0)) - 1) * 1000000000000
                div (2 * __w) AS BIGINT)"""))
    graft.ops.Windows.globalRowNumber(ranked,
        Seq(col("__key"), col("__s"), col("__r")), "pos")
      .select(col("pos"), col("__s").as("source"), col("__id").as("id"),
        col("__key").as("stride_key"))
  }

  /** Fill a token budget by source priority — the "assemble a training
    * mix under a budget" operator: rank sources by a caller-supplied
    * aggregate `priority` (desc, source asc tiebreak), admit whole
    * sources while the running weight total fits `budgetPermille`‰ of
    * the corpus total, take a deterministic partial prefix (md5-ordered
    * docs) from the single boundary source, exclude the rest.
    *
    * All arithmetic is BIGINT (budget = total × permille div 1000), so
    * every engine agrees on the exact cut line.
    *
    * Scale shape: the per-source rollup is one partial-agg shuffle; the
    * priority ranking and cumulative sum run over one row per source
    * (a single-task window over a frame that is tiny by construction —
    * sources are low-cardinality); the tier verdict broadcasts back;
    * and the only per-doc window is over the ONE boundary source,
    * bounded by the largest source (shard it two-phase like
    * [[weightedSample]] if a single source dominates the corpus).
    *
    * Returns the id/source/weight columns plus `tier`
    * ('full'|'partial'|'excluded') and `selected`.
    */
  def tokenBudgetFill(df: DataFrame, sourceCol: Column, weightCol: Column,
                      idCol: Column, budgetPermille: Int, priority: Column,
                      salt: String = ""): DataFrame = {
    require(budgetPermille >= 0 && budgetPermille <= 1000,
      s"budgetPermille must be in [0, 1000], got $budgetPermille")
    val src = df.groupBy(sourceCol.as("__s"))
      .agg(sum(weightCol.cast("long")).as("__w"), priority.as("__prio"))
    val total = src.agg(sum(col("__w")).as("__tot"))
    // one row per source: the single-partition window is deliberate
    val ord = Window.orderBy(col("__prio").desc, col("__s").asc)
    val tiers = src.crossJoin(broadcast(total))
      .withColumn("__budget", expr(s"__tot * ${budgetPermille}L div 1000"))
      .withColumn("__cum", sum(col("__w")).over(ord))
      .withColumn("__prev", col("__cum") - col("__w"))
      .withColumn("tier",
        when(col("__cum") <= col("__budget"), "full")
          .when(col("__prev") < col("__budget"), "partial")
          .otherwise("excluded"))
      .withColumn("__rem",
        when(col("tier") === "partial", col("__budget") - col("__prev"))
          .otherwise(lit(0L)))
      .select(col("__s"), col("tier"), col("__rem"))
      .transform(graft.core.Checkpoints.sessionCk) // tiny (one row per source); referenced by
                              // both union branches — roll up once
    val docs = df.select(idCol.as("__id"), sourceCol.as("__s"),
        weightCol.cast("long").as("__wt"))
      .join(broadcast(tiers), Seq("__s"))
    val prefixOrd = Window.partitionBy(col("__s"))
      .orderBy(md5(concat(col("__id").cast("string"), lit(salt))).asc,
        col("__id").asc)
    // the window runs ONLY over the boundary source's docs
    val partial = docs.where(col("tier") === "partial")
      .withColumn("__dcum", sum(col("__wt")).over(prefixOrd))
      .withColumn("selected", col("__dcum") <= col("__rem"))
      .drop("__dcum")
    val rest = docs.where(col("tier") =!= "partial")
      .withColumn("selected", col("tier") === "full")
    partial.unionByName(rest)
      .select(col("__id").as("id"), col("__s").as("source"),
        col("__wt").as("weight"), col("tier"), col("selected"))
  }

  /** Fractional-epoch mixture replication — the data-mixing complement
    * of [[mixtureSchedule]] (which ORDERS) and [[tokenBudgetFill]]
    * (which CUTS): this one REPEATS. Domain d's docs each appear
    * floor(e_d) times, plus once more when a deterministic per-doc
    * portable md5 draw lands under frac(e_d) — so the realized corpus
    * hits the target epoch mix ("2.25 epochs of wiki, 0.5 of web") with
    * zero RNG state: identical on every engine, every rerun, every
    * partitioning. Epochs < 1 act as a keep-probability downsample.
    *
    * Exact arithmetic: epochs arrive quantized to ppm; the draw
    * compares the 48-bit md5 value against thr = ⌊frac_ppm·2^48/10^6⌋
    * computed in BigInt on the DRIVER — executors run one integer
    * comparison, no floats anywhere.
    *
    * Scale shape: one broadcast join against the tiny domain table, one
    * codegen'd md5 + comparison, one explode — the corpus itself never
    * shuffles; output rows ≈ Σ_d |d|·e_d by construction. Emits
    * (id, domain, epoch_copy) with epoch_copy 1-based.
    */
  def epochMix(df: DataFrame, idCol: Column, domainCol: Column,
               epochsPpm: Map[String, Long], defaultPpm: Long = 1000000L,
               salt: String = "", carryCols: Seq[String] = Nil): DataFrame = {
    require(defaultPpm >= 0 && epochsPpm.values.forall(_ >= 0),
      "epoch weights must be >= 0 ppm")
    def thr(ppm: Long): Long = ((BigInt(ppm % 1000000L) << 48) / 1000000L).toLong
    val session = df.sparkSession
    import session.implicits._
    val doms = epochsPpm.toSeq
      .map { case (d, ppm) => (d, ppm / 1000000L, thr(ppm)) }
      .toDF("__dom", "__base", "__thr")
    val draw = TextAnalysis.portableHash48(
      concat(lit("mix:"), lit(salt), col("id").cast("string")))
    // carryCols ride unit-functional payload (precomputed token counts,
    // lengths) through the replication so composed pipelines need no
    // join-back to recover them per copy
    df.select(idCol.as("id") +: domainCol.as("domain") +: carryCols.map(col): _*)
      .join(broadcast(doms), col("domain") === col("__dom"), "left")
      .withColumn("__copies",
        coalesce(col("__base"), lit(defaultPpm / 1000000L)) +
          when(draw < coalesce(col("__thr"), lit(thr(defaultPpm))), 1L)
            .otherwise(0L))
      .where(col("__copies") > 0)
      .select(col("id") +: col("domain") +: carryCols.map(col) :+
        explode(sequence(lit(1L), col("__copies"))).as("epoch_copy"): _*)
  }
}
