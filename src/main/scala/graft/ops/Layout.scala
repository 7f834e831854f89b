package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) interleaving for
  * multi-dimensional clustering of fact tables.
  *
  * Why it matters at 100 TB: parquet row-group pruning works off
  * per-file/rowgroup min-max stats, which a linear sort only tightens
  * for ONE leading column. Z-ordering the layout key interleaves the
  * bits of two dimensions, so files cover small RECTANGLES of the
  * (x, y) space — point/range predicates on EITHER dimension prune
  * most files (the technique behind Delta/Iceberg OPTIMIZE ZORDER).
  *
  * The interleave is pure 64-bit integer arithmetic (shift/mask magic
  * numbers) — codegen-friendly, engine-portable, and exactly
  * reproducible in any SQL engine with bit operators.
  */
object Layout {

  /** (shift, mask) ladder that spreads a 16-bit value so bit i lands at
    * position 2i (the standard Morton magic numbers).
    */
  private val spreadSteps: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FFL,
    4 -> 0x0F0F0F0FL,
    2 -> 0x33333333L,
    1 -> 0x55555555L)

  /** Spread the low 16 bits of `c` onto even bit positions. */
  def spread16(c: Column): Column =
    spreadSteps.foldLeft(c.bitwiseAND(lit(0xFFFFL))) {
      case (acc, (s, m)) => (acc.bitwiseOR(shiftleft(acc, s))).bitwiseAND(lit(m))
    }

  /** 32-bit Z-value interleaving the low 16 bits of `x` (even positions)
    * and `y` (odd positions). Values are masked to 16 bits — quantize or
    * bucket wider domains first.
    */
  def zorder2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** The same spread as ANSI-ish SQL text (DuckDB dialect: `&`, `|`,
    * `<<`), built from the SAME step table so engine and oracle cannot
    * drift.
    */
  def spread16Sql(e: String): String =
    spreadSteps.foldLeft(s"($e & 65535)") {
      case (acc, (s, m)) => s"((($acc | ($acc << $s)) & $m))"
    }

  def zorder2Sql(x: String, y: String): String =
    s"(${spread16Sql(x)} | (${spread16Sql(y)} << 1))"

  /** Write `df` Z-ordered on (x, y): range-partition by the Z-value so
    * each output file owns a contiguous Z-range (a small rectangle of
    * the key space), sort within partitions so row groups subdivide it
    * further. The Z column is an unnamed sort expression — it does not
    * survive into the written schema.
    */
  def writeZOrdered(df: DataFrame, path: String, x: Column, y: Column,
                    numFiles: Int): Unit = {
    val z = zorder2(x.cast("long"), y.cast("long"))
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }

  /** Compaction-aware partitioned write — the small-files killer. A
    * naive `partitionBy` write emits one file per (task, partition-key)
    * pair: a 32-task shuffle over 1,000 keys can scatter 32,000 tiny
    * files, and at 100 TB the metadata + open-file cost dominates reads.
    * This writer first computes a per-key file budget from row counts
    * (⌈rows / targetRowsPerFile⌉), then salts each row into one of its
    * key's budget slots (deterministic: xxhash64 of `idCol`) and
    * repartitions by (key, slot) — so every partition directory gets AT
    * MOST its budgeted file count (hash collisions between slots can
    * only merge files, never split them), skewed keys get proportionally
    * more files, and tiny keys collapse to one.
    *
    * Scale shape: the plan is one partial-agg shuffle bounded by key
    * cardinality and rides back as a broadcast; the data moves in
    * exactly one shuffle (the repartition), which the write needs
    * anyway. Returns the plan (key cols, n_rows, n_files) for
    * observability / assertion.
    */
  def writeCompacted(df: DataFrame, path: String, partCols: Seq[String],
                     idCol: Column, targetRowsPerFile: Long): DataFrame = {
    require(partCols.nonEmpty, "writeCompacted needs partition columns")
    require(targetRowsPerFile > 0,
      s"targetRowsPerFile must be positive, got $targetRowsPerFile")
    val keys = partCols.map(col)
    val plan = df.groupBy(keys: _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__files", greatest(lit(1L),
        expr(s"(__n + ${targetRowsPerFile - 1}) div ${targetRowsPerFile}L")))
    // explicit width (the total file budget): a width-less expression
    // repartition is fair game for AQE coalescing, which would collapse
    // the salt slots back into one task — one fat file per key
    val totalFiles = math.max(
      plan.agg(sum(col("__files"))).head().getLong(0), 1L).toInt
    val salted = df
      .join(broadcast(plan.select((keys :+ col("__files")): _*)), partCols)
      .withColumn("__slot", pmod(xxhash64(idCol), col("__files")))
    salted.repartition(totalFiles, (keys :+ col("__slot")): _*)
      .drop("__slot", "__files")
      .write.mode("overwrite").partitionBy(partCols: _*).parquet(path)
    plan.select((keys :+ col("__n").as("n_rows") :+
      col("__files").as("n_files")): _*)
  }

  /** Rendezvous (highest-random-weight) shard assignment — the
    * minimal-movement re-layout primitive: when the shard count grows
    * K → K', only docs whose NEW shard is one of the added ones move
    * (expected moved fraction = (K'−K)/K'), versus `id mod K` where
    * nearly everything moves. At 100 TB that is the difference between
    * rewriting 20% of the corpus and rewriting all of it.
    *
    * Weight w(id, s) is the portable 48-bit md5 family; the argmax
    * rides one `greatest` over K compiled expressions per row — K
    * md5 calls, zero shuffles, no interpreted lambdas, exactly
    * reproducible in any engine with md5 (encode w·64+s, decode mod
    * 64, so the tie-break — larger shard wins — is part of the key).
    */
  def rendezvousShard(idCol: Column, nShards: Int,
                      salt: String = ""): Column = {
    require(nShards >= 1 && nShards <= 64,
      s"nShards must be in [1, 64], got $nShards")
    if (nShards == 1) lit(0)
    else {
      val keys = (0 until nShards).map { s =>
        TextAnalysis.portableHash48(concat(
          lit(s"hrw:$salt"), idCol.cast("string"), lit(s":$s"))) * 64 + s
      }
      (greatest(keys: _*) % 64).cast("int")
    }
  }

  /** Reshard plan for a shard-count change: per doc, the old and new
    * rendezvous shard and whether it moves. The HRW superset property
    * guarantees every moved doc lands on an ADDED shard (asserted in
    * LayoutSpec) — the rewrite set is exactly the new shards' files.
    */
  def rendezvousReshard(df: DataFrame, idCol: String, fromShards: Int,
                        toShards: Int, salt: String = ""): DataFrame = {
    require(fromShards <= toShards,
      s"rendezvousReshard grows the ring: $fromShards > $toShards")
    df.select(col(idCol),
      rendezvousShard(col(idCol), fromShards, salt).as("shard_from"),
      rendezvousShard(col(idCol), toShards, salt).as("shard_to"))
      .withColumn("moved", col("shard_from") =!= col("shard_to"))
  }
}
