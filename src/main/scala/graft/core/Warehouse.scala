package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink layer (SURVEY.md §2.1 S8–S12) over a parquet warehouse
  * directory. SQL Server tables become date-partitioned parquet table
  * dirs; the reference's row-level UPDATEs (S10) become whole-table
  * merge-rewrites (see graft.ops.Scd2); its append loops become
  * idempotent per-date partition overwrites — re-running a day replaces
  * exactly that day's partition (dynamic partition overwrite), the
  * property the reference lacks (missed-day reruns acknowledged as
  * future work, reference README.md:37).
  */
final class Warehouse(spark: SparkSession, root: String) {

  private def path(table: String) = s"$root/$table"

  /** S12 — table-exists probe gating run-once bootstraps. Hadoop FS
    * resolved from the path (not java.io.File), so the probe is correct
    * on HDFS/S3 warehouses, not only local ones.
    */
  def exists(table: String): Boolean = {
    val (fs, p) = hadoopFs(path(table))
    fs.exists(p)
  }

  /** Crash recovery for [[forget]]'s rename-rename swap: a failure
    * between the two renames leaves the table stranded under
    * `.forget_old` with no live path. Entry points that touch the table
    * call this first — if the live path is missing but the staged-out
    * copy exists, the rename is rolled forward and the table is
    * readable again with no manual surgery. Single-writer assumption:
    * the warehouse (like the reference's nightly job) has exactly one
    * writer at a time; concurrent writers would race the swap itself,
    * which no rename protocol on a non-transactional store can fix.
    */
  private def recoverStranded(table: String): Unit = {
    val (fs, live) = hadoopFs(path(table))
    val oldP = new org.apache.hadoop.fs.Path(path(table) + ".forget_old")
    if (!fs.exists(live) && fs.exists(oldP)) fs.rename(oldP, live)
  }

  def read(table: String): DataFrame = {
    recoverStranded(table)
    spark.read.parquet(path(table))
  }

  /** S8 — plain append. */
  def append(df: DataFrame, table: String): Unit =
    df.write.mode("append").parquet(path(table))

  /** S9 — full overwrite (initial snapshot / SCD-2 merge-rewrite). */
  def overwrite(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").parquet(path(table))

  /** S8 at scale — write partitioned by a date column, dynamically
    * overwriting ONLY the partitions present in `df` (idempotent
    * re-runs; other dates untouched).
    */
  def overwriteDatePartitions(df: DataFrame, table: String,
                              dateCol: String): Unit =
    df.write
      .partitionBy(dateCol)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path(table))

  /** A9 — incremental watermark: max value of `dateCol`, None when the
    * table doesn't exist yet (bootstrap case).
    */
  def watermark(table: String, dateCol: String): Option[java.sql.Date] =
    if (!exists(table)) None
    else graft.ops.Aggs.watermark(read(table), dateCol)

  /** Bucketed external table: pre-shuffled on `bucketCols` so joins and
    * aggregations on those keys read co-located, shuffle-free (the
    * "bucketing for co-located joins" leg of the 100 TB posture — two
    * tables bucketed the same way sort-merge join with zero Exchange).
    * Registered in the session catalog (bucketing metadata lives there);
    * data is plain parquet at the warehouse path.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .option("path", path(table))
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Read a bucketed table (bucket metadata requires the catalog route,
    * not a raw parquet path read).
    */
  def readBucketed(table: String): DataFrame = spark.table(table)

  /** JDBC sink — the reference's actual warehouse is SQL Server reached
    * over DBI/odbc (`R/_db_connect.R:16-36`, `dbWriteTable`/`dbAppendTable`
    * in `R/_pull_data.R`); this is that leg on Spark's JDBC source.
    * Executors write their partitions concurrently over independent
    * connections — the driver never funnels rows. `batchSize` maps to
    * JDBC addBatch chunking (the knob that matters against a real
    * RDBMS); `numPartitions` caps concurrent connections so a 1000-task
    * stage doesn't open 1000 sessions against one database.
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: String = "overwrite", batchSize: Int = 10000,
                numPartitions: Int = 8): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .option("numPartitions", numPartitions)
      .option("truncate", true) // overwrite keeps the DDL, empties rows
      .mode(mode)
      .save()

  /** JDBC source, single-partition — fine for dimension-sized tables
    * (the reference reads its config dims back the same way).
    */
  def readJdbc(url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load()

  /** JDBC source, range-partitioned — the 100 TB shape for a big
    * RDBMS-resident fact table: `numPartitions` executors each issue
    * `WHERE partCol BETWEEN …` slices concurrently, so ingest
    * parallelism is bounded by the database, not by one cursor. Spark
    * pushes filters into the remote WHERE clause (JDBC V1 pushdown),
    * so a date-ranged read never ships the whole table.
    */
  def readJdbcPartitioned(url: String, table: String, partCol: String,
                          lower: Long, upper: Long,
                          numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partCol)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  private def hadoopFs(p: String) = {
    val hp = new org.apache.hadoop.fs.Path(p)
    (hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp)
  }

  /** Right-to-be-forgotten: delete every row of `table` whose `keyCol`
    * appears in `keys`, returning the number of rows removed. The
    * delete is a broadcast anti-join rewrite — at warehouse scale pair
    * this with date partitioning so only partitions actually holding
    * the keys rewrite; here the single-dir test shape rewrites the
    * table. Crash-safety: the kept rows are FULLY written to a staging
    * path first, then swapped in with two renames — a failure during
    * the rewrite leaves the original table intact, and only the narrow
    * rename-rename window (not the whole job) can strand the table
    * under the `.old` name (recoverable by hand, never truncated).
    */
  def forget(table: String, keyCol: String, keys: DataFrame): Int = {
    recoverStranded(table)
    val current = read(table)
    val k = keys.select(col(keyCol)).distinct()
    val kept = current.join(broadcast(k), Seq(keyCol), "left_anti")
    val staging = path(table) + ".forget_staging"
    kept.write.mode("overwrite").parquet(staging)
    val removed =
      (current.count() - spark.read.parquet(staging).count()).toInt
    val (fs, live) = hadoopFs(path(table))
    val stagingP = new org.apache.hadoop.fs.Path(staging)
    val oldP = new org.apache.hadoop.fs.Path(path(table) + ".forget_old")
    fs.delete(oldP, true)
    if (!fs.rename(live, oldP))
      throw new java.io.IOException(s"forget: cannot stage out $live")
    if (!fs.rename(stagingP, live)) {
      fs.rename(oldP, live) // restore
      throw new java.io.IOException(s"forget: cannot swap in $stagingP")
    }
    fs.delete(oldP, true)
    removed
  }

  /** Retention expiry: drop date partitions older than `keepFrom` from
    * a date-partitioned table (written via [[overwriteDatePartitions]]).
    * Deletes partition DIRECTORIES — no data rewrite, no scan; the
    * operation 100 TB retention jobs must be (a rewrite-based expiry
    * would read the whole table to delete a day). Unparsable partition
    * values (e.g. `__HIVE_DEFAULT_PARTITION__` from NULL dates) are
    * skipped, never fatal. Hadoop FileSystem API, so any warehouse
    * filesystem works, not just local disk. Returns the dropped
    * partition names.
    */
  def expirePartitions(table: String, dateCol: String,
                       keepFrom: java.sql.Date): Seq[String] = {
    val (fs, dir) = hadoopFs(path(table))
    if (!fs.exists(dir)) return Seq.empty
    val prefix = s"$dateCol="
    val dropped = fs.listStatus(dir).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .filter { st =>
        val v = java.net.URLDecoder.decode(
          st.getPath.getName.stripPrefix(prefix), "UTF-8")
        scala.util.Try(java.sql.Date.valueOf(v))
          .toOption.exists(_.before(keepFrom))
      }
    dropped.foreach(st => fs.delete(st.getPath, true))
    dropped.map(_.getPath.getName)
  }

  // ---- versioned publish / time travel -------------------------------
  //
  // Poor-man's snapshot isolation for a parquet warehouse, the primitive
  // a corpus-governance layer (graft.ops.Versioning) composes with:
  // every publish writes an IMMUTABLE `v=NNNNN` directory and then swaps
  // a one-line `_CURRENT` pointer file. Readers resolve the pointer once
  // and then scan a directory no writer will ever touch again — so a
  // publish never disturbs an in-flight 100 TB read, rollback is a
  // pointer swap (zero data movement), time-travel reads are just
  // version-dir scans, and expiry is directory deletion (no rewrite).
  // Same single-writer assumption as [[forget]]; the only
  // non-atomic window is the delete+rename pointer swap. A reader that
  // finds no pointer first consults the surviving `_CURRENT.tmp` (a
  // crash inside the swap window leaves it holding the intended target
  // — which after a `rollbackTo` is NOT the newest version) and only
  // then falls back to the newest published version (a pristine table
  // or a pre-tmp crash).

  private def versionDir(table: String, v: Int) =
    new org.apache.hadoop.fs.Path(f"${path(table)}/v=$v%05d")
  private def pointerPath(table: String) =
    new org.apache.hadoop.fs.Path(s"${path(table)}/_CURRENT")

  /** All published version numbers, ascending. */
  def versions(table: String): Seq[Int] = {
    val (fs, dir) = hadoopFs(path(table))
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("v="))
      .flatMap(n => scala.util.Try(n.stripPrefix("v=").toInt).toOption)
      .sorted
  }

  /** The pointer target; if the pointer is missing, the intended target
    * recovered from a surviving `_CURRENT.tmp` (crash inside the swap
    * window — after a rollback that target is an OLDER version, so
    * jumping to newest would silently undo the rollback); failing both,
    * the newest published version (pristine table / pre-tmp crash).
    */
  def currentVersion(table: String): Option[Int] = {
    val (fs, _) = hadoopFs(path(table))
    def readInt(p: org.apache.hadoop.fs.Path): Option[Int] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        scala.util.Try(s.toInt).toOption
      }
    val tmp = new org.apache.hadoop.fs.Path(s"${path(table)}/_CURRENT.tmp")
    readInt(pointerPath(table))
      .orElse(readInt(tmp).filter(versions(table).contains))
      .orElse(versions(table).lastOption)
  }

  /** Publish `df` as the next version and move the pointer to it.
    * Returns the new version number.
    */
  def publishVersion(df: DataFrame, table: String): Int = {
    val v = versions(table).lastOption.getOrElse(0) + 1
    df.write.mode("overwrite").parquet(versionDir(table, v).toString)
    setPointer(table, v)
    v
  }

  private def setPointer(table: String, v: Int): Unit = {
    val (fs, _) = hadoopFs(path(table))
    val tmp = new org.apache.hadoop.fs.Path(s"${path(table)}/_CURRENT.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(pointerPath(table), false)
    if (!fs.rename(tmp, pointerPath(table)))
      throw new java.io.IOException(
        s"publish: cannot move pointer for $table to v$v")
  }

  /** Time-travel read of a specific published version. */
  def readVersion(table: String, v: Int): DataFrame =
    spark.read.parquet(versionDir(table, v).toString)

  /** Read whatever the pointer currently targets. */
  def readCurrent(table: String): DataFrame =
    readVersion(table, currentVersion(table).getOrElse(
      throw new java.util.NoSuchElementException(
        s"no published version for $table")))

  /** Rollback = pointer swap to an existing version; data untouched. */
  def rollbackTo(table: String, v: Int): Unit = {
    require(versions(table).contains(v),
      s"rollbackTo: version $v of $table does not exist")
    setPointer(table, v)
  }

  /** Drop all but the newest `keepLast` versions (the pointer target is
    * always kept, wherever it points). Directory deletes only.
    */
  def expireVersions(table: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, "expireVersions: keepLast must be >= 1")
    val vs = versions(table)
    val keep = vs.takeRight(keepLast).toSet ++ currentVersion(table)
    val drop = vs.filterNot(keep)
    val (fs, _) = hadoopFs(path(table))
    drop.foreach(v => fs.delete(versionDir(table, v), true))
    drop
  }
}
