package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Training-data handoff sink: sharded JSONL export with a manifest.
  *
  * JSONL (one JSON object per line) is the lingua franca between a
  * curation warehouse and a training stack — every loader reads it, and
  * line-orientation keeps it splittable. The scale contract:
  *
  *   - sharding is BY A COLUMN the caller derives (hash-mod, date,
  *     source...), written as `shard=N/` partition directories: shard
  *     assignment is reproducible from row content, never from Spark's
  *     task layout, so a re-export on a different cluster produces
  *     byte-identical shard membership (only intra-file order differs);
  *   - the writer is one pass, no shuffle beyond the caller's own
  *     partitioning — `partitionBy` splits files per task, so for
  *     physically-clustered output repartition by the shard column
  *     first (the helper does it; at 100 TB this is the one shuffle an
  *     export costs, and it is also what bounds files-per-shard);
  *   - the manifest (shard, n_files, n_bytes) comes from a FileSystem
  *     listing, not a data scan — auditing an exported corpus must not
  *     re-read it. Row counts are the READER's job (see
  *     [[readJsonlShards]]) because counting rows requires a scan by
  *     definition; the manifest stays scan-free.
  *
  * Compression note: default is uncompressed (splittable); pass a codec
  * for wire-size-sensitive handoffs — on a cluster prefer a splittable
  * codec or size-bounded files via `maxRecordsPerFile`.
  */
final class Export(spark: SparkSession, root: String) {

  private def path(name: String) = s"$root/$name"

  private def hadoopFs(p: String) = {
    val hp = new org.apache.hadoop.fs.Path(p)
    (hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp)
  }

  /** Write `df` as JSONL under `root/name/shardCol=N/part-NNN.json`.
    * One file per shard by construction (repartition on the shard
    * column first); `maxRecordsPerFile` re-splits oversized shards
    * without breaking the shard=dir contract.
    */
  def writeJsonlShards(df: DataFrame, name: String, shardCol: String,
                       compression: String = "none",
                       maxRecordsPerFile: Long = 0L): Unit =
    df.repartition(col(shardCol))
      .write
      .partitionBy(shardCol)
      .option("compression", compression)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .json(path(name))

  /** Read an exported corpus back. The schema is explicit (JSONL files
    * carry no schema; inference is a full extra pass at corpus scale
    * and can widen types) and must include the shard column, which is
    * recovered from the partition directories.
    */
  def readJsonlShards(name: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path(name))

  /** Scan-free audit of an export: per shard, file count and total
    * bytes from the FileSystem listing (any Hadoop FS, not just local
    * disk). Hidden/metadata files (`_SUCCESS`, `.crc`) are excluded.
    */
  def shardManifest(name: String, shardCol: String): Seq[Row] = {
    val (fs, dir) = hadoopFs(path(name))
    val prefix = s"$shardCol="
    fs.listStatus(dir).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .sortBy(_.getPath.getName)
      .map { st =>
        val files = fs.listStatus(st.getPath).toSeq.filter { f =>
          val n = f.getPath.getName
          f.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        Row(st.getPath.getName.stripPrefix(prefix),
          files.size.toLong, files.map(_.getLen).sum)
      }
  }
}
