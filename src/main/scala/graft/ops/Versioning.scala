package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset versioning for corpus governance: content-addressed row
  * identity and snapshot-to-snapshot diff.
  *
  * A training corpus is re-curated continuously; what downstream
  * consumers need from "v7 → v8" is not the 100 TB of v8 but the
  * CHANGESET — which documents appeared, vanished, or changed — both
  * to audit the curation run and to trigger incremental downstream
  * work (re-embedding, re-tokenization) on exactly the changed slice.
  *
  * Scale shape: `rowHash` is a per-row codegen'd projection (no
  * shuffle); `datasetDiff` is ONE full-outer shuffle join on the key —
  * with both snapshots bucketed by the key (core.Warehouse.writeBucketed)
  * it is zero-Exchange. The output is proportional to the CHANGE volume,
  * not the corpus: unchanged rows are dropped before any collect/sink.
  */
object Versioning {

  /** Content hash over `cols`, null-safe and unambiguous: each column
    * is cast to string, NULL becomes a reserved sentinel, and fields
    * join on a control character that cannot appear in fixture text —
    * so ("a", "bc") never collides with ("ab", "c") and NULL never
    * collides with the string "NULL".
    */
  def rowHash(cols: Seq[Column]): Column =
    md5(concat_ws("\u0001",
      cols.map(c => coalesce(c.cast("string"), lit("\u0002"))): _*))

  /** Snapshot diff: full-outer join `oldDf` and `newDf` on `keyCol`,
    * classify each key as added / removed / changed by comparing the
    * content hash of `contentCols`, and return ONLY the changeset
    * (unchanged keys are filtered before anything downstream).
    */
  def datasetDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                  contentCols: Seq[String]): DataFrame = {
    val oh = rowHash(contentCols.map(oldDf(_)))
    val nh = rowHash(contentCols.map(newDf(_)))
    val o = oldDf.select(oldDf(keyCol).as("k"), oh.as("old_hash"))
    val n = newDf.select(newDf(keyCol).as("k"), nh.as("new_hash"))
    o.join(n, Seq("k"), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged"))
      .where(col("status") =!= "unchanged")
      .select(col("k").as(keyCol), col("status"))
  }
}
