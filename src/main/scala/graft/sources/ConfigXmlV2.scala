package graft.sources.v2

import java.util.OptionalLong
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.ConfigXml

/** DataSource V2 connector for metro_config XML snapshots — the S1/S2
  * source (reference /root/reference/R/_pull_data.R:5-136) surfaced as a
  * first-class Spark table:
  *
  *   spark.read.format("graft-config-xml").load("/path/to/snapshots")
  *
  * What the connector contributes beyond [[ConfigXml.readSnapshots]]:
  *
  *  - **Snapshot pruning at planning time.** Each snapshot file carries
  *    its date in the file name (P4), so every comparison/equality/IN
  *    filter on LAST_CHANGE_DATE eliminates whole files before any
  *    byte is read — the connector's analogue of parquet partition
  *    pruning, and the difference between "scan 1,400 files" and "scan
  *    7" for a one-week backfill. Filters are also left as residuals
  *    (pushFilters returns them all), so Spark re-verifies rows and
  *    semantics never depend on the pruning being right.
  *  - **Column pruning into the parser output.** The reader materializes
  *    only the requested fields per detector row — a
  *    `SELECT count(*)` or a two-column projection carries 2 values per
  *    row, not 20.
  *  - **Size statistics** (sum of snapshot file lengths, post-pruning)
  *    so the optimizer can pick broadcast joins over config dims
  *    without hints.
  *
  * One InputPartition per snapshot file: executors parse in parallel,
  * the same distribution as `readSnapshots`, with reads going through
  * the Hadoop FileSystem API (captured driver fs.* conf re-applied on
  * executors) so the same plan works on local disk, HDFS, or object
  * stores.
  */
class ConfigXmlDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-config-xml"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ConfigXml.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-config-xml needs a path: spark.read.format(\"graft-config-xml\").load(dir)"))
    new ConfigXmlTable(path)
  }
}

private[v2] class ConfigXmlTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft_config_xml(`$path`)"
  override def schema(): StructType = ConfigXml.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ConfigXmlScanBuilder(path)
}

private[v2] class ConfigXmlScanBuilder(path: String)
  extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {

  private var required: StructType = ConfigXml.schema
  private var retained: Array[Filter] = Array.empty
  private var aggMaxFlags: Option[Seq[Boolean]] = None // true=MAX false=MIN

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Retain LAST_CHANGE_DATE filters for file pruning; report everything
    * as residual so Spark re-evaluates rows (pruning is an optimization,
    * never a correctness dependency).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    retained = filters.filter(ConfigXmlScan.prunable)
    filters
  }
  override def pushedFilters(): Array[Filter] = retained

  /** Aggregate pushdown for the one aggregation this source can answer
    * from its file LISTING: ungrouped MIN/MAX of LAST_CHANGE_DATE.
    * Every row in a snapshot file carries the file's own date (the
    * parser stamps it from the file name), so the min/max over rows is
    * the min/max over NON-EMPTY file names; the driver confirms the
    * boundary file actually yields a row with an early-exit probe (see
    * [[ConfigXmlAggScan]]) so the pushed answer never diverges from the
    * row-scan plan. The payoff is the watermark probe
    * (`SELECT max(LAST_CHANGE_DATE)`), the query every nightly
    * incremental run issues first: O(listing) + a few KB of boundary
    * probe instead of a full-corpus parse. Complete pushdown (the scan
    * returns the FINAL one-row answer); anything grouped, any other
    * column, or any other function is declined and planned normally.
    */
  private def pushableMaxFlags(agg: Aggregation): Option[Seq[Boolean]] = {
    if (agg.groupByExpressions.nonEmpty) return None
    def dateRef(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case nr: NamedReference =>
          nr.fieldNames.sameElements(Array("LAST_CHANGE_DATE"))
        case _ => false
      }
    val flags = agg.aggregateExpressions.toSeq.map {
      case m: Max if dateRef(m.column) => Some(true)
      case m: Min if dateRef(m.column) => Some(false)
      case _ => None
    }
    if (flags.nonEmpty && flags.forall(_.isDefined)) Some(flags.map(_.get))
    else None
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    pushableMaxFlags(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    pushableMaxFlags(agg) match {
      case Some(flags) => aggMaxFlags = Some(flags); true
      case None => false
    }

  override def build(): Scan = aggMaxFlags match {
    case Some(flags) => new ConfigXmlAggScan(path, retained, flags)
    case None => new ConfigXmlScan(path, required, retained)
  }
}

private[v2] object ConfigXmlScan {
  private val DateCol = "LAST_CHANGE_DATE"

  /** Filters this source can turn into snapshot-file pruning. */
  def prunable(f: Filter): Boolean = f match {
    case EqualTo(DateCol, _) | GreaterThan(DateCol, _)
         | GreaterThanOrEqual(DateCol, _) | LessThan(DateCol, _)
         | LessThanOrEqual(DateCol, _) | In(DateCol, _)
         | IsNotNull(DateCol) => true
    case And(l, r) => prunable(l) && prunable(r)
    case Or(l, r) => prunable(l) && prunable(r)
    case _ => false
  }

  /** Date literals arrive as java.sql.Date or (java8 datetime API)
    * LocalDate; compare in epoch days.
    */
  private def days(v: Any): Long = v match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case d: java.time.LocalDate => d.toEpochDay
    case s: String => java.time.LocalDate.parse(s).toEpochDay
    case other => throw new IllegalArgumentException(
      s"unexpected date literal ${other.getClass}: $other")
  }

  /** Driver-side snapshot listing + date pruning, shared by the row
    * scan and the listing-only aggregate scan. */
  def listParts(path: String, filters: Array[Filter]): Array[ConfigXmlPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val stats =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile &&
          (s.getPath.getName.endsWith(".xml") ||
            s.getPath.getName.endsWith(".xml.gz")))
      else Array(fs.getFileStatus(p))
    stats
      .map { s =>
        val d = ConfigXml.dateFromPath(s.getPath.toString)
        ConfigXmlPartition(s.getPath.toString,
          d.toLocalDate.toEpochDay.toInt, s.getLen)
      }
      .filter(part => filters.forall(f =>
        ConfigXmlScan.keep(f, part.dateDays.toLong)))
      .sortBy(_.path)
  }

  /** Evaluate a prunable filter against one snapshot's date. */
  def keep(f: Filter, fileDays: Long): Boolean = f match {
    case EqualTo(DateCol, v) => fileDays == days(v)
    case GreaterThan(DateCol, v) => fileDays > days(v)
    case GreaterThanOrEqual(DateCol, v) => fileDays >= days(v)
    case LessThan(DateCol, v) => fileDays < days(v)
    case LessThanOrEqual(DateCol, v) => fileDays <= days(v)
    case In(DateCol, vs) => vs.exists(v => fileDays == days(v))
    case IsNotNull(DateCol) => true
    case And(l, r) => keep(l, fileDays) && keep(r, fileDays)
    case Or(l, r) => keep(l, fileDays) || keep(r, fileDays)
    case _ => true
  }
}

private[v2] case class ConfigXmlPartition(path: String, dateDays: Int,
                                          bytes: Long) extends InputPartition

private[v2] class ConfigXmlScan(path: String, required: StructType,
                                filters: Array[Filter])
  extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-config-xml $path, PrunedBy: [${filters.mkString(", ")}]"

  /** Driver-side listing + date pruning. */
  private lazy val partitions: Array[ConfigXmlPartition] =
    ConfigXmlScan.listParts(path, filters)

  override def planInputPartitions(): Array[InputPartition] =
    partitions.toArray[InputPartition]

  override def estimateStatistics(): Statistics = {
    val total = partitions.map(_.bytes).sum
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(total)
      override def numRows(): OptionalLong = OptionalLong.empty()
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // ship the filesystem-relevant driver conf so executors open files
    // the same way (credentials, fs implementations)
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val fsConf = conf.asScala
      .filter { e =>
        val k = e.getKey
        k.startsWith("fs.") || k.startsWith("dfs.") || k.startsWith("hadoop.")
      }
      .map(e => e.getKey -> e.getValue).toMap
    new ConfigXmlReaderFactory(required, fsConf)
  }
}

/** The listing-only aggregate scan: the final one-row MIN/MAX answer is
  * computed on the DRIVER from the (pruned) file listing and shipped
  * inside the single InputPartition — executors open no file. The
  * boundary candidate IS verified (round-9 advice): a listed snapshot
  * that parses to zero detector rows (empty or element-free XML) must
  * not contribute its date, so the driver probes the extreme file with
  * an early-exit parse (first `<detector>` wins — a few KB for a normal
  * snapshot) and walks inward past empty files. Common case: one probe,
  * O(KB); worst case (all files empty): a full verification pass, and
  * the SQL-correct one row of NULLs. Empty listing → NULLs too.
  */
private[v2] case class ConfigXmlAggPartition(values: Array[Option[Int]])
  extends InputPartition

private[v2] class ConfigXmlAggScan(path: String, filters: Array[Filter],
                                   maxFlags: Seq[Boolean])
  extends Scan with Batch {

  override def readSchema(): StructType = StructType(maxFlags.map { isMax =>
    StructField(if (isMax) "max(LAST_CHANGE_DATE)" else "min(LAST_CHANGE_DATE)",
      DateType)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-config-xml $path, PushedAggregates: [" +
      maxFlags.map(m => if (m) "MAX(LAST_CHANGE_DATE)" else "MIN(LAST_CHANGE_DATE)")
        .mkString(", ") + "]"

  override def planInputPartitions(): Array[InputPartition] = {
    val parts = ConfigXmlScan.listParts(path, filters)
    val conf = SparkSession.active.sessionState.newHadoopConf()
    // memoized so MIN and MAX in one query share probes
    val yields = scala.collection.mutable.Map.empty[String, Boolean]
    def nonEmpty(p: ConfigXmlPartition): Boolean =
      yields.getOrElseUpdate(p.path, {
        val hp = new Path(p.path)
        val raw = hp.getFileSystem(conf).open(hp)
        val in =
          if (p.path.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw)
          else raw
        try ConfigXml.hasDetectorRow(in) finally in.close()
      })
    val byDay = parts.groupBy(_.dateDays)
    val daysAsc = byDay.keys.toSeq.sorted
    val values = maxFlags.map { isMax =>
      (if (isMax) daysAsc.reverse else daysAsc)
        .find(d => byDay(d).exists(nonEmpty))
    }.toArray
    Array(ConfigXmlAggPartition(values))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val vals = partition.asInstanceOf[ConfigXmlAggPartition].values
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = if (emitted) false else { emitted = true; true }
          override def get(): InternalRow =
            new GenericInternalRow(
              vals.map(_.map(Int.box).orNull): Array[Any])
          override def close(): Unit = ()
        }
      }
    }
}

private[v2] class ConfigXmlReaderFactory(required: StructType,
                                         fsConf: Map[String, String])
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[ConfigXmlPartition]
    new PartitionReader[InternalRow] {
      private val rows: Iterator[InternalRow] = {
        val conf = new Configuration()
        fsConf.foreach { case (k, v) => conf.set(k, v) }
        val p = new Path(part.path)
        val raw = p.getFileSystem(conf).open(p)
        val in =
          if (part.path.endsWith(".gz"))
            new java.util.zip.GZIPInputStream(raw)
          else raw
        val date = java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(part.dateDays.toLong))
        val parsed = try ConfigXml.parse(in, date) finally in.close()
        // project + convert once per row: only the pruned columns are
        // materialized into the InternalRow
        val fullIdx = required.fields.map(f =>
          ConfigXml.schema.fieldIndex(f.name))
        val convert: Array[Any => Any] = required.fields.map { f =>
          f.dataType match {
            case StringType => (v: Any) =>
              if (v == null) null else UTF8String.fromString(v.asInstanceOf[String])
            case DateType => (v: Any) =>
              if (v == null) null
              else Int.box(v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt)
            case _ => identity[Any] _
          }
        }
        parsed.iterator.map { r =>
          val vals = new Array[Any](fullIdx.length)
          var i = 0
          while (i < fullIdx.length) {
            vals(i) = convert(i)(r.get(fullIdx(i)))
            i += 1
          }
          new GenericInternalRow(vals)
        }
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
