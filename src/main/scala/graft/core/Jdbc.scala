package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC sink/source leg (SURVEY.md §1.3 / §2.1 S5, S8, S9) — the
  * reference's physical contract is a SQL Server database reached over
  * odbc/DBI (connection built at /root/reference/R/_db_connect.R:16-36;
  * `dbWriteTable` appends at R/_pull_data.R:158-163 and 712-715;
  * `dbReadTable`/`dbGetQuery` reads throughout R/_analyze_data.R).
  * Spark-first re-expression: the built-in `jdbc` format, which keeps
  * reads parallel (partitioned predicates) and writes batched — no
  * row-at-a-time driver loops.
  *
  * Scale posture:
  *  - Reads: `readPartitioned` splits the table into `numPartitions`
  *    range predicates on a numeric/date column, one executor task
  *    each. A bare `read` is a single-task scan — fine for dimension
  *    tables, wrong for facts; at 100 TB the fact tables live in the
  *    parquet warehouse (see [[Warehouse]]) and JDBC carries only the
  *    dimension/config edge, exactly how the reference uses SQL Server.
  *  - Writes: `batchsize` rows per round-trip per partition;
  *    `coalesceTo` caps concurrent connections so a 1000-partition
  *    frame doesn't open 1000 sessions against one database.
  *  - Filters/projections on a JDBC read push down into the remote SQL
  *    (Catalyst JDBC pushdown), so `read(...).where(...)` ships the
  *    WHERE clause, not the table.
  *
  * Exercised in-test against embedded Derby (on the Spark classpath);
  * the URL/driver are parameters, so SQL Server is the same call with
  * its url + driver.
  */
object Jdbc {

  /** Connection descriptor — url plus optional driver class,
    * credentials, and passthrough options (e.g. `truncate=true` to keep
    * indexes on overwrite, `isolationLevel`).
    */
  final case class Conn(url: String,
                        driver: Option[String] = None,
                        user: Option[String] = None,
                        password: Option[String] = None,
                        options: Map[String, String] = Map.empty) {
    private[core] def apply[T](b: org.apache.spark.sql.DataFrameReader): org.apache.spark.sql.DataFrameReader = {
      var r = b.format("jdbc").option("url", url).options(options)
      driver.foreach(d => r = r.option("driver", d))
      user.foreach(u => r = r.option("user", u))
      password.foreach(p => r = r.option("password", p))
      r
    }
    private[core] def apply(b: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row]): org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] = {
      var w = b.format("jdbc").option("url", url).options(options)
      driver.foreach(d => w = w.option("driver", d))
      user.foreach(u => w = w.option("user", u))
      password.foreach(p => w = w.option("password", p))
      w
    }
  }

  /** Embedded-Derby connection for tests/local runs (`create=true`
    * bootstraps the database on first touch).
    */
  def derbyMemory(name: String): Conn =
    Conn(s"jdbc:derby:memory:$name;create=true",
      driver = Some("org.apache.derby.jdbc.EmbeddedDriver"))

  /** S8/S9 — batched parallel write. `mode=Append` is the reference's
    * `dbWriteTable(append=TRUE)`; `Overwrite` replaces the table
    * (add `truncate=true` in `conn.options` to TRUNCATE instead of
    * DROP/CREATE and keep grants/indexes). `columnTypes` passes
    * explicit DDL types for created columns
    * (`"NAME VARCHAR(64), NOTE VARCHAR(512)"`): dialects map Spark
    * StringType to LOB types (Derby CLOB, SQL Server NVARCHAR(MAX))
    * that the database then refuses to compare/group/index — key
    * columns need real widths.
    */
  def write(df: DataFrame, conn: Conn, table: String,
            mode: SaveMode = SaveMode.Append,
            batchSize: Int = 10000, coalesceTo: Int = 8,
            columnTypes: Option[String] = None): Unit = {
    val bounded =
      if (df.rdd.getNumPartitions > coalesceTo) df.coalesce(coalesceTo) else df
    var w = conn(bounded.write)
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
    columnTypes.foreach(ct => w = w.option("createTableColumnTypes", ct))
    w.mode(mode).save()
  }

  /** S5 — whole-table read (single task; dimension-scale only). */
  def read(spark: SparkSession, conn: Conn, table: String): DataFrame =
    conn(spark.read).option("dbtable", table).load()

  /** Remote-SQL read — the query executes in the database (the
    * reference's `dbGetQuery` shape); result lands as one partition.
    */
  def readQuery(spark: SparkSession, conn: Conn, query: String): DataFrame =
    conn(spark.read).option("query", query).load()

  /** Parallel range-partitioned read: `numPartitions` executor tasks,
    * each scanning `partCol` stripes of [lower, upper] — the only JDBC
    * read shape that scales past one connection.
    */
  def readPartitioned(spark: SparkSession, conn: Conn, table: String,
                      partCol: String, lower: Long, upper: Long,
                      numPartitions: Int): DataFrame =
    conn(spark.read)
      .option("dbtable", table)
      .option("partitionColumn", partCol)
      .option("lowerBound", lower.toString)
      .option("upperBound", upper.toString)
      .option("numPartitions", numPartitions.toString)
      .load()
}
