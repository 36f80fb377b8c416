package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the harness star schema (TESTDATA.md).
  *
  * The reference ingests CSV with header+inferSchema
  * (`app/AE_model.py:25-29`) and Iceberg/Glue tables (`app/main.py:16-22`,
  * `lib/connector.py:34-61`). Here the canonical source is parquet; CSV and
  * generic-format readers are provided for capability parity. All readers
  * return lazy DataFrames — Catalyst pushes filters/projections into the
  * scan, so callers should filter/select as early as possible.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // some testdata generations write events.ts as TIMESTAMP(NANOS), which
    // Spark's reader rejects by default; read those as LongType nanos
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // DuckDB's epoch_us() interprets naive timestamps as UTC; pin the
    // session the same way so timestamp→epoch math is engine-identical
    // regardless of which entry point built the session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // graft's native expressions (graft_dot, graft_strhash) ride every
    // query path; registration is idempotent
    graft.sim.GraftFunctions.register(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") withNanosTs(df) else df
  }

  /** Harness generations have shipped `events.ts` both as
    * TIMESTAMP(NANOS) (surfaced as LongType nanos under nanosAsLong) and
    * as timestamp[us] (surfaced as TIMESTAMP_NTZ). Normalize to LongType
    * epoch-nanoseconds at the scan so every downstream consumer
    * (`ts div 1000` micro bucketing, Resample's integer-exact nanos path)
    * sees one shape whichever generation wrote the file. Values stay
    * within Long range until 2262, same bound as the nanos encoding.
    */
  def withNanosTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) | None => df
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000L"))
      case Some(other) =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected long nanos or timestamp")
    }

  /** CSV scan with header + schema inference — parity with the reference's
    * `spark.read.csv(..., header=True, inferSchema=True)`
    * (`app/AE_model.py:25-29`). At 100 TB inference costs an extra pass:
    * prefer an explicit schema via `csvWithSchema`.
    */
  def csvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  def csvWithSchema(spark: SparkSession, path: String,
                    schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** CSV sink — parity with the reference's anomaly-table export
    * (`app/AE_model.py:288-290`). Distributed write, no driver collect.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.option("header", "true").mode("overwrite").csv(path)

  /** JSON line source/sink — additional interchange format. */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC source/sink — the other columnar lake format Spark ships
    * natively; same pushdown/pruning properties as parquet
    * (PushedFilters in the scan node, vectorized reader).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Register every harness table as a temp view so the SQL entry
    * surface works (`spark.sql("SELECT … FROM lineitem")`) — parity
    * with the reference's SQL-on-catalog entry point
    * (`app/main.py:16-22`; here the "catalog" is the harness dir).
    * Views are lazy metadata: no data is read until a query runs.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(t => load(spark, dir, t).createOrReplaceTempView(t))

  def dropViews(spark: SparkSession): Unit =
    all.foreach(t => spark.catalog.dropTempView(t))

  /** Managed-table sink + lifecycle — parity with the reference's
    * Iceberg `writeTo(...).createOrReplace()` ingest and
    * `DROP TABLE ... PURGE` (`app/main.py:13-14,25`); here the catalog
    * is Spark's session catalog (swap in an Iceberg catalog config for
    * the lakehouse deployment — the API shape is identical).
    */
  def writeManagedTable(df: DataFrame, name: String): Unit =
    df.write.mode("overwrite").saveAsTable(name)

  def dropTable(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $name")

  /** Bucketed managed table: rows are hash-clustered into `nBuckets`
    * files by `bucketCols` and sorted within buckets. Two tables
    * bucketed the same way join WITHOUT a shuffle on either side — at
    * 100 TB this turns the fact⋈fact join from the dominant exchange
    * into a zip of co-located files. (Bucketing requires the session
    * catalog: `saveAsTable`, not a bare path.)
    */
  def writeBucketed(df: DataFrame, name: String, bucketCols: Seq[String],
                    nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(name)

  /** Hive-style partitioned parquet sink: one directory per partition
    * value. At 100 TB this is what makes downstream scans prunable —
    * a filter on a partition column never touches other partitions'
    * files (verify via `PartitionFilters` in the scan node).
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
