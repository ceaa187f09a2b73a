package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Accessors for the driver-provided test tables (TESTDATA.md).
  *
  * Every query entry point receives `(spark, sfDir)` and loads through here so
  * path handling and any future source options live in one place. Reads are
  * plain parquet scans — Catalyst handles column pruning + predicate pushdown,
  * which is the load-bearing property at 100 TB (only the referenced columns
  * and row groups are read).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark only reads as a raw
    // long (spark.sql.legacy.parquet.nanosAsLong). Convert to a microsecond
    // TIMESTAMP here (integer division — exact), matching DuckDB's own
    // ns→µs truncation, so downstream operators see a real timestamp column.
    df.schema.find(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case None => df
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
