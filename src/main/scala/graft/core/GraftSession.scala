package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the settings we want everywhere (tests, bench,
  * verify): UTC, AQE on, shuffle partitions sized to local cores rather than
  * the 200 default (on a real cluster this would be set to ~2-3x total cores;
  * AQE coalesces down from there).
  */
object GraftSession {

  /** Silence per-row/per-query log noise whose conditions are deliberate
    * here: WindowExec's "no partition defined" fires on the bounded
    * (≤ 2·limit) post-top-k candidate windows in HybridSearch, where a
    * single partition is the design (a constant partitionBy key would just
    * be constant-folded away). Call after session creation. */
  def quietNoisyLoggers(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

  /** Release EVERY stored block: cached Datasets (CacheManager) AND
    * RDD-level blocks that `clearCache()` cannot see — `localCheckpoint`
    * blocks are persisted directly on the RDD, bypass the CacheManager, and
    * are otherwise only released when the ContextCleaner happens to GC the
    * last reference. A long single-JVM run (Bench's 28 queries, Verify's
    * ~90) accumulates those blocks until they squeeze execution memory; a
    * real cluster recycles executors between jobs and never sees this.
    * Blocking unpersist so the next query starts from a clean BlockManager
    * rather than racing the async release. */
  def releaseAllBlocks(spark: SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  }

  def local(threads: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // external bucketed tables carry their own path; this only keeps the
      // (otherwise empty) default warehouse dir out of the repo checkout
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    quietNoisyLoggers()
    spark
  }
}
