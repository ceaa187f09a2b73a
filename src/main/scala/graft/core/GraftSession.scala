package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the settings we want everywhere (tests, bench,
  * verify): UTC, AQE on, shuffle partitions sized to local cores rather than
  * the 200 default (on a real cluster this would be set to ~2-3x total cores;
  * AQE coalesces down from there).
  */
object GraftSession {
  def local(threads: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
