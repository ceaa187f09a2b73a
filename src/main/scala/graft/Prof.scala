package graft

import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** Dev profiling main: run named queries repeatedly in one session to split
  * fixed per-plan overhead (codegen compile, scan setup) from data work.
  *   tools/run.sh graft.Prof <sfDir> <name> [name...]   (each name runs 3x)
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args.tail; i <- 1 to 3) {
      val q = Registry.byName(name)
      val t0 = System.nanoTime()
      q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
