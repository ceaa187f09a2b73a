package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch probe: where does q1_pricing_summary's wall go — the scan, the
  * wide-decimal (precision 30) aggregation buffers, or the floor?
  * tools/run.sh graft.Q1Probe /root/testdata/sf0.1 */
object Q1Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.core.Tables.lineitem(spark, args(0))
    def t(name: String)(body: => Unit): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        body
        println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    t("scan_only") {
      li.select("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount")
        .write.format("noop").mode("overwrite").save()
    }
    t("double_sums") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), sum("l_extendedprice"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    t("decimal30_sums") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast(DecimalType(30, 2))),
          sum(col("l_extendedprice").cast(DecimalType(30, 2))),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(30, 8))),
          count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    t("decimal18_sums") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(18, 8))),
          count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    t("decimal8_compact_sums") {
      // sum over DECIMAL(8,2) → result DECIMAL(18,2) → COMPACT (long-backed)
      // aggregation buffer; per-row (8,2) is exact for 2dp values < 1e6
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast(DecimalType(8, 2))),
          sum(col("l_extendedprice").cast(DecimalType(8, 2))),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(8, 2))),
          count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    t("mixed_disc30_only") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast(DecimalType(8, 2))),
          sum(col("l_extendedprice").cast(DecimalType(8, 2))),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(30, 8))),
          count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    t("disc_unscaled_long_split") {
      // the disc term's (30,8) per-row semantics reproduced as an unscaled
      // long (BigDecimal(toString).setScale(8, HALF_UP) — the exact code
      // path Spark's double->decimal cast runs), then summed as TWO compact
      // long columns (whole units, 1e8-fraction) to dodge the wide buffer
      val unscaled8 = udf { (x: Double) =>
        java.math.BigDecimal.valueOf(x)
          .setScale(8, java.math.RoundingMode.HALF_UP)
          .unscaledValue().longValueExact()
      }
      li.withColumn("_k", unscaled8(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(expr("_k div 100000000")).as("hi"),
          sum(col("_k") % 100000000L).as("lo"),
          count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    t("cents_long_sums") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum((col("l_quantity") * 100).cast("long")),
          sum((col("l_extendedprice") * 100).cast("long")),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 1e8).cast("long")),
          count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
