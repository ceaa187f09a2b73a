package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank over an edge list — the entity-importance weighting
  * corpus curation uses (domain/URL authority à la the public Common Crawl
  * ranking work) expressed as the classic iterative join-aggregate:
  *
  *   r_{k+1}(v) = (1-d)/N + d · ( Σ_{u→v} r_k(u)·w(u,v)/W(u) + D_k/N )
  *
  * with D_k the dangling mass (rank held by nodes without out-edges —
  * dropped on the floor by naive implementations, redistributed uniformly
  * here, so Σr stays 1 and ranks are comparable across graphs).
  *
  * Scale shape: one shuffle per iteration (the contribution aggregate); the
  * out-weight table is computed once and re-joined; the dangling mass is a
  * ONE-ROW broadcast, never a driver collect — `iters` iterations build a
  * single lazy plan. Iteration count is a semantic parameter (the oracle
  * unrolls the same count), not a convergence loop: data pipelines want
  * deterministic, replayable ranks, not float-threshold convergence races.
  */
object GraphRank {

  /** edges(src, dst, weight) → (v, r) after `iters` damped iterations */
  def pageRank(edges: DataFrame, iters: Int = 3,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 10, "iters in 1..10 (each adds a shuffle)")
    val nodes = edges.select(col("src").as("v"))
      .union(edges.select(col("dst").as("v")))
      .distinct().persist()
    val n = nodes.count().toDouble // one count; N is a plan literal below
    val outW = edges.groupBy("src").agg(sum("weight").as("w_out")).persist()
    var ranks = nodes.withColumn("r", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contribs = edges.join(outW, "src")
        .join(ranks.withColumnRenamed("v", "src"), "src")
        .select(col("dst").as("v"),
          (col("r") * col("weight") / col("w_out")).as("c"))
        .groupBy("v").agg(sum("c").as("contrib"))
      val dangling = ranks
        .join(outW.withColumnRenamed("src", "v"), Seq("v"), "left_anti")
        .agg(coalesce(sum("r"), lit(0.0)).as("dm")) // 1 row, broadcast below
      ranks = nodes
        .join(contribs, Seq("v"), "left_outer")
        .crossJoin(broadcast(dangling))
        .select(col("v"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) + col("dm") / n))
            .as("r"))
    }
    ranks
  }
}
