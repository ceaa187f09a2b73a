package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: where does d_corpus_pipeline's wall go — the scan, the
  * quality projection, the fingerprint groupBy, the LSH+verify leg, or the
  * decontamination join? (r15 VERDICT ask #4: attribute the last
  * multi-second headliner, and check whether the five stage counts
  * recompute work the persisted frames should have absorbed.)
  *
  *   tools/run.sh graft.PipelineProbe /root/testdata/sf0.1
  *   tools/run.sh graft.PipelineProbe /tmp/stress_r14/sf_x100   # ×100 twin
  *
  * Each cumulative arm builds a FRESH funnel (graft.ops.CleanCorpus over
  * the d_corpus_pipeline dup-injected corpus), counts one stage frame, and
  * releases — so arm N minus arm N-1 attributes stage N's marginal cost.
  * The `warm_*` arms count stage 4 then stage 5 inside ONE funnel
  * instance: stage 5's marginal wall on warm caches is exactly the
  * "re-derive decontaminated from nearShingled" cost the verdict flagged.
  * Walls are 3-run bands; shuffle/spill off the listener bus is the
  * signal (this VM's wall noise is documented in PERF.md). */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.GraftSession.quietNoisyLoggers()

    val collector = new graft.core.TaskMetricsCollector
    spark.sparkContext.addSparkListener(collector)
    def t(name: String)(body: => Unit): Unit = {
      for (i <- 1 to 3) {
        collector.reset()
        val t0 = System.nanoTime()
        body
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // listener bus drain
        println(f"$name run$i $sec%.2f s shufW=${collector.shuffleWrite / 1e6}%.1fMB " +
          f"spill=${collector.totalSpill / 1e6}%.1fMB maxTaskSpill=${collector.maxTaskSpill / 1e6}%.1fMB")
      }
    }

    def corpus = graft.queries.DedupQueries.dupCorpus(spark, d)
    def funnel() = graft.ops.CleanCorpus.cleanCorpusReleasable(
      corpus, "doc_id", "text", isHoldout = Some(col("doc_id") % 97 === 0))

    t("raw_scan_count") { corpus.count(): Unit }
    // cum2 sub-decomposition: the funnel's BUILD is not free when a holdout
    // predicate is given (the decontamination broadcast's limit-probe runs
    // eagerly, r16), and the quality frame persists — separate the three
    t("build_only_holdout") {
      val (_, rel) = funnel(); rel()
    }
    t("quality_filter_nocache") {
      val g = graft.ops.TextAnalysis.gopherRules(col("text"))
      corpus.filter(g.getField("n_words").between(20, 100000) &&
        g.getField("symbol_ratio") < 0.1 &&
        g.getField("bullet_ratio") <= 0.9 &&
        g.getField("ellipsis_ratio") <= 0.3).count(): Unit
    }
    t("cum2_quality_noholdout") {
      val (st, rel) = graft.ops.CleanCorpus.cleanCorpusReleasable(
        corpus, "doc_id", "text")
      st.quality.count(): Unit; rel()
    }
    t("cum2_quality") {
      val (st, rel) = funnel(); st.quality.count(): Unit; rel()
    }
    t("cum3_exact") {
      val (st, rel) = funnel(); st.exactDeduped.count(): Unit; rel()
    }
    t("cum4_near") {
      val (st, rel) = funnel(); st.nearDeduped.count(): Unit; rel()
    }
    t("cum5_decon") {
      val (st, rel) = funnel(); st.decontaminated.count(): Unit; rel()
    }
    // stage-5 marginal cost on WARM caches: the re-derive the verdict
    // flagged (stage counts 4 and 5 both re-evaluate nearShingled's anti
    // join off the persisted exactShingled + pair list)
    t("warm_near_then_decon") {
      val (st, rel) = funnel()
      st.nearDeduped.count(): Unit
      val t0 = System.nanoTime()
      st.decontaminated.count(): Unit
      println(f"  (decon marginal: ${(System.nanoTime() - t0) / 1e9}%.2f s)")
      rel()
    }
    // the registry query's exact shape: all five counts, one funnel
    t("full_query_5counts") {
      val (st, rel) = funnel()
      def stage(name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("docs")).select(lit(name).as("stage"), col("docs"))
      stage("1_raw", st.corpus)
        .union(stage("2_quality", st.quality))
        .union(stage("3_exact_dedup", st.exactDeduped))
        .union(stage("4_near_dedup", st.nearDeduped))
        .union(stage("5_decontaminated", st.decontaminated))
        .orderBy("stage").collect(): Unit
      rel()
    }
    spark.stop()
  }
}
