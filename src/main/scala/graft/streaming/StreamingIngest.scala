package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.chunker.MaxMinChunker
import graft.core.ChunkSchema.ChunkRow
import graft.embed.Embedder
import graft.ingest.Ingest

/** Structured Streaming surfaces. The reference has no stream processing
  * (SURVEY §2.10) — its only async is a driver-side sync job — but a
  * continuously-arriving corpus is the natural 100 TB deployment shape, so
  * the ingestion dataflow is exposed as an incremental streaming job
  * (readStream → same per-document chunk+embed stages → writeStream), plus
  * the standard event-time operators a training-data pipeline needs.
  *
  * The batch and streaming paths share `Ingest`'s per-document logic — one
  * code path, two triggers (the `Trigger.AvailableNow` reconciliation
  * pattern SURVEY §2.10 calls the optional stretch).
  */
object StreamingIngest {

  /** streaming docs(filePath, content) → streaming chunk rows; identical
    * semantics to Ingest.buildChunks (mapPartitions is stateless per batch) */
  def chunkStream(docs: Dataset[Ingest.Doc], mkEmbedder: () => Embedder,
                  timestamp: String): Dataset[ChunkRow] =
    Ingest.buildChunks(docs, mkEmbedder, timestamp) // one code path, two triggers

  /** event-time windowed counts with a watermark — late data beyond the
    * watermark is dropped, state is bounded */
  def windowedCounts(events: DataFrame, watermark: String = "30 minutes",
                     window: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("event_type"), col("cnt"))

  private val sinkCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Run the watermarked hourly rollup as a real Structured Streaming job
    * over the events parquet (AvailableNow trigger → terminates when the
    * backlog drains) and return the final result table. Complete output
    * mode makes the result deterministic and equal to the batch aggregation
    * — which is exactly what the DuckDB oracle checks. The production twin
    * runs the same plan with a micro-batch trigger and append mode. */
  def hourlyRollupAvailableNow(spark: org.apache.spark.sql.SparkSession,
                               eventsPath: String): DataFrame = {
    val schema = spark.read.parquet(eventsPath).schema // ts = long (nanosAsLong)
    // FileStreamSource insists its basePath be a directory (it treats the
    // monitored path as the partition-discovery root), so a single flat
    // parquet file can't be streamed directly — stage a symlink to it in a
    // fresh temp dir and stream that dir. (Production corpora are
    // directories of part files anyway; this shim is test-data-shaped.)
    val stageDir = java.nio.file.Files.createTempDirectory("graft_stream_src")
    stageDir.toFile.deleteOnExit()
    val target = java.nio.file.Paths.get(eventsPath).toAbsolutePath
    java.nio.file.Files.createSymbolicLink(
      stageDir.resolve(target.getFileName.toString), target)
    val raw = spark.readStream.schema(schema).parquet(stageDir.toString)
    val ev = raw.withColumn("ts",
      timestamp_micros(expr("ts DIV 1000"))) // same ns→µs cast as Tables.load
    val agg = ev
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 8)))
          .cast("double").as("sum_value"))
    val name = s"graft_stream_rollup_${sinkCounter.incrementAndGet()}"
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).select(
      date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour"),
      col("event_type"), col("cnt"), col("sum_value"))
  }

  final case class SessionState(count: Long, lastTs: Long)
  final case class SessionUpdate(userId: Long, events: Long, closed: Boolean)

  /** custom stateful sessionization via mapGroupsWithState: per-user running
    * session state across micro-batches (a production variant would add an
    * event-time timeout to close idle sessions and bound state) */
  def sessionize(events: Dataset[(Long, Long)]): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[SessionState, SessionUpdate](GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0L, 0L))
          val incoming = rows.toSeq
          val st = SessionState(prev.count + incoming.size,
            math.max(prev.lastTs, if (incoming.isEmpty) 0L else incoming.map(_._2).max))
          state.update(st)
          SessionUpdate(userId, st.count, closed = false)
      }
  }

  /** run the streaming ingest over a directory of text files using
    * AvailableNow (incremental batch), writing chunk parquet + checkpoint */
  def runAvailableNow(docs: Dataset[Ingest.Doc], mkEmbedder: () => Embedder,
                      timestamp: String, outPath: String, checkpoint: String): Unit = {
    val q = chunkStream(docs, mkEmbedder, timestamp)
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
