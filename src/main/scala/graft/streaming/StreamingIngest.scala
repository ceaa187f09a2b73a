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
