package graft.ingest

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.UUID

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.chunker.MaxMinChunker
import graft.core.ChunkSchema.{ChunkMetadata, ChunkRow}
import graft.embed.Embedder

/** The ingestion dataflow (reference §3.2: parse → chunk → embed → rows).
  *
  * Chunking + embedding run inside `mapPartitions`: one embedder instance per
  * partition, each document processed sequentially (Max-Min is
  * order-dependent per document — SURVEY §7 "what's hard" #1). Documents are
  * the unit of parallelism, which is the right grain at 100 TB: a corpus is
  * billions of docs × KBs, not one doc × TBs.
  */
object Ingest {

  final case class Doc(filePath: String, content: String)

  class NoChunksError(filePath: String)
    extends RuntimeException(s"document produced zero chunks: $filePath")

  def sha256Hex(content: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(content.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Deterministic chunk id (name-based UUID over filePath+index+timestamp —
    * the reference uses randomUUID, `src/ingest/compute.ts:129`; determinism
    * is strictly better for a re-runnable batch engine). */
  def chunkId(filePath: String, chunkIndex: Int, timestamp: String): String =
    UUID.nameUUIDFromBytes(s"$filePath#$chunkIndex@$timestamp"
      .getBytes(StandardCharsets.UTF_8)).toString

  /** assemble full chunk rows for one document (shared by the batch and
    * streaming ingest paths) */
  def assembleRows(doc: Doc, chunks: Seq[MaxMinChunker.TextChunk],
                   vectors: Seq[Array[Float]], timestamp: String): Iterator[ChunkRow] = {
    val content = Option(doc.content).getOrElse("")
    val title = TitleExtractor.forFile(content, doc.filePath)
    val hash = sha256Hex(content)
    val fileName = doc.filePath.substring(doc.filePath.lastIndexOf('/') + 1)
    val fileType = doc.filePath.substring(doc.filePath.lastIndexOf('.') + 1)
    chunks.iterator.zip(vectors.iterator).map { case (c, v) =>
      ChunkRow(
        id = chunkId(doc.filePath, c.index, timestamp),
        filePath = doc.filePath,
        chunkIndex = c.index,
        text = c.text,
        vector = v,
        metadata = ChunkMetadata(fileName, content.length.toLong, fileType),
        fileTitle = Some(title.value),
        contentHash = Some(hash),
        timestamp = timestamp)
    }
  }

  /** docs(filePath, content) → full chunk rows (ChunkSchema). One shared
    * timestamp per ingest batch (reference `src/ingest/compute.ts:122,142`). */
  def buildChunks(docs: Dataset[Doc], mkEmbedder: () => Embedder,
                  timestamp: String,
                  cfg: MaxMinChunker.Config = MaxMinChunker.Config()): Dataset[ChunkRow] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      val embedder = mkEmbedder()
      it.flatMap { doc =>
        val content = Option(doc.content).getOrElse("")
        val chunks = MaxMinChunker.chunkText(content, embedder.embedBatch, cfg = cfg)
        if (chunks.isEmpty) Iterator.empty
        else assembleRows(doc, chunks, embedder.embedBatch(chunks.map(_.text)), timestamp)
      }
    }
  }

  /** DataFrame convenience: df(filePath, content) → chunk rows */
  def buildChunksDF(spark: SparkSession, docs: DataFrame, mkEmbedder: () => Embedder,
                    timestamp: String): DataFrame = {
    import spark.implicits._
    buildChunks(docs.select("filePath", "content").as[Doc], mkEmbedder, timestamp).toDF()
  }
}
