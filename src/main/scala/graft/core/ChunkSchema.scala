package graft.core

import org.apache.spark.sql.types._

/** The engine's one persistent table (reference `VectorChunk`,
  * `src/vectordb/types.ts:83-102`; see FIXTURES.md §1). Schema is fixed up
  * front — the reference's first-insert inference + ''-seeding is a LanceDB
  * workaround, not semantics to keep.
  */
object ChunkSchema {

  final case class ChunkMetadata(fileName: String, fileSize: Long, fileType: String)

  final case class ChunkRow(
      id: String,
      filePath: String,
      chunkIndex: Int,
      text: String,
      vector: Array[Float],
      metadata: ChunkMetadata,
      fileTitle: Option[String],
      contentHash: Option[String],
      timestamp: String)

  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("filePath", StringType, nullable = false),
    StructField("chunkIndex", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("vector", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("metadata", StructType(Seq(
      StructField("fileName", StringType, nullable = false),
      StructField("fileSize", LongType, nullable = false),
      StructField("fileType", StringType, nullable = false))), nullable = false),
    StructField("fileTitle", StringType, nullable = true),
    StructField("contentHash", StringType, nullable = true),
    StructField("timestamp", StringType, nullable = false)))
}
