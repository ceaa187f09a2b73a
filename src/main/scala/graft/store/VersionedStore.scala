package graft.store

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.ChunkSchema

/** Snapshot-versioned chunk table: the Delta-style transaction layer the
  * reference approximates with backup/rollback around delete+insert
  * (`src/server/index.ts:645-701`) — rebuilt on the log-structured pattern
  * the lakehouse formats use (public design: the Delta Lake paper,
  * VLDB 2020):
  *
  *  - data files are immutable; a write only ADDS files under `data/`;
  *  - a snapshot is a manifest under `_log/` listing (bucket, file) pairs;
  *  - commit = write manifest to a temp name, then an atomic
  *    rename-if-absent to `v%08d.manifest` — Hadoop `rename` fails when the
  *    destination exists, which is the compare-and-swap: two writers racing
  *    to the same version number means exactly one wins;
  *  - the loser rebases: bucket-granular copy-on-write means a concurrent
  *    upsert to a DIFFERENT bucket commutes, so the retry re-reads the
  *    latest manifest and re-applies its single-bucket delta;
  *  - readers never lock: `read()` resolves the latest manifest and reads
  *    exactly those files, so a reader started on v_n is unaffected by a
  *    concurrent commit of v_{n+1} (files are never mutated in place);
  *  - `readVersion(v)` is time travel; `vacuum(keep)` drops manifests older
  *    than the kept window and any data file no kept manifest references.
  *
  * At 100 TB the manifest is itself a parquet table (file-level min/max
  * stats for pruning) — a text manifest keeps this slice dependency-free;
  * the commit protocol is identical.
  */
object VersionedStore {
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(logDir: String): Object =
    locks.computeIfAbsent(logDir, _ => new Object)
}

final class VersionedStore(spark: SparkSession, root: String, numBuckets: Int = 16) {

  private val dataDir = s"$root/data"
  private val logDir = s"$root/_log"

  private def fs: FileSystem =
    new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())

  def bucketOf(filePath: String): Long =
    math.floorMod(graft.ops.Dedup.hash60Scala(filePath), numBuckets.toLong)

  // ---- manifests ----

  private def manifestPath(v: Long): HPath =
    new HPath(f"$logDir/v$v%08d.manifest")

  /** versions present in the log, ascending */
  def versions(): Seq[Long] = {
    val p = new HPath(logDir)
    val f = fs
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong }
      .sorted.toSeq
  }

  def latestVersion(): Option[Long] = versions().lastOption

  /** manifest body: one "bucket<TAB>relativePath" line per data file */
  private def readManifest(v: Long): Seq[(Long, String)] = {
    val in = fs.open(manifestPath(v))
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).map { line =>
          val Array(b, p) = line.split("\t", 2)
          (b.toLong, p)
        }.toList
    } finally in.close()
  }

  /** atomic commit of `entries` as version `v`: returns false when v was
    * taken by a concurrent writer (caller rebases and retries).
    *
    * The compare-and-swap is exists-check + rename. On HDFS/object-store
    * committers rename-without-overwrite is atomic at the namenode, so the
    * check+rename pair is safe cross-process. The LOCAL filesystem's rename
    * silently replaces an existing destination (POSIX rename), so the
    * critical section is additionally serialized per log dir within the
    * JVM — which covers Spark's actual local topology (one driver commits;
    * executors never write the log). */
  private def tryCommit(v: Long, entries: Seq[(Long, String)]): Boolean = {
    val f = fs
    f.mkdirs(new HPath(logDir))
    val tmp = new HPath(s"$logDir/.tmp-${UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(entries.map { case (b, p) => s"$b\t$p" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val target = manifestPath(v)
    VersionedStore.lockFor(logDir).synchronized {
      if (f.exists(target)) { f.delete(tmp, false); false }
      else {
        val ok = f.rename(tmp, target)
        if (!ok) f.delete(tmp, false)
        ok
      }
    }
  }

  // ---- data files ----

  /** write df's rows for ONE bucket as immutable files; returns the new
    * (bucket, relativePath) entries */
  private def writeDataFiles(bucket: Long, df: DataFrame): Seq[(Long, String)] = {
    val f = fs
    f.mkdirs(new HPath(dataDir))
    val staging = s"$root/.staging-${UUID.randomUUID()}"
    df.write.mode(SaveMode.Overwrite).parquet(staging)
    val parts = f.listStatus(new HPath(staging))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val entries = parts.toSeq.map { s =>
      val name = s"b$bucket-${UUID.randomUUID()}.parquet"
      if (!f.rename(s.getPath, new HPath(s"$dataDir/$name")))
        throw new java.io.IOException(s"could not stage data file $name")
      (bucket, s"data/$name")
    }
    f.delete(new HPath(staging), true)
    entries
  }

  // ---- public API ----

  /** initialize an empty table (version 0, no files); no-op when it exists */
  def create(): Unit =
    if (latestVersion().isEmpty) {
      require(tryCommit(0L, Seq.empty), "concurrent create")
    }

  private def snapshotDF(entries: Seq[(Long, String)]): DataFrame =
    if (entries.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ChunkSchema.schema)
    else spark.read.schema(ChunkSchema.schema)
      .parquet(entries.map { case (_, p) => s"$root/$p" }: _*)

  /** read a specific snapshot (time travel) */
  def readVersion(v: Long): DataFrame = snapshotDF(readManifest(v))

  /** read the latest snapshot */
  def read(): DataFrame =
    latestVersion().map(readVersion).getOrElse(snapshotDF(Seq.empty))

  /** copy-on-write upsert of one file's chunks: rewrites ONLY the file's
    * bucket (other buckets' files are carried by reference), then commits
    * with CAS + rebase. Retries are bounded: bucket-disjoint writers always
    * commute, same-bucket writers serialize. */
  def upsertFile(filePath: String, newChunks: DataFrame,
                 maxRetries: Int = 20): Long = {
    require(newChunks.take(1).nonEmpty,
      s"refusing upsert of ZERO chunks for $filePath") // zero-chunk fail-fast
    val b = bucketOf(filePath)
    val base = latestVersion().getOrElse {
      create(); 0L
    }
    // rewrite the bucket once (against the base snapshot)...
    val entriesAtBase = readManifest(base)
    val bucketRows = snapshotDF(entriesAtBase.filter(_._1 == b))
      .filter(col("filePath") =!= filePath)
      .unionByName(newChunks.select(ChunkSchema.schema.fieldNames.map(col): _*))
    val newFiles = writeDataFiles(b, bucketRows)
    // ...then CAS-commit, rebasing the untouched-bucket references on
    // every retry. Same-bucket concurrent commits invalidate our rewrite
    // (it was computed against a stale bucket state) — redo those fully.
    var attempt = 0
    while (attempt < maxRetries) {
      val cur = latestVersion().getOrElse(0L)
      val curEntries = readManifest(cur)
      if (cur != base &&
          curEntries.filter(_._1 == b).toSet != entriesAtBase.filter(_._1 == b).toSet) {
        // Bucket conflict: our rewrite was computed against a stale bucket
        // state. Drop its (now superseded, never-referenced) data files and
        // redo with the REMAINING retry budget — passing the full budget back
        // made sustained same-bucket contention an unbounded livelock.
        val f = fs
        newFiles.foreach { case (_, p) => f.delete(new HPath(s"$root/$p"), false) }
        return upsertFile(filePath, newChunks, maxRetries - attempt - 1)
      }
      val next = curEntries.filterNot(_._1 == b) ++ newFiles
      if (tryCommit(cur + 1, next)) return cur + 1
      attempt += 1
    }
    throw new java.io.IOException(s"upsert of $filePath lost $maxRetries CAS races")
  }

  /** drop manifests older than the newest `keepVersions` and delete data
    * files no kept manifest references.
    *
    * `retentionMs` age-gates DATA-file deletion (Delta-style retention; the
    * reference uses a 60 s cleanup threshold for its backup dirs,
    * `src/server/index.ts:645-701`): an in-flight `upsertFile` stages its new
    * files into `data/` BEFORE the manifest commit, so an un-gated vacuum
    * racing that window would delete files the next commit references.
    * Files younger than the cutoff are always kept. */
  def vacuum(keepVersions: Int = 2, retentionMs: Long = 60000L): Unit = {
    val f = fs
    val vs = versions()
    if (vs.size <= keepVersions) return
    val (drop, keep) = vs.splitAt(vs.size - keepVersions)
    val referenced = keep.flatMap(readManifest).map(_._2).toSet
    drop.foreach(v => f.delete(manifestPath(v), false))
    val cutoff = System.currentTimeMillis() - math.max(0L, retentionMs)
    val dd = new HPath(dataDir)
    if (f.exists(dd)) {
      f.listStatus(dd).foreach { s =>
        if (!referenced.contains(s"data/${s.getPath.getName}") &&
            s.getModificationTime < cutoff)
          f.delete(s.getPath, false)
      }
    }
  }
}
