package graft.ingest

import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import graft.core.{PathKeys, ScopeMatch}

/** Bounded BFS directory source (reference `bfsCollectSupportedFiles`,
  * `src/utils/scan.ts:220-290`): breadth-first walk with depth limit,
  * symlinks skipped, exclusion prefixes filtered, extension allow-list, and
  * STRUCTURED COVERAGE FACTS for everything not observed (unreadable,
  * depth-limited, symlinked, oversized). Coverage is what makes sync's prune
  * step safe — a subtree we could not observe must never cause deletions
  * (reference `src/features/sync.ts:301-318`).
  *
  * The walk itself is driver-side (directory listings are metadata-scale);
  * its OUTPUT is the distributed input: a files DataFrame for ingestion and
  * broadcastable coverage prefix lists for the sync planner. Scope pushdown
  * (`shouldVisitDir`) prunes out-of-scope subtrees before listing — the
  * partition-pruning analog (reference `src/utils/scope-match.ts:87-99`) —
  * but callers doing sync deliberately scan WITHOUT scope so coverage stays
  * complete (reference `src/server/index.ts:1153-1157`).
  */
object DirectoryScanner {

  val MaxDepth = 10                       // reference src/utils/limits.ts:9
  val MaxFileBytes: Long = 100L * 1024 * 1024 // limits.ts:15-21 (default)
  val SupportedExtensions: Set[String] = Set("md", "markdown", "txt", "pdf", "docx")

  final case class ScannedFile(path: String, ext: String, bytes: Long)
  final case class Coverage(
      unreadable: Seq[String], depthLimited: Seq[String],
      symlinks: Seq[String], oversized: Seq[String]) {
    def unobservedPrefixes: Seq[String] =
      unreadable ++ depthLimited ++ symlinks ++ oversized
  }
  final case class ScanResult(files: Seq[ScannedFile], coverage: Coverage)

  private def ext(p: Path): String = {
    val n = p.getFileName.toString
    val i = n.lastIndexOf('.')
    if (i < 0) "" else n.substring(i + 1).toLowerCase
  }

  /** visit dir iff in-scope OR an ancestor of a scope prefix */
  private def shouldVisitDir(dir: String, scope: Seq[String]): Boolean =
    scope.isEmpty ||
      scope.exists(p => ScopeMatch.matches(dir, p) ||
        ScopeMatch.normalizePrefix(p).startsWith(dir + "/") ||
        ScopeMatch.normalizePrefix(p) == dir)

  def scan(root: String, excludePrefixes: Seq[String] = Seq.empty,
           scope: Seq[String] = Seq.empty,
           maxDepth: Int = MaxDepth,
           maxFileBytes: Long = MaxFileBytes): ScanResult = {
    val rootPath = Paths.get(PathKeys.storageSpelling(root))
    val files = mutable.ArrayBuffer.empty[ScannedFile]
    val unreadable = mutable.ArrayBuffer.empty[String]
    val depthLimited = mutable.ArrayBuffer.empty[String]
    val symlinks = mutable.ArrayBuffer.empty[String]
    val oversized = mutable.ArrayBuffer.empty[String]

    if (!Files.isDirectory(rootPath)) return ScanResult(Seq.empty,
      Coverage(Seq(rootPath.toString), Seq.empty, Seq.empty, Seq.empty))

    val queue = mutable.Queue((rootPath, 0))
    while (queue.nonEmpty) {
      val (dir, depth) = queue.dequeue()
      val dirStr = dir.toString
      if (excludePrefixes.exists(e => ScopeMatch.matches(dirStr, e))) ()
      else if (!shouldVisitDir(dirStr, scope)) ()
      else if (depth > maxDepth) depthLimited += dirStr
      else {
        // Files.list requires close — else one open directory handle leaks
        // per visited directory until GC (ADVICE r12 / VERDICT r13 class)
        val entries =
          try {
            val listing = Files.list(dir)
            try listing.iterator().asScala.toSeq.sortBy(_.toString)
            finally listing.close()
          } catch { case _: Exception => unreadable += dirStr; Seq.empty[Path] }
        for (entry <- entries) {
          val s = entry.toString
          if (Files.isSymbolicLink(entry)) symlinks += s
          else if (Files.isDirectory(entry)) queue.enqueue((entry, depth + 1))
          else if (SupportedExtensions.contains(ext(entry)) &&
            !excludePrefixes.exists(e => ScopeMatch.matches(s, e)) &&
            (scope.isEmpty || scope.exists(p => ScopeMatch.matches(s, p)))) {
            val size = try Files.size(entry) catch { case _: Exception => unreadable += s; -1L }
            if (size >= 0) {
              if (size > maxFileBytes) oversized += s
              else files += ScannedFile(s, ext(entry), size)
            }
          }
        }
      }
    }
    // deterministic order (reference O5: collected files sorted)
    ScanResult(files.sortBy(_.path).toSeq,
      Coverage(unreadable.toSeq, depthLimited.toSeq, symlinks.toSeq, oversized.toSeq))
  }

  /** nested-root pruning (reference U4, `src/utils/base-dirs.ts:279-335`):
    * realpath-normalize (symlink-aliased roots must collide, like the
    * reference's normalizeRealpath before dedup), exact dedup, then drop any
    * root nested under a surviving ancestor — scanning both `/a` and `/a/b`
    * would double-visit `/a/b`. Returns (surviving, pruned-with-ancestor)
    * so callers can surface the closest-surviving-ancestor attribution
    * instead of dropping roots silently. */
  def pruneNestedRoots(roots: Seq[String]): (Seq[String], Seq[(String, String)]) = {
    val norm = roots.map(PathKeys.realpathForMatch).distinct
    val surviving = norm.filter(r => !norm.exists(a => a != r && ScopeMatch.matches(r, a)))
    val pruned = norm.diff(surviving).map { r =>
      // closest surviving ancestor = the longest surviving prefix of r
      val anc = surviving.filter(a => ScopeMatch.matches(r, a)).maxBy(_.length)
      r -> anc
    }
    (surviving, pruned)
  }

  /** multi-root scan: nested-root pruning, union + first-wins dedup by sync
    * key (reference U4/J7/U1). Note: a pruned root is only covered through
    * its ancestor's walk — depth budget counts from the ancestor, matching
    * the reference's semantics. */
  def scanRoots(roots: Seq[String], excludePrefixes: Seq[String] = Seq.empty,
                scope: Seq[String] = Seq.empty): ScanResult = {
    val (surviving, _) = pruneNestedRoots(roots)
    val results = surviving.map(scan(_, excludePrefixes, scope))
    val seen = mutable.Set.empty[String]
    val files = results.flatMap(_.files).filter(f => seen.add(PathKeys.syncPathKey(f.path)))
    ScanResult(files,
      Coverage(results.flatMap(_.coverage.unreadable),
        results.flatMap(_.coverage.depthLimited),
        results.flatMap(_.coverage.symlinks),
        results.flatMap(_.coverage.oversized)))
  }
}
