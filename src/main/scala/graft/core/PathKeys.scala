package graft.core

import java.nio.file.{Files, Path, Paths}

/** The reference's "path-identity trinity" — three DISTINCT key functions
  * with non-interchangeable roles (`src/utils/sync-path-key.ts:29-34`,
  * `src/utils/scan.ts:34-65`, `src/utils/base-dirs.ts:21-34`):
  *
  *  - [[storageSpelling]]: lexical resolve() spelling — what gets stored in
  *    `filePath` and used for delete/lookup. Never follows symlinks.
  *  - [[syncPathKey]]: lexical normalize + case-fold on Windows — the JOIN
  *    key for reconciliation. Must work for paths that no longer exist on
  *    disk (deleted files still need prune keys), hence lexical-only.
  *  - [[realpathForMatch]]: filesystem realpath with identity fallback —
  *    ONLY for the security/identity boundary (does this scanned file equal
  *    that ingested file), never for storage.
  *
  * Collapsing these into one function is the documented failure mode — keep
  * three names.
  */
object PathKeys {

  private val isWindows = sys.props.getOrElse("os.name", "").toLowerCase.contains("win")

  /** lexical absolute-normalize: resolve `.`/`..`, keep symlinks unresolved */
  def storageSpelling(p: String): String =
    Paths.get(p).toAbsolutePath.normalize.toString

  /** reconciliation key: lexical normalize, case-folded on win32 only */
  def syncPathKey(p: String): String = {
    val n = storageSpelling(p)
    if (isWindows) n.toLowerCase else n
  }

  /** realpath if the file exists, else the lexical spelling (reference
    * `realpathForMatch`, `src/utils/scan.ts:34-40`) */
  def realpathForMatch(p: String): String = {
    val path = Paths.get(p)
    try {
      if (Files.exists(path)) path.toRealPath().toString
      else storageSpelling(p)
    } catch { case _: Exception => storageSpelling(p) }
  }

  /** user-facing display abbreviation: `$HOME` prefix → `~` (reference F18,
    * `src/utils/base-dirs.ts:95-107` — usernames must not leak into
    * responses served over a protocol boundary). Case-folded and
    * either-separator on Windows, like the reference. */
  def displayPath(p: String): String = {
    val home = sys.props.getOrElse("user.home", "")
    if (home.isEmpty) return p
    val (cp, ch) = if (isWindows) (p.toLowerCase, home.toLowerCase) else (p, home)
    val isUnder = cp == ch ||
      cp.startsWith(ch + "/") || (isWindows && cp.startsWith(ch + "\\"))
    if (isUnder) "~" + p.substring(home.length) else p
  }

  /** canonicalize a user-requested path: realpath(parent) + basename —
    * validates the ancestry without requiring the leaf to exist
    * (reference `canonicalizeRequestedPath`, `src/utils/scan.ts:59-65`) */
  def canonicalizeRequestedPath(p: String): String = {
    val path = Paths.get(p).toAbsolutePath.normalize
    val parent = Option(path.getParent)
    parent match {
      case Some(par) if Files.exists(par) =>
        try par.toRealPath().resolve(path.getFileName).toString
        catch { case _: Exception => path.toString }
      case _ => path.toString
    }
  }
}
