package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scope (path-prefix) matching: a path is in scope iff it equals a prefix or
  * is a descendant of it — `/foo/bar` matches `/foo/bar/x` but NOT
  * `/foo/barista` (reference contract: `src/utils/scope-match.ts:39-58`).
  *
  * Implemented ONCE as a Column function so the "SQL twin vs JS twin in
  * lockstep" problem the reference documents (`src/utils/scope-match.ts:1-9`)
  * cannot arise: every Spark operator goes through this function, and plain
  * Scala callers use [[matches]] with identical semantics.
  */
object ScopeMatch {

  /** normalize a prefix: drop trailing slashes (but keep root "/") */
  def normalizePrefix(p: String): String = {
    val t = p.replaceAll("/+$", "")
    if (t.isEmpty) "/" else t
  }

  /** relative prefixes match nothing (reference: scope-match.ts:76-78) */
  def isUsablePrefix(p: String): Boolean = p.startsWith("/")

  private def childPrefix(p: String): String = if (p == "/") "/" else p + "/"

  /** plain-Scala twin (used by driver-side helpers and tests) */
  def matches(path: String, prefix: String): Boolean = {
    val p = normalizePrefix(prefix)
    isUsablePrefix(p) && (path == p || path.startsWith(childPrefix(p)))
  }

  /** Column predicate: path in scope of ANY of the prefixes.
    * startsWith compiles to a native StartsWith expression (codegen'd, and a
    * candidate for parquet row-group pruning on sorted path columns). */
  def inScope(path: Column, prefixes: Seq[String]): Column = {
    val usable = prefixes.map(normalizePrefix).filter(isUsablePrefix)
    if (usable.isEmpty) lit(false)
    else usable.map(p => path === lit(p) || path.startsWith(childPrefix(p))).reduce(_ || _)
  }
}
