package graft.sync

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.ScopeMatch

/** Sync reconciliation planning — the flagship join of the rebuild
  * (reference `src/features/sync.ts:251-319`, SURVEY §2.3 J1/J2).
  *
  * disk manifest (key → {path, hash}) FULL OUTER JOIN db manifest grouped by
  * key (key → {spellings, hashes}):
  *   - both + converged (exactly ONE stored spelling AND every stored hash
  *     equals the disk hash, `sync.ts:237-239`) → skip
  *   - both + dirty → upsert (+ stale-spelling deletes for every OTHER
  *     stored spelling, `sync.ts:293-298`)
  *   - disk-only → upsert
  *   - db-only → prune, GUARDED (`sync.ts:301-318`): only when the key is in
  *     the requested scope, NOT under any unobserved coverage prefix
  *     (unreadable / depth-limited / symlinked / oversized), and NOT under an
  *     exclude prefix. A guarded key is held (no action) — losing coverage
  *     facts must never delete data.
  *
  * Two implementations with identical semantics:
  *  - [[plan]]: pure Scala over in-memory manifests (property-testable, the
  *    reference keeps this a pure function and so do we);
  *  - [[planDF]]: the same classification as a Spark full-outer join for
  *    manifest scale (billions of keys) — disk and db manifests shuffle on
  *    `key` once; guards are broadcast prefix lists.
  */
object SyncPlanner {

  final case class DiskFile(key: String, path: String, hash: Option[String])
  final case class DbEntry(key: String, path: String, hash: Option[String])
  final case class Coverage(unobservedPrefixes: Seq[String])
  final case class Request(scope: Seq[String], excludePrefixes: Seq[String],
                           fileRequest: Boolean = false)

  sealed trait Action
  final case class Upsert(key: String, path: String, hash: Option[String],
                          staleSpellings: Seq[String]) extends Action
  final case class Skip(key: String) extends Action
  final case class Prune(key: String, spellings: Seq[String]) extends Action
  final case class Hold(key: String) extends Action

  final case class Plan(upserts: Seq[Upsert], skipped: Seq[Skip],
                        prunes: Seq[Prune], held: Seq[Hold])

  private def underAny(key: String, prefixes: Seq[String]): Boolean =
    prefixes.exists(p => ScopeMatch.matches(key, p))

  /** scope test for prune: prefix semantics for directory requests,
    * EQUALITY for single-file requests — a stored `<file>/child.md` row
    * survives a file request (reference `sync.ts:259-265`) */
  private def inPruneScope(key: String, req: Request): Boolean =
    if (req.fileRequest) req.scope.contains(key)
    else req.scope.isEmpty || underAny(key, req.scope)

  def plan(disk: Seq[DiskFile], db: Seq[DbEntry], cov: Coverage, req: Request): Plan = {
    val diskByKey = disk.groupBy(_.key).view.mapValues(_.head).toMap
    val dbByKey = db.groupBy(_.key)

    val upserts = Seq.newBuilder[Upsert]
    val skipped = Seq.newBuilder[Skip]
    val prunes = Seq.newBuilder[Prune]
    val held = Seq.newBuilder[Hold]

    for ((key, d) <- diskByKey.toSeq.sortBy(_._1)) {
      dbByKey.get(key) match {
        case None => upserts += Upsert(key, d.path, d.hash, Seq.empty)
        case Some(entries) =>
          val spellings = entries.map(_.path).distinct
          val converged = spellings.size == 1 &&
            entries.forall(e => e.hash.isDefined && d.hash.isDefined && e.hash == d.hash)
          if (converged) skipped += Skip(key)
          else upserts += Upsert(key, d.path, d.hash, spellings.filterNot(_ == d.path))
      }
    }
    for ((key, entries) <- dbByKey.toSeq.sortBy(_._1) if !diskByKey.contains(key)) {
      val guarded = !inPruneScope(key, req) ||
        underAny(key, cov.unobservedPrefixes) ||
        underAny(key, req.excludePrefixes)
      if (guarded) held += Hold(key)
      else prunes += Prune(key, entries.map(_.path).distinct)
    }
    Plan(upserts.result(), skipped.result(), prunes.result(), held.result())
  }

  /** the shared full-outer reconciliation: disk ⟗ grouped db + action
    * classification. `withSpellings` additionally carries the stored
    * spellings through the aggregate (needed to EXECUTE a plan, not to
    * summarize one). */
  private def reconcile(disk: DataFrame, db: DataFrame,
                        unobservedPrefixes: Seq[String],
                        scope: Seq[String], excludePrefixes: Seq[String],
                        fileRequest: Boolean, withSpellings: Boolean): DataFrame = {
    val baseAggs = Seq(
      countDistinct(col("spelling")).as("n_spellings"),
      countDistinct(col("hash")).as("n_hashes"),
      max(col("hash")).as("one_hash"),
      sum(when(col("hash").isNull, 1).otherwise(0)).as("null_hashes"))
    val aggs = if (withSpellings)
      baseAggs :+ sort_array(collect_set(col("spelling"))).as("spellings")
    else baseAggs
    val dbAgg = db.groupBy("key").agg(aggs.head, aggs.tail: _*)
    val diskR = disk.withColumnRenamed("hash", "disk_hash")
    def guardedCol(key: Column): Column = {
      // prune-scope: prefix semantics for directory requests, EQUALITY for
      // single-file requests (mirrors inPruneScope / reference sync.ts:259-265)
      val inScope =
        if (scope.isEmpty) lit(true)
        else if (fileRequest) key.isin(scope: _*)
        else ScopeMatch.inScope(key, scope)
      val unobserved = if (unobservedPrefixes.isEmpty) lit(false)
        else ScopeMatch.inScope(key, unobservedPrefixes)
      val excluded = if (excludePrefixes.isEmpty) lit(false)
        else ScopeMatch.inScope(key, excludePrefixes)
      !inScope || unobserved || excluded
    }
    diskR.join(dbAgg, Seq("key"), "full_outer")
      .withColumn("action",
        when(col("disk_hash").isNotNull && col("n_spellings").isNull, lit("upsert"))
          .when(col("disk_hash").isNotNull && col("n_spellings") === 1 &&
            col("n_hashes") === 1 && col("null_hashes") === 0 &&
            col("one_hash") === col("disk_hash"), lit("skip"))
          .when(col("disk_hash").isNotNull, lit("upsert"))
          .otherwise(when(guardedCol(col("key")), lit("hold")).otherwise(lit("prune"))))
  }

  /** DataFrame form: disk(key, hash) ⟗ db(key, spelling, hash) →
    * (key, action, n_spellings). Same classification as [[plan]].
    * Note `hash IS NOT NULL` participates in convergence: hashless rows
    * (pre-migration or unreadable) are never "converged". */
  def planDF(disk: DataFrame, db: DataFrame,
             unobservedPrefixes: Seq[String],
             scope: Seq[String] = Seq.empty,
             excludePrefixes: Seq[String] = Seq.empty): DataFrame =
    reconcile(disk, db, unobservedPrefixes, scope, excludePrefixes,
        fileRequest = false, withSpellings = false)
      .select(col("key"), col("action"),
        coalesce(col("n_spellings"), lit(0L)).as("n_spellings"))

  /** Executable action-plan form for the DISTRIBUTED sync gather: one row per
    * key carrying everything the execute loop needs — the disk spelling to
    * (re)ingest, the stored spellings that differ from it (stale deletes),
    * and the spellings to prune. The caller aggregates skip/hold COUNTS and
    * collects only upsert/prune rows: the manifests (potentially billions of
    * keys) never reach the driver, only the work items do.
    *
    * disk(key, path, hash) ⟗ db(key, spelling, hash) →
    * (key, action, path, stale_spellings, spellings). */
  def planActionsDF(disk: DataFrame, db: DataFrame,
                    unobservedPrefixes: Seq[String],
                    scope: Seq[String] = Seq.empty,
                    excludePrefixes: Seq[String] = Seq.empty,
                    fileRequest: Boolean = false): DataFrame =
    reconcile(disk, db, unobservedPrefixes, scope, excludePrefixes,
        fileRequest, withSpellings = true)
      .select(col("key"), col("action"), col("path"),
        when(col("spellings").isNotNull,
          array_remove(col("spellings"), col("path")))
          .otherwise(array().cast("array<string>")).as("stale_spellings"),
        coalesce(col("spellings"), array().cast("array<string>")).as("spellings"))
}
