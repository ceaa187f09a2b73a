package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sync.SyncPlanner
import graft.sync.SyncPlanner._

/** Pure-planner fixtures from FIXTURES.md §4 / reference
  * src/features/__tests__/sync.test.ts shapes. */
class SyncPlannerSpec extends AnyFunSuite {

  private val cov0 = Coverage(Seq.empty)
  private val req0 = Request(Seq.empty, Seq.empty)

  test("unchanged file (hash match, single spelling) => skip") {
    val p = plan(
      Seq(DiskFile("/a/x.md", "/a/x.md", Some("h1"))),
      Seq(DbEntry("/a/x.md", "/a/x.md", Some("h1"))), cov0, req0)
    assert(p.skipped.map(_.key) === Seq("/a/x.md"))
    assert(p.upserts.isEmpty && p.prunes.isEmpty)
  }

  test("changed bytes => upsert") {
    val p = plan(
      Seq(DiskFile("/a/x.md", "/a/x.md", Some("h2"))),
      Seq(DbEntry("/a/x.md", "/a/x.md", Some("h1"))), cov0, req0)
    assert(p.upserts.map(_.key) === Seq("/a/x.md"))
  }

  test("hashless DB rows (pre-migration) => upsert, never skip") {
    val p = plan(
      Seq(DiskFile("/a/x.md", "/a/x.md", Some("h1"))),
      Seq(DbEntry("/a/x.md", "/a/x.md", None)), cov0, req0)
    assert(p.upserts.map(_.key) === Seq("/a/x.md"))
  }

  test("two stored spellings of one key => upsert + stale spelling delete") {
    val p = plan(
      Seq(DiskFile("/a/x.md", "/a/x.md", Some("h1"))),
      Seq(DbEntry("/a/x.md", "/a/x.md", Some("h1")),
        DbEntry("/a/x.md", "/a/X.md", Some("h1"))), cov0, req0)
    assert(p.upserts.length === 1)
    assert(p.upserts.head.staleSpellings === Seq("/a/X.md"))
  }

  test("file deleted from disk => prune") {
    val p = plan(Seq.empty, Seq(DbEntry("/a/gone.md", "/a/gone.md", Some("h"))), cov0, req0)
    assert(p.prunes.map(_.key) === Seq("/a/gone.md"))
  }

  test("deleted file under unobserved prefix => prune withheld") {
    val p = plan(Seq.empty, Seq(DbEntry("/a/deep/gone.md", "/a/deep/gone.md", Some("h"))),
      Coverage(Seq("/a/deep")), req0)
    assert(p.prunes.isEmpty)
    assert(p.held.map(_.key) === Seq("/a/deep/gone.md"))
  }

  test("deleted file under exclude prefix => prune withheld") {
    val p = plan(Seq.empty, Seq(DbEntry("/a/node_modules/x.md", "/a/node_modules/x.md", Some("h"))),
      cov0, Request(Seq.empty, Seq("/a/node_modules")))
    assert(p.prunes.isEmpty && p.held.length === 1)
  }

  test("file request: prune scope is equality, child rows survive") {
    val req = Request(Seq("/a/x.md"), Seq.empty, fileRequest = true)
    val p = plan(Seq.empty,
      Seq(DbEntry("/a/x.md", "/a/x.md", Some("h")),
        DbEntry("/a/x.md/child.md", "/a/x.md/child.md", Some("h"))), cov0, req)
    assert(p.prunes.map(_.key) === Seq("/a/x.md"))
    assert(p.held.map(_.key) === Seq("/a/x.md/child.md"))
  }

  test("directory request: out-of-scope db-only keys are held, not pruned") {
    val req = Request(Seq("/a/docs"), Seq.empty)
    val p = plan(Seq.empty,
      Seq(DbEntry("/a/docs/x.md", "/a/docs/x.md", Some("h")),
        DbEntry("/b/other.md", "/b/other.md", Some("h"))), cov0, req)
    assert(p.prunes.map(_.key) === Seq("/a/docs/x.md"))
    assert(p.held.map(_.key) === Seq("/b/other.md"))
  }

  test("property: actions partition all keys; prunes never intersect disk") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val keys = (0 until 30).map(i => s"/r/${rnd.nextInt(20)}/f$i.md")
      val disk = keys.filter(_ => rnd.nextBoolean())
        .map(k => DiskFile(k, k, Some(s"h${rnd.nextInt(3)}")))
      val db = keys.filter(_ => rnd.nextBoolean())
        .flatMap { k =>
          val n = 1 + rnd.nextInt(2)
          (0 until n).map(i => DbEntry(k, if (i == 0) k else k + ".alt", Some(s"h${rnd.nextInt(3)}")))
        }
      val cov = Coverage(if (rnd.nextBoolean()) Seq(s"/r/${rnd.nextInt(20)}") else Seq.empty)
      val p = plan(disk, db, cov, req0)
      val acted = p.upserts.map(_.key) ++ p.skipped.map(_.key) ++
        p.prunes.map(_.key) ++ p.held.map(_.key)
      assert(acted.distinct.size === acted.size)
      assert(acted.toSet === (disk.map(_.key) ++ db.map(_.key)).toSet)
      // prune safety: never prune something on disk, never prune unobserved
      val diskKeys = disk.map(_.key).toSet
      assert(p.prunes.forall(pr => !diskKeys.contains(pr.key)))
      assert(p.prunes.forall(pr =>
        !cov.unobservedPrefixes.exists(pre => graft.core.ScopeMatch.matches(pr.key, pre))))
      // disk keys are never held or pruned
      assert(p.held.forall(h => !diskKeys.contains(h.key)))
    }
  }
}
