package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{PathKeys, ScopeMatch}
import graft.ingest.TitleExtractor

class ScopeAndPathSpec extends AnyFunSuite {

  // contract table from reference src/utils/scope-match.ts:39-58 + FIXTURES §3
  test("exact-or-descendant semantics") {
    assert(ScopeMatch.matches("/docs/api", "/docs/api"))
    assert(ScopeMatch.matches("/docs/api/x.md", "/docs/api"))
    assert(!ScopeMatch.matches("/docs/apiv2", "/docs/api"))
    assert(!ScopeMatch.matches("/docs/barista", "/docs/bar"))
  }

  test("trailing-slash equivalence") {
    assert(ScopeMatch.matches("/docs/api/x.md", "/docs/api/"))
    assert(ScopeMatch.normalizePrefix("/a/b//") === "/a/b")
    assert(ScopeMatch.normalizePrefix("/") === "/")
  }

  test("relative prefixes match nothing") {
    assert(!ScopeMatch.matches("/docs/api/x.md", "docs/api"))
    assert(!ScopeMatch.matches("docs/api/x.md", "docs/api"))
  }

  test("path keys: lexical normalize, never realpath") {
    assert(PathKeys.storageSpelling("/a/b/../c/./d.md") === "/a/c/d.md")
    assert(PathKeys.syncPathKey("/a/b/../c/d.md") === "/a/c/d.md")
    // key survives nonexistent paths (prune keys for deleted files)
    assert(PathKeys.syncPathKey("/definitely/not/there/x.md") === "/definitely/not/there/x.md")
    assert(PathKeys.realpathForMatch("/definitely/not/there/x.md") === "/definitely/not/there/x.md")
  }

  test("nested-root pruning: descendants dropped with ancestor attribution") {
    import graft.ingest.DirectoryScanner.pruneNestedRoots
    val (surviving, pruned) = pruneNestedRoots(Seq("/a", "/a/b", "/c", "/a/b/c", "/cd"))
    assert(surviving === Seq("/a", "/c", "/cd"))
    assert(pruned.toMap === Map("/a/b" -> "/a", "/a/b/c" -> "/a"))
    assert(pruneNestedRoots(Seq("/a", "/a"))._1 === Seq("/a")) // exact dedup
    assert(pruneNestedRoots(Seq("/ab", "/a"))._1 === Seq("/ab", "/a")) // not prefixes
    // root "/" covers everything (the "//"-prefix bug regression guard)
    assert(pruneNestedRoots(Seq("/", "/home/x"))._1 === Seq("/"))
  }

  test("display path abbreviates the home prefix only") {
    val home = sys.props("user.home")
    assert(PathKeys.displayPath(s"$home/docs/x.md") === "~/docs/x.md")
    assert(PathKeys.displayPath(home) === "~")
    assert(PathKeys.displayPath(s"${home}stead/x") === s"${home}stead/x")
    assert(PathKeys.displayPath("/other/place") === "/other/place")
  }

  // title extraction priority chains (reference title-extractor.ts:34-190)
  test("markdown title: frontmatter > H1 > filename") {
    val fm = "---\ntitle: From Frontmatter\n---\n# From H1\nbody"
    assert(TitleExtractor.markdown(fm, "/x/doc.md") ===
      TitleExtractor.Title("From Frontmatter", "metadata"))
    val h1 = "intro\n# From H1\nbody"
    assert(TitleExtractor.markdown(h1, "/x/doc.md") ===
      TitleExtractor.Title("From H1", "content"))
    assert(TitleExtractor.markdown("no title here", "/x/my-doc_name.md") ===
      TitleExtractor.Title("my doc name", "filename"))
  }

  test("txt title: first line iff followed by blank") {
    assert(TitleExtractor.text("The Title\n\nbody text", "/x/a.txt") ===
      TitleExtractor.Title("The Title", "content"))
    assert(TitleExtractor.text("not a title\nbody", "/x/a.txt") ===
      TitleExtractor.Title("a", "filename"))
  }
}
