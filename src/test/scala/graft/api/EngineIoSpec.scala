package graft.api

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Executor-side file-read seam of the batched sync gather
  * ([[Engine.readFileBytes]]): schemeless paths take the java.nio fast
  * path; scheme-qualified URIs go through Hadoop FileSystem — with the
  * caller's Configuration when one is supplied (the conf carries
  * spark.hadoop.* credentials/tuning on a real deployment). */
class EngineIoSpec extends AnyFunSuite {

  private def tempFile(bytes: Array[Byte]): java.nio.file.Path = {
    val f = Files.createTempFile("graft-io", ".bin")
    Files.write(f, bytes)
    f.toFile.deleteOnExit()
    f
  }

  test("schemeless path reads via java.nio") {
    val payload = Array.tabulate[Byte](4096)(i => (i * 31).toByte)
    val f = tempFile(payload)
    assert(Engine.readFileBytes(f.toString).sameElements(payload))
  }

  test("file: URI reads through Hadoop FileSystem, default and supplied conf") {
    val payload = "graft hadoop read éß".getBytes("UTF-8")
    val f = tempFile(payload)
    val uri = f.toUri.toString // file:///...
    assert(uri.startsWith("file:"))
    assert(Engine.readFileBytes(uri).sameElements(payload))
    // a supplied conf is honored (the broadcast-rebuilt executor shape:
    // Configuration(false) + explicit entries, no default resources)
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.set("fs.file.impl", classOf[org.apache.hadoop.fs.LocalFileSystem].getName)
    assert(Engine.readFileBytes(uri, Some(conf)).sameElements(payload))
  }

  test("windows-style or odd relative paths without a scheme still go to java.nio") {
    // ":/" is the scheme probe; a plain relative path must not match it
    val payload = "relative".getBytes("UTF-8")
    val f = tempFile(payload)
    val rel = java.nio.file.Paths.get("").toAbsolutePath
      .relativize(f.toAbsolutePath).toString
    assume(!rel.contains(":/"))
    assert(Engine.readFileBytes(rel).sameElements(payload))
  }
}
