package graft.ingest

import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable

/** ZIP member reader — the third archive container next to
  * [[WarcSource]] and [[TarSource]] (user uploads and dataset releases
  * ship as .zip at least as often as .tar.gz). Stream-walked via the
  * JDK's ZipInputStream (local-header order, no central-directory
  * dependency, so truncated archives yield their good prefix);
  * directories and non-text members are filtered by the same rules as
  * the TAR path.
  */
object ZipSource {

  final case class ZipMember(name: String, body: Array[Byte])

  def entries(bytes: Array[Byte]): Seq[ZipMember] = {
    val out = mutable.ArrayBuffer.empty[ZipMember]
    val zin = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = zin.read(buf)
          while (n > 0) { bos.write(buf, 0, n); n = zin.read(buf) }
          out += ZipMember(e.getName, bos.toByteArray)
        }
        e = try zin.getNextEntry
            catch { case _: java.io.IOException => null } // truncated tail
      }
    } catch { case _: java.io.IOException => () } // refuse the bad tail
    finally zin.close()
    out.toSeq
  }

  /** text-document members (.md/.txt) as (name, text) */
  def textDocs(bytes: Array[Byte]): Seq[(String, String)] =
    entries(bytes).filter(e =>
      e.name.endsWith(".md") || e.name.endsWith(".txt")).map(e =>
      e.name -> new String(e.body, StandardCharsets.UTF_8))

  /** fixture: real ZIP with a directory entry, the given text members,
    * and a binary member extraction must skip; STORED (uncompressed)
    * entries for even docIds, DEFLATED for odd — both code paths of any
    * reader are load-bearing */
  def fixture(docId: Long, docs: Seq[(String, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    zip.setMethod(
      if (docId % 2 == 0) ZipOutputStream.STORED else ZipOutputStream.DEFLATED)
    def put(name: String, body: Array[Byte]): Unit = {
      val e = new ZipEntry(name)
      if (docId % 2 == 0) {
        e.setMethod(ZipEntry.STORED)
        e.setSize(body.length)
        val crc = new java.util.zip.CRC32
        crc.update(body)
        e.setCrc(crc.getValue)
      }
      zip.putNextEntry(e)
      zip.write(body)
      zip.closeEntry()
    }
    put(s"corpus$docId/", Array.emptyByteArray)
    docs.foreach { case (name, text) =>
      put(name, text.getBytes(StandardCharsets.UTF_8))
    }
    put("assets/blob.bin", Array[Byte](9, 8, 7))
    zip.close()
    bos.toByteArray
  }
}
