package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.zip.Deflater
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

import org.scalatest.funsuite.AnyFunSuite

/** Standard-security-handler decryption (`ingest/PdfDecrypt.scala`): the
  * spec CONSTRUCTS encrypted PDFs from the forward algorithms of ISO 32000
  * §7.6 (RC4 R=2/R=3, AESV2 R=4, AESV3 R=6) and asserts the parser reads
  * them back — and that anything unsupported or genuinely password-locked
  * emits nothing. Reference behavior: mupdf's built-in handler behind
  * `src/parser/pdf-extract.ts:79-153` (opens empty-user-password files,
  * yields nothing without the password). The fixture encryptors here are
  * written independently of PdfDecrypt's decrypt path wherever the
  * algorithm is directional (AES forward vs backward, per-object key twin
  * below), so a shared-bug pass is impossible for those legs; RC4 is its
  * own inverse by definition, so its leg pins key DERIVATION, not the
  * cipher. */
class PdfDecryptSpec extends AnyFunSuite {

  // ---- fixture encryptors (forward direction, independent twins) ----

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** §7.6.2 Algorithm 1 per-object key — an independent twin of
    * Decryptor.objKey (same spec text, re-derived here) */
  private def objKey(fileKey: Array[Byte], num: Int, gen: Int,
                     aes: Boolean): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    md.update(fileKey)
    md.update(Array((num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte,
      ((num >> 16) & 0xFF).toByte, (gen & 0xFF).toByte,
      ((gen >> 8) & 0xFF).toByte))
    if (aes) md.update(Array[Byte](0x73, 0x41, 0x6C, 0x54))
    md.digest().take(math.min(fileKey.length + 5, 16))
  }

  private def aesNoPad(mode: Int, key: Array[Byte], iv: Array[Byte],
                       data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** forward AES leg used by fixtures: IV ++ ct, RFC 2898 pad — built on
    * the JDK's ENCRYPT mode, the inverse of what PdfDecrypt exercises */
  private def aesEnc(key: Array[Byte], iv: Array[Byte],
                     data: Array[Byte]): Array[Byte] = {
    val padLen = 16 - (data.length % 16)
    iv ++ aesNoPad(Cipher.ENCRYPT_MODE, key, iv,
      data ++ Array.fill(padLen)(padLen.toByte))
  }

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  // deterministic fixture parameters
  private val fileId: Array[Byte] = Array.tabulate(16)(i => (i * 11 + 5).toByte)
  private val oEntry: Array[Byte] = Array.tabulate(32)(i => (i * 7 + 3).toByte)
  private val pPerm = -44
  private val pageText = "classified volcano findings"
  private val infoTitle = "Sealed Report"

  /** one-page PDF, content stream + Info /Title encrypted by `encStream` /
    * `encString` (already closed over the object number), /Encrypt dict
    * verbatim, trailer carrying /Encrypt + /ID */
  private def encryptedPdf(encDict: String,
                           encStream: (Int, Array[Byte]) => Array[Byte],
                           encString: (Int, Array[Byte]) => Array[Byte],
                           title: String = infoTitle): Array[Byte] = {
    val content =
      s"BT /F1 12 Tf 72 720 Td ($pageText) Tj ET"
    val data = encStream(4, deflate(content.getBytes(StandardCharsets.ISO_8859_1)))
    val titleEnc = encString(7, title.getBytes(StandardCharsets.ISO_8859_1))
    val sb = new StringBuilder
    sb ++= "%PDF-1.6\n"
    sb ++= s"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    sb ++= s"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    sb ++= s"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
    sb ++= s"4 0 obj\n<< /Length ${data.length} /Filter /FlateDecode >>\nstream\n" +
      new String(data, StandardCharsets.ISO_8859_1) + "\nendstream\nendobj\n"
    sb ++= s"7 0 obj\n<< /Title <${hex(titleEnc)}> /Producer <${hex(encString(7,
      "graft-spec".getBytes(StandardCharsets.ISO_8859_1)))}> >>\nendobj\n"
    sb ++= s"8 0 obj\n$encDict\nendobj\n"
    sb ++= s"trailer\n<< /Root 1 0 R /Size 9 /Encrypt 8 0 R " +
      s"/ID [<${hex(fileId)}> <${hex(fileId)}>] >>\n%%EOF\n"
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  private def rc4Fixture(r: Int): Array[Byte] = {
    val n = if (r == 2) 5 else 16
    val key = PdfDecrypt.fileKeyR234(oEntry, pPerm, fileId, n, r,
      encryptMetadata = true)
    val u = PdfDecrypt.userValueR234(key, r, fileId)
    val (v, len) = if (r == 2) (1, 40) else (2, 128)
    encryptedPdf(
      s"<< /Filter /Standard /V $v /R $r /Length $len /O <${hex(oEntry)}> " +
        s"/U <${hex(u)}> /P $pPerm >>",
      (num, d) => PdfDecrypt.rc4(objKey(key, num, 0, aes = false), d),
      (num, d) => PdfDecrypt.rc4(objKey(key, num, 0, aes = false), d))
  }

  private def aesV2Fixture: Array[Byte] = {
    val key = PdfDecrypt.fileKeyR234(oEntry, pPerm, fileId, 16, 4,
      encryptMetadata = true)
    val u = PdfDecrypt.userValueR234(key, 4, fileId)
    encryptedPdf(
      "<< /Filter /Standard /V 4 /R 4 /Length 128 " +
        "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
        s"/StmF /StdCF /StrF /StdCF /O <${hex(oEntry)}> /U <${hex(u)}> " +
        s"/P $pPerm >>",
      (num, d) => aesEnc(objKey(key, num, 0, aes = true),
        Array.fill[Byte](16)(0x5A), d),
      (num, d) => aesEnc(objKey(key, num, 0, aes = true),
        Array.fill[Byte](16)(0x33), d))
  }

  /** R=6: /U = hash2B(∅, valSalt) ++ valSalt ++ keySalt; /UE wraps the
    * file key under the keySalt-derived intermediate key (zero IV, no pad) */
  private def aesV3Fixture: (Array[Byte], Array[Byte]) = {
    val fileKey = Array.tabulate(32)(i => (i * 13 + 1).toByte)
    val valSalt = Array.tabulate(8)(i => (i + 0x40).toByte)
    val keySalt = Array.tabulate(8)(i => (i + 0x60).toByte)
    val e = Array.emptyByteArray
    val u = PdfDecrypt.hash2B(e, valSalt, e) ++ valSalt ++ keySalt
    val iKey = PdfDecrypt.hash2B(e, keySalt, e)
    val ue = aesNoPad(Cipher.ENCRYPT_MODE, iKey, new Array[Byte](16), fileKey)
    val pdf = encryptedPdf(
      "<< /Filter /Standard /V 5 /R 6 /Length 256 " +
        "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF " +
        s"/O <${hex(oEntry ++ oEntry.take(16))}> /U <${hex(u)}> " +
        s"/UE <${hex(ue)}> /OE <${hex(ue)}> /P $pPerm >>",
      (_, d) => aesEnc(fileKey, Array.fill[Byte](16)(0x77), d),
      (_, d) => aesEnc(fileKey, Array.fill[Byte](16)(0x11), d))
    (pdf, fileKey)
  }

  // ---- extraction through every supported scheme ----

  test("RC4 R=3 (V=2, 128-bit): text and Info title decrypt end-to-end") {
    val pdf = rc4Fixture(3)
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq(pageText))
    assert(PdfTextParser.docTitle(pdf) === Some(infoTitle))
  }

  test("RC4 R=2 (V=1, 40-bit): the short-key derivation path decrypts") {
    val pdf = rc4Fixture(2)
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq(pageText))
    assert(PdfTextParser.docTitle(pdf) === Some(infoTitle))
  }

  test("AESV2 (V=4/R=4 crypt filters): text and title decrypt end-to-end") {
    val pdf = aesV2Fixture
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq(pageText))
    assert(PdfTextParser.docTitle(pdf) === Some(infoTitle))
  }

  test("AESV3 (V=5/R=6): Algorithm 2.B validation + /UE key unwrap decrypt") {
    val (pdf, _) = aesV3Fixture
    assert(PdfTextParser.parseItems(pdf).map(_.text) === Seq(pageText))
    assert(PdfTextParser.docTitle(pdf) === Some(infoTitle))
  }

  // ---- refuse-don't-garble ----

  test("encrypted ObjStm: structural dicts decrypt, THEN expand (ordering)") {
    // the common modern shape: AES-128 file whose catalog/page-tree dicts
    // live inside an encrypted+flated object stream. Decryption must run
    // before ObjStm expansion (§7.5.7: strings inside an ObjStm are never
    // individually encrypted — the container stream carries the crypto).
    val key = PdfDecrypt.fileKeyR234(oEntry, pPerm, fileId, 16, 4,
      encryptMetadata = true)
    val u = PdfDecrypt.userValueR234(key, 4, fileId)
    def encStream(num: Int, d: Array[Byte]): Array[Byte] =
      aesEnc(objKey(key, num, 0, aes = true), Array.fill[Byte](16)(0x5A), d)
    val kids = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    val bodies = kids.map(_._2)
    val offsets = bodies.scanLeft(0)((a, b) => a + b.length + 1).init
    val header = kids.zip(offsets).map { case ((n, _), o) => s"$n $o" }
      .mkString(" ")
    val payload = (header + "\n" + bodies.mkString("\n"))
      .getBytes(StandardCharsets.ISO_8859_1)
    val stmData = encStream(10, deflate(payload))
    val content = encStream(4, deflate(
      s"BT /F1 12 Tf 72 720 Td ($pageText) Tj ET"
        .getBytes(StandardCharsets.ISO_8859_1)))
    val sb = new StringBuilder
    sb ++= "%PDF-1.6\n"
    sb ++= s"10 0 obj\n<< /Type /ObjStm /N ${kids.length} " +
      s"/First ${header.length + 1} /Length ${stmData.length} " +
      "/Filter /FlateDecode >>\nstream\n" +
      new String(stmData, StandardCharsets.ISO_8859_1) + "\nendstream\nendobj\n"
    sb ++= s"4 0 obj\n<< /Length ${content.length} /Filter /FlateDecode >>\n" +
      "stream\n" + new String(content, StandardCharsets.ISO_8859_1) +
      "\nendstream\nendobj\n"
    sb ++= "8 0 obj\n<< /Filter /Standard /V 4 /R 4 /Length 128 " +
      "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
      s"/StmF /StdCF /StrF /StdCF /O <${hex(oEntry)}> /U <${hex(u)}> " +
      s"/P $pPerm >>\nendobj\n"
    sb ++= "trailer\n<< /Root 1 0 R /Size 11 /Encrypt 8 0 R " +
      s"/ID [<${hex(fileId)}> <${hex(fileId)}>] >>\n%%EOF\n"
    val items = PdfTextParser.parseItems(
      sb.toString.getBytes(StandardCharsets.ISO_8859_1))
    assert(items.map(_.text) === Seq(pageText))
  }

  test("a real user password (U mismatch) refuses: nothing, never garbage") {
    // flip one /U byte in the R=3 fixture — exactly what a file whose user
    // password is NOT empty looks like to the empty-password check
    val pdf = rc4Fixture(3)
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
    val key = PdfDecrypt.fileKeyR234(oEntry, pPerm, fileId, 16, 3,
      encryptMetadata = true)
    val u = PdfDecrypt.userValueR234(key, 3, fileId)
    val flipped = u.clone(); flipped(0) = (flipped(0) ^ 0xFF).toByte
    val locked = s.replace(s"/U <${hex(u)}>", s"/U <${hex(flipped)}>")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(locked !== pdf) // the replace really happened
    assert(PdfTextParser.parseItems(locked) === Seq.empty)
    assert(PdfTextParser.docTitle(locked) === None)
  }

  test("unsupported handlers refuse whole: filter, V, CFM, missing target") {
    def swap(find: String, repl: String): Array[Byte] =
      new String(rc4Fixture(3), StandardCharsets.ISO_8859_1)
        .replace(find, repl).getBytes(StandardCharsets.ISO_8859_1)
    // a third-party security handler
    assert(PdfTextParser.parseItems(
      swap("/Filter /Standard", "/Filter /AcmeCrypt")) === Seq.empty)
    // an /Encrypt version outside the handler's table
    assert(PdfTextParser.parseItems(swap("/V 2 /R 3", "/V 3 /R 3")) === Seq.empty)
    // /Encrypt pointing at an object the file does not contain
    assert(PdfTextParser.parseItems(
      swap("/Encrypt 8 0 R", "/Encrypt 99 0 R")) === Seq.empty)
    // /Encrypt of a shape that is neither a ref nor a dict
    assert(PdfTextParser.parseItems(
      swap("/Encrypt 8 0 R", "/Encrypt 8")) === Seq.empty)
    // an unknown crypt-filter method under V=4
    val aes = new String(aesV2Fixture, StandardCharsets.ISO_8859_1)
    assert(PdfTextParser.parseItems(
      aes.replace("/CFM /AESV2", "/CFM /AESV9")
        .getBytes(StandardCharsets.ISO_8859_1)) === Seq.empty)
  }

  test("R<=4 derivation without a file /ID refuses (key would be garbage)") {
    val pdf = new String(rc4Fixture(3), StandardCharsets.ISO_8859_1)
      .replace(s"/ID [<${hex(fileId)}> <${hex(fileId)}>] ", "")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfTextParser.parseItems(pdf) === Seq.empty)
  }

  test("an unencrypted PDF is untouched by the encryption probe") {
    // no /Encrypt anywhere: loadObjects must behave exactly like scanObjects
    val sb = new StringBuilder
    sb ++= "%PDF-1.4\n"
    sb ++= "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    sb ++= "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    sb ++= "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
    val c = "BT /F1 12 Tf 72 720 Td (plain sailing) Tj ET"
    sb ++= s"4 0 obj\n<< /Length ${c.length} >>\nstream\n$c\nendstream\nendobj\n"
    sb ++= "trailer\n<< /Root 1 0 R /Size 5 >>\n%%EOF\n"
    assert(PdfTextParser.parseItems(
      sb.toString.getBytes(StandardCharsets.ISO_8859_1)).map(_.text) ===
      Seq("plain sailing"))
  }

  // ---- primitives ----

  test("rc4 matches the public test vectors") {
    // RFC 6229-style vectors ("Key"/"Plaintext" from the original posting)
    assert(hex(PdfDecrypt.rc4("Key".getBytes, "Plaintext".getBytes)) ===
      "bbf316e8d940af0ad3")
    assert(hex(PdfDecrypt.rc4("Wiki".getBytes, "pedia".getBytes)) ===
      "1021bf0420")
    assert(hex(PdfDecrypt.rc4("Secret".getBytes, "Attack at dawn".getBytes)) ===
      "45a01f645fc35b383552544b9bf5")
  }

  test("aesCbcDecrypt: JDK-forward round trip; malformed shapes refuse") {
    val key = Array.tabulate(16)(_.toByte)
    val iv = Array.fill[Byte](16)(0x42)
    for (len <- Seq(0, 1, 15, 16, 17, 100)) {
      val msg = Array.tabulate(len)(i => (i * 3).toByte)
      val enc = aesEnc(key, iv, msg)
      assert(PdfDecrypt.aesCbcDecrypt(key, enc).map(_.toSeq) === Some(msg.toSeq))
    }
    // truncated, non-block-aligned, bad pad byte
    assert(PdfDecrypt.aesCbcDecrypt(key, Array.fill[Byte](16)(1)) === None)
    assert(PdfDecrypt.aesCbcDecrypt(key,
      aesEnc(key, iv, Array.fill[Byte](20)(7)).dropRight(3)) === None)
    val badPad = iv ++ aesNoPad(Cipher.ENCRYPT_MODE, key, iv,
      Array.fill[Byte](15)(9) :+ 0x00.toByte) // pad byte 0 is invalid
    assert(PdfDecrypt.aesCbcDecrypt(key, badPad) === None)
  }

  test("hash2B is deterministic and password-sensitive") {
    val salt = Array.tabulate(8)(_.toByte)
    val a = PdfDecrypt.hash2B("pw".getBytes, salt, Array.emptyByteArray)
    val b = PdfDecrypt.hash2B("pw".getBytes, salt, Array.emptyByteArray)
    val c = PdfDecrypt.hash2B("pw2".getBytes, salt, Array.emptyByteArray)
    assert(a.length === 32 && a.toSeq === b.toSeq && a.toSeq != c.toSeq)
  }
}
