package graft.ingest

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

import graft.ingest.PdfTextParser._

/** Standard security handler (ISO 32000 §7.6) for EMPTY-user-password PDFs —
  * the common "owner-restricted" class (printing/copying disabled but
  * readable by anyone). The reference reads these through mupdf's built-in
  * handler (`src/parser/pdf-extract.ts:79-153`); here the handler is
  * implemented from the public spec:
  *
  *  - V=1/2, R=2/3: RC4 with MD5 key derivation (Algorithms 2, 6, 7.4.4.3)
  *  - V=4, R=4: crypt filters /StdCF with /CFM /V2 (RC4) or /AESV2
  *    (AES-128-CBC, 16-byte IV prefix, RFC 2898 padding)
  *  - V=5, R=5/6: /AESV3 (AES-256-CBC; R=6 uses the Algorithm 2.B iterated
  *    SHA-256/384/512 hash; file key unwrapped from /UE)
  *
  * Refuse-don't-garble: a non-Standard /Filter, an unsupported /V or /CFM, a
  * missing /ID when R≤4 derivation needs it, or a failed empty-user-password
  * VALIDATION (Algorithm 6 / the R≥5 hash compare — i.e. the file genuinely
  * requires a password) all yield None and the document emits nothing.
  *
  * What is decrypted: every string in every object's dict (strings inherit
  * their containing object's key) and every stream except XRef streams (spec:
  * never encrypted) and the /Encrypt dictionary itself. RC4 is hand-rolled
  * (16 lines, a public algorithm); AES comes from the JDK.
  */
private[ingest] object PdfDecrypt {

  /** the spec's 32-byte password pad (ISO 32000 Table 21 prologue) */
  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private[ingest] sealed trait Scheme
  private[ingest] case object Rc4 extends Scheme
  private[ingest] case object AesCbc extends Scheme // V4 AESV2 / V5 AESV3
  private[ingest] case object Identity extends Scheme

  /** resolved handler state: file key + string/stream schemes.
    * `perObject` = false for AESV3 (one key for the whole file). */
  private[ingest] final case class Decryptor(fileKey: Array[Byte],
                                             strScheme: Scheme,
                                             stmScheme: Scheme,
                                             perObject: Boolean) {
    private def objKey(num: Int, gen: Int, aes: Boolean): Array[Byte] = {
      if (!perObject) return fileKey
      val md = MessageDigest.getInstance("MD5")
      md.update(fileKey)
      md.update(Array((num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte,
        ((num >> 16) & 0xFF).toByte, (gen & 0xFF).toByte,
        ((gen >> 8) & 0xFF).toByte))
      if (aes) md.update(Array[Byte](0x73, 0x41, 0x6C, 0x54)) // "sAlT"
      md.digest().take(math.min(fileKey.length + 5, 16))
    }
    private[ingest] def apply(scheme: Scheme, data: Array[Byte],
                              num: Int, gen: Int): Option[Array[Byte]] =
      scheme match {
        case Identity => Some(data)
        case Rc4      => Some(rc4(objKey(num, gen, aes = false), data))
        case AesCbc   => aesCbcDecrypt(objKey(num, gen, aes = true), data)
      }
  }

  /** entry: decrypt all objects, or None = refuse (unsupported / password
    * actually required). Called only when an /Encrypt dict was found. */
  private[ingest] def decryptObjects(objs: Seq[PdfObj], enc: PDict,
                                     encNum: Int,
                                     id0: Option[Array[Byte]]): Option[Seq[PdfObj]] =
    buildDecryptor(enc, id0).map { dec =>
      objs.map { o =>
        val isXref = o.dict.exists(_.m.get("Type").contains(PName("XRef")))
        if (o.num == encNum || isXref) o
        else {
          val d = o.dict.map(pd => mapStrings(pd, dec, o.num, o.gen)
            .asInstanceOf[PDict])
          val s = o.stream.flatMap(dec(dec.stmScheme, _, o.num, o.gen))
          // a stream that fails AES unpadding decrypts to None: drop the
          // DATA but keep the object (its dict may carry tree structure)
          o.copy(dict = d, stream = s)
        }
      }
    }

  private def mapStrings(v: PVal, dec: Decryptor, num: Int, gen: Int): PVal =
    v match {
      case PStr(b) =>
        dec(dec.strScheme, b, num, gen).map(PStr.apply).getOrElse(PStr(Array.emptyByteArray))
      case PArr(items) => PArr(items.map(mapStrings(_, dec, num, gen)))
      case PDict(m) => PDict(m.map { case (k, pv) => k -> mapStrings(pv, dec, num, gen) })
      case other => other
    }

  // ---- handler resolution ----

  private def buildDecryptor(enc: PDict, id0: Option[Array[Byte]]): Option[Decryptor] = {
    val m = enc.m
    def str(k: String): Option[Array[Byte]] =
      m.get(k).collect { case PStr(b) => b }
    def int(k: String): Option[Int] =
      m.get(k).collect { case PNum(n) => n.toInt }
    if (!m.get("Filter").contains(PName("Standard"))) return None
    val v = int("V").getOrElse(0)
    val r = int("R").getOrElse(0)
    val o = str("O").getOrElse(return None)
    val u = str("U").getOrElse(return None)
    val p = int("P").getOrElse(return None)
    val lenBits = int("Length").getOrElse(40)
    v match {
      case 1 | 2 =>
        if (r != 2 && r != 3) return None
        val n = if (r == 2) 5 else lenBits / 8
        val id = id0.getOrElse(return None)
        val key = fileKeyR234(o, p, id, n, r, encryptMetadata = true)
        if (!validateEmptyUser(key, u, r, id)) None
        else Some(Decryptor(key, Rc4, Rc4, perObject = true))
      case 4 =>
        if (r != 4) return None
        // the lexer parses true/false as PNum(1)/PNum(0)
        val encMeta = !m.get("EncryptMetadata").contains(PNum(0))
        // crypt filters: /CF /StdCF /CFM, classes via /StmF /StrF
        def cfm: Option[Scheme] = m.get("CF") match {
          case Some(PDict(cf)) => cf.get("StdCF") match {
            case Some(PDict(std)) => std.get("CFM") match {
              case Some(PName("V2"))    => Some(Rc4)
              case Some(PName("AESV2")) => Some(AesCbc)
              case _ => None
            }
            case _ => None
          }
          case _ => None
        }
        def classScheme(k: String): Option[Scheme] =
          m.get(k) match {
            case Some(PName("Identity")) => Some(Identity)
            case Some(PName("StdCF")) | None => cfm
            case _ => None
          }
        val stm = classScheme("StmF").getOrElse(return None)
        val sstr = classScheme("StrF").getOrElse(return None)
        val id = id0.getOrElse(return None)
        val key = fileKeyR234(o, p, id, lenBits / 8, r, encMeta)
        if (!validateEmptyUser(key, u, r, id)) None
        else Some(Decryptor(key, sstr, stm, perObject = true))
      case 5 =>
        if (r != 5 && r != 6) return None
        if (u.length < 48) return None
        val ue = str("UE").getOrElse(return None)
        val valSalt = u.slice(32, 40)
        val keySalt = u.slice(40, 48)
        val vHash =
          if (r == 5) sha256(Array.emptyByteArray ++ valSalt)
          else hash2B(Array.emptyByteArray, valSalt, Array.emptyByteArray)
        if (!java.util.Arrays.equals(vHash, u.take(32))) None
        else {
          val iKey =
            if (r == 5) sha256(Array.emptyByteArray ++ keySalt)
            else hash2B(Array.emptyByteArray, keySalt, Array.emptyByteArray)
          // unwrap the 32-byte file key from /UE: AES-256-CBC, zero IV, no pad
          val c = Cipher.getInstance("AES/CBC/NoPadding")
          c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(iKey, "AES"),
            new IvParameterSpec(new Array[Byte](16)))
          val fileKey = c.doFinal(ue.take(32))
          Some(Decryptor(fileKey, AesCbc, AesCbc, perObject = false))
        }
      case _ => None
    }
  }

  /** Algorithm 2: file key for R=2/3/4 from the (empty) user password */
  private[ingest] def fileKeyR234(o: Array[Byte], p: Int, id0: Array[Byte],
                                  n: Int, r: Int,
                                  encryptMetadata: Boolean): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    md.update(Pad) // empty password → the pad alone
    md.update(o.take(32))
    md.update(Array((p & 0xFF).toByte, ((p >> 8) & 0xFF).toByte,
      ((p >> 16) & 0xFF).toByte, ((p >> 24) & 0xFF).toByte))
    md.update(id0)
    if (r >= 4 && !encryptMetadata)
      md.update(Array[Byte](-1, -1, -1, -1))
    var h = md.digest()
    if (r >= 3)
      for (_ <- 0 until 50)
        h = MessageDigest.getInstance("MD5").digest(h.take(n))
    h.take(n)
  }

  /** Algorithms 4/5 (forward) + 6 (check): does the empty user password
    * open this file? Exposed forward so the spec fixture can CONSTRUCT /U. */
  private[ingest] def userValueR234(key: Array[Byte], r: Int,
                                    id0: Array[Byte]): Array[Byte] =
    if (r == 2) rc4(key, Pad)
    else {
      val h = MessageDigest.getInstance("MD5")
      h.update(Pad); h.update(id0)
      var u = rc4(key, h.digest())
      for (i <- 1 to 19)
        u = rc4(key.map(b => (b ^ i).toByte), u)
      u ++ new Array[Byte](16)
    }

  private def validateEmptyUser(key: Array[Byte], u: Array[Byte], r: Int,
                                id0: Array[Byte]): Boolean = {
    val expect = userValueR234(key, r, id0)
    val cmp = if (r == 2) 32 else 16
    u.length >= cmp && java.util.Arrays.equals(
      expect.take(cmp), u.take(cmp))
  }

  /** Algorithm 2.B (R=6): iterated SHA-256/384/512 password hash */
  private[ingest] def hash2B(pwd: Array[Byte], salt: Array[Byte],
                             udata: Array[Byte]): Array[Byte] = {
    var k = sha256(pwd ++ salt ++ udata)
    var e = Array.emptyByteArray
    var i = 0
    while (i < 64 || (e(e.length - 1) & 0xFF) > i - 32) {
      val k1 = {
        val one = pwd ++ k ++ udata
        val out = new Array[Byte](one.length * 64)
        for (j <- 0 until 64) System.arraycopy(one, 0, out, j * one.length, one.length)
        out
      }
      val c = Cipher.getInstance("AES/CBC/NoPadding")
      c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(k.take(16), "AES"),
        new IvParameterSpec(k.slice(16, 32)))
      e = c.doFinal(k1)
      val mod = e.take(16).foldLeft(0)((a, b) => a + (b & 0xFF)) % 3
      k = MessageDigest.getInstance(
        if (mod == 0) "SHA-256" else if (mod == 1) "SHA-384" else "SHA-512")
        .digest(e)
      i += 1
    }
    k.take(32)
  }

  private def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)

  // ---- primitives ----

  /** RC4 (public algorithm; symmetric — also used by the spec fixture) */
  private[ingest] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    for (i <- 0 until 256) {
      j = (j + s(i) + key(i % key.length)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
    }
    val out = new Array[Byte](data.length)
    var a = 0; var b = 0
    for (i <- data.indices) {
      a = (a + 1) & 0xFF
      b = (b + s(a)) & 0xFF
      val t = s(a); s(a) = s(b); s(b) = t
      out(i) = (data(i) ^ s((s(a) + s(b)) & 0xFF)).toByte
    }
    out
  }

  /** data = IV(16) ++ ciphertext; strip the RFC 2898 pad. None on any
    * malformed shape (truncated, non-block-aligned, bad pad byte). */
  private[ingest] def aesCbcDecrypt(key: Array[Byte],
                                    data: Array[Byte]): Option[Array[Byte]] = {
    if (data.length < 32 || (data.length - 16) % 16 != 0) return None
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
      new IvParameterSpec(data.take(16)))
    val plain = c.doFinal(data, 16, data.length - 16)
    val pad = plain(plain.length - 1) & 0xFF
    if (pad < 1 || pad > 16 || pad > plain.length) None
    else Some(plain.dropRight(pad))
  }

  /** forward AES-CBC (fixture construction): returns IV ++ ct with pad */
  private[ingest] def aesCbcEncrypt(key: Array[Byte], iv: Array[Byte],
                                    data: Array[Byte]): Array[Byte] = {
    val padLen = 16 - (data.length % 16)
    val padded = data ++ Array.fill(padLen)(padLen.toByte)
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
      new IvParameterSpec(iv))
    iv ++ c.doFinal(padded)
  }
}
