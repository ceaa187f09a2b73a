package graft.ingest

import scala.collection.mutable

/** JBIG2 (ITU-T T.88) — the arithmetic-coded bilevel codec scanned PDFs
  * embed via `/JBIG2Decode`, completing the raster filter family next to
  * [[CcittG4]]. Implemented from the public standard:
  *
  *  - the MQ arithmetic coder (Annex E: Qe state table E.1, BYTEIN/BYTEOUT
  *    with 0xFF stuffing, RENORM, FLUSH) — both directions
  *  - generic region decoding (§6.2), template 0 with programmable AT
  *    pixels and TPGDON typical-prediction rows; MMR=1 regions delegate to
  *    [[CcittG4]] (T.6 and JBIG2-MMR share the coding)
  *  - the integer arithmetic decoding procedures (Annex A: IAx context
  *    trees, IAID fixed-length tree), both directions
  *  - SYMBOL DICTIONARY segments (§6.5: arithmetic, template 0, height
  *    classes, export runs) and TEXT REGION segments (§6.4: arithmetic,
  *    strip decoding, all reference corners, non-transposed) — the page
  *    shape jbig2enc-class toolchains emit for scanned TEXT pages
  *  - the PDF EMBEDDED segment stream (§7.2 headers without file header):
  *    page information (type 48), immediate (lossless) generic regions
  *    (types 36/38/39), symbol dictionaries (type 0), text regions
  *    (types 4/6/7), end-of-page/file tolerated
  *  - refinement regions (§6.3, GRTEMPLATE 0/1) as both consumers:
  *    SDREFAGG=1 single-instance aggregate dictionary symbols (§6.5.8.2)
  *    and per-instance IARI text-region refinement (§6.4.11)
  *  - HUFFMAN-CODED symbol dictionaries (SDHUFF=1 with the standard
  *    Annex-B tables B.1–B.5: per-class collective bitmaps, §6.5.9,
  *    uncompressed or MMR) — the shape legacy scanned-text encoders emit
  *
  * /JBIG2Globals streams (shared dictionaries, no page association) are
  * handled by the PDF layer as segment-stream concatenation —
  * [[graft.ingest.PdfImages]] resolves and prepends them.
  *
  * Subset honesty (refuse-don't-garble): generic templates 1–3,
  * REFAGGNINST>1 aggregation, SDHUFF+SDREFAGG, custom Huffman tables,
  * Huffman-coded TEXT regions (SBHUFF), transposed text, halftone
  * segments, and EXTTEMPLATE are refused.
  *
  * Validation posture: the MQ coder and region coders are pinned by
  * encode→decode round-trips over adversarial planes (a carry or
  * stuffing bug reliably breaks these); the MMR leg is additionally
  * cross-checked through the independently-validated G4 codec.
  */
object Jbig2 {

  // ---- MQ coder state table (T.88 Table E.1): Qe, NMPS, NLPS, SWITCH ----

  private val Qe = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private val Nmps = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private val Nlps = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
    15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private val Switch = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  // ---------------------------------------------------------- MQ decoder --

  /** caller-owned per-context state array: index into Qe table (low 7
    * bits) | MPS (bit 7). The symbol/text decoding procedures interleave
    * SEVERAL context families (generic GB, the IAx integer procedures,
    * IAID) on ONE arithmetic decoder, so contexts belong to the procedure,
    * not the coder. */
  private[graft] def newCx(n: Int): Array[Byte] = new Array[Byte](n)

  private[graft] final class MqDecoder(data: Array[Byte]) {
    private var bp = 0
    private var c = 0L
    private var a = 0L
    private var ct = 0

    private def byteAt(i: Int): Int =
      if (i < data.length) data(i) & 0xFF else 0xFF

    private def byteIn(): Unit = {
      if (byteAt(bp) == 0xFF) {
        if (byteAt(bp + 1) > 0x8F) { c += 0xFF00L; ct = 8 }
        else { bp += 1; c += byteAt(bp).toLong << 9; ct = 7 }
      } else { bp += 1; c += byteAt(bp).toLong << 8; ct = 8 }
    }

    locally {
      bp = 0
      c = byteAt(0).toLong << 16
      byteIn()
      c <<= 7; ct -= 7; a = 0x8000L
    }

    def decode(cx: Array[Byte], ctx: Int): Int = {
      val s = cx(ctx) & 0x7F
      val mps = (cx(ctx) >> 7) & 1
      val qe = Qe(s).toLong
      a -= qe
      var d = 0
      if (((c >> 16) & 0xFFFF) < qe) {
        // LPS exchange path
        if (a < qe) { d = mps; cx(ctx) = ((mps << 7) | Nmps(s)).toByte }
        else {
          d = 1 - mps
          val nm = if (Switch(s) == 1) 1 - mps else mps
          cx(ctx) = ((nm << 7) | Nlps(s)).toByte
        }
        a = qe
        // RENORMD
        do { if (ct == 0) byteIn(); a <<= 1; c = (c << 1) & 0xFFFFFFFFL; ct -= 1 }
        while ((a & 0x8000L) == 0)
      } else {
        c -= qe << 16
        if ((a & 0x8000L) == 0) {
          if (a < qe) {
            d = 1 - mps
            val nm = if (Switch(s) == 1) 1 - mps else mps
            cx(ctx) = ((nm << 7) | Nlps(s)).toByte
          } else { d = mps; cx(ctx) = ((mps << 7) | Nmps(s)).toByte }
          do { if (ct == 0) byteIn(); a <<= 1; c = (c << 1) & 0xFFFFFFFFL; ct -= 1 }
          while ((a & 0x8000L) == 0)
        } else d = mps
      }
      d
    }
  }

  // ---------------------------------------------------------- MQ encoder --

  private[graft] final class MqEncoder {
    private val out = mutable.ArrayBuffer.empty[Byte]
    private var a = 0x8000L
    private var c = 0L
    private var ct = 12
    private var b = -1 // value of the pending byte; -1 = none yet

    private def byteOut(): Unit = {
      if (b == 0xFF) {
        emit(); b = (c >> 20).toInt; c &= 0xFFFFFL; ct = 7
      } else if (c < 0x8000000L) {
        emit(); b = (c >> 19).toInt; c &= 0x7FFFFL; ct = 8
      } else {
        b += 1
        if (b == 0xFF) {
          c &= 0x7FFFFFFL
          emit(); b = (c >> 20).toInt; c &= 0xFFFFFL; ct = 7
        } else { emit(); b = (c >> 19).toInt; c &= 0x7FFFFL; ct = 8 }
      }
    }
    private def emit(): Unit = if (b >= 0) { out += b.toByte; () }

    private def renorm(): Unit = {
      do {
        if (ct == 0) byteOut()
        a <<= 1; c <<= 1; ct -= 1
      } while ((a & 0x8000L) == 0)
    }

    def encode(cx: Array[Byte], ctx: Int, bit: Int): Unit = {
      val s = cx(ctx) & 0x7F
      val mps = (cx(ctx) >> 7) & 1
      val qe = Qe(s).toLong
      if (bit == mps) { // CODEMPS
        a -= qe
        if ((a & 0x8000L) == 0) {
          if (a < qe) a = qe else c += qe
          cx(ctx) = ((mps << 7) | Nmps(s)).toByte
          renorm()
        } else c += qe
      } else { // CODELPS
        a -= qe
        if (a < qe) c += qe else a = qe
        val nm = if (Switch(s) == 1) 1 - mps else mps
        cx(ctx) = ((nm << 7) | Nlps(s)).toByte
        renorm()
      }
    }

    def flush(): Array[Byte] = {
      // SETBITS (§E.3.8): largest all-ones tail INSIDE the final interval
      // [C, C+A). (Zeroing the tail instead — pick the 0x10000 multiple ≤
      // C+A−1 — can land BELOW C when the interval straddles no boundary
      // and C's low offset exceeds 0x8000, corrupting the last decisions
      // for interval-alignment-dependent content.)
      val tempC = c + a
      c |= 0xFFFFL
      if (c >= tempC) c -= 0x8000L
      c <<= ct; byteOut()
      c <<= ct; byteOut()
      emit()
      // terminating marker bytes the decoder's 0xFF handling expects
      out += 0xFF.toByte; out += 0xAC.toByte
      out.toArray
    }
  }

  // -------------------------------------------- generic region, template 0 --

  /** nominal AT pixels for template 0 (§6.2.5.3) */
  private val NominalAt = Array((3, -1), (-3, -1), (2, -2), (-2, -2))

  /** the template-0 SLTP (typical prediction) context (§6.2.5.7) */
  private val Tpgdon0Ctx = 0x9B25

  private def ctx0(bits: (Int, Int) => Int, x: Int, y: Int,
                   at: Array[(Int, Int)]): Int = {
    var v = bits(x - 1, y)
    v |= bits(x - 2, y) << 1
    v |= bits(x - 3, y) << 2
    v |= bits(x - 4, y) << 3
    v |= bits(x + at(0)._1, y + at(0)._2) << 4
    v |= bits(x + 2, y - 1) << 5
    v |= bits(x + 1, y - 1) << 6
    v |= bits(x, y - 1) << 7
    v |= bits(x - 1, y - 1) << 8
    v |= bits(x - 2, y - 1) << 9
    v |= bits(x + at(1)._1, y + at(1)._2) << 10
    v |= bits(x + 1, y - 2) << 11
    v |= bits(x, y - 2) << 12
    v |= bits(x - 1, y - 2) << 13
    v |= bits(x + at(2)._1, y + at(2)._2) << 14
    v |= bits(x + at(3)._1, y + at(3)._2) << 15
    v
  }

  /** decode an arithmetic generic region (template 0) into a fresh plane */
  private[graft] def decodeGenericArith(data: Array[Byte], w: Int, h: Int,
                                         at: Array[(Int, Int)],
                                         tpgdon: Boolean): Array[Boolean] =
    decodeGenericWith(new MqDecoder(data), newCx(1 << 16), w, h, at, tpgdon)

  /** generic-region decode on a SHARED decoder + GB context — the form the
    * symbol dictionary uses: every symbol bitmap continues the same
    * arithmetic stream and adapts the same generic contexts (§6.5.5). */
  private[graft] def decodeGenericWith(dec: MqDecoder, cx: Array[Byte],
                                        w: Int, h: Int,
                                        at: Array[(Int, Int)],
                                        tpgdon: Boolean): Array[Boolean] = {
    val plane = new Array[Boolean](w * h)
    def px(x: Int, y: Int): Int =
      if (x < 0 || x >= w || y < 0) 0 else if (plane(y * w + x)) 1 else 0
    var ltp = false
    var y = 0
    while (y < h) {
      if (tpgdon) {
        val sltp = dec.decode(cx, Tpgdon0Ctx)
        if (sltp == 1) ltp = !ltp
      }
      if (ltp) {
        // typical row: copy the row above (row 0 copies the all-0 row)
        var x = 0
        while (x < w) { plane(y * w + x) = y > 0 && plane((y - 1) * w + x); x += 1 }
      } else {
        var x = 0
        while (x < w) {
          val bit = dec.decode(cx, ctx0(px, x, y, at))
          plane(y * w + x) = bit == 1
          x += 1
        }
      }
      y += 1
    }
    plane
  }

  /** encode a plane as an arithmetic generic region (template 0) */
  private[graft] def encodeGenericArith(plane: Array[Boolean], w: Int, h: Int,
                                         at: Array[(Int, Int)] = NominalAt,
                                         tpgdon: Boolean = false): Array[Byte] = {
    val enc = new MqEncoder
    encodeGenericWith(enc, newCx(1 << 16), plane, w, h, at, tpgdon)
    enc.flush()
  }

  /** generic-region encode on a shared encoder + GB context (no flush) */
  private[graft] def encodeGenericWith(enc: MqEncoder, cx: Array[Byte],
                                        plane: Array[Boolean], w: Int, h: Int,
                                        at: Array[(Int, Int)],
                                        tpgdon: Boolean): Unit = {
    def px(x: Int, y: Int): Int =
      if (x < 0 || x >= w || y < 0 || y >= h) 0 else if (plane(y * w + x)) 1 else 0
    var ltp = false
    var y = 0
    while (y < h) {
      if (tpgdon) {
        val typical = y > 0 && (0 until w).forall(x => px(x, y) == px(x, y - 1))
        val sltp = if (typical != ltp) 1 else 0
        enc.encode(cx, Tpgdon0Ctx, sltp)
        if (sltp == 1) ltp = !ltp
      }
      if (!(tpgdon && ltp)) {
        var x = 0
        while (x < w) { enc.encode(cx, ctx0(px, x, y, at), px(x, y)); x += 1 }
      }
      y += 1
    }
  }

  // ------------------------------- generic refinement region (§6.3) --

  /** nominal refinement adaptive pixels (GRAT), §6.3.5.3 */
  private[graft] val NominalGrAt: Array[(Int, Int)] = Array((-1, -1), (-1, -1))

  /** §6.3.5.3 refinement context templates. GRTEMPLATE 0 = 3 coding
    * neighbours + A1 and 8 reference neighbours + A2 (13 bits);
    * GRTEMPLATE 1 = 4 coding + 6 reference (10 bits). The context is
    * assembled coding-plane-first, MSB-first, in the figures' raster
    * order — the layout interoperable decoders share. Coding offsets are
    * relative to the current pixel; reference offsets relative to the
    * reference-aligned pixel (x − GRREFERENCEDX, y − GRREFERENCEDY). */
  private def grTemplates(template: Int, at: Array[(Int, Int)])
      : (Array[(Int, Int)], Array[(Int, Int)]) =
    if (template == 0)
      (Array((0, -1), (1, -1), (-1, 0), at(0)),
       Array((0, -1), (1, -1), (-1, 0), (0, 0), (1, 0),
             (-1, 1), (0, 1), (1, 1), at(1)))
    else
      (Array((-1, -1), (0, -1), (1, -1), (-1, 0)),
       Array((0, -1), (-1, 0), (0, 0), (1, 0), (0, 1), (1, 1)))

  /** decode a w×h refinement region against `ref` (refW×refH) at offset
    * (dx, dy) on a SHARED decoder + GR context array (the form both the
    * REFAGG symbol dictionary and the refining text region use —
    * §6.5.8.2.1 keeps ONE GR context across all of a dictionary's
    * refinements). TPGRON out of subset (callers refuse it upstream). */
  private[graft] def decodeRefinementWith(dec: MqDecoder, cx: Array[Byte],
      w: Int, h: Int, ref: Array[Boolean], refW: Int, refH: Int,
      dx: Int, dy: Int, template: Int,
      at: Array[(Int, Int)]): Array[Boolean] = {
    val (ct, rt) = grTemplates(template, at)
    val plane = new Array[Boolean](w * h)
    def cur(x: Int, y: Int): Int =
      if (x < 0 || x >= w || y < 0) 0 else if (plane(y * w + x)) 1 else 0
    def rp(x: Int, y: Int): Int = {
      val rx = x - dx; val ry = y - dy
      if (rx < 0 || rx >= refW || ry < 0 || ry >= refH) 0
      else if (ref(ry * refW + rx)) 1 else 0
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        var i = 0
        while (i < ct.length) {
          c = (c << 1) | cur(x + ct(i)._1, y + ct(i)._2); i += 1
        }
        i = 0
        while (i < rt.length) {
          c = (c << 1) | rp(x + rt(i)._1, y + rt(i)._2); i += 1
        }
        plane(y * w + x) = dec.decode(cx, c) == 1
        x += 1
      }
      y += 1
    }
    plane
  }

  /** refinement encode, symmetric to [[decodeRefinementWith]] (no flush) */
  private[graft] def encodeRefinementWith(enc: MqEncoder, cx: Array[Byte],
      target: Array[Boolean], w: Int, h: Int,
      ref: Array[Boolean], refW: Int, refH: Int,
      dx: Int, dy: Int, template: Int, at: Array[(Int, Int)]): Unit = {
    val (ct, rt) = grTemplates(template, at)
    def cur(x: Int, y: Int): Int =
      if (x < 0 || x >= w || y < 0 || y >= h) 0
      else if (target(y * w + x)) 1 else 0
    def rp(x: Int, y: Int): Int = {
      val rx = x - dx; val ry = y - dy
      if (rx < 0 || rx >= refW || ry < 0 || ry >= refH) 0
      else if (ref(ry * refW + rx)) 1 else 0
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        var i = 0
        while (i < ct.length) {
          c = (c << 1) | cur(x + ct(i)._1, y + ct(i)._2); i += 1
        }
        i = 0
        while (i < rt.length) {
          c = (c << 1) | rp(x + rt(i)._1, y + rt(i)._2); i += 1
        }
        enc.encode(cx, c, cur(x, y))
        x += 1
      }
      y += 1
    }
  }

  // ----------------------- integer arithmetic decoding (Annex A) + IAID --

  /** out-of-band marker for the IAx procedures (sign=1, value=0) */
  private[graft] val OOB = Int.MinValue

  /** Annex A.2 IAx integer decode on a 512-context state array. The PREV
    * context tree follows the decoded bits: full 9-bit prefix below 256,
    * then the sliding 8-bit window with bit 8 pinned. */
  private[graft] def decodeInt(dec: MqDecoder, cx: Array[Byte]): Int = {
    var prev = 1
    def bit(): Int = {
      val b = dec.decode(cx, prev)
      prev =
        if (prev < 256) (prev << 1) | b
        else ((((prev << 1) | b) & 511) | 256)
      b
    }
    val s = bit()
    var n = 0
    var offset = 0
    if (bit() == 0) { n = 2; offset = 0 }
    else if (bit() == 0) { n = 4; offset = 4 }
    else if (bit() == 0) { n = 6; offset = 20 }
    else if (bit() == 0) { n = 8; offset = 84 }
    else if (bit() == 0) { n = 12; offset = 340 }
    else { n = 32; offset = 4436 }
    var v = 0
    var i = 0
    while (i < n) { v = (v << 1) | bit(); i += 1 }
    v += offset
    if (s == 1 && v == 0) OOB else if (s == 1) -v else v
  }

  /** Annex A.2 mirror: encode `value` (or [[OOB]]) with the same context
    * tree, so [[decodeInt]] replays it exactly. */
  private[graft] def encodeInt(enc: MqEncoder, cx: Array[Byte], value: Int): Unit = {
    var prev = 1
    def bit(b: Int): Unit = {
      enc.encode(cx, prev, b)
      prev =
        if (prev < 256) (prev << 1) | b
        else ((((prev << 1) | b) & 511) | 256)
    }
    val (s, v) =
      if (value == OOB) (1, 0)
      else if (value < 0) (1, -value)
      else (0, value)
    bit(s)
    val (prefix, n, offset) =
      if (v <= 3) (Seq(0), 2, 0)
      else if (v <= 19) (Seq(1, 0), 4, 4)
      else if (v <= 83) (Seq(1, 1, 0), 6, 20)
      else if (v <= 339) (Seq(1, 1, 1, 0), 8, 84)
      else if (v <= 4435) (Seq(1, 1, 1, 1, 0), 12, 340)
      else (Seq(1, 1, 1, 1, 1), 32, 4436)
    prefix.foreach(bit)
    val m = v - offset
    var i = n - 1
    while (i >= 0) { bit((m >> i) & 1); i -= 1 }
  }

  /** A.3 IAID: `codeLen` fixed bits down a context tree of size
    * 2^(codeLen+1) */
  private[graft] def decodeIaid(dec: MqDecoder, cx: Array[Byte],
                                codeLen: Int): Int = {
    var prev = 1
    var i = 0
    while (i < codeLen) { prev = (prev << 1) | dec.decode(cx, prev); i += 1 }
    prev - (1 << codeLen)
  }

  private[graft] def encodeIaid(enc: MqEncoder, cx: Array[Byte],
                                codeLen: Int, value: Int): Unit = {
    var prev = 1
    var i = codeLen - 1
    while (i >= 0) {
      val b = (value >> i) & 1
      enc.encode(cx, prev, b)
      prev = (prev << 1) | b
      i -= 1
    }
  }

  /** symbol-ID code length for arithmetic text regions: max(1, ⌈log₂ n⌉)
    * (the form interoperable decoders use; 1 symbol still spends one bit) */
  private[graft] def symCodeLen(nSyms: Int): Int = {
    var n = 1
    while (nSyms > (1 << n)) n += 1
    n
  }

  // ------------------- Huffman tables (Annex B) + bit-level I/O (§B.4) --

  /** MSB-first bit reader over a byte array — the reading procedure
    * Huffman-coded symbol dictionaries use (§B.4). Throws past the end,
    * so every decode loop over it terminates promptly on truncated or
    * adversarial input (the caller's NonFatal catch turns that into a
    * refusal). */
  private[graft] final class BitReader(val data: Array[Byte]) {
    private var pos = 0 // absolute bit position
    def bit(): Int = {
      if (pos >= (data.length << 3))
        throw new IndexOutOfBoundsException("bit read past stream end")
      val b = (data(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    def bits(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** skip to the next byte boundary (§6.5.9 collective-bitmap entry) */
    def align(): Unit = pos = (pos + 7) & ~7
    /** current byte offset; only meaningful when aligned */
    def bytePos: Int = { align(); pos >> 3 }
    def skipBytes(n: Int): Unit = { align(); pos += n << 3 }
  }

  /** MSB-first bit writer, the encoder mirror of [[BitReader]] */
  private[graft] final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); n += 1
      if (n == 8) { out.write(cur); cur = 0; n = 0 }
    }
    def bits(v: Long, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { bit(((v >> i) & 1).toInt); i -= 1 }
    }
    /** zero-pad to the next byte boundary */
    def align(): Unit = while (n != 0) bit(0)
    /** write whole bytes; caller must be aligned */
    def bytes(b: Array[Byte]): Unit = { require(n == 0, "unaligned"); out.write(b) }
    def result(): Array[Byte] = { align(); out.toByteArray }
  }

  /** OOB sentinel for [[HuffTable]] decodes (value space is Long, so the
    * Int [[OOB]] marker can't collide) */
  private[graft] val HuffOob = Long.MinValue

  /** one line of an Annex-B Huffman table: a `prefLen`-bit prefix code
    * followed by `rangeLen` delta bits coding `rangeLow + delta` — or, for
    * the `lower` line, `rangeLow - delta` (the open low range). A 32-bit
    * `rangeLen` is the open high range. */
  private[graft] final case class HuffLine(prefLen: Int, rangeLen: Int,
                                           rangeLow: Long, lower: Boolean = false)

  /** A standard Annex-B table: `lines` in the spec's printed order plus
    * the OOB prefix length (0 = table has no OOB, §B.1 HTOOB). Prefix
    * codes are assigned by the §B.3 canonical procedure — increasing
    * code length, table order within a length — which reproduces the code
    * column printed in the standard (pinned by PdfImagesSpec). */
  private[graft] final class HuffTable(val lines: IndexedSeq[HuffLine],
                                       oobPrefLen: Int) {
    /** whether the table carries an OOB code (custom DW tables must) */
    private[graft] val hasOob: Boolean = oobPrefLen > 0
    /** the OOB code's prefix length (0 = none) — serialization needs it */
    private[graft] val oobLen: Int = oobPrefLen
    // canonical assignment over lines ++ the OOB pseudo-line (printed last
    // among its length's codes in every standard table that has one)
    private val prefLens: Array[Int] =
      (lines.map(_.prefLen) ++ (if (oobPrefLen > 0) Seq(oobPrefLen) else Nil)).toArray
    private val maxLen = prefLens.max
    // Canonical assignment in LONG: Int `curCode <<= 1` wraps once the
    // running code crosses 2^31 (a dense length multiset near len 31, or a
    // hostile PREFLEN > 31), and a wrapped code can alias a small value —
    // wellFormed would then pass a Kraft-violating table and decode would
    // accept garbled output instead of refusing. The loop is also bounded
    // at 62 doublings so a 255-length hostile table cannot shift the
    // accumulator off the end of the Long either.
    private val codesL: Array[Long] = {
      val assigned = new Array[Long](prefLens.length)
      val lim = math.min(maxLen, 62)
      var curCode = 0L
      var len = 1
      while (len <= lim) {
        var i = 0
        while (i < prefLens.length) {
          if (prefLens(i) == len) { assigned(i) = curCode; curCode += 1 }
          i += 1
        }
        curCode <<= 1
        len += 1
      }
      assigned
    }
    /** Int view of the canonical codes (spec pins compare against the
      * printed code columns); −1 marks a code that does not fit an Int —
      * only reachable on tables [[wellFormed]] already refuses. */
    private[graft] val codes: Array[Int] =
      codesL.map(c => if (c >= 0L && c <= Int.MaxValue) c.toInt else -1)

    /** every used line's canonical code fits in its own prefix length —
      * false means the length multiset violates Kraft (a malformed custom
      * table): the overflowed lines would be undecodable dead weight, so
      * the table parser refuses such streams up front instead of failing
      * line-by-line at decode time. Prefix lengths above 31 are refused
      * outright: [[decode]] accumulates the candidate code over at most
      * `maxLen` bit-shifts, and 31 bits already covers any table this
      * subset can meet (B.1–B.5 max 8; custom tables ≤ 4096 lines need
      * ≤ 13; runcode/symbol-ID lengths are ≤ 31 by construction). */
    private[graft] val wellFormed: Boolean =
      maxLen <= 31 && prefLens.indices.forall(i =>
        prefLens(i) == 0 || codesL(i) < (1L << prefLens(i)))

    /** read one value (or [[HuffOob]]) off the bit stream */
    def decode(r: BitReader): Long = {
      var len = 0
      var code = 0L
      while (len < maxLen) {
        code = (code << 1) | r.bit()
        len += 1
        var i = 0
        while (i < prefLens.length) {
          if (prefLens(i) == len && codesL(i) == code) {
            if (i == lines.length) return HuffOob // the OOB pseudo-line
            val l = lines(i)
            val delta = r.bits(l.rangeLen)
            return if (l.lower) l.rangeLow - delta else l.rangeLow + delta
          }
          i += 1
        }
      }
      throw new IllegalArgumentException("no Huffman code matches")
    }

    /** write `v` (or [[HuffOob]]) with the first line whose range holds it */
    def encode(w: BitWriter, v: Long): Unit = {
      if (v == HuffOob) {
        require(oobPrefLen > 0, "table has no OOB")
        w.bits(codesL(lines.length), oobPrefLen)
        return
      }
      var i = 0
      while (i < lines.length) {
        val l = lines(i)
        // prefLen 0 marks an UNUSED line (§B.2 custom tables): no code is
        // assigned, so a value landing only there is unencodable
        val hit = l.prefLen > 0 && (
          if (l.lower) v <= l.rangeLow
          else if (l.rangeLen == 32) v >= l.rangeLow
          else v >= l.rangeLow && v < l.rangeLow + (1L << l.rangeLen))
        if (hit) {
          w.bits(codesL(i), l.prefLen)
          w.bits(if (l.lower) l.rangeLow - v else v - l.rangeLow, l.rangeLen)
          return
        }
        i += 1
      }
      throw new IllegalArgumentException(s"value $v outside table range")
    }
  }

  /** Table B.1 — BMSIZE / EXRUNLENGTH (and AGGINST, out of subset) */
  private[graft] val TableB1 = new HuffTable(IndexedSeq(
    HuffLine(1, 4, 0), HuffLine(2, 8, 16), HuffLine(3, 16, 272),
    HuffLine(3, 32, 65808)), 0)
  /** Table B.2 — SDHUFFDW selection 0 (DW ≥ 0, OOB ends the class) */
  private[graft] val TableB2 = new HuffTable(IndexedSeq(
    HuffLine(1, 0, 0), HuffLine(2, 0, 1), HuffLine(3, 0, 2),
    HuffLine(4, 3, 3), HuffLine(5, 6, 11), HuffLine(6, 32, 75)), 6)
  /** Table B.3 — SDHUFFDW selection 1 (signed DW, OOB) */
  private[graft] val TableB3 = new HuffTable(IndexedSeq(
    HuffLine(8, 8, -256), HuffLine(1, 0, 0), HuffLine(2, 0, 1),
    HuffLine(3, 0, 2), HuffLine(4, 3, 3), HuffLine(5, 6, 11),
    HuffLine(8, 32, -257, lower = true), HuffLine(7, 32, 75)), 6)
  /** Table B.4 — SDHUFFDH selection 0 (DH ≥ 1) */
  private[graft] val TableB4 = new HuffTable(IndexedSeq(
    HuffLine(1, 0, 1), HuffLine(2, 0, 2), HuffLine(3, 0, 3),
    HuffLine(4, 3, 4), HuffLine(5, 6, 12), HuffLine(5, 32, 76)), 0)
  /** Table B.5 — SDHUFFDH selection 1 (signed DH) */
  private[graft] val TableB5 = new HuffTable(IndexedSeq(
    HuffLine(7, 8, -255), HuffLine(1, 0, 1), HuffLine(2, 0, 2),
    HuffLine(3, 0, 3), HuffLine(4, 3, 4), HuffLine(5, 6, 12),
    HuffLine(7, 32, -256, lower = true), HuffLine(6, 32, 76)), 0)

  // --------------------------------------- custom Huffman tables (§B.2) --

  /** Parse a code table segment body (§7.4.13 / §B.2) into a [[HuffTable]].
    * Custom tables are SELF-DESCRIBING — flags byte (HTOOB, HTPS−1,
    * HTRS−1), HTLOW/HTHIGH 32-bit signed bounds, then per-range-line
    * (PREFLEN, RANGELEN) fields, the lower/upper open-range PREFLENs, and
    * the OOB PREFLEN when HTOOB=1 — so unlike the SBHUFF standard tables
    * B.6–B.13 (whose constants are NOT carried in the stream) they are
    * implementable and verifiable without memorized tables. PREFLEN 0
    * marks an unused line. Refuses malformed shapes: reserved flag bit,
    * inverted bounds, RANGELEN > 32, a Kraft-violating length multiset
    * (overflowed canonical codes), or a table with no used line. */
  private[graft] def parseCodeTable(body: Array[Byte]): Option[HuffTable] =
    try {
      if (body.length < 9) return None
      val fl = body(0) & 0xFF
      if ((fl & 0x80) != 0) return None // reserved bit 7 must be 0
      val htOob = (fl & 1) != 0
      val htps = ((fl >> 1) & 7) + 1
      val htrs = ((fl >> 4) & 7) + 1
      def s32(o: Int): Int = ((body(o) & 0xFF) << 24) |
        ((body(o + 1) & 0xFF) << 16) | ((body(o + 2) & 0xFF) << 8) |
        (body(o + 3) & 0xFF)
      val htLow = s32(1).toLong
      val htHigh = s32(5).toLong
      if (htHigh <= htLow) return None
      val r = new BitReader(java.util.Arrays.copyOfRange(body, 9, body.length))
      val rangeLines = mutable.ArrayBuffer.empty[HuffLine]
      var cur = htLow
      while (cur < htHigh) {
        if (rangeLines.size >= 4096) return None // adversarial line bound
        val prefLen = r.bits(htps).toInt
        val rangeLen = r.bits(htrs).toInt
        // PREFLEN can be 8 bits on the wire (HTPS up to 8). The 31-bit cap
        // is a DELIBERATE conservative subset boundary (ADVICE r13): an
        // OPTIMAL Huffman code over ≤ 4099 symbols needs lengths ≤ 13, but
        // an arbitrary wire table may legally be Kraft-complete with
        // lengths up to 32+ (e.g. {1..31, 32, 32}) — such tables are
        // refused (fail-closed, parseCodeTable → None), trading that rare
        // conformance corner for shift-safety headroom on top of the
        // Long-accumulated codes (the ADVICE r12 overflow class: wrapped
        // codes could pass wellFormed)
        if (prefLen > 31 || rangeLen > 32) return None
        rangeLines += HuffLine(prefLen, rangeLen, cur)
        cur += (1L << rangeLen)
      }
      val lowerPref = r.bits(htps).toInt
      val upperPref = r.bits(htps).toInt
      val oobPref = if (htOob) r.bits(htps).toInt else 0
      if (lowerPref > 31 || upperPref > 31 || oobPref > 31) return None
      val lines = rangeLines.toIndexedSeq :+
        HuffLine(lowerPref, 32, htLow - 1, lower = true) :+
        HuffLine(upperPref, 32, htHigh)
      if (!lines.exists(_.prefLen > 0) && oobPref == 0) return None
      val t = new HuffTable(lines, oobPref)
      if (!t.wellFormed) return None
      Some(t)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Serialize a custom table to a §7.4.13 code table segment body — the
    * encoder mirror of [[parseCodeTable]] (HTPS=4 / HTRS=6 fixed: wide
    * enough for any prefix length ≤ 15 and range length ≤ 32 this encoder
    * builds). `lines` must end with the lower then upper open-range lines,
    * contiguous range lines before them starting at the lowest value. */
  private[graft] def encodeCodeTable(t: HuffTable): Array[Byte] = {
    val oobPrefLen = t.oobLen
    val rangeLines = t.lines.dropRight(2)
    val lower = t.lines(t.lines.length - 2)
    val upper = t.lines.last
    require(lower.lower && !upper.lower, "line order: ranges, lower, upper")
    val htLow = lower.rangeLow + 1
    val htHigh = upper.rangeLow
    val out = new java.io.ByteArrayOutputStream()
    out.write((if (oobPrefLen > 0) 1 else 0) | ((4 - 1) << 1) | ((6 - 1) << 4))
    def s32(v: Long): Unit = {
      out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
    }
    s32(htLow); s32(htHigh)
    val w = new BitWriter
    rangeLines.foreach { l =>
      w.bits(l.prefLen.toLong, 4); w.bits(l.rangeLen.toLong, 6)
    }
    w.bits(lower.prefLen.toLong, 4)
    w.bits(upper.prefLen.toLong, 4)
    if (oobPrefLen > 0) w.bits(oobPrefLen.toLong, 4)
    out.write(w.result())
    out.toByteArray
  }

  /** Build a compact custom table covering [lo, hi] (inclusive): the span
    * splits into at most two range lines (prefix lengths 1, 2), the open
    * lower/upper ranges and OOB take the tail lengths — a Kraft-complete
    * assignment in every arm. The TABLE is what's under test (it travels
    * in the stream via [[encodeCodeTable]] and is rebuilt by
    * [[parseCodeTable]]); compactness, not optimality, is the point. */
  private[graft] def buildCustomTable(lo: Long, hi: Long,
                                      oob: Boolean): HuffTable = {
    require(hi >= lo, s"empty custom-table range [$lo, $hi]")
    val span = hi - lo + 1
    def bitsFor(n: Long): Int = { // smallest k with 2^k >= n
      var k = 0
      while ((1L << k) < n) k += 1
      k
    }
    // Kraft-complete length sets (verified by wellFormed below):
    //   1 range line:  {1, 2, 2}        or with OOB {1, 2, 3, 3}
    //   2 range lines: {1, 2, 3, 3}     or with OOB {1, 2, 3, 4, 4}
    val lines =
      if (span == 1)
        IndexedSeq(HuffLine(1, 0, lo),
          HuffLine(2, 32, lo - 1, lower = true),
          HuffLine(if (oob) 3 else 2, 32, hi + 1))
      else {
        val k1 = bitsFor((span + 1) / 2) // 2^k1 < span for every span >= 2
        val rest = span - (1L << k1)
        val k2 = bitsFor(math.max(1L, rest))
        IndexedSeq(HuffLine(1, k1, lo), HuffLine(2, k2, lo + (1L << k1)),
          HuffLine(3, 32, lo - 1, lower = true),
          HuffLine(if (oob) 4 else 3, 32, hi + 1))
      }
    val oobPref = if (!oob) 0 else if (span == 1) 3 else 4
    val t = new HuffTable(lines, oobPref)
    assert(t.wellFormed, s"custom table [$lo, $hi] oob=$oob not Kraft-complete")
    t
  }

  // ----------------------------- symbol dictionary + text region (§6.5/§6.4) --

  /** one dictionary symbol: a w×h bilevel glyph */
  private[graft] final case class Glyph(w: Int, h: Int, bits: Array[Boolean])

  /** Decode a symbol dictionary segment body (§6.5, §7.4.3) to its EXPORTED
    * symbol list. Arithmetic coding (template 0) and Huffman coding with
    * the standard Annex-B tables are supported. SDREFAGG=1 is supported
    * for the single-instance aggregate case (each new symbol a refinement
    * of an already-decoded one, §6.5.8.2 — the shape refining encoders
    * emit); REFAGGNINST>1 (text-region recursion), custom Huffman tables,
    * and SDHUFF+SDREFAGG refuse. `inputSyms` = concatenated exports of the
    * referred-to dictionaries, in referred order; `inputTables` = the
    * referred-to CUSTOM TABLES (§7.4.13 code table segments) in referred
    * order, consumed by the SDHUFF selections in the §7.4.3.1.6 order
    * (DH, DW, BMSIZE). */
  private[graft] def decodeSymbolDict(body: Array[Byte],
                                      inputSyms: Seq[Glyph],
                                      inputTables: Seq[HuffTable] = Seq.empty): Option[Seq[Glyph]] = {
    // the minimum-length gate is FLAG-DEPENDENT: an SDHUFF=1 header carries
    // no AT pixels (flags + numEx + numNew = 10 bytes is legal), so check
    // the flags before requiring the arithmetic path's 8 AT bytes — a gate
    // of 18 up front refused legal tiny Huffman dictionaries
    if (body.length < 2) return None
    val flags = ((body(0) & 0xFF) << 8) | (body(1) & 0xFF)
    val sdhuff = (flags & 1) != 0
    val sdrefagg = (flags & 2) != 0
    val template = (flags >> 10) & 3
    val rTemplate = (flags >> 12) & 1
    if (sdhuff) {
      if (body.length < 2 + 8) return None
      return decodeSymbolDictHuff(body, flags, inputSyms, inputTables)
    }
    if (body.length < 2 + 8 + 8) return None
    if (template != 0) return None
    val at = Array.tabulate(4)(i => (body(2 + 2 * i).toInt, body(3 + 2 * i).toInt))
    // §7.4.3.1.2 field order: GB AT (template 0), then — when SDREFAGG=1
    // and SDRTEMPLATE=0 — the 2-pair refinement AT, then numEx/numNew
    var off = 10
    val rAt =
      if (sdrefagg && rTemplate == 0) {
        if (body.length < off + 4 + 8) return None
        val a = Array.tabulate(2)(i =>
          (body(off + 2 * i).toInt, body(off + 2 * i + 1).toInt))
        off += 4; a
      } else NominalGrAt
    def be32(o: Int): Long = (((body(o) & 0xFFL) << 24) |
      ((body(o + 1) & 0xFF) << 16) | ((body(o + 2) & 0xFF) << 8) |
      (body(o + 3) & 0xFF)) & 0xFFFFFFFFL
    val numEx = be32(off)
    val numNew = be32(off + 4)
    if (numNew > 65536 || numEx > inputSyms.size + numNew) return None
    val dec = new MqDecoder(
      java.util.Arrays.copyOfRange(body, off + 8, body.length))
    val gbCx = newCx(1 << 16)
    val iadh = newCx(512); val iadw = newCx(512); val iaex = newCx(512)
    // REFAGG machinery (§6.5.8.2): instance count, reference-symbol id over
    // input ∪ new (code length over the FULL eventual symbol count), offset
    // IAx contexts, and ONE refinement context shared across all symbols
    val iaai = newCx(512); val iardx = newCx(512); val iardy = newCx(512)
    val aggCodeLen = symCodeLen(inputSyms.size + numNew.toInt)
    val iaidAgg = newCx(1 << (aggCodeLen + 1))
    val grCx = newCx(1 << 13)
    val newSyms = mutable.ArrayBuffer.empty[Glyph]
    var hcHeight = 0
    // adversarial-stream progress guards (terminates-promptly contract):
    // an MQ tail converging to zero-valued decodes could otherwise spin
    // forever on empty height classes (dh=0, immediate OOB dw), and
    // per-symbol 4096×4096 × numNew is an unbounded CPU/memory
    // amplification from a tiny input — cap cumulative decoded area at
    // the same 64 Mpx bound decodeEmbedded puts on the page
    var totalArea = 0L
    while (newSyms.size < numNew) {
      val dh = decodeInt(dec, iadh)
      if (dh == OOB) return None
      hcHeight += dh
      if (hcHeight <= 0 || hcHeight > 4096) return None
      val classStart = newSyms.size
      var symWidth = 0
      var classDone = false
      while (!classDone) {
        val dw = decodeInt(dec, iadw)
        if (dw == OOB) classDone = true
        else {
          symWidth += dw
          if (symWidth <= 0 || symWidth > 4096 || newSyms.size >= numNew)
            return None
          totalArea += symWidth.toLong * hcHeight
          if (totalArea > 64L * 1024 * 1024) return None
          val bits =
            if (!sdrefagg)
              decodeGenericWith(dec, gbCx, symWidth, hcHeight, at,
                tpgdon = false)
            else {
              // aggregate path: exactly ONE refinement instance per symbol
              // (REFAGGNINST > 1 would recurse into a full text region —
              // out of subset, refuse)
              val nInst = decodeInt(dec, iaai)
              if (nInst != 1) return None
              val id = decodeIaid(dec, iaidAgg, aggCodeLen)
              val pool = inputSyms.size + newSyms.size
              if (id < 0 || id >= pool) return None
              val rdx = decodeInt(dec, iardx)
              val rdy = decodeInt(dec, iardy)
              if (rdx == OOB || rdy == OOB) return None
              val g = if (id < inputSyms.size) inputSyms(id)
                      else newSyms(id - inputSyms.size)
              decodeRefinementWith(dec, grCx, symWidth, hcHeight,
                g.bits, g.w, g.h, rdx, rdy, rTemplate, rAt)
            }
          newSyms += Glyph(symWidth, hcHeight, bits)
        }
      }
      // §6.5.5: every height class carries at least one symbol — an empty
      // class on a legal stream is impossible, and accepting it lets a
      // zero-converging MQ tail spin this loop forever
      if (newSyms.size == classStart) return None
    }
    // export flags (§6.5.10): alternating not-exported/exported runs over
    // input ++ new symbols, starting not-exported; bound the iterations
    // (run=0 makes no progress) so a zero-converging tail can't spin
    val all = inputSyms ++ newSyms
    val exported = mutable.ArrayBuffer.empty[Glyph]
    var i = 0
    var cur = false
    var exIters = 0
    while (i < all.size) {
      exIters += 1
      if (exIters > 2 * all.size + 2) return None
      val run = decodeInt(dec, iaex)
      if (run == OOB || run < 0 || i + run > all.size) return None
      if (cur) exported ++= all.slice(i, i + run)
      i += run
      cur = !cur
    }
    if (exported.size != numEx) return None
    Some(exported.toSeq)
  }

  /** §6.5 with SDHUFF=1, SDREFAGG=0 — the Huffman-coded dictionary shape
    * legacy scanned-text encoders emit: per height class, DH via Table
    * B.4/B.5 and the widths via B.2/B.3 (OOB-terminated), then ONE
    * COLLECTIVE BITMAP for the whole class (§6.5.9: BMSIZE via Table B.1;
    * 0 = stored uncompressed with byte-aligned rows, else MMR-coded over
    * exactly BMSIZE bytes — [[CcittG4]], the same delegation MMR generic
    * regions use) from which the symbols are cut by width. Export runs via
    * B.1. CUSTOM tables (selection 3 for DH/DW, the custom-BMSIZE flag)
    * resolve against `inputTables` — the referred code table segments in
    * referred order, consumed DH → DW → BMSIZE (§7.4.3.1.6); a custom DW
    * table without OOB cannot terminate a height class and refuses.
    * Reserved selections, retained contexts, custom AGGINST, and
    * SDHUFF+SDREFAGG refuse. */
  private def decodeSymbolDictHuff(body: Array[Byte], flags: Int,
                                   inputSyms: Seq[Glyph],
                                   inputTables: Seq[HuffTable]): Option[Seq[Glyph]] =
    try {
      if ((flags & 2) != 0) return None // SDHUFF+SDREFAGG out of subset
      if (((flags >> 7) & 1) != 0) return None // custom AGGINST (needs SDREFAGG anyway)
      if (((flags >> 8) & 3) != 0) return None // contexts used/retained: arith-only
      var tblIdx = 0
      def nextTable(): Option[HuffTable] =
        if (tblIdx < inputTables.size) {
          val t = inputTables(tblIdx); tblIdx += 1; Some(t)
        } else None
      val tDH = ((flags >> 2) & 3) match {
        case 0 => TableB4; case 1 => TableB5
        case 3 => nextTable().getOrElse(return None)
        case _ => return None
      }
      val tDW = ((flags >> 4) & 3) match {
        case 0 => TableB2; case 1 => TableB3
        case 3 => nextTable().getOrElse(return None)
        case _ => return None
      }
      if (!tDW.hasOob) return None // DW table MUST code OOB (class terminator)
      val tBm =
        if (((flags >> 6) & 1) != 0) nextTable().getOrElse(return None)
        else TableB1
      // SDHUFF=1 headers carry no AT pixels: numEx/numNew follow the flags
      def be32(o: Int): Long = (((body(o) & 0xFFL) << 24) |
        ((body(o + 1) & 0xFF) << 16) | ((body(o + 2) & 0xFF) << 8) |
        (body(o + 3) & 0xFF)) & 0xFFFFFFFFL
      val numEx = be32(2)
      val numNew = be32(6)
      if (numNew > 65536 || numEx > inputSyms.size + numNew) return None
      val r = new BitReader(java.util.Arrays.copyOfRange(body, 10, body.length))
      val newSyms = mutable.ArrayBuffer.empty[Glyph]
      var hcHeight = 0
      var totalArea = 0L
      while (newSyms.size < numNew) {
        val dh = tDH.decode(r)
        // range-check the LONG before narrowing: a 32-bit-range line can
        // return values whose Int truncation wraps back into the accepted
        // band — refuse, don't garble
        if (dh == HuffOob || dh > 4096 || dh < -4096) return None
        hcHeight += dh.toInt
        if (hcHeight <= 0 || hcHeight > 4096) return None
        // widths first (no per-symbol bitmaps in this mode), then the
        // class's collective bitmap
        val widths = mutable.ArrayBuffer.empty[Int]
        var symWidth = 0
        var totWidth = 0
        var classDone = false
        while (!classDone) {
          val dw = tDW.decode(r)
          if (dw == HuffOob) classDone = true
          else if (dw > 4096 || dw < -4096) return None // pre-narrowing guard
          else {
            symWidth += dw.toInt
            if (symWidth <= 0 || symWidth > 4096 ||
                newSyms.size + widths.size >= numNew) return None
            totalArea += symWidth.toLong * hcHeight
            if (totalArea > 64L * 1024 * 1024) return None
            widths += symWidth
            totWidth += symWidth
          }
        }
        if (widths.isEmpty) return None // §6.5.5: no empty height classes
        val bmSize = tBm.decode(r)
        if (bmSize < 0 || bmSize > r.data.length) return None
        val coll: Array[Boolean] =
          if (bmSize == 0L) {
            // uncompressed: one bit per pixel, rows padded to byte bounds
            val plane = new Array[Boolean](totWidth * hcHeight)
            r.align()
            val pad = ((totWidth + 7) & ~7) - totWidth
            var y = 0
            while (y < hcHeight) {
              var x = 0
              while (x < totWidth) { plane(y * totWidth + x) = r.bit() == 1; x += 1 }
              if (pad > 0) { r.bits(pad); () }
              y += 1
            }
            plane
          } else {
            val start = r.bytePos
            if (start + bmSize > r.data.length) return None
            val slice = java.util.Arrays.copyOfRange(r.data, start,
              start + bmSize.toInt)
            r.skipBytes(bmSize.toInt)
            CcittG4.decode(slice, totWidth, hcHeight).getOrElse(return None)
          }
        var x0 = 0
        widths.foreach { wi =>
          val bits = new Array[Boolean](wi * hcHeight)
          var y = 0
          while (y < hcHeight) {
            var x = 0
            while (x < wi) { bits(y * wi + x) = coll(y * totWidth + x0 + x); x += 1 }
            y += 1
          }
          newSyms += Glyph(wi, hcHeight, bits)
          x0 += wi
        }
      }
      // export flags (§6.5.10): EXRUNLENGTH via Table B.1, same alternating
      // runs as the arithmetic path; the BitReader throws at stream end, so
      // a zero-converging tail can't spin this loop
      val all = inputSyms ++ newSyms
      val exported = mutable.ArrayBuffer.empty[Glyph]
      var i = 0
      var cur = false
      var exIters = 0
      while (i < all.size) {
        exIters += 1
        if (exIters > 2 * all.size + 2) return None
        val run = TableB1.decode(r)
        if (run == HuffOob || run < 0 || i + run > all.size) return None
        if (cur) exported ++= all.slice(i, i + run.toInt)
        i += run.toInt
        cur = !cur
      }
      if (exported.size != numEx) return None
      Some(exported.toSeq)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode a text region body AFTER the region-info bytes (§6.4, §7.4.4):
    * `body` starts at the text-region flags. Subset: SBCOMBOP=OR,
    * SBDEFPIXEL=0; arithmetic coding with REFINE=1 supported
    * (per-instance IARI refinement, §6.4.11); SBHUFF=1 supported for the
    * ALL-CUSTOM-table shape (FS/DS/DT selection 3 resolved against
    * `inputTables`, symbol IDs via the §7.4.4.5 runcode-coded table —
    * every table self-describing, no reliance on the B.6–B.13 constants,
    * which stay out of subset along with SBHUFF+REFINE); TRANSPOSED=1
    * supported in both coders (S runs down the page, T across it,
    * corner picks the column side, advance by symbol height) except
    * combined with REFINE. Anything else refuses. Returns the composed
    * region plane. */
  private[graft] def decodeTextRegion(body: Array[Byte], syms: IndexedSeq[Glyph],
                                      rw: Int, rh: Int,
                                      inputTables: Seq[HuffTable] = Seq.empty): Option[Array[Boolean]] = {
    if (body.length < 6 || syms.isEmpty) return None
    val flags = ((body(0) & 0xFF) << 8) | (body(1) & 0xFF)
    val sbhuff = (flags & 1) != 0
    val refine = (flags & 2) != 0
    val logStrips = (flags >> 2) & 3
    val refCorner = (flags >> 4) & 3
    val transposed = (flags & 0x40) != 0
    val combOp = (flags >> 7) & 3
    val defPixel = (flags & 0x200) != 0
    val rTemplate = (flags >> 15) & 1
    var dsOffset = (flags >> 10) & 0x1F
    if (dsOffset > 15) dsOffset -= 32 // signed 5-bit
    if (combOp != 0 || defPixel) return None
    if (transposed && refine) return None // TRANSPOSED+REFINE out of subset
    if (sbhuff) {
      if (refine) return None // SBHUFF+REFINE out of subset
      return decodeTextRegionHuff(body, syms, rw, rh, logStrips, refCorner,
        dsOffset, transposed, inputTables)
    }
    // §7.4.4.1 field order: flags, then — when REFINE=1 and SBRTEMPLATE=0 —
    // the 2-pair refinement AT, then SBNUMINSTANCES
    var off = 2
    val rAt =
      if (refine && rTemplate == 0) {
        if (body.length < off + 4 + 4) return None
        val a = Array.tabulate(2)(i =>
          (body(off + 2 * i).toInt, body(off + 2 * i + 1).toInt))
        off += 4; a
      } else NominalGrAt
    def be32(o: Int): Long = (((body(o) & 0xFFL) << 24) |
      ((body(o + 1) & 0xFF) << 16) | ((body(o + 2) & 0xFF) << 8) |
      (body(o + 3) & 0xFF)) & 0xFFFFFFFFL
    val numInstances = be32(off)
    if (numInstances > 1000000) return None
    val sbStrips = 1 << logStrips
    val codeLen = symCodeLen(syms.size)
    val dec = new MqDecoder(
      java.util.Arrays.copyOfRange(body, off + 4, body.length))
    val iadt = newCx(512); val iafs = newCx(512)
    val iads = newCx(512); val iait = newCx(512)
    val iaid = newCx(1 << (codeLen + 1))
    val iari = newCx(512); val iardw = newCx(512); val iardh = newCx(512)
    val iardx = newCx(512); val iardy = newCx(512)
    val grCx = newCx(1 << 13)
    val plane = new Array[Boolean](rw * rh)
    val dt0 = decodeInt(dec, iadt)
    if (dt0 == OOB) return None
    var stripT = -dt0 * sbStrips
    var firstS = 0
    var inst = 0L
    while (inst < numInstances) {
      val dt = decodeInt(dec, iadt)
      if (dt == OOB) return None
      stripT += dt * sbStrips
      val dfs = decodeInt(dec, iafs)
      if (dfs == OOB) return None
      firstS += dfs
      var curS = firstS
      var first = true
      var stripDone = false
      while (!stripDone && inst < numInstances) {
        if (!first) {
          val ids = decodeInt(dec, iads)
          if (ids == OOB) stripDone = true else curS += ids + dsOffset
        }
        if (!stripDone) {
          val curT = if (sbStrips == 1) 0
            else {
              val t = decodeInt(dec, iait)
              if (t == OOB) return None
              t
            }
          val t = stripT + curT
          val id = decodeIaid(dec, iaid, codeLen)
          if (id < 0 || id >= syms.size) return None
          val base = syms(id)
          // REFINE=1: per-instance IARI — a nonzero RI replaces the
          // dictionary symbol with a refinement of it sized (w+RDW, h+RDH)
          // at reference offset (⌊RDW/2⌋+RDX, ⌊RDH/2⌋+RDY) (§6.4.11)
          val g =
            if (!refine) base
            else {
              val ri = decodeInt(dec, iari)
              if (ri == OOB) return None
              if (ri == 0) base
              else {
                val rdw = decodeInt(dec, iardw)
                val rdh = decodeInt(dec, iardh)
                val rdx = decodeInt(dec, iardx)
                val rdy = decodeInt(dec, iardy)
                if (rdw == OOB || rdh == OOB || rdx == OOB || rdy == OOB)
                  return None
                val wo = base.w + rdw; val ho = base.h + rdh
                if (wo <= 0 || wo > 4096 || ho <= 0 || ho > 4096) return None
                val bits = decodeRefinementWith(dec, grCx, wo, ho,
                  base.bits, base.w, base.h,
                  Math.floorDiv(rdw, 2) + rdx, Math.floorDiv(rdh, 2) + rdy,
                  rTemplate, rAt)
                Glyph(wo, ho, bits)
              }
            }
          // draw with OR. Non-transposed: S = left edge, corner picks
          // top vs bottom row. TRANSPOSED=1 (§6.4.5): the axes swap — S
          // runs down the page (top edge), T across it, and the corner
          // picks left vs right column; advance is the symbol HEIGHT.
          val (x0, y0) =
            if (!transposed)
              (curS, if (refCorner == 0 || refCorner == 2) t - g.h + 1 else t)
            else
              (if (refCorner == 2 || refCorner == 3) t - g.w + 1 else t, curS)
          var yy = 0
          while (yy < g.h) {
            val py = y0 + yy
            if (py >= 0 && py < rh) {
              var xx = 0
              while (xx < g.w) {
                val px = x0 + xx
                if (px >= 0 && px < rw && g.bits(yy * g.w + xx))
                  plane(py * rw + px) = true
                xx += 1
              }
            }
            yy += 1
          }
          inst += 1
          first = false
          curS += (if (transposed) g.h else g.w) - 1
        }
      }
      // drain the final strip's OOB terminator when the instance budget
      // ended the inner loop exactly at a strip boundary
      if (!stripDone && inst >= numInstances) {
        val ids = decodeInt(dec, iads)
        if (ids != OOB) return None
      }
    }
    Some(plane)
  }

  /** §6.4 with SBHUFF=1 — the Huffman-coded text region, restricted to the
    * fully SELF-DESCRIBING shape: SBHUFFFS/DS/DT must all be selection 3
    * (custom tables, consumed from `inputTables` in that order; DS must
    * carry OOB — it terminates strips), the refinement selections must be
    * zero (REFINE is refused upstream), and symbol IDs decode through the
    * §7.4.4.5 runcode-coded code-length table carried in the stream. The
    * standard text tables B.6–B.13 are NOT in this repo (their constants
    * cannot be carried by the stream), so selections 0–2 refuse. */
  private def decodeTextRegionHuff(body: Array[Byte], syms: IndexedSeq[Glyph],
                                   rw: Int, rh: Int, logStrips: Int,
                                   refCorner: Int, dsOffset: Int,
                                   transposed: Boolean,
                                   inputTables: Seq[HuffTable]): Option[Array[Boolean]] =
    try {
      if (body.length < 2 + 2 + 4) return None
      val hFlags = ((body(2) & 0xFF) << 8) | (body(3) & 0xFF)
      if ((hFlags & 0x8000) != 0) return None // reserved bit
      // refinement-table selections + RSIZE (bits 6-14) are meaningless
      // with REFINE=0; a nonzero value signals a stream shape we do not
      // model (it would also shift custom-table consumption) — refuse
      if (((hFlags >> 6) & 0x1FF) != 0) return None
      var tblIdx = 0
      def nextTable(): Option[HuffTable] =
        if (tblIdx < inputTables.size) {
          val t = inputTables(tblIdx); tblIdx += 1; Some(t)
        } else None
      val tFS = (hFlags & 3) match {
        case 3 => nextTable().getOrElse(return None)
        case _ => return None // B.6/B.7 constants not carried in-stream
      }
      val tDS = ((hFlags >> 2) & 3) match {
        case 3 => nextTable().getOrElse(return None)
        case _ => return None // B.8-B.10
      }
      val tDT = ((hFlags >> 4) & 3) match {
        case 3 => nextTable().getOrElse(return None)
        case _ => return None // B.11-B.13
      }
      if (!tDS.hasOob) return None // DS OOB terminates strips
      def be32(o: Int): Long = (((body(o) & 0xFFL) << 24) |
        ((body(o + 1) & 0xFF) << 16) | ((body(o + 2) & 0xFF) << 8) |
        (body(o + 3) & 0xFF)) & 0xFFFFFFFFL
      val numInstances = be32(4)
      if (numInstances > 1000000) return None
      val sbStrips = 1 << logStrips
      val r = new BitReader(java.util.Arrays.copyOfRange(body, 8, body.length))
      // ---- §7.4.4.5: the symbol-ID code table, runcode-coded ----
      val runLens = Array.fill(35)(r.bits(4).toInt)
      val runTable = new HuffTable(
        IndexedSeq.tabulate(35)(i => HuffLine(runLens(i), 0, i)), 0)
      if (!runTable.wellFormed) return None // Kraft-violating runcode lengths
      val symLens = new Array[Int](syms.size)
      var si = 0
      var prevLen = -1 // -1 = no previous length yet (RUNCODE32 refuses)
      while (si < syms.size) {
        val c = runTable.decode(r)
        if (c == HuffOob || c < 0 || c > 34) return None
        c.toInt match {
          case 32 =>
            if (prevLen < 0) return None
            val n = 3 + r.bits(2).toInt
            if (si + n > syms.size) return None
            var k = 0
            while (k < n) { symLens(si) = prevLen; si += 1; k += 1 }
          case 33 =>
            val n = 3 + r.bits(3).toInt
            if (si + n > syms.size) return None
            var k = 0
            while (k < n) { symLens(si) = 0; si += 1; k += 1 }
            prevLen = 0
          case 34 =>
            val n = 11 + r.bits(7).toInt
            if (si + n > syms.size) return None
            var k = 0
            while (k < n) { symLens(si) = 0; si += 1; k += 1 }
            prevLen = 0
          case len =>
            symLens(si) = len; prevLen = len; si += 1
        }
      }
      r.align() // §7.4.4.5 ends byte-aligned
      // canonical prefix code over symbol order — the same B.3 assignment
      // HuffTable implements; rangeLen 0 lines return the symbol index
      val symTable = new HuffTable(
        IndexedSeq.tabulate(syms.size)(i => HuffLine(symLens(i), 0, i)), 0)
      if (!symTable.wellFormed) return None // Kraft-violating symbol lengths
      // ---- §6.4 decode loop, Huffman variant ----
      val plane = new Array[Boolean](rw * rh)
      def bounded(v: Long): Int = {
        if (v == HuffOob || v < -1000000 || v > 1000000)
          throw new IllegalArgumentException("text field out of range")
        v.toInt
      }
      var stripT = -bounded(tDT.decode(r)) * sbStrips
      var firstS = 0
      var inst = 0L
      while (inst < numInstances) {
        stripT += bounded(tDT.decode(r)) * sbStrips
        firstS += bounded(tFS.decode(r))
        var curS = firstS
        var first = true
        var stripDone = false
        while (!stripDone && inst < numInstances) {
          if (!first) {
            val ids = tDS.decode(r)
            if (ids == HuffOob) stripDone = true
            else curS += bounded(ids) + dsOffset
          }
          if (!stripDone) {
            val curT = if (sbStrips == 1) 0 else r.bits(logStrips).toInt
            val t = stripT + curT
            val id = symTable.decode(r)
            if (id == HuffOob || id < 0 || id >= syms.size) return None
            val g = syms(id.toInt)
            // same corner/axis model as the arithmetic path (see there)
            val (x0, y0) =
              if (!transposed)
                (curS, if (refCorner == 0 || refCorner == 2) t - g.h + 1 else t)
              else
                (if (refCorner == 2 || refCorner == 3) t - g.w + 1 else t, curS)
            var yy = 0
            while (yy < g.h) {
              val py = y0 + yy
              if (py >= 0 && py < rh) {
                var xx = 0
                while (xx < g.w) {
                  val px = x0 + xx
                  if (px >= 0 && px < rw && g.bits(yy * g.w + xx))
                    plane(py * rw + px) = true
                  xx += 1
                }
              }
              yy += 1
            }
            inst += 1
            first = false
            curS += (if (transposed) g.h else g.w) - 1
          }
        }
        // drain the strip's OOB terminator when the instance budget ended
        // the inner loop exactly at the boundary (mirror of the arith path)
        if (!stripDone && inst >= numInstances) {
          val ids = tDS.decode(r)
          if (ids != HuffOob) return None
        }
      }
      Some(plane)
    } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------- embedded segment stream (PDF leg) --

  /** decode a PDF-embedded JBIG2 stream (§7.2 segment headers, no file
    * header) to the page bilevel plane; None when any needed feature is
    * out of subset. `w`/`h` from the PDF image dict bound the plane (the
    * page-info segment must agree or be absent/unbounded). */
  def decodeEmbedded(data: Array[Byte], w: Int, h: Int): Option[Array[Boolean]] =
    try {
      if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024) return None
      val plane = new Array[Boolean](w * h)
      var sawRegion = false
      // exported symbols by symbol-dictionary segment number — text regions
      // assemble their SBSYMS from their referred-to dictionaries in order
      val dicts = mutable.Map.empty[Long, Seq[Glyph]]
      // parsed custom Huffman tables by code-table segment number (§7.4.13)
      val tables = mutable.Map.empty[Long, HuffTable]
      var p = 0
      def u8(): Int = { val v = data(p) & 0xFF; p += 1; v }
      def u16(): Int = (u8() << 8) | u8()
      def u32(): Long = ((u16().toLong << 16) | u16().toLong) & 0xFFFFFFFFL
      while (p + 11 <= data.length) {
        val segNum = u32() // segment number
        val flags = u8()
        val segType = flags & 0x3F
        val pageAssoc4 = (flags & 0x40) != 0
        // referred-to segment count + retention flags
        val rts = u8()
        val count =
          if ((rts >> 5) == 7) {
            p -= 1
            val c = (u32() & 0x1FFFFFFFL).toInt
            p += (c + 8) / 8 // long-form retention bits
            c
          } else rts >> 5
        // referred segment numbers: width keyed to THIS segment's number
        // (§7.2.5: ≤256 → 1 byte, ≤65536 → 2, else 4)
        val refSize = if (segNum <= 256) 1 else if (segNum <= 65536) 2 else 4
        if (count > 64 || p + count.toLong * refSize > data.length) return None
        val referred = (0 until count).map { i =>
          val o = p + i * refSize
          var v = 0L
          var j = 0
          while (j < refSize) { v = (v << 8) | (data(o + j) & 0xFFL); j += 1 }
          v
        }
        p += count * refSize
        if (pageAssoc4) p += 4 else p += 1
        val dataLen = u32()
        if (dataLen == 0xFFFFFFFFL) return None // unknown-length: refuse
        val segStart = p
        val segEnd = segStart + dataLen.toInt
        if (segEnd > data.length) return None
        // every read below is bounded by the segment's own dataLen — a
        // short segment refuses cleanly instead of reading the next
        // segment's header bytes as its body
        def need(n: Int): Boolean = dataLen >= n
        segType match {
          case 48 => // page info: sanity-check dims when bounded
            if (!need(4)) return None
            val pw = ((data(segStart) & 0xFF) << 24) |
              ((data(segStart + 1) & 0xFF) << 16) |
              ((data(segStart + 2) & 0xFF) << 8) | (data(segStart + 3) & 0xFF)
            if (pw != 0 && pw != w) return None
          case 0 => // symbol dictionary
            val inputSyms = referred.flatMap(r => dicts.getOrElse(r, Seq.empty))
            // referred CODE TABLES in referred order (dictionary and table
            // refs interleave freely; each map only resolves its own kind)
            val inputTables = referred.flatMap(tables.get)
            val body = java.util.Arrays.copyOfRange(data, segStart, segEnd)
            dicts(segNum) = decodeSymbolDict(body, inputSyms, inputTables)
              .getOrElse(return None)
          case 53 => // code table segment (§7.4.13): custom Huffman table
            val body = java.util.Arrays.copyOfRange(data, segStart, segEnd)
            tables(segNum) = parseCodeTable(body).getOrElse(return None)
          case 4 | 6 | 7 => // text region (immediate / lossless)
            if (!need(17 + 6)) return None
            def be32(o: Int): Int = ((data(o) & 0xFF) << 24) |
              ((data(o + 1) & 0xFF) << 16) | ((data(o + 2) & 0xFF) << 8) |
              (data(o + 3) & 0xFF)
            val rw = be32(segStart); val rh = be32(segStart + 4)
            val rx = be32(segStart + 8); val ry = be32(segStart + 12)
            if (rx < 0 || ry < 0 || rw <= 0 || rh <= 0 ||
                rx.toLong + rw > w || ry.toLong + rh > h) return None
            val syms = referred.flatMap(r => dicts.getOrElse(r, Seq.empty))
            val inputTables = referred.flatMap(tables.get)
            val body = java.util.Arrays.copyOfRange(data, segStart + 17, segEnd)
            val region = decodeTextRegion(body, syms.toIndexedSeq, rw, rh,
                inputTables)
              .getOrElse(return None)
            var yy = 0
            while (yy < rh) {
              var xx = 0
              while (xx < rw) {
                if (region(yy * rw + xx)) plane((ry + yy) * w + rx + xx) = true
                xx += 1
              }
              yy += 1
            }
            sawRegion = true
          case 36 | 38 | 39 => // generic region (immediate / lossless)
            // region segment info (§7.4.1): w, h, x, y (4 bytes each), flags
            if (!need(18)) return None
            def be32(o: Int): Int = ((data(o) & 0xFF) << 24) |
              ((data(o + 1) & 0xFF) << 16) | ((data(o + 2) & 0xFF) << 8) |
              (data(o + 3) & 0xFF)
            val rw = be32(segStart); val rh = be32(segStart + 4)
            val rx = be32(segStart + 8); val ry = be32(segStart + 12)
            // +1 external-combination-operator byte
            val gFlags = data(segStart + 17) & 0xFF
            val mmr = (gFlags & 1) != 0
            val template = (gFlags >> 1) & 3
            val tpgdon = (gFlags & 8) != 0
            if ((gFlags & 0x10) != 0) return None // EXTTEMPLATE
            var q = segStart + 18
            val at = if (!mmr && template == 0) {
              if (!need(26)) return None
              val arr = Array.tabulate(4) { i =>
                val r = (data(q + 2 * i).toInt, data(q + 2 * i + 1).toInt)
                r
              }
              q += 8; arr
            } else if (!mmr) return None // templates 1-3 out of subset
            else NominalAt
            if (rx < 0 || ry < 0 || rw <= 0 || rh <= 0 ||
                rx.toLong + rw > w || ry.toLong + rh > h) return None
            val body = java.util.Arrays.copyOfRange(data, q, segEnd)
            val region =
              if (mmr) CcittG4.decode(body, rw, rh).getOrElse(return None)
              else decodeGenericArith(body, rw, rh, at, tpgdon)
            // compose with OR (the default external op for bilevel pages)
            var yy = 0
            while (yy < rh) {
              var xx = 0
              while (xx < rw) {
                if (region(yy * rw + xx)) plane((ry + yy) * w + rx + xx) = true
                xx += 1
              }
              yy += 1
            }
            sawRegion = true
          case 49 | 50 | 51 | 62 => () // end-of-page/stripe/file, extension: skip
          case _ => return None // halftone/refinement region: refuse
        }
        p = segEnd
      }
      if (sawRegion) Some(plane) else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** build a PDF-embeddable JBIG2 stream: page info + one immediate
    * lossless generic region covering the plane. `mmr` selects the MMR
    * (G4) coding; otherwise arithmetic template 0 with nominal AT. */
  def encodeEmbedded(plane: Array[Boolean], w: Int, h: Int,
                     mmr: Boolean, tpgdon: Boolean = false): Array[Byte] = {
    require(plane.length == w * h, "plane shape mismatch")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def u32(v: Int): Unit = { u16(v >>> 16); u16(v) }
    def header(num: Int, segType: Int, dataLen: Int): Unit = {
      u32(num); u8(segType) // flags: 1-byte page assoc
      u8(0) // zero referred-to segments
      u8(1) // page 1
      u32(dataLen)
    }
    // page info (type 48): w, h, xres, yres, flags, striping
    header(0, 48, 19)
    u32(w); u32(h); u32(0); u32(0); u8(0); u16(0)
    // immediate lossless generic region (type 39)
    val body = if (mmr) CcittG4.encode(plane, w, h)
               else encodeGenericArith(plane, w, h, NominalAt, tpgdon)
    val atLen = if (mmr) 0 else 8
    header(1, 39, 18 + atLen + body.length)
    u32(w); u32(h); u32(0); u32(0); u8(0) // region info, external op OR
    u8((if (tpgdon) 8 else 0) | (if (mmr) 1 else 0)) // flags: template 0
    if (!mmr) NominalAt.foreach { case (ax, ay) => u8(ax); u8(ay) }
    out.write(body)
    out.toByteArray
  }

  /** Build a PDF-embeddable SYMBOL-CODED JBIG2 stream — the page shape
    * jbig2enc-class scanner toolchains emit for text pages: a symbol
    * dictionary (type 0, arithmetic, template 0) holding `glyphs`, plus an
    * immediate text region (type 6) placing them at `places` =
    * (glyphIndex, x, y) where y is the glyph's TOP row. Glyphs must be
    * sorted by nondecreasing height (the dictionary's height-class decode
    * order IS the text region's symbol-ID order); places must be sorted
    * by (y, x) and instances on one y must not regress in x.
    *
    * `bottomLeft` switches the reference corner to BOTTOMLEFT (T = the
    * glyph's bottom row), and `logStrips` > 0 encodes SBSTRIPS = 2^log
    * strips with per-instance CURT (IAIT) offsets — together they cover
    * the §6.4.5 placement variants beyond the plain one-row-strip
    * TOPLEFT shape. The composed page raster is identical for any
    * setting; only the coded representation differs.
    *
    * `huffDict` switches the DICTIONARY to Huffman coding (SDHUFF=1 with
    * the standard Annex-B tables — DH via B.4, DW via B.2, BMSIZE and the
    * export runs via B.1): 0 stores each height class's collective bitmap
    * uncompressed (§6.5.9 BMSIZE=0), 1 codes it with MMR; -1 keeps the
    * arithmetic dictionary. The text region stays arithmetic either way
    * (the modes are per-segment — mixing is the legal shape that pins
    * both coders against ONE oracle).
    *
    * `huffSel` = (SDHUFFDH, SDHUFFDW) standard-table selections: (0, 0)
    * codes DH with Table B.4 and DW with B.2 (DW ≥ 0 — widths must be
    * nondecreasing within a height class); (1, 1) selects the signed
    * tables B.5/B.3, whose DW range admits width-DECREASING classes.
    * `customTables = true` (requires `huffDict >= 0`) instead BUILDS
    * per-stream DH/DW/BMSIZE tables from the dictionary's value sets,
    * carries them as §7.4.13 code table segments, and selects them with
    * SDHUFFDH/DW=3 + the custom-BMSIZE flag. `huffText = true` codes the
    * TEXT region with SBHUFF=1 in the all-custom shape: FS/DS/DT tables
    * built from the region's own deltas (three more table segments,
    * selections 3) and symbol IDs through the §7.4.4.5 runcode-coded
    * table — the only SBHUFF form expressible without the B.6–B.13
    * constants. `transposed = true` codes the region with TRANSPOSED=1
    * (§6.4.5 swapped axes: S down the page, T across, TOPLEFT corner,
    * advance by symbol height) — the vertical-text / column layout shape;
    * the composed raster is identical to the non-transposed coding of
    * the same placements, so one oracle pins both. */
  def encodeEmbeddedSymbols(glyphs: IndexedSeq[Glyph],
                            places: Seq[(Int, Int, Int)],
                            w: Int, h: Int,
                            bottomLeft: Boolean = false,
                            logStrips: Int = 0,
                            huffDict: Int = -1,
                            huffSel: (Int, Int) = (0, 0),
                            customTables: Boolean = false,
                            huffText: Boolean = false,
                            transposed: Boolean = false): Array[Byte] =
    encodeSymbolStreams(glyphs, places, w, h, bottomLeft, logStrips,
      huffDict, splitGlobals = false, huffSel, customTables, huffText,
      transposed)._2

  /** [[encodeEmbeddedSymbols]] split for the PDF /JBIG2Globals shape
    * (multi-page scanned toolchains share one dictionary across pages):
    * returns (globals, page) where `globals` holds the symbol-dictionary
    * segment (page association 0) and `page` the page-info + text-region
    * segments referring to it. A decoder processes the globals stream's
    * segments before the page's own. */
  def encodeEmbeddedSymbolsGlobals(glyphs: IndexedSeq[Glyph],
                                   places: Seq[(Int, Int, Int)],
                                   w: Int, h: Int,
                                   huffDict: Int = -1): (Array[Byte], Array[Byte]) =
    encodeSymbolStreams(glyphs, places, w, h, bottomLeft = false,
      logStrips = 0, huffDict = huffDict, splitGlobals = true)

  private def encodeSymbolStreams(glyphs: IndexedSeq[Glyph],
                                  places: Seq[(Int, Int, Int)],
                                  w: Int, h: Int,
                                  bottomLeft: Boolean,
                                  logStrips: Int,
                                  huffDict: Int,
                                  splitGlobals: Boolean,
                                  huffSel: (Int, Int) = (0, 0),
                                  customTables: Boolean = false,
                                  huffText: Boolean = false,
                                  transposed: Boolean = false): (Array[Byte], Array[Byte]) = {
    require(glyphs.nonEmpty && places.nonEmpty, "need glyphs and placements")
    require((1 until glyphs.size).forall(i => glyphs(i - 1).h <= glyphs(i).h),
      "glyphs must be sorted by height")
    require(!customTables || huffDict >= 0, "custom tables need SDHUFF=1")
    // custom-table mode: the DH/DW/BMSIZE coding tables are BUILT from the
    // dictionary's actual value sets (a pre-pass below collects them),
    // serialized as §7.4.13 code table segments, and selected with
    // SDHUFFDH/DW=3 + the custom-BMSIZE flag — the self-describing shape
    // real encoders emit when the standard tables fit their data poorly
    var customSegs: IndexedSeq[Array[Byte]] = IndexedSeq.empty
    // ---- symbol dictionary body ----
    val sdBody: Array[Byte] = if (huffDict < 0) {
      val sdEnc = new MqEncoder
      val gbCx = newCx(1 << 16)
      val iadh = newCx(512); val iadw = newCx(512); val iaex = newCx(512)
      var hcHeight = 0
      var gi = 0
      while (gi < glyphs.size) {
        val ch = glyphs(gi).h
        encodeInt(sdEnc, iadh, ch - hcHeight)
        hcHeight = ch
        var symWidth = 0
        while (gi < glyphs.size && glyphs(gi).h == ch) {
          val g = glyphs(gi)
          encodeInt(sdEnc, iadw, g.w - symWidth)
          symWidth = g.w
          encodeGenericWith(sdEnc, gbCx, g.bits, g.w, g.h, NominalAt,
            tpgdon = false)
          gi += 1
        }
        encodeInt(sdEnc, iadw, OOB)
      }
      encodeInt(sdEnc, iaex, 0) // zero-length not-exported run
      encodeInt(sdEnc, iaex, glyphs.size) // export everything
      sdEnc.flush()
    } else {
      // pre-pass: height classes, their collective bitmaps (MMR-coded up
      // front when huffDict=1 — BMSIZE values must exist BEFORE a custom
      // BMSIZE table can be built), and the DH/DW value sets
      final case class HClass(dh: Int, dws: Seq[Long], totWidth: Int,
                              coll: Array[Boolean], mmr: Option[Array[Byte]])
      val hclasses = mutable.ArrayBuffer.empty[HClass]
      var hcHeight0 = 0
      var gi0 = 0
      while (gi0 < glyphs.size) {
        val ch = glyphs(gi0).h
        val cls = mutable.ArrayBuffer.empty[Glyph]
        val dws = mutable.ArrayBuffer.empty[Long]
        var symWidth = 0
        while (gi0 < glyphs.size && glyphs(gi0).h == ch) {
          val g = glyphs(gi0)
          dws += (g.w - symWidth).toLong
          symWidth = g.w
          cls += g
          gi0 += 1
        }
        val totWidth = cls.map(_.w).sum
        val coll = new Array[Boolean](totWidth * ch)
        var x0 = 0
        cls.foreach { g =>
          var y = 0
          while (y < ch) {
            var x = 0
            while (x < g.w) { coll(y * totWidth + x0 + x) = g.bits(y * g.w + x); x += 1 }
            y += 1
          }
          x0 += g.w
        }
        val mmr = if (huffDict == 0) None
                  else Some(CcittG4.encode(coll, totWidth, ch))
        hclasses += HClass(ch - hcHeight0, dws.toSeq, totWidth, coll, mmr)
        hcHeight0 = ch
      }
      val (tDH, tDW, tBm) =
        if (customTables) {
          val dhVals = hclasses.map(_.dh.toLong)
          val dwVals = hclasses.flatMap(_.dws)
          val bmVals = hclasses.map(_.mmr.map(_.length.toLong).getOrElse(0L))
          val dh = buildCustomTable(dhVals.min, dhVals.max, oob = false)
          val dw = buildCustomTable(dwVals.min, dwVals.max, oob = true)
          val bm = buildCustomTable(bmVals.min, bmVals.max, oob = false)
          customSegs = IndexedSeq(
            encodeCodeTable(dh), encodeCodeTable(dw), encodeCodeTable(bm))
          (dh, dw, bm)
        } else {
          val (dhSel, dwSel) = huffSel
          hclasses.foreach(c => require(dwSel == 1 || c.dws.forall(_ >= 0),
            "Table B.2 (dwSel 0) needs nondecreasing widths in a class"))
          (if (dhSel == 0) TableB4 else TableB5,
           if (dwSel == 0) TableB2 else TableB3, TableB1)
        }
      val wtr = new BitWriter
      hclasses.foreach { c =>
        tDH.encode(wtr, c.dh)
        c.dws.foreach(dw => tDW.encode(wtr, dw))
        tDW.encode(wtr, HuffOob)
        c.mmr match {
          case None =>
            tBm.encode(wtr, 0) // BMSIZE=0: uncompressed, byte-padded rows
            wtr.align()
            val ch = c.coll.length / c.totWidth
            var y = 0
            while (y < ch) {
              var x = 0
              while (x < c.totWidth) {
                wtr.bit(if (c.coll(y * c.totWidth + x)) 1 else 0); x += 1
              }
              wtr.align()
              y += 1
            }
          case Some(mmr) =>
            tBm.encode(wtr, mmr.length)
            wtr.align()
            wtr.bytes(mmr)
        }
      }
      TableB1.encode(wtr, 0) // zero-length not-exported run (EX: always B.1)
      TableB1.encode(wtr, glyphs.size)
      wtr.result()
    }
    // ---- text region body ----
    val sbStrips = 1 << logStrips
    val codeLen = symCodeLen(glyphs.size)
    // instance (S, T) per the reference corner: non-transposed S = x
    // (left edge) and T = the top (TOPLEFT) or bottom (BOTTOMLEFT) row;
    // TRANSPOSED swaps the axes — S = y (top edge), T = x, TOPLEFT only.
    // Strips cover [k·SBSTRIPS, (k+1)·SBSTRIPS) in T, CURT = the in-strip
    // offset (IAIT / raw bits when SBSTRIPS > 1)
    require(!transposed || !bottomLeft, "transposed encoder emits TOPLEFT only")
    val inst =
      if (transposed) places.map { case (si, x, y) => (si, y, x) }
      else places.map { case (si, x, y) =>
        (si, x, if (bottomLeft) y + glyphs(si).h - 1 else y)
      }
    def advance(si: Int): Int =
      (if (transposed) glyphs(si).h else glyphs(si).w) - 1
    val groups = inst.groupBy(_._3 / sbStrips).toSeq.sortBy(_._1)
    var textTableBodies: IndexedSeq[Array[Byte]] = IndexedSeq.empty
    val trBody: Array[Byte] = if (!huffText) {
      val trEnc = new MqEncoder
      val iadt = newCx(512); val iafs = newCx(512); val iads = newCx(512)
      val iait = newCx(512); val iaid = newCx(1 << (codeLen + 1))
      encodeInt(trEnc, iadt, 0) // STRIPT starts at 0
      var stripT = 0
      var firstS = 0
      groups.foreach { case (sk, ps) =>
        encodeInt(trEnc, iadt, (sk * sbStrips - stripT) / sbStrips)
        stripT = sk * sbStrips
        val sorted = ps.sortBy(_._2)
        encodeInt(trEnc, iafs, sorted.head._2 - firstS)
        firstS = sorted.head._2
        var curS = firstS
        var first = true
        sorted.foreach { case (si, x, t) =>
          if (!first) encodeInt(trEnc, iads, x - curS) // IDS (SBDSOFFSET = 0)
          if (sbStrips > 1) encodeInt(trEnc, iait, t - stripT)
          encodeIaid(trEnc, iaid, codeLen, si)
          curS = x + advance(si)
          first = false
        }
        encodeInt(trEnc, iads, OOB) // strip terminator
      }
      trEnc.flush()
    } else {
      // SBHUFF=1, all-custom: pre-pass collects the DT/DFS/IDS value sets
      // so the FS/DS/DT tables can be built before the fields are written
      val dtVals = mutable.ArrayBuffer[Long](0L) // initial STRIPT field
      val dfsVals = mutable.ArrayBuffer.empty[Long]
      val idsVals = mutable.ArrayBuffer.empty[Long]
      var stripT = 0
      var firstS = 0
      groups.foreach { case (sk, ps) =>
        dtVals += ((sk * sbStrips - stripT) / sbStrips).toLong
        stripT = sk * sbStrips
        val sorted = ps.sortBy(_._2)
        dfsVals += (sorted.head._2 - firstS).toLong
        firstS = sorted.head._2
        var curS = firstS
        var first = true
        sorted.foreach { case (si, x, _) =>
          if (!first) idsVals += (x - curS).toLong
          curS = x + advance(si)
          first = false
        }
      }
      val tFS = buildCustomTable(dfsVals.min, dfsVals.max, oob = false)
      val tDS = buildCustomTable(
        if (idsVals.isEmpty) 0L else idsVals.min,
        if (idsVals.isEmpty) 0L else idsVals.max, oob = true)
      val tDT = buildCustomTable(dtVals.min, dtVals.max, oob = false)
      textTableBodies = IndexedSeq(tFS, tDS, tDT).map(encodeCodeTable)
      val wtr = new BitWriter
      // §7.4.4.5 symbol-ID table: every symbol gets the same code length
      // (the flat assignment — Kraft-fine since 2^codeLen >= nSyms), so
      // the runcode table needs exactly ONE used entry: RUNCODE<codeLen>
      // with prefix length 1 (its canonical code is the single bit 0)
      (0 until 35).foreach(i => wtr.bits(if (i == codeLen) 1L else 0L, 4))
      glyphs.indices.foreach(_ => wtr.bit(0))
      wtr.align()
      val symTable = new HuffTable(
        IndexedSeq.tabulate(glyphs.size)(i => HuffLine(codeLen, 0, i)), 0)
      stripT = 0
      firstS = 0
      tDT.encode(wtr, 0) // initial STRIPT
      groups.foreach { case (sk, ps) =>
        tDT.encode(wtr, (sk * sbStrips - stripT) / sbStrips)
        stripT = sk * sbStrips
        val sorted = ps.sortBy(_._2)
        tFS.encode(wtr, sorted.head._2 - firstS)
        firstS = sorted.head._2
        var curS = firstS
        var first = true
        sorted.foreach { case (si, x, t) =>
          if (!first) tDS.encode(wtr, x - curS)
          if (sbStrips > 1) wtr.bits((t - stripT).toLong, logStrips)
          symTable.encode(wtr, si)
          curS = x + advance(si)
          first = false
        }
        tDS.encode(wtr, HuffOob) // strip terminator
      }
      wtr.result()
    }
    // ---- segments, each a standalone byte run so the caller can route
    // the dictionary out-of-band (/JBIG2Globals) or keep one stream ----
    def segment(body: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      body(out)
      out.toByteArray
    }
    def writers(out: java.io.ByteArrayOutputStream) = {
      def u8(v: Int): Unit = out.write(v & 0xFF)
      def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
      def u32(v: Int): Unit = { u16(v >>> 16); u16(v) }
      def header(num: Int, segType: Int, refs: Seq[Int], dataLen: Int,
                 pageAssoc: Int): Unit = {
        u32(num); u8(segType)
        u8(refs.size << 5) // short-form count, retain bits 0
        refs.foreach(u8) // 1-byte referred numbers (segNum ≤ 256)
        u8(pageAssoc)
        u32(dataLen)
      }
      (u8 _, u16 _, u32 _, header _)
    }
    val pageSeg = segment { out =>
      val (u8, u16, u32, header) = writers(out)
      header(0, 48, Nil, 19, 1) // page info
      u32(w); u32(h); u32(0); u32(0); u8(0); u16(0)
    }
    // custom-table mode renumbers: tables 1-3 (type 53), dictionary 4
    // (referring to them in §7.4.3.1.6 consumption order), text region 5 —
    // the standard-table layout keeps its historical 1/2 numbering so
    // existing golden fixtures stay byte-stable
    val dictNum = if (customTables) 4 else 1
    // globals-eligible dictionary: page association 0 when routed
    // out-of-band (ISO 32000 §7.4.7 / T.88 §7.3.3: globals segments have
    // no page), 1 when inline — the body is identical
    def tableSegs(pageAssoc: Int): Array[Byte] = segment { out =>
      val (_, _, _, header) = writers(out)
      customSegs.zipWithIndex.foreach { case (body, i) =>
        header(i + 1, 53, Nil, body.length, pageAssoc)
        out.write(body)
      }
    }
    def dictSeg(pageAssoc: Int): Array[Byte] = segment { out =>
      val (u8, u16, u32, header) = writers(out)
      if (huffDict < 0) {
        header(dictNum, 0, Nil, 18 + sdBody.length, pageAssoc) // arithmetic
        u16(0) // flags: arithmetic, template 0, no refinement
        NominalAt.foreach { case (ax, ay) => u8(ax); u8(ay) }
      } else if (customTables) {
        // SDHUFF=1 with DH/DW selection 3 + custom BMSIZE, resolved
        // against the three referred code table segments
        header(dictNum, 0, Seq(1, 2, 3), 10 + sdBody.length, pageAssoc)
        u16(1 | (3 << 2) | (3 << 4) | (1 << 6))
      } else {
        // SDHUFF=1 with the (DH, DW) standard-table selections: no AT pixels
        header(dictNum, 0, Nil, 10 + sdBody.length, pageAssoc)
        u16(1 | (huffSel._1 << 2) | (huffSel._2 << 4))
      }
      u32(glyphs.size); u32(glyphs.size) // numEx, numNew
      out.write(sdBody)
    }
    // SBHUFF text: three more table segments (FS/DS/DT) after the dict,
    // referred by the text region in §7.4.4 consumption order
    val textTableNums = textTableBodies.indices.map(_ + dictNum + 1)
    def textTableSegs: Array[Byte] = segment { out =>
      val (_, _, _, header) = writers(out)
      textTableBodies.zip(textTableNums).foreach { case (body, num) =>
        header(num, 53, Nil, body.length, 1)
        out.write(body)
      }
    }
    val textSeg = segment { out =>
      val (u8, u16, u32, header) = writers(out)
      val textNum = dictNum + textTableBodies.size + 1
      header(textNum, 6, dictNum +: textTableNums,
        17 + 2 + (if (huffText) 2 else 0) + 4 + trBody.length, 1)
      u32(w); u32(h); u32(0); u32(0); u8(0) // region info, external op OR
      // flags: SBHUFF, LOGSBSTRIPS, refcorner (0 = BOTTOMLEFT,
      // 1 = TOPLEFT), TRANSPOSED, OR, defpixel 0, dsOffset 0
      u16((if (huffText) 1 else 0) | (logStrips << 2) |
        ((if (bottomLeft) 0 else 1) << 4) |
        (if (transposed) 0x40 else 0))
      if (huffText) u16(3 | (3 << 2) | (3 << 4)) // FS/DS/DT all custom
      u32(places.size) // SBNUMINSTANCES
      out.write(trBody)
    }
    if (splitGlobals)
      (tableSegs(0) ++ dictSeg(0), pageSeg ++ textTableSegs ++ textSeg)
    else (Array.emptyByteArray,
      pageSeg ++ tableSegs(1) ++ dictSeg(1) ++ textTableSegs ++ textSeg)
  }

  /** Build a PDF-embeddable REFINING JBIG2 stream exercising BOTH §6.3
    * refinement consumers — the shape refinement-capable encoders emit
    * for text pages whose glyph instances differ slightly from the
    * dictionary prototype:
    *
    *  - dictionary A (segment 1): plain arithmetic template-0 dictionary
    *    exporting `baseGlyphs` (sorted by nondecreasing height);
    *  - dictionary B (segment 2, SDREFAGG=1, refers to A): each entry of
    *    `refined` = (index into baseGlyphs, target glyph) is coded as a
    *    single-instance aggregate refinement of that base glyph
    *    (REFAGGNINST=1, RDX=RDY=0) — sorted by nondecreasing height;
    *  - immediate text region (segment 3, REFINE=1, refers to A then B):
    *    `places` = (symIndex into A.exports ++ B.exports, x, y,
    *    optional inline target with the SAME dims) placed TOPLEFT on
    *    one-row strips; a Some target is coded per-instance with IARI=1
    *    and RDW=RDH=RDX=RDY=0 (§6.4.11).
    *
    * Refinement coding is lossless, so the composed page is exactly the
    * OR of the placed targets/glyphs — the closed form the oracle
    * recomputes. `rTemplate` selects GRTEMPLATE 0 (nominal AT written)
    * or 1. */
  def encodeEmbeddedRefined(baseGlyphs: IndexedSeq[Glyph],
                            refined: Seq[(Int, Glyph)],
                            places: Seq[(Int, Int, Int, Option[Array[Boolean]])],
                            w: Int, h: Int,
                            rTemplate: Int = 0): Array[Byte] = {
    require(baseGlyphs.nonEmpty && places.nonEmpty, "need glyphs and places")
    require((1 until baseGlyphs.size).forall(i =>
      baseGlyphs(i - 1).h <= baseGlyphs(i).h), "base glyphs sorted by height")
    require((1 until refined.size).forall(i =>
      refined(i - 1)._2.h <= refined(i)._2.h), "refined glyphs sorted by height")
    val rAt = NominalGrAt
    // ---- dictionary A body: the plain shape encodeEmbeddedSymbols uses ----
    def plainDictBody(glyphs: IndexedSeq[Glyph]): Array[Byte] = {
      val enc = new MqEncoder
      val gbCx = newCx(1 << 16)
      val iadh = newCx(512); val iadw = newCx(512); val iaex = newCx(512)
      var hcHeight = 0
      var gi = 0
      while (gi < glyphs.size) {
        val ch = glyphs(gi).h
        encodeInt(enc, iadh, ch - hcHeight)
        hcHeight = ch
        var symWidth = 0
        while (gi < glyphs.size && glyphs(gi).h == ch) {
          val g = glyphs(gi)
          encodeInt(enc, iadw, g.w - symWidth)
          symWidth = g.w
          encodeGenericWith(enc, gbCx, g.bits, g.w, g.h, NominalAt,
            tpgdon = false)
          gi += 1
        }
        encodeInt(enc, iadw, OOB)
      }
      encodeInt(enc, iaex, 0)
      encodeInt(enc, iaex, glyphs.size)
      enc.flush()
    }
    val sdABody = plainDictBody(baseGlyphs)
    // ---- dictionary B body: SDREFAGG single-instance refinements ----
    val sdBEnc = new MqEncoder
    val aggCodeLen = symCodeLen(baseGlyphs.size + refined.size)
    locally {
      val iadh = newCx(512); val iadw = newCx(512); val iaex = newCx(512)
      val iaai = newCx(512); val iardx = newCx(512); val iardy = newCx(512)
      val iaidAgg = newCx(1 << (aggCodeLen + 1))
      val grCx = newCx(1 << 13)
      var hcHeight = 0
      var gi = 0
      while (gi < refined.size) {
        val ch = refined(gi)._2.h
        encodeInt(sdBEnc, iadh, ch - hcHeight)
        hcHeight = ch
        var symWidth = 0
        while (gi < refined.size && refined(gi)._2.h == ch) {
          val (refIdx, tgt) = refined(gi)
          encodeInt(sdBEnc, iadw, tgt.w - symWidth)
          symWidth = tgt.w
          encodeInt(sdBEnc, iaai, 1) // REFAGGNINST = 1
          encodeIaid(sdBEnc, iaidAgg, aggCodeLen, refIdx)
          encodeInt(sdBEnc, iardx, 0)
          encodeInt(sdBEnc, iardy, 0)
          val ref = baseGlyphs(refIdx)
          encodeRefinementWith(sdBEnc, grCx, tgt.bits, tgt.w, tgt.h,
            ref.bits, ref.w, ref.h, 0, 0, rTemplate, rAt)
          gi += 1
        }
        encodeInt(sdBEnc, iadw, OOB)
      }
      encodeInt(sdBEnc, iaex, baseGlyphs.size) // input symbols: not exported
      encodeInt(sdBEnc, iaex, refined.size)    // new symbols: exported
    }
    val sdBBody = sdBEnc.flush()
    // ---- text region body (TOPLEFT, one-row strips, REFINE=1) ----
    val allGlyphs = baseGlyphs ++ refined.map(_._2)
    val codeLen = symCodeLen(allGlyphs.size)
    val trEnc = new MqEncoder
    locally {
      val iadt = newCx(512); val iafs = newCx(512); val iads = newCx(512)
      val iaid = newCx(1 << (codeLen + 1))
      val iari = newCx(512); val iardw = newCx(512); val iardh = newCx(512)
      val iardx = newCx(512); val iardy = newCx(512)
      val grCx = newCx(1 << 13)
      encodeInt(trEnc, iadt, 0)
      var stripT = 0
      var firstS = 0
      places.groupBy(_._3).toSeq.sortBy(_._1).foreach { case (t, ps) =>
        encodeInt(trEnc, iadt, t - stripT)
        stripT = t
        val sorted = ps.sortBy(_._2)
        encodeInt(trEnc, iafs, sorted.head._2 - firstS)
        firstS = sorted.head._2
        var curS = firstS
        var first = true
        sorted.foreach { case (si, x, _, inline) =>
          if (!first) encodeInt(trEnc, iads, x - curS)
          encodeIaid(trEnc, iaid, codeLen, si)
          val g = allGlyphs(si)
          inline match {
            case None => encodeInt(trEnc, iari, 0)
            case Some(tgt) =>
              require(tgt.length == g.w * g.h, "inline target dims mismatch")
              encodeInt(trEnc, iari, 1)
              encodeInt(trEnc, iardw, 0); encodeInt(trEnc, iardh, 0)
              encodeInt(trEnc, iardx, 0); encodeInt(trEnc, iardy, 0)
              encodeRefinementWith(trEnc, grCx, tgt, g.w, g.h,
                g.bits, g.w, g.h, 0, 0, rTemplate, rAt)
          }
          curS = x + g.w - 1
          first = false
        }
        encodeInt(trEnc, iads, OOB)
      }
    }
    val trBody = trEnc.flush()
    // ---- segment stream ----
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def u32(v: Int): Unit = { u16(v >>> 16); u16(v) }
    def header(num: Int, segType: Int, refs: Seq[Int], dataLen: Int): Unit = {
      u32(num); u8(segType)
      u8(refs.size << 5)
      refs.foreach(u8)
      u8(1)
      u32(dataLen)
    }
    header(0, 48, Nil, 19)
    u32(w); u32(h); u32(0); u32(0); u8(0); u16(0)
    header(1, 0, Nil, 18 + sdABody.length) // dictionary A: plain
    u16(0)
    NominalAt.foreach { case (ax, ay) => u8(ax); u8(ay) }
    u32(baseGlyphs.size); u32(baseGlyphs.size)
    out.write(sdABody)
    val grAtLen = if (rTemplate == 0) 4 else 0
    header(2, 0, Seq(1), 18 + grAtLen + sdBBody.length) // dictionary B: REFAGG
    u16(2 | (rTemplate << 12)) // SDREFAGG=1, SDTEMPLATE=0, SDRTEMPLATE
    NominalAt.foreach { case (ax, ay) => u8(ax); u8(ay) }
    if (rTemplate == 0) rAt.foreach { case (ax, ay) => u8(ax); u8(ay) }
    u32(refined.size); u32(refined.size)
    out.write(sdBBody)
    header(3, 6, Seq(1, 2), 17 + 6 + grAtLen + trBody.length) // text region
    u32(w); u32(h); u32(0); u32(0); u8(0)
    u16(2 | (1 << 4) | (rTemplate << 15)) // REFINE=1, TOPLEFT, strips=1
    if (rTemplate == 0) rAt.foreach { case (ax, ay) => u8(ax); u8(ay) }
    u32(places.size)
    out.write(trBody)
    out.toByteArray
  }
}
