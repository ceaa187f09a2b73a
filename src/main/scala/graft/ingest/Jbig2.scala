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
  *  - the PDF EMBEDDED segment stream (§7.2 headers without file header):
  *    page information (type 48) + immediate (lossless) generic regions
  *    (types 36/38/39), end-of-page/file tolerated
  *
  * Subset honesty (refuse-don't-garble): templates 1–3, refinement,
  * symbol/text/halftone segments, /JBIG2Globals, and EXTTEMPLATE are
  * refused — the generic-region path implemented here is what scanner
  * toolchains (jbig2enc and kin) emit for plain scanned pages.
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

  private[graft] final class MqDecoder(data: Array[Byte]) {
    // per-context state: index into Qe table (low 7 bits) | MPS (bit 7)
    private val cx = new Array[Byte](1 << 16)
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

    def decode(ctx: Int): Int = {
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
    private val cx = new Array[Byte](1 << 16)
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

    def encode(ctx: Int, bit: Int): Unit = {
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
      // SETBITS
      val tempC = (c + a - 1) & 0xFFFF0000L
      c = if (tempC < c) tempC + 0x8000L else tempC
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
                                         tpgdon: Boolean): Array[Boolean] = {
    val plane = new Array[Boolean](w * h)
    def px(x: Int, y: Int): Int =
      if (x < 0 || x >= w || y < 0) 0 else if (plane(y * w + x)) 1 else 0
    val dec = new MqDecoder(data)
    var ltp = false
    var y = 0
    while (y < h) {
      if (tpgdon) {
        val sltp = dec.decode(Tpgdon0Ctx)
        if (sltp == 1) ltp = !ltp
      }
      if (ltp) {
        // typical row: copy the row above (row 0 copies the all-0 row)
        var x = 0
        while (x < w) { plane(y * w + x) = y > 0 && plane((y - 1) * w + x); x += 1 }
      } else {
        var x = 0
        while (x < w) {
          val bit = dec.decode(ctx0(px, x, y, at))
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
    def px(x: Int, y: Int): Int =
      if (x < 0 || x >= w || y < 0 || y >= h) 0 else if (plane(y * w + x)) 1 else 0
    val enc = new MqEncoder
    var ltp = false
    var y = 0
    while (y < h) {
      if (tpgdon) {
        val typical = y > 0 && (0 until w).forall(x => px(x, y) == px(x, y - 1))
        val sltp = if (typical != ltp) 1 else 0
        enc.encode(Tpgdon0Ctx, sltp)
        if (sltp == 1) ltp = !ltp
      }
      if (!(tpgdon && ltp)) {
        var x = 0
        while (x < w) { enc.encode(ctx0(px, x, y, at), px(x, y)); x += 1 }
      }
      y += 1
    }
    enc.flush()
  }

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
        p += count * refSize
        if (pageAssoc4) p += 4 else p += 1
        val dataLen = u32()
        if (dataLen == 0xFFFFFFFFL) return None // unknown-length: refuse
        val segStart = p
        val segEnd = segStart + dataLen.toInt
        if (segEnd > data.length) return None
        segType match {
          case 48 => // page info: sanity-check dims when bounded
            val pw = ((data(segStart) & 0xFF) << 24) |
              ((data(segStart + 1) & 0xFF) << 16) |
              ((data(segStart + 2) & 0xFF) << 8) | (data(segStart + 3) & 0xFF)
            if (pw != 0 && pw != w) return None
          case 36 | 38 | 39 => // generic region (immediate / lossless)
            // region segment info (§7.4.1): w, h, x, y (4 bytes each), flags
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
          case _ => return None // symbol/text/halftone/refinement: refuse
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
}
