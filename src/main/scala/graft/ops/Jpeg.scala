package graft.ops

import scala.collection.mutable

/** Baseline JPEG (ITU-T T.81 / ISO 10918) — REAL from-scratch codec,
  * completing the image set (BMP/PNG/GIF) with the format crawled image
  * corpora are overwhelmingly made of.
  *
  * The DECODER is general baseline sequential: marker walk (APPn/COM
  * skipped), 8-bit DQT tables, DHT canonical Huffman construction, SOF0
  * (8-bit, non-subsampled components), interleaved SOS entropy data with
  * 0xFF00 byte unstuffing, per-block DC-predictor + AC run/size
  * decoding through the zigzag order, dequantization, a double-precision
  * separable IDCT, level shift, and clamping.
  *
  * The FIXTURE encoder emits valid DC-only JPEGs: per-8×8-block constant
  * Y (even values) with flat chroma, flat quant 16, and minimal CUSTOM
  * Huffman tables declared in DHT (12 four-bit DC categories; a one-code
  * AC table holding only EOB). A constant block has one nonzero DCT
  * coefficient — DC = 8·(y−128) — and even `y` makes `round(8v/16)`
  * LOSSLESS through quantization, so the decoded image equals the
  * closed-form pixel rule EXACTLY and a SQL oracle can pin the whole
  * decode chain despite JPEG being a lossy format. (General AC paths are
  * exercised in OpsSpec by decoding ImageIO-encoded JPEGs, which carry
  * the full standard tables and real AC coefficients.)
  */
object Jpeg {

  // ---- shared tables ----

  private[graft] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ---- fixture encoder ----

  /** block-constant Y rule shared with the oracle */
  private[graft] def blockY(did: Int, bx: Int, by: Int): Int =
    2 * ((did + 5 * bx + 7 * by) % 100) + 16

  private[graft] def encodeJpeg(docId: Long): Array[Byte] = {
    val did = (docId % 256).toInt
    val w = (24 + (docId % 2) * 8).toInt
    val h = (16 + (docId % 3) * 8).toInt
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int): Unit = { out.write(0xFF); out.write(b) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    m(0xD8) // SOI
    // DQT: table 0 (luma) and 1 (chroma), 8-bit, all 16s
    for (id <- 0 to 1) {
      m(0xDB); be16(2 + 1 + 64); out.write(id)
      for (_ <- 0 until 64) out.write(16)
    }
    // SOF0: 8-bit, h×w, 3 components, 1×1 sampling each
    m(0xC0); be16(8 + 3 * 3); out.write(8); be16(h); be16(w); out.write(3)
    out.write(1); out.write(0x11); out.write(0) // Y:  table 0
    out.write(2); out.write(0x11); out.write(1) // Cb: table 1
    out.write(3); out.write(0x11); out.write(1) // Cr: table 1
    // DHT: minimal custom tables. DC (class 0, id 0): twelve 4-bit
    // category codes; AC (class 1, id 0): one 1-bit code = EOB.
    m(0xC4)
    be16(2 + (1 + 16 + 12) + (1 + 16 + 1))
    out.write(0x00)
    for (i <- 1 to 16) out.write(if (i == 4) 12 else 0)
    for (v <- 0 to 11) out.write(v)
    out.write(0x10)
    for (i <- 1 to 16) out.write(if (i == 1) 1 else 0)
    out.write(0x00)
    // SOS: 3 components, all using DC table 0 / AC table 0
    m(0xDA); be16(6 + 2 * 3); out.write(3)
    for (c <- 1 to 3) { out.write(c); out.write(0x00) }
    out.write(0); out.write(63); out.write(0)
    // entropy-coded data: interleaved MCUs of (Y, Cb, Cr) blocks
    var acc = 0L; var nb = 0
    val body = new java.io.ByteArrayOutputStream()
    def putBits(v: Int, n: Int): Unit = if (n > 0) {
      acc = (acc << n) | (v & ((1 << n) - 1)); nb += n
      while (nb >= 8) {
        val b = ((acc >> (nb - 8)) & 0xFF).toInt
        body.write(b)
        if (b == 0xFF) body.write(0x00) // byte stuffing
        nb -= 8
      }
    }
    def putDc(diff: Int): Unit = {
      var cat = 0
      var a = math.abs(diff)
      while (a > 0) { cat += 1; a >>= 1 }
      putBits(cat, 4) // our DC codes: category c encodes as c in 4 bits
      if (cat > 0)
        putBits(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
      // AC: single EOB bit (code "0")
      putBits(0, 1)
    }
    val predict = Array(0, 0, 0)
    for (by <- 0 until h / 8; bx <- 0 until w / 8) {
      val qdcY = math.round((8.0 * (blockY(did, bx, by) - 128)) / 16.0).toInt
      putDc(qdcY - predict(0)); predict(0) = qdcY
      putDc(0 - predict(1)); predict(1) = 0 // Cb flat 128 → DC 0
      putDc(0 - predict(2)); predict(2) = 0 // Cr flat 128
    }
    if (nb > 0) putBits(0x7F, 8 - (nb % 8)) // pad with 1s? pad with bits
    out.write(body.toByteArray)
    m(0xD9) // EOI
    out.toByteArray
  }

  // ---- general baseline decoder ----

  final case class JpegFeatures(width: Int, height: Int, nPx: Long,
                                sumLuma: Long, probeLuma: Long)

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var nb = 0
    def bit(): Int = {
      if (nb == 0) {
        require(pos < data.length, "entropy data exhausted")
        var b = data(pos) & 0xFF; pos += 1
        if (b == 0xFF) {
          require(pos < data.length, "truncated at stuffing")
          val nxt = data(pos) & 0xFF
          if (nxt == 0x00) pos += 1 // stuffed
          else b = 0xFF // marker reached mid-read: let require below fire later
        }
        acc = b; nb = 8
      }
      nb -= 1
      ((acc >> nb) & 1).toInt
    }
    def bits(n: Int): Int = { var v = 0; var i = 0; while (i < n) { v = (v << 1) | bit(); i += 1 }; v }
  }

  private final class Huff(counts: Array[Int], vals: Array[Int]) {
    // canonical code table: (length → first code, index) per T.81 C.2
    private val maxLen = 16
    private val firstCode = new Array[Int](maxLen + 1)
    private val firstIdx = new Array[Int](maxLen + 1)
    locally {
      var code = 0; var idx = 0
      for (l <- 1 to maxLen) {
        firstCode(l) = code; firstIdx(l) = idx
        code += counts(l - 1); idx += counts(l - 1)
        code <<= 1
      }
    }
    def decode(in: BitReader): Int = {
      var code = 0
      var l = 0
      while (l < maxLen) {
        code = (code << 1) | in.bit()
        l += 1
        val n = counts(l - 1)
        if (n > 0 && code - firstCode(l) < n)
          return vals(firstIdx(l) + (code - firstCode(l)))
      }
      throw new IllegalArgumentException("bad huffman code")
    }
  }

  private def extend(v: Int, cat: Int): Int =
    if (cat == 0) 0 else if (v < (1 << (cat - 1))) v - (1 << cat) + 1 else v

  private lazy val idctCos: Array[Double] =
    Array.tabulate(8 * 8) { i => math.cos((2 * (i / 8) + 1) * (i % 8) * math.Pi / 16) }

  private def idct(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
            val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
            s += cu * cv * coef(v * 8 + u) * idctCos(x * 8 + u) * idctCos(y * 8 + v)
            v += 1
          }
          u += 1
        }
        val p = math.round(s / 4.0).toInt + 128
        out(y * 8 + x) = math.max(0, math.min(255, p))
        x += 1
      }
      y += 1
    }
    out
  }

  /** decode a baseline JPEG; returns Y-channel statistics (luma IS the Y
    * plane — chroma is decoded through the same entropy/IDCT machinery
    * but does not enter the stats, keeping the oracle closed-form).
    * Stats accumulate through the per-pixel sink of [[decodeY]], so this
    * path never materializes the plane — the shape that matters when the
    * decoded image is large and only statistics are wanted. */
  private[graft] def decodeJpeg(bytes: Array[Byte]): JpegFeatures = {
    var sum = 0L; var probe = 0L
    var probeX = 0; var probeY = 0
    val (w, h) = decodeY(bytes,
      onDims = (dw, dh) => { probeX = math.min(1, dw - 1); probeY = math.min(2, dh - 1) },
      emit = (x, y, v) => {
        sum += v
        if (x == probeX && y == probeY) probe = v
      })
    JpegFeatures(w, h, w.toLong * h, sum, probe)
  }

  /** decode a baseline JPEG to its full Y (luma) plane, row-major.
    * The materializing twin of [[decodeJpeg]] — used where downstream
    * needs pixels (perceptual hashing, resize), not statistics. */
  private[graft] def decodeJpegLuma(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    var plane: Array[Int] = null
    var pw = 0
    val (w, h) = decodeY(bytes,
      onDims = (dw, dh) => { plane = new Array[Int](dw * dh); pw = dw },
      emit = (x, y, v) => plane(y * pw + x) = v)
    (w, h, plane)
  }

  /** shared baseline decode core: walks markers, entropy-decodes every
    * component, and pushes each in-bounds Y-plane pixel through `emit`.
    * `onDims` fires once, at SOF, before any pixel. */
  private def decodeY(bytes: Array[Byte], onDims: (Int, Int) => Unit,
                      emit: (Int, Int, Int) => Unit): (Int, Int) = {
    require(bytes.length > 4 && (bytes(0) & 0xFF) == 0xFF &&
      (bytes(1) & 0xFF) == 0xD8, "not a JPEG payload")
    var p = 2
    val quant = mutable.Map.empty[Int, Array[Int]]
    val huffDc = mutable.Map.empty[Int, Huff]
    val huffAc = mutable.Map.empty[Int, Huff]
    var w = 0; var h = 0
    // per component: (id, qtable, dcTable, acTable)
    var comps: Array[(Int, Int)] = Array.empty       // (id, qtab) from SOF
    var scan: Array[(Int, Int, Int)] = Array.empty    // (compIdx, dcTab, acTab)
    def u8(o: Int) = bytes(o) & 0xFF
    def be16(o: Int) = (u8(o) << 8) | u8(o + 1)
    var decoded = false
    while (!decoded) {
      require(p + 1 < bytes.length, "truncated before EOI")
      require(u8(p) == 0xFF, s"expected marker at $p")
      val marker = u8(p + 1)
      p += 2
      marker match {
        case 0xD9 => decoded = true // EOI (no scan seen ⇒ fails below)
        case mk if mk == 0x01 || (mk >= 0xD0 && mk <= 0xD7) =>
          () // standalone markers (TEM, RSTn)
        case 0xDB =>
          val len = be16(p); var q = p + 2
          while (q < p + len) {
            val pq = u8(q) >> 4; val id = u8(q) & 0xF
            require(pq == 0, "16-bit quant tables unsupported")
            quant(id) = Array.tabulate(64)(k => u8(q + 1 + k))
            q += 65
          }
          p += len
        case 0xC4 =>
          val len = be16(p); var q = p + 2
          while (q < p + len) {
            val cls = u8(q) >> 4; val id = u8(q) & 0xF
            val counts = Array.tabulate(16)(k => u8(q + 1 + k))
            val n = counts.sum
            val vals = Array.tabulate(n)(k => u8(q + 17 + k))
            val t = new Huff(counts, vals)
            if (cls == 0) huffDc(id) = t else huffAc(id) = t
            q += 17 + n
          }
          p += len
        case 0xC0 | 0xC1 =>
          val len = be16(p)
          require(u8(p + 2) == 8, "8-bit precision only")
          h = be16(p + 3); w = be16(p + 5)
          onDims(w, h)
          val nc = u8(p + 7)
          comps = Array.tabulate(nc) { k =>
            val off = p + 8 + 3 * k
            require(u8(off + 1) == 0x11,
              "subsampled components unsupported (4:4:4 / grayscale only)")
            (u8(off), u8(off + 2))
          }
          p += len
        case 0xC2 => throw new IllegalArgumentException("progressive JPEG unsupported")
        case 0xDA =>
          val len = be16(p)
          val ns = u8(p + 2)
          scan = Array.tabulate(ns) { k =>
            val off = p + 3 + 2 * k
            val cid = u8(off)
            val ci = comps.indexWhere(_._1 == cid)
            require(ci >= 0, s"scan component $cid not in frame")
            (ci, u8(off + 1) >> 4, u8(off + 1) & 0xF)
          }
          p += len
          // entropy-coded segment: decode interleaved MCUs
          require(w > 0 && h > 0 && scan.nonEmpty, "scan before frame")
          val in = new BitReader(bytes, p)
          val mcuW = (w + 7) / 8; val mcuH = (h + 7) / 8
          val predict = new Array[Int](comps.length)
          var my = 0
          while (my < mcuH) {
            var mx = 0
            while (mx < mcuW) {
              var s = 0
              while (s < scan.length) {
                val (ci, dct, act) = scan(s)
                val qt = quant.getOrElse(comps(ci)._2,
                  throw new IllegalArgumentException("missing quant table"))
                val coef = new Array[Int](64)
                val cat = huffDc(dct).decode(in)
                val diff = extend(in.bits(cat), cat)
                predict(ci) += diff
                coef(0) = predict(ci) * qt(0)
                var k = 1
                var eob = false
                while (k < 64 && !eob) {
                  val rs = huffAc(act).decode(in)
                  val run = rs >> 4; val size = rs & 0xF
                  if (size == 0) {
                    if (run == 15) k += 16 // ZRL
                    else eob = true
                  } else {
                    k += run
                    require(k < 64, "AC index overflow")
                    coef(Zigzag(k)) = extend(in.bits(size), size) * qt(k)
                    k += 1
                  }
                }
                if (s == 0) { // Y component drives the stats
                  val px = idct(coef)
                  var yy = 0
                  while (yy < 8) {
                    val iy = my * 8 + yy
                    var xx = 0
                    while (xx < 8) {
                      val ix = mx * 8 + xx
                      if (ix < w && iy < h) emit(ix, iy, px(yy * 8 + xx))
                      xx += 1
                    }
                    yy += 1
                  }
                } else idct(coef) // decoded for stream correctness
                s += 1
              }
              mx += 1
            }
            my += 1
          }
          p = in.pos
          // skip any pad bits to the next marker
          while (p + 1 < bytes.length &&
            !((u8(p) == 0xFF) && u8(p + 1) != 0x00)) p += 1
        case 0xD8 => () // spurious SOI
        case _ => // APPn, COM, others: length-skipped
          val len = be16(p)
          require(len >= 2, "bad segment length")
          p += len
      }
    }
    require(w > 0 && h > 0 && scan.nonEmpty, "no image decoded")
    (w, h)
  }
}
