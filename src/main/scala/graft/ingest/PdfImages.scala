package graft.ingest

import graft.ingest.PdfTextParser._

/** Embedded-image extraction from PDF page resources — the raster twin of
  * [[PdfTextParser]]: where that walks `/Resources → /Font`, this walks
  * `/Resources → /XObject` to `/Subtype /Image` streams and decodes them to
  * a luma plane, so a crawled-PDF corpus feeds the SAME downstream image
  * machinery (dHash, banded-hamming near-dup, image stats) as standalone
  * image files do. The reference reaches embedded rasters by rendering whole
  * pages through a native library (mupdf render + VLM captioning,
  * `src/pdf-visual/pdf-renderer.ts`); here the images themselves are the
  * unit — decoded byte-level, no rasterizer.
  *
  * Supported image shapes (refuse-don't-garble on everything else, per-image
  * — one undecodable image never drops its siblings):
  *  - raw samples after any standard filter chain (Flate/LZW incl.
  *    PNG predictors, AHx/A85/RL): 8-bit `/DeviceGray` or `/DeviceRGB`
  *  - `/DCTDecode` terminal codec: baseline JPEG via [[graft.ops.Jpeg]]
  *    (the filter crawled PDFs overwhelmingly embed photos with)
  *  - `/CCITTFaxDecode` terminal codec: Group 4 (K < 0) two-dimensional
  *    coding via [[CcittG4]] — the scanned-document filter
  *
  * Encryption, ObjStm containers, and inheritance come free: the walk
  * starts from [[PdfTextParser.loadObjects]], the same single entry every
  * other consumer uses.
  */
object PdfImages {

  /** one decoded image XObject: `luma` is the row-major w×h Y plane
    * (gray value for /DeviceGray, ITU-R 601 integer luma for /DeviceRGB,
    * JPEG Y channel for /DCTDecode, 0/255 for CCITT bilevel) */
  final case class PdfImageX(page: Int, name: String, width: Int, height: Int,
                             bpc: Int, colorSpace: String, codec: String,
                             luma: Array[Int])

  /** every decodable image of the document — XObject images in (page,
    * name) order, then the page's INLINE images (§8.9.7 BI…ID…EI, the
    * shape producers use for small masks/logos) in stream order. The name
    * sort makes multi-image pages deterministic for oracles. */
  def extract(bytes: Array[Byte]): Seq[PdfImageX] =
    try {
      val objs = loadObjects(bytes)
      val byNum = objs.map(o => o.num -> o).toMap
      orderedPages(objs, byNum).zipWithIndex.flatMap { case (pageObj, idx) =>
        val res = pageResources(pageObj, byNum)
        val xobj = imageRefs(res, byNum).flatMap { case (name, obj) =>
          decodeImage(obj, idx + 1, name, byNum)
        }
        val inline = contentBytes(pageObj, byNum)
          .map(inlineImages(_, idx + 1)).getOrElse(Seq.empty)
        xobj ++ inline
      }
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** inline images of one decoded content stream. Abbreviated keys per
    * §8.9.7 Table 91 (W/H/BPC/CS/F, long forms accepted); /G and /RGB
    * color spaces at 8 bpc; raw, /Fl (Flate, end found by the inflater's
    * consumed-byte count — never by searching the binary for "EI") or
    * /AHx (end at the hex EOD '>') data. A BI whose dict or data doesn't
    * parse is skipped whole — same refuse-don't-garble posture, and the
    * text interpreter's own EI-skip already guarantees image bytes can't
    * lex as operators. */
  private[graft] def inlineImages(content: Array[Byte],
                                   page: Int): Seq[PdfImageX] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[PdfImageX]
    var i = 0
    var n = 0
    while (i + 1 < content.length) {
      if (content(i) == 'B' && content(i + 1) == 'I' &&
          (i == 0 || isWs(content(i - 1))) &&
          (i + 2 >= content.length || isWs(content(i + 2)))) {
        decodeInline(content, i + 2, page, s"BI$n") match {
          case Some((img, end)) =>
            out += img; n += 1; i = end
          case None => i += 2
        }
      } else i += 1
    }
    out.toSeq
  }

  private def decodeInline(content: Array[Byte], from: Int, page: Int,
                           name: String): Option[(PdfImageX, Int)] =
    try {
      val lex = new Lexer(content, from, content.length)
      val kv = scala.collection.mutable.Map.empty[String, PVal]
      var key: String = null
      var t = lex.token()
      while (t != null && t != Op("ID")) {
        t match {
          case PName(k) if key == null => key = k
          case v if key != null        => kv(key) = v; key = null
          case _                       => return None
        }
        t = lex.token()
      }
      if (t == null || key != null) return None
      def num(short: String, long: String): Option[Int] =
        kv.get(short).orElse(kv.get(long)).collect { case PNum(v) => v.toInt }
      val w = num("W", "Width").getOrElse(return None)
      val h = num("H", "Height").getOrElse(return None)
      if (w <= 0 || h <= 0 || w.toLong * h > 16L * 1024 * 1024) return None
      if (num("BPC", "BitsPerComponent").getOrElse(8) != 8) return None
      // non-default /Decode or /ImageMask: refuse rather than mis-map
      if (Seq("D", "Decode", "IM", "ImageMask").exists(kv.contains)) return None
      val cs = kv.get("CS").orElse(kv.get("ColorSpace")).collect {
        case PName(v) => v
      }
      val comps = cs match {
        case Some("G" | "DeviceGray")  => 1
        case Some("RGB" | "DeviceRGB") => 3
        case _                         => return None // masks/indexed: skip
      }
      val filter = kv.get("F").orElse(kv.get("Filter")).collect {
        case PName(v) => v
      }
      val dStart = lex.pos + 1 // one ws byte separates ID from data
      val (samples, dEnd) = filter match {
        case None =>
          val nBytes = comps * w * h
          if (dStart + nBytes > content.length) return None
          (java.util.Arrays.copyOfRange(content, dStart, dStart + nBytes),
            dStart + nBytes)
        case Some("Fl" | "FlateDecode") =>
          val inf = new java.util.zip.Inflater()
          inf.setInput(content, dStart, content.length - dStart)
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          while (!inf.finished() && !inf.needsInput())
            buf.write(tmp, 0, inf.inflate(tmp))
          if (!inf.finished()) { inf.end(); return None }
          val consumed = inf.getBytesRead.toInt
          inf.end()
          (buf.toByteArray, dStart + consumed)
        case Some("AHx" | "ASCIIHexDecode") =>
          val eod = content.indexOf('>'.toByte, dStart)
          if (eod < 0) return None
          val dec = asciiHexDecode(
            java.util.Arrays.copyOfRange(content, dStart, eod + 1))
            .getOrElse(return None)
          (dec, eod + 1)
        case _ => return None // DCT/CCITT inline: out of subset
      }
      // whitespace then EI must close the object
      var e = dEnd
      while (e < content.length && isWs(content(e))) e += 1
      if (e + 1 >= content.length ||
          content(e) != 'E' || content(e + 1) != 'I') return None
      if (samples.length < comps * w * h) return None
      val luma = new Array[Int](w * h)
      var p = 0
      while (p < w * h) {
        if (comps == 1) luma(p) = samples(p) & 0xff
        else {
          val r = samples(3 * p) & 0xff
          val g = samples(3 * p + 1) & 0xff
          val b = samples(3 * p + 2) & 0xff
          luma(p) = (299 * r + 587 * g + 114 * b) / 1000
        }
        p += 1
      }
      val csName = if (comps == 1) "DeviceGray" else "DeviceRGB"
      Some((PdfImageX(page, name, w, h, 8, csName, "inline", luma), e + 2))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** (name, object) pairs under /Resources → /XObject with /Subtype /Image */
  private def imageRefs(res: Option[PDict],
                        byNum: Map[Int, PdfObj]): Seq[(String, PdfObj)] = {
    def deref(v: PVal): Option[PDict] = v match {
      case d: PDict => Some(d)
      case PRef(n)  => byNum.get(n).flatMap(_.dict)
      case _        => None
    }
    (for {
      r <- res.toSeq
      xo <- deref(r.m.getOrElse("XObject", PNullV)).toSeq
      (name, v) <- xo.m.toSeq.sortBy(_._1)
      obj <- v match {
        case PRef(n) => byNum.get(n)
        case _       => None // image XObjects are streams: always indirect
      }
      if obj.dict.exists(_.m.get("Subtype").contains(PName("Image")))
    } yield (name, obj)).toSeq
  }

  private def intOf(d: PDict, k: String): Option[Int] =
    d.m.get(k).collect { case PNum(n) => n.toInt }

  /** /ColorSpace as a plain name; indirect refs resolve through the caller's
    * map upstream — indexed/ICC spaces are out of subset (refused) */
  private def csName(d: PDict): Option[String] =
    d.m.get("ColorSpace").collect { case PName(n) => n }

  /** /Decode handling for `comps` components: Some(false) = identity
    * (absent or the default array), Some(true) = single-component
    * inversion ([1 0], the scanned-bilevel producers' shape), None =
    * refuse (any other mapping — emitting wrongly-mapped luma would
    * garble instead of refusing). /ImageMask images are refused outright:
    * they are stencil paint operations, not sample rasters. */
  private def decodeInversion(dict: PDict, comps: Int): Option[Boolean] = {
    val isMask = dict.m.get("ImageMask")
      .collect { case PNum(n) => n != 0 }.getOrElse(false)
    if (isMask) return None
    dict.m.get("Decode") match {
      case None => Some(false)
      case Some(PArr(items)) =>
        val nums = items.collect { case PNum(v) => v }
        if (nums.size != 2 * comps) None
        else if ((0 until comps).forall(i =>
          nums(2 * i) == 0.0 && nums(2 * i + 1) == 1.0)) Some(false)
        else if (comps == 1 && nums(0) == 1.0 && nums(1) == 0.0) Some(true)
        else None
      case _ => None
    }
  }

  private def decodeImage(obj: PdfObj, page: Int, name: String,
                          byNum: Map[Int, PdfObj]): Option[PdfImageX] =
    try {
      for {
        dict <- obj.dict
        data <- obj.stream
        w <- intOf(dict, "Width")
        h <- intOf(dict, "Height")
        if w > 0 && h > 0 && w.toLong * h <= 64L * 1024 * 1024
        (decoded, codec) <- decodeToImageCodec(data, Some(dict))
        img <- codec match {
          case None =>
            rawPlane(decoded, dict, w, h).map { case (cs, bpc, luma) =>
              PdfImageX(page, name, w, h, bpc, cs, "raw", luma)
            }
          case Some(("DCTDecode" | "DCT", _)) =>
            // only the identity /Decode is in subset for 3-component JPEG
            decodeInversion(dict, 3).filter(!_).map { _ =>
              val (jw, jh, luma) = graft.ops.Jpeg.decodeJpegLuma(decoded)
              // dict dims are advisory; the codec's own header is the truth
              PdfImageX(page, name, jw, jh, 8, "DeviceRGB", "dct", luma)
            }
          case Some(("CCITTFaxDecode" | "CCF", parms)) =>
            decodeInversion(dict, 1).flatMap { inv =>
              ccittPlane(decoded, dict, parms, w, h, inv).map { luma =>
                PdfImageX(page, name, w, h, 1, "DeviceGray", "ccitt", luma)
              }
            }
          case Some(("JBIG2Decode", parms)) =>
            // /JBIG2Globals: the out-of-band segment stream holding
            // shared symbol dictionaries (ISO 32000 §7.4.7 — the
            // multi-page scanned shape, one dictionary reused by every
            // page). Its segments are processed BEFORE the page's own,
            // which for the T.88 §7.2 embedded walk is exactly stream
            // concatenation; the globals stream's own /Filter chain is
            // honored, anything unresolvable refuses the image.
            val globals: Option[Array[Byte]] =
              parms.flatMap(_.m.get("JBIG2Globals")) match {
                case None => Some(Array.emptyByteArray)
                case Some(PRef(n)) =>
                  for {
                    gobj <- byNum.get(n)
                    gdata <- gobj.stream
                    (gdec, gcodec) <- decodeToImageCodec(gdata, gobj.dict)
                    if gcodec.isEmpty // an image codec on globals: malformed
                  } yield gdec
                case Some(_) => None // non-ref globals value: refuse
              }
            globals.flatMap { g =>
              decodeInversion(dict, 1).flatMap { inv =>
                Jbig2.decodeEmbedded(g ++ decoded, w, h).map { bits =>
                  // JBIG2 1-bits are black; /Decode [1 0] flips the mapping
                  PdfImageX(page, name, w, h, 1, "DeviceGray", "jbig2",
                    bits.map(b => if (b != inv) 0 else 255))
                }
              }
            }
          case Some(_) => None // JPX: out of subset, refuse this image
        }
      } yield img
    } catch { case scala.util.control.NonFatal(_) => None }

  /** raw post-filter samples → luma plane. 8-bit Gray and RGB only; a
    * too-short sample buffer refuses (a garbled predictor or truncated
    * stream must not emit a half-image). */
  private def rawPlane(samples: Array[Byte], dict: PDict,
                       w: Int, h: Int): Option[(String, Int, Array[Int])] = {
    val bpc = intOf(dict, "BitsPerComponent").getOrElse(8)
    if (bpc != 8) return None
    csName(dict) match {
      case Some("DeviceGray") if samples.length >= w * h =>
        val inv = decodeInversion(dict, 1).getOrElse(return None)
        val out = new Array[Int](w * h)
        var i = 0
        while (i < w * h) {
          val v = samples(i) & 0xff
          out(i) = if (inv) 255 - v else v
          i += 1
        }
        Some(("DeviceGray", 8, out))
      case Some("DeviceRGB") if samples.length >= 3 * w * h =>
        if (decodeInversion(dict, 3).getOrElse(return None)) return None
        val out = new Array[Int](w * h)
        var i = 0
        while (i < w * h) {
          val r = samples(3 * i) & 0xff
          val g = samples(3 * i + 1) & 0xff
          val b = samples(3 * i + 2) & 0xff
          out(i) = (299 * r + 587 * g + 114 * b) / 1000
          i += 1
        }
        Some(("DeviceRGB", 8, out))
      case _ => None
    }
  }

  /** CCITT G4 → 0/255 luma plane. Only K < 0 (pure two-dimensional) with
    * default /EncodedByteAlign false is in subset — the shape PDF
    * producers emit for scanned pages. /Rows, when present, must agree
    * with the dict /Height (a disagreeing stream refuses explicitly
    * rather than decoding against the wrong row count). Sample mapping is
    * faithful: a black-run pixel's sample is 1 under /BlackIs1 else 0,
    * and `inv` (/Decode [1 0]) flips the sample→gray map — so
    * BlackIs1+Decode[1 0] (the common producer pairing) renders black as
    * luma 0, and a bare BlackIs1 renders the inversion the stream
    * actually specifies instead of silently normalizing it. */
  private def ccittPlane(data: Array[Byte], dict: PDict, parms: Option[PDict],
                         w: Int, h: Int, inv: Boolean): Option[Array[Int]] = {
    val p = parms.map(_.m).getOrElse(Map.empty)
    def pInt(k: String, dflt: Int): Int =
      p.get(k).collect { case PNum(n) => n.toInt }.getOrElse(dflt)
    def pBool(k: String): Boolean = // the lexer reads true/false as 1/0
      p.get(k).collect { case PNum(n) => n != 0 }.getOrElse(false)
    val k = pInt("K", 0)
    val cols = pInt("Columns", 1728)
    if (k >= 0 || cols != w || pBool("EncodedByteAlign")) return None
    if (pInt("Rows", h) != h) return None
    val blackIs1 = pBool("BlackIs1")
    CcittG4.decode(data, w, h).map { bits =>
      // bits: true = member of a black run. sample = blackIs1 ? bit : !bit
      // (default: 0 bits are black); gray = inv ? 1-sample : sample.
      val blackLuma = if (inv != blackIs1) 255 else 0
      val out = new Array[Int](w * h)
      var i = 0
      while (i < w * h) {
        out(i) = if (bits(i)) blackLuma else 255 - blackLuma
        i += 1
      }
      out
    }
  }
}
