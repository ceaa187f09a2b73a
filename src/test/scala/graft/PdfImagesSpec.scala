package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{CcittG4, PdfImageFixtures, PdfImages}
import graft.ops.{Jpeg, Multimodal}

/** Embedded-image extraction (`ingest/PdfImages.scala`) and the CCITT G4
  * codec (`ingest/CcittG4.scala`). The G4 leg is validated three ways:
  * a structural table audit (prefix-free, complete run coverage), an
  * encode→decode round-trip over adversarial planes, and — independently —
  * the JDK's own TIFF G4 decoder reading this encoder's output. */
class PdfImagesSpec extends AnyFunSuite {

  // ---------------------------------------------------------- G4 tables --

  test("G4 run tables are prefix-free and cover every legal run") {
    for ((table, name) <- Seq((CcittG4.whiteTable, "white"),
                              (CcittG4.blackTable, "black"))) {
      val codes = table.map { case (c, l, _) =>
        String.format("%" + l + "s", Integer.toBinaryString(c))
          .replace(' ', '0')
      }
      assert(codes.distinct.length === codes.length, s"$name: duplicate code")
      for (a <- codes; b <- codes if a != b)
        assert(!b.startsWith(a), s"$name: $a is a prefix of $b")
      val runs = table.map(_._3).toSet
      for (r <- 0 to 63)
        assert(runs.contains(r), s"$name: missing terminating run $r")
      for (r <- 64 to 2560 by 64)
        assert(runs.contains(r), s"$name: missing make-up run $r")
      // mode codes must not collide with any run-code prefix ambiguity:
      // they are consumed in a separate state, so no audit needed there
    }
  }

  test("G4 round-trips adversarial planes exactly") {
    val rnd = new scala.util.Random(42)
    val shapes = Seq((1, 1), (8, 6), (13, 7), (64, 20), (130, 3))
    for ((w, h) <- shapes; density <- Seq(0.05, 0.5, 0.95)) {
      val plane = Array.fill(w * h)(rnd.nextDouble() < density)
      val enc = CcittG4.encode(plane, w, h)
      val dec = CcittG4.decode(enc, w, h)
      assert(dec.isDefined, s"decode failed at ${w}x$h d=$density")
      assert(dec.get.toSeq === plane.toSeq, s"mismatch at ${w}x$h d=$density")
    }
    // degenerate planes: all-white, all-black, stripes, lone pixel
    for ((w, h) <- Seq((16, 4), (5, 5))) {
      val cases = Seq(
        Array.fill(w * h)(false),
        Array.fill(w * h)(true),
        Array.tabulate(w * h)(i => i % 2 == 0),
        Array.tabulate(w * h)(i => i == w + 1))
      for (plane <- cases) {
        val dec = CcittG4.decode(CcittG4.encode(plane, w, h), w, h)
        assert(dec.exists(_.toSeq == plane.toSeq))
      }
    }
    // long runs force make-up codes (>64) through horizontal mode: a
    // 2000-wide line whose single black run starts mid-row
    val w = 2000
    val plane = Array.tabulate(w * 2)(i => (i % w) >= 300 && (i % w) < 1900)
    val dec = CcittG4.decode(CcittG4.encode(plane, w, 2), w, 2)
    assert(dec.exists(_.toSeq == plane.toSeq))
  }

  test("G4 encoder agrees with the JDK's independent TIFF G4 decoder") {
    // wrap raw G4 bytes in a minimal big-endian TIFF (Compression=4) and
    // let javax.imageio decode it — an implementation this codec shares
    // no code with. Validates the encoder directly and, through the
    // round-trip test above, the decoder transitively.
    def tiffG4(data: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(122 + data.length)
      out.put('M'.toByte).put('M'.toByte).putShort(42)
      out.putInt(8) // IFD offset
      out.putShort(9) // entry count
      def entry(tag: Int, typ: Int, value: Int): Unit = {
        out.putShort(tag.toShort).putShort(typ.toShort).putInt(1)
        if (typ == 3) { out.putShort(value.toShort); out.putShort(0) }
        else out.putInt(value)
      }
      entry(256, 4, w) // ImageWidth
      entry(257, 4, h) // ImageLength
      entry(258, 3, 1) // BitsPerSample
      entry(259, 3, 4) // Compression: CCITT T.6
      entry(262, 3, 0) // Photometric: WhiteIsZero
      entry(273, 4, 122) // StripOffsets
      entry(277, 3, 1) // SamplesPerPixel
      entry(278, 4, h) // RowsPerStrip
      entry(279, 4, data.length) // StripByteCounts
      out.putInt(0) // next IFD
      out.put(data)
      out.array()
    }
    val rnd = new scala.util.Random(7)
    for ((w, h) <- Seq((40, 12), (17, 9), (64, 64))) {
      val plane = Array.fill(w * h)(rnd.nextInt(3) == 0)
      val tiff = tiffG4(CcittG4.encode(plane, w, h), w, h)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(tiff))
      assume(img != null, "JDK TIFF reader unavailable — skipping cross-check")
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val black = (img.getRGB(x, y) & 0xFFFFFF) == 0
        assert(black === plane(y * w + x), s"pixel ($x,$y) of ${w}x$h")
      }
    }
  }

  // ------------------------------------------------------------- JBIG2 --

  test("JBIG2 MQ coder round-trips adversarial bit sequences") {
    import graft.ingest.Jbig2
    val rnd = new scala.util.Random(11)
    // mixed-context streams exercise state machines, stuffing, and carries
    for (trial <- 0 until 20) {
      val n = 50 + rnd.nextInt(4000)
      val ctxs = Array.fill(n)(rnd.nextInt(1 << 16))
      val bits = trial match {
        case 0 => Array.fill(n)(0)            // all-MPS fast path
        case 1 => Array.fill(n)(1)            // forced LPS→switch chains
        case 2 => Array.tabulate(n)(i => i & 1) // alternation (carry stress)
        case _ => Array.fill(n)(if (rnd.nextDouble() < 0.2) 1 else 0)
      }
      val enc = new Jbig2.MqEncoder
      val ecx = Jbig2.newCx(1 << 16)
      for (i <- 0 until n) enc.encode(ecx, ctxs(i), bits(i))
      val dec = new Jbig2.MqDecoder(enc.flush())
      val dcx = Jbig2.newCx(1 << 16)
      for (i <- 0 until n)
        assert(dec.decode(dcx, ctxs(i)) === bits(i), s"trial $trial bit $i")
    }
  }

  test("JBIG2 MQ flush lands inside the final interval for every stream tail") {
    import graft.ingest.Jbig2
    // Regression for the r10 refined-JBIG2 escape (fixture docs 54/186):
    // SETBITS that ZEROES the code tail (largest 0x10000 multiple ≤ C+A−1,
    // +0x8000 when below C) can flush a value OUTSIDE [C, C+A) when the
    // final interval straddles no 64Ki boundary and C's low offset exceeds
    // 0x8000 — corrupting the last decisions for alignment-dependent
    // content. Short skewed streams make the tail decisions a large
    // fraction of the stream, so a wide seeded sweep hits the alignment:
    // this test fails on the zero-tail flush and pins the §E.3.8 form.
    val rnd = new scala.util.Random(0xF1A5)
    for (trial <- 0 until 3000) {
      val n = 1 + rnd.nextInt(60)
      val nCtx = 1 + rnd.nextInt(8)
      val ctxs = Array.fill(n)(rnd.nextInt(nCtx))
      val p = 0.05 + rnd.nextDouble() * 0.9
      val bits = Array.fill(n)(if (rnd.nextDouble() < p) 1 else 0)
      val enc = new Jbig2.MqEncoder
      val ecx = Jbig2.newCx(nCtx)
      for (i <- 0 until n) enc.encode(ecx, ctxs(i), bits(i))
      val dec = new Jbig2.MqDecoder(enc.flush())
      val dcx = Jbig2.newCx(nCtx)
      for (i <- 0 until n)
        assert(dec.decode(dcx, ctxs(i)) === bits(i), s"trial $trial bit $i/$n")
    }
  }

  test("JBIG2 refinement pipeline round-trips the full fixture grid (regression: docs 54/186)") {
    import graft.ingest.Jbig2
    // The dedicated refinement unit tests passed while the full-stream
    // sweep failed on two documents — the escape was content-dependent
    // (MQ flush tail, see the test above). Close the coverage hole by
    // round-tripping encodeEmbeddedRefined→decodeEmbedded over the WHOLE
    // fixture parameter grid (every did residue × both rTemplates ×
    // every dims class), not a random sample.
    for (did <- 0 until 256; rTemplate <- Seq(0, 1)) {
      val gw = 3 + did % 3
      val h = 5 + did % 4
      val w = 3 * gw
      def bits(third: Int): Array[Boolean] =
        Array.tabulate(gw * h)(i =>
          PdfImageFixtures.refBlack(did, gw, third * gw + i % gw, i / gw))
      val g0 = Jbig2.Glyph(gw, h, bits(0))
      val g1 = Jbig2.Glyph(gw, h, bits(1))
      val stream = Jbig2.encodeEmbeddedRefined(IndexedSeq(g0), Seq((0, g1)),
        Seq((0, 0, 0, None), (1, gw, 0, None),
          (0, 2 * gw, 0, Some(bits(2)))), w, h, rTemplate = rTemplate)
      val out = Jbig2.decodeEmbedded(stream, w, h)
      assert(out.nonEmpty, s"did=$did rt=$rTemplate: refused")
      val expected = Array.tabulate(w * h)(i =>
        PdfImageFixtures.refBlack(did, gw, i % w, i / w))
      assert(out.get.toSeq === expected.toSeq, s"did=$did rt=$rTemplate")
    }
    // the two documents the r10 sweep lost, pinned end-to-end through the
    // PDF layer exactly as the judge reproduced them
    for (docId <- Seq(54L, 186L)) {
      val ims = PdfImages.extract(PdfImageFixtures.imagePdf(docId))
      assert(ims.length === 1, s"doc $docId must extract its refined image")
    }
  }

  test("JBIG2 integer arithmetic procedures (Annex A) round-trip, OOB included") {
    import graft.ingest.Jbig2
    val rnd = new scala.util.Random(23)
    val values = Seq(0, 1, -1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436,
      100000, -100000, Jbig2.OOB) ++
      Seq.fill(200)(rnd.nextInt(200001) - 100000)
    val enc = new Jbig2.MqEncoder
    val ecx = Jbig2.newCx(512)
    values.foreach(v => Jbig2.encodeInt(enc, ecx, v))
    val dec = new Jbig2.MqDecoder(enc.flush())
    val dcx = Jbig2.newCx(512)
    values.foreach(v => assert(Jbig2.decodeInt(dec, dcx) === v, s"value $v"))
    // IAID fixed-length tree
    for (codeLen <- Seq(1, 3, 6)) {
      val ids = Seq.fill(50)(rnd.nextInt(1 << codeLen))
      val e2 = new Jbig2.MqEncoder
      val c2 = Jbig2.newCx(1 << (codeLen + 1))
      ids.foreach(id => Jbig2.encodeIaid(e2, c2, codeLen, id))
      val d2 = new Jbig2.MqDecoder(e2.flush())
      val c3 = Jbig2.newCx(1 << (codeLen + 1))
      ids.foreach(id => assert(Jbig2.decodeIaid(d2, c3, codeLen) === id))
    }
  }

  test("JBIG2 symbol dictionary + text region round-trip composes the page") {
    import graft.ingest.Jbig2
    val rnd = new scala.util.Random(31)
    // mixed-height glyph set (two height classes), instances across strips
    // and with symbol re-use — the full §6.5/§6.4 arithmetic chain
    for (trial <- 0 until 4;
         bottomLeft <- Seq(false, true);
         logStrips <- Seq(0, 2)) {
      val g1 = Jbig2.Glyph(3, 4, Array.fill(12)(rnd.nextBoolean()))
      val g2 = Jbig2.Glyph(5, 4, Array.fill(20)(rnd.nextBoolean()))
      val g3 = Jbig2.Glyph(4, 6, Array.fill(24)(rnd.nextBoolean()))
      val glyphs = IndexedSeq(g1, g2, g3)
      // mixed heights on one row: with SBSTRIPS=4 and BOTTOMLEFT corners
      // these land in different strips with nonzero CURT offsets
      val places = Seq((0, 0, 0), (1, 4, 1), (2, 10, 0), (0, 2, 7), (2, 8, 7))
      val (w, h) = (16, 14)
      val stream = Jbig2.encodeEmbeddedSymbols(glyphs, places, w, h,
        bottomLeft = bottomLeft, logStrips = logStrips)
      val out = Jbig2.decodeEmbedded(stream, w, h)
      assert(out.nonEmpty,
        s"trial $trial bl=$bottomLeft ls=$logStrips: symbol-coded page refused")
      val expected = new Array[Boolean](w * h)
      places.foreach { case (si, x, y) =>
        val g = glyphs(si)
        for (yy <- 0 until g.h; xx <- 0 until g.w)
          if (g.bits(yy * g.w + xx)) expected((y + yy) * w + (x + xx)) = true
      }
      assert(out.get.toSeq === expected.toSeq,
        s"trial $trial bl=$bottomLeft ls=$logStrips")
    }
  }

  test("JBIG2 Annex-B standard Huffman tables pin the printed codes") {
    import graft.ingest.Jbig2
    // canonical §B.3 assignment must reproduce the code column printed in
    // the standard (OOB pseudo-line last in the codes array)
    assert(Jbig2.TableB1.codes.toSeq === Seq(0, 2, 6, 7))
    assert(Jbig2.TableB2.codes.toSeq === Seq(0, 2, 6, 14, 30, 62, 63))
    assert(Jbig2.TableB3.codes.toSeq === Seq(254, 0, 2, 6, 14, 30, 255, 126, 62))
    assert(Jbig2.TableB4.codes.toSeq === Seq(0, 2, 6, 14, 30, 31))
    assert(Jbig2.TableB5.codes.toSeq === Seq(126, 0, 2, 6, 14, 30, 127, 62))
    // prefix-freedom: no assigned code is a prefix of a longer one
    for ((t, name) <- Seq((Jbig2.TableB1, "B1"), (Jbig2.TableB2, "B2"),
                          (Jbig2.TableB3, "B3"), (Jbig2.TableB4, "B4"),
                          (Jbig2.TableB5, "B5"))) {
      val lens = t.lines.map(_.prefLen) ++
        (if (t.codes.length > t.lines.length) Seq(6) else Nil)
      val strs = t.codes.toSeq.zip(lens).map { case (c, l) =>
        String.format("%" + l + "s", Integer.toBinaryString(c)).replace(' ', '0')
      }
      assert(strs.distinct.length === strs.length, s"$name: duplicate code")
      for (a <- strs; b <- strs if a != b)
        assert(!b.startsWith(a), s"$name: $a prefixes $b")
    }
    // value round-trips through the bit reader/writer, boundaries + OOB
    val cases = Seq(
      (Jbig2.TableB1, Seq(0L, 15L, 16L, 271L, 272L, 65807L, 65808L, 1000000L)),
      (Jbig2.TableB2, Seq(0L, 1L, 2L, 3L, 10L, 11L, 74L, 75L, 5000L, Jbig2.HuffOob)),
      (Jbig2.TableB3, Seq(-300L, -257L, -256L, -1L, 0L, 2L, 10L, 74L, 75L,
        9999L, Jbig2.HuffOob)),
      (Jbig2.TableB4, Seq(1L, 2L, 3L, 4L, 11L, 12L, 75L, 76L, 4096L)),
      (Jbig2.TableB5, Seq(-4000L, -256L, -255L, 0L, 1L, 3L, 12L, 75L, 76L, 8888L)))
    for ((t, vs) <- cases) {
      val wtr = new Jbig2.BitWriter
      vs.foreach(v => t.encode(wtr, v))
      val r = new Jbig2.BitReader(wtr.result())
      vs.foreach(v => assert(t.decode(r) === v, s"value $v"))
    }
  }

  test("JBIG2 Huffman symbol dictionary round-trips the full fixture grid") {
    import graft.ingest.Jbig2
    // same sweep discipline that caught the r10 refinement escape: the
    // WHOLE did grid × both collective-bitmap codings (uncompressed, MMR),
    // through the embedded stream, not just a unit sample
    for (did <- 0 until 256; huffDict <- Seq(0, 1)) {
      val gw = 2 + did % 3
      val h = 5 + did % 4
      val w = 4 * gw
      val glyphs = IndexedSeq(0, 1).map { k =>
        Jbig2.Glyph(gw, h, Array.tabulate(gw * h)(i =>
          PdfImageFixtures.symBlack(did, gw, i % gw + k * gw, i / gw)))
      }
      val places = Seq((0, 0, 0), (1, gw, 0), (0, 2 * gw, 0), (1, 3 * gw, 0))
      val stream = Jbig2.encodeEmbeddedSymbols(glyphs, places, w, h,
        huffDict = huffDict)
      val out = Jbig2.decodeEmbedded(stream, w, h)
      assert(out.nonEmpty, s"did=$did huffDict=$huffDict: refused")
      val expected = Array.tabulate(w * h)(i =>
        PdfImageFixtures.symBlack(did, gw, i % w, i / w))
      assert(out.get.toSeq === expected.toSeq, s"did=$did huffDict=$huffDict")
    }
    // multi-height-class, multi-width-class dictionaries (widths
    // nondecreasing within a class, the Table-B.2 range), random planes
    val rnd = new scala.util.Random(59)
    for (trial <- 0 until 6; huffDict <- Seq(0, 1)) {
      val g1 = Jbig2.Glyph(3, 4, Array.fill(12)(rnd.nextBoolean()))
      val g2 = Jbig2.Glyph(5, 4, Array.fill(20)(rnd.nextBoolean()))
      val g3 = Jbig2.Glyph(9, 4, Array.fill(36)(rnd.nextBoolean()))
      val g4 = Jbig2.Glyph(4, 7, Array.fill(28)(rnd.nextBoolean()))
      val glyphs = IndexedSeq(g1, g2, g3, g4)
      val places = Seq((0, 0, 0), (1, 4, 1), (2, 10, 0), (3, 20, 0),
        (0, 2, 8), (3, 8, 8))
      val (w, h) = (26, 16)
      val stream = Jbig2.encodeEmbeddedSymbols(glyphs, places, w, h,
        huffDict = huffDict)
      val out = Jbig2.decodeEmbedded(stream, w, h)
      assert(out.nonEmpty, s"trial $trial huffDict=$huffDict: refused")
      val expected = new Array[Boolean](w * h)
      places.foreach { case (si, x, y) =>
        val g = glyphs(si)
        for (yy <- 0 until g.h; xx <- 0 until g.w)
          if (g.bits(yy * g.w + xx)) expected((y + yy) * w + (x + xx)) = true
      }
      assert(out.get.toSeq === expected.toSeq, s"trial $trial huffDict=$huffDict")
    }
  }

  test("JBIG2 custom code tables: serialize/parse round trip + refusals") {
    import graft.ingest.Jbig2
    // decode-behavior equality over the whole value neighborhood: the
    // parsed table must reproduce the built table's codes exactly
    for ((lo, hi, oob) <- Seq((1L, 1L, false), (0L, 7L, false), (-5L, 12L, true),
                              (1L, 300L, false), (-256L, -250L, true), (3L, 4L, true))) {
      val built = Jbig2.buildCustomTable(lo, hi, oob)
      val parsed = Jbig2.parseCodeTable(Jbig2.encodeCodeTable(built))
        .getOrElse(fail(s"parse refused [$lo,$hi] oob=$oob"))
      val vals = ((lo - 40) to (hi + 40)).map(identity) ++
        (if (oob) Seq(Jbig2.HuffOob) else Nil)
      val w = new Jbig2.BitWriter
      vals.foreach(v => built.encode(w, v))
      val r = new Jbig2.BitReader(w.result())
      vals.foreach(v => assert(parsed.decode(r) === v, s"[$lo,$hi] oob=$oob v=$v"))
    }
    // refusals: reserved flag bit, inverted bounds, truncated body
    val ok = Jbig2.encodeCodeTable(Jbig2.buildCustomTable(0, 7, oob = true))
    assert(Jbig2.parseCodeTable(ok).nonEmpty)
    val reserved = ok.clone(); reserved(0) = (reserved(0) | 0x80).toByte
    assert(Jbig2.parseCodeTable(reserved) === None)
    val inverted = ok.clone()
    inverted(1) = 0x7F.toByte // HTLOW becomes huge positive > HTHIGH
    assert(Jbig2.parseCodeTable(inverted) === None)
    assert(Jbig2.parseCodeTable(ok.take(8)) === None)
    // Kraft violation refuses at parse time: three preflen-1 lines
    val bad = new java.io.ByteArrayOutputStream()
    bad.write((4 - 1) << 1 | (6 - 1) << 4) // no OOB
    for (v <- Seq(0, 0, 0, 0, 0, 0, 0, 2)) bad.write(v) // HTLOW=0, HTHIGH=2
    val bw = new Jbig2.BitWriter
    for (_ <- 0 until 2) { bw.bits(1, 4); bw.bits(0, 6) } // 2 range lines, len 1
    bw.bits(1, 4); bw.bits(1, 4) // lower/upper also len 1 -> Kraft > 1
    bad.write(bw.result())
    assert(Jbig2.parseCodeTable(bad.toByteArray) === None)
    // hostile PREFLEN (ADVICE r12): HTPS=8 lets the wire carry 8-bit prefix
    // lengths; 200 would drive the canonical-code Int shifts into wrap
    // territory where a Kraft-violating table could alias small codes and
    // decode garbage. The parser must refuse any PREFLEN > 31 up front.
    val hostile = new java.io.ByteArrayOutputStream()
    hostile.write((8 - 1) << 1 | (6 - 1) << 4) // HTPS=8, HTRS=6, no OOB
    for (v <- Seq(0, 0, 0, 0, 0, 0, 0, 2)) hostile.write(v) // HTLOW=0, HTHIGH=2
    val hw = new Jbig2.BitWriter
    for (_ <- 0 until 2) { hw.bits(200, 8); hw.bits(0, 6) } // PREFLEN=200 lines
    hw.bits(200, 8); hw.bits(200, 8) // lower/upper PREFLEN=200
    hostile.write(hw.result())
    assert(Jbig2.parseCodeTable(hostile.toByteArray) === None)
    // and the Long-safe wellFormed itself: a direct 62-bit-length table is
    // refused rather than wrapped into acceptance
    val deep = new Jbig2.HuffTable(IndexedSeq(
      Jbig2.HuffLine(62, 0, 0), Jbig2.HuffLine(62, 0, 1)), 0)
    assert(!deep.wellFormed)
  }

  test("JBIG2 custom-table symbol dictionary round-trips the full fixture grid") {
    import graft.ingest.Jbig2
    // the same sweep discipline as the standard-table grid: every did ×
    // both collective-bitmap codings, through the embedded stream with the
    // code tables travelling as real §7.4.13 segments
    for (did <- 0 until 256; huffDict <- Seq(0, 1)) {
      val gw = 2 + did % 3
      val h = 5 + did % 4
      val w = 4 * gw
      val glyphs = IndexedSeq(0, 1).map { k =>
        Jbig2.Glyph(gw, h, Array.tabulate(gw * h)(i =>
          PdfImageFixtures.symBlack(did, gw, i % gw + k * gw, i / gw)))
      }
      val places = Seq((0, 0, 0), (1, gw, 0), (0, 2 * gw, 0), (1, 3 * gw, 0))
      val stream = Jbig2.encodeEmbeddedSymbols(glyphs, places, w, h,
        huffDict = huffDict, customTables = true)
      val out = Jbig2.decodeEmbedded(stream, w, h)
      assert(out.nonEmpty, s"did=$did huffDict=$huffDict: refused")
      val expected = Array.tabulate(w * h)(i =>
        PdfImageFixtures.symBlack(did, gw, i % w, i / w))
      assert(out.get.toSeq === expected.toSeq, s"did=$did huffDict=$huffDict")
    }
    // multi-class dictionaries with negative width deltas (the shape the
    // signed standard tables needed) — custom tables carry them natively
    val rnd = new scala.util.Random(97)
    for (trial <- 0 until 6; huffDict <- Seq(0, 1)) {
      val g1 = Jbig2.Glyph(7, 4, Array.fill(28)(rnd.nextBoolean()))
      val g2 = Jbig2.Glyph(3, 4, Array.fill(12)(rnd.nextBoolean())) // DW < 0
      val g3 = Jbig2.Glyph(5, 9, Array.fill(45)(rnd.nextBoolean()))
      val glyphs = IndexedSeq(g1, g2, g3)
      val places = Seq((0, 0, 0), (1, 8, 1), (2, 12, 0), (1, 18, 6))
      val (w, h) = (22, 16)
      val stream = Jbig2.encodeEmbeddedSymbols(glyphs, places, w, h,
        huffDict = huffDict, customTables = true)
      val out = Jbig2.decodeEmbedded(stream, w, h)
      assert(out.nonEmpty, s"trial $trial huffDict=$huffDict: refused")
      val expected = new Array[Boolean](w * h)
      places.foreach { case (si, x, y) =>
        val g = glyphs(si)
        for (yy <- 0 until g.h; xx <- 0 until g.w)
          if (g.bits(yy * g.w + xx)) expected((y + yy) * w + (x + xx)) = true
      }
      assert(out.get.toSeq === expected.toSeq, s"trial $trial huffDict=$huffDict")
    }
    // refusal: selection 3 with the table refs stripped must refuse, not
    // garble (rewrite the dict segment's referred list to empty)
    val glyphs = IndexedSeq(Jbig2.Glyph(2, 5, Array.fill(10)(true)),
      Jbig2.Glyph(2, 5, Array.fill(10)(false)))
    val stream = Jbig2.encodeEmbeddedSymbols(glyphs,
      Seq((0, 0, 0), (1, 2, 0), (0, 4, 0), (1, 6, 0)), 8, 5,
      huffDict = 0, customTables = true)
    assert(Jbig2.decodeEmbedded(stream, 8, 5).nonEmpty)
    // drop the three table segments entirely: dict's refs now dangle
    // (parse skips unknown referred numbers), selection 3 finds no table
    def u32(a: Array[Byte], o: Int): Long =
      (((a(o) & 0xFFL) << 24) | ((a(o + 1) & 0xFF) << 16) |
        ((a(o + 2) & 0xFF) << 8) | (a(o + 3) & 0xFF)) & 0xFFFFFFFFL
    // walk segments, rebuild the stream without type-53 segments
    val outBytes = new java.io.ByteArrayOutputStream()
    var p = 0
    while (p + 11 <= stream.length) {
      val segType = stream(p + 4) & 0x3F
      val rts = stream(p + 5) & 0xFF
      val count = rts >> 5
      val hdrLen = 6 + count + 1 // short form, 1-byte refs, 1-byte page assoc
      val dataLen = u32(stream, p + hdrLen).toInt
      val segEnd = p + hdrLen + 4 + dataLen
      if (segType != 53)
        outBytes.write(stream, p, segEnd - p)
      p = segEnd
    }
    assert(Jbig2.decodeEmbedded(outBytes.toByteArray, 8, 5) === None,
      "selection 3 without its referred tables must refuse")
  }

  test("JBIG2 SBHUFF text region (all-custom tables) round-trips the grid") {
    import graft.ingest.Jbig2
    // full Huffman pipeline: SDHUFF dictionary (custom tables) + SBHUFF
    // text region (custom FS/DS/DT + runcode-coded symbol IDs) — the only
    // SBHUFF shape expressible without the B.6-B.13 constants. Whole did
    // grid × both collective codings, embedded stream end to end.
    for (did <- 0 until 256; huffDict <- Seq(0, 1)) {
      val gw = 2 + did % 3
      val h = 5 + did % 4
      val w = 4 * gw
      val glyphs = IndexedSeq(0, 1).map { k =>
        Jbig2.Glyph(gw, h, Array.tabulate(gw * h)(i =>
          PdfImageFixtures.symBlack(did, gw, i % gw + k * gw, i / gw)))
      }
      val places = Seq((0, 0, 0), (1, gw, 0), (0, 2 * gw, 0), (1, 3 * gw, 0))
      val stream = Jbig2.encodeEmbeddedSymbols(glyphs, places, w, h,
        huffDict = huffDict, customTables = true, huffText = true)
      val out = Jbig2.decodeEmbedded(stream, w, h)
      assert(out.nonEmpty, s"did=$did huffDict=$huffDict: refused")
      val expected = Array.tabulate(w * h)(i =>
        PdfImageFixtures.symBlack(did, gw, i % w, i / w))
      assert(out.get.toSeq === expected.toSeq, s"did=$did huffDict=$huffDict")
    }
    // multi-strip + BOTTOMLEFT + scattered placements + >2 symbols (the
    // symbol-ID table is codeLen 2 here, exercising unused-code slack),
    // arithmetic dictionary feeding a Huffman text region (legal mix)
    val rnd = new scala.util.Random(131)
    for (trial <- 0 until 6; variant <- 0 until 3) {
      val g1 = Jbig2.Glyph(3, 4, Array.fill(12)(rnd.nextBoolean()))
      val g2 = Jbig2.Glyph(5, 4, Array.fill(20)(rnd.nextBoolean()))
      val g3 = Jbig2.Glyph(4, 6, Array.fill(24)(rnd.nextBoolean()))
      val glyphs = IndexedSeq(g1, g2, g3)
      val places = Seq((0, 1, 0), (1, 6, 2), (2, 13, 1), (0, 19, 8), (2, 3, 9))
      val (w, h) = (24, 16)
      val stream = Jbig2.encodeEmbeddedSymbols(glyphs, places, w, h,
        bottomLeft = variant == 1,
        logStrips = if (variant == 2) 2 else 0,
        huffDict = trial % 2, customTables = true, huffText = true)
      val out = Jbig2.decodeEmbedded(stream, w, h)
      assert(out.nonEmpty, s"trial $trial variant $variant: refused")
      val expected = new Array[Boolean](w * h)
      places.foreach { case (si, x, y) =>
        val g = glyphs(si)
        for (yy <- 0 until g.h; xx <- 0 until g.w)
          if (g.bits(yy * g.w + xx)) expected((y + yy) * w + (x + xx)) = true
      }
      assert(out.get.toSeq === expected.toSeq, s"trial $trial variant $variant")
    }
    // refusal pins: standard text-table selections (B.6-B.13 constants
    // are NOT in-repo) and SBHUFF+REFINE refuse rather than garble
    val glyphs1 = IndexedSeq(Jbig2.Glyph(2, 5, Array.fill(10)(true)),
      Jbig2.Glyph(2, 5, Array.fill(10)(false)))
    val base = Jbig2.encodeEmbeddedSymbols(glyphs1,
      Seq((0, 0, 0), (1, 2, 0), (0, 4, 0), (1, 6, 0)), 8, 5,
      huffDict = 0, customTables = true, huffText = true)
    assert(Jbig2.decodeEmbedded(base, 8, 5).nonEmpty)
    // find the text segment's Huffman flags and flip FS selection 3 -> 0:
    // the hFlags bytes are 2 bytes after the region-info block of the
    // LAST segment (type 6); locate by walking headers
    def u32(a: Array[Byte], o: Int): Long =
      (((a(o) & 0xFFL) << 24) | ((a(o + 1) & 0xFF) << 16) |
        ((a(o + 2) & 0xFF) << 8) | (a(o + 3) & 0xFF)) & 0xFFFFFFFFL
    var p = 0
    var hOff = -1
    while (p + 11 <= base.length) {
      val segType = base(p + 4) & 0x3F
      val count = (base(p + 5) & 0xFF) >> 5
      val hdrLen = 6 + count + 1
      val dataLen = u32(base, p + hdrLen).toInt
      if (segType == 6) hOff = p + hdrLen + 4 + 17 + 2 // region info + flags
      p = p + hdrLen + 4 + dataLen
    }
    assert(hOff > 0)
    val mangled = base.clone()
    mangled(hOff + 1) = (mangled(hOff + 1) & ~3).toByte // FS sel 3 -> 0
    assert(Jbig2.decodeEmbedded(mangled, 8, 5) === None,
      "standard text-table selection must refuse (B.6/B.7 not in repo)")
  }

  test("JBIG2 TRANSPOSED text regions round-trip, both coders") {
    import graft.ingest.Jbig2
    // TRANSPOSED=1 swaps the S/T axes (vertical-text / column layout);
    // the composed raster equals the non-transposed coding of the same
    // placements, so equality against the plain encoding pins it. Grid
    // over the did rotation, arithmetic AND SBHUFF-all-custom text.
    for (did <- 0 until 64; coder <- Seq("arith", "huff")) {
      val gw = 2 + did % 3
      val h = 5 + did % 4
      val w = 4 * gw
      val glyphs = IndexedSeq(0, 1).map { k =>
        Jbig2.Glyph(gw, h, Array.tabulate(gw * h)(i =>
          PdfImageFixtures.symBlack(did, gw, i % gw + k * gw, i / gw)))
      }
      val places = Seq((0, 0, 0), (1, gw, 0), (0, 2 * gw, 0), (1, 3 * gw, 0))
      val huffText = coder == "huff"
      val stream = Jbig2.encodeEmbeddedSymbols(glyphs, places, w, h,
        huffDict = if (huffText) did % 2 else -1,
        customTables = huffText, huffText = huffText, transposed = true)
      val out = Jbig2.decodeEmbedded(stream, w, h)
      assert(out.nonEmpty, s"did=$did $coder: refused")
      val plain = Jbig2.decodeEmbedded(
        Jbig2.encodeEmbeddedSymbols(glyphs, places, w, h), w, h).get
      assert(out.get.toSeq === plain.toSeq, s"did=$did $coder")
    }
    // column-layout shape (the reason TRANSPOSED exists): instances
    // stacked VERTICALLY share one strip in transposed coding; scattered
    // columns + mixed symbol heights + multi-strip
    val rnd = new scala.util.Random(173)
    for (trial <- 0 until 6; huffText <- Seq(false, true)) {
      val g1 = Jbig2.Glyph(3, 4, Array.fill(12)(rnd.nextBoolean()))
      val g2 = Jbig2.Glyph(3, 6, Array.fill(18)(rnd.nextBoolean()))
      val g3 = Jbig2.Glyph(5, 3, Array.fill(15)(rnd.nextBoolean()))
      val glyphs = IndexedSeq(g3, g1, g2).sortBy(_.h) // dict wants by height
      val places = Seq((0, 2, 0), (1, 2, 5), (2, 2, 10), // column at x=2
        (0, 10, 1), (2, 10, 6), (1, 16, 0)) // second column + a stray
      val (w, h) = (22, 18)
      val stream = Jbig2.encodeEmbeddedSymbols(glyphs, places, w, h,
        logStrips = if (trial % 2 == 1) 2 else 0,
        huffDict = if (huffText) trial % 2 else -1,
        customTables = huffText, huffText = huffText, transposed = true)
      val out = Jbig2.decodeEmbedded(stream, w, h)
      assert(out.nonEmpty, s"trial $trial huffText=$huffText: refused")
      val expected = new Array[Boolean](w * h)
      places.foreach { case (si, x, y) =>
        val g = glyphs(si)
        for (yy <- 0 until g.h; xx <- 0 until g.w)
          if (g.bits(yy * g.w + xx)) expected((y + yy) * w + (x + xx)) = true
      }
      assert(out.get.toSeq === expected.toSeq, s"trial $trial huffText=$huffText")
    }
  }

  test("JBIG2 SDHUFF length gate admits the 10-byte minimal dictionary") {
    import graft.ingest.Jbig2
    // an SDHUFF=1 header carries no AT pixels: flags(2) + numEx(4) +
    // numNew(4) = 10 bytes is a legal (empty) dictionary. The old gate
    // required the arithmetic path's 18 bytes up front, refusing it.
    val tiny = Array[Byte](0x00, 0x01, // flags: SDHUFF=1, selections 0
      0, 0, 0, 0, // numEx = 0
      0, 0, 0, 0) // numNew = 0
    assert(Jbig2.decodeSymbolDict(tiny, Nil) === Some(Seq.empty),
      "legal minimal Huffman dictionary must decode to zero exports")
    // truncated below the SDHUFF minimum still refuses (never throws)
    for (len <- 0 until 10)
      assert(Jbig2.decodeSymbolDict(tiny.take(len), Nil) === None, s"len=$len")
    // the arithmetic path keeps its 18-byte minimum
    assert(Jbig2.decodeSymbolDict(Array.fill[Byte](17)(0), Nil) === None)
  }

  test("JBIG2 Huffman dictionary decodes the signed-table selections (B.5/B.3)") {
    import graft.ingest.Jbig2
    // SDHUFFDH/SDHUFFDW selection 1 picks the SIGNED tables — the only
    // route that admits width-DECREASING height classes (DW < 0, outside
    // Table B.2's range). Round-trip both selections over random planes,
    // with class shapes that force negative deltas.
    val rnd = new scala.util.Random(83)
    for (trial <- 0 until 6; huffDict <- Seq(0, 1)) {
      val g1 = Jbig2.Glyph(7, 4, Array.fill(28)(rnd.nextBoolean()))
      val g2 = Jbig2.Glyph(3, 4, Array.fill(12)(rnd.nextBoolean())) // DW = -4
      val g3 = Jbig2.Glyph(5, 4, Array.fill(20)(rnd.nextBoolean())) // DW = +2
      val g4 = Jbig2.Glyph(4, 6, Array.fill(24)(rnd.nextBoolean()))
      val glyphs = IndexedSeq(g1, g2, g3, g4)
      val places = Seq((0, 0, 0), (1, 8, 0), (2, 12, 0), (3, 18, 0), (1, 22, 7))
      val (w, h) = (26, 14)
      val stream = Jbig2.encodeEmbeddedSymbols(glyphs, places, w, h,
        huffDict = huffDict, huffSel = (1, 1))
      val out = Jbig2.decodeEmbedded(stream, w, h)
      assert(out.nonEmpty, s"trial $trial huffDict=$huffDict: refused")
      val expected = new Array[Boolean](w * h)
      places.foreach { case (si, x, y) =>
        val g = glyphs(si)
        for (yy <- 0 until g.h; xx <- 0 until g.w)
          if (g.bits(yy * g.w + xx)) expected((y + yy) * w + (x + xx)) = true
      }
      assert(out.get.toSeq === expected.toSeq, s"trial $trial huffDict=$huffDict")
    }
    // selection-0 encode of a width-decreasing class must refuse at the
    // encoder (B.2 cannot express DW < 0) rather than emit a wrong stream
    val bad = IndexedSeq(Jbig2.Glyph(5, 3, Array.fill(15)(true)),
      Jbig2.Glyph(2, 3, Array.fill(6)(true)))
    intercept[IllegalArgumentException] {
      Jbig2.encodeEmbeddedSymbols(bad, Seq((0, 0, 0), (1, 6, 0)), 10, 3,
        huffDict = 0)
    }
  }

  test("/JBIG2Globals shared dictionaries resolve through the PDF layer") {
    import graft.ingest.Jbig2
    // the multi-page scanner shape: the symbol dictionary travels in a
    // SEPARATE (Flate-coded) globals stream the image's /DecodeParms
    // points at. Full did sweep through the PDF layer, both dictionary
    // codings — same discipline as the other JBIG2 grids.
    for (did <- 0 until 256; huffDict <- Seq(-1, 0)) {
      val docId = did.toLong
      val gw = (2 + docId % 3).toInt
      val h = (5 + docId % 4).toInt
      val w = 4 * gw
      val glyphs = IndexedSeq(0, 1).map { k =>
        Jbig2.Glyph(gw, h, Array.tabulate(gw * h)(i =>
          PdfImageFixtures.symBlack(did, gw, i % gw + k * gw, i / gw)))
      }
      val places = Seq((0, 0, 0), (1, gw, 0), (0, 2 * gw, 0), (1, 3 * gw, 0))
      val (globals, page) = Jbig2.encodeEmbeddedSymbolsGlobals(glyphs, places,
        w, h, huffDict = huffDict)
      // the split streams decode when concatenated (globals first)...
      val direct = Jbig2.decodeEmbedded(globals ++ page, w, h)
      assert(direct.nonEmpty, s"did=$did huffDict=$huffDict: refused")
      val expected = Array.tabulate(w * h)(i =>
        PdfImageFixtures.symBlack(did, gw, i % w, i / w))
      assert(direct.get.toSeq === expected.toSeq, s"did=$did huffDict=$huffDict")
      // ...and the page stream ALONE refuses (its text region refers to a
      // dictionary it never saw) — the refusal that keeps a missing
      // globals stream from garbling
      assert(Jbig2.decodeEmbedded(page, w, h).isEmpty,
        s"did=$did huffDict=$huffDict: page without globals must refuse")
    }
  }

  test("JBIG2 refinement coder round-trips against shifted references, both templates") {
    import graft.ingest.Jbig2
    val rnd = new scala.util.Random(47)
    for (trial <- 0 until 4; template <- Seq(0, 1);
         (dx, dy) <- Seq((0, 0), (1, -1), (-2, 3))) {
      val (rw, rh) = (7, 5)
      val ref = Array.fill(rw * rh)(rnd.nextBoolean())
      // target near the reference (the regime refinement coding exists
      // for) plus a fringe the reference doesn't cover
      val (w, h) = (9, 6)
      val tgt = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        val rx = x - dx; val ry = y - dy
        val base = rx >= 0 && rx < rw && ry >= 0 && ry < rh && ref(ry * rw + rx)
        if (rnd.nextInt(8) == 0) !base else base
      }
      val enc = new Jbig2.MqEncoder
      val ecx = Jbig2.newCx(1 << 13)
      Jbig2.encodeRefinementWith(enc, ecx, tgt, w, h, ref, rw, rh,
        dx, dy, template, Jbig2.NominalGrAt)
      val dec = new Jbig2.MqDecoder(enc.flush())
      val dcx = Jbig2.newCx(1 << 13)
      val out = Jbig2.decodeRefinementWith(dec, dcx, w, h, ref, rw, rh,
        dx, dy, template, Jbig2.NominalGrAt)
      assert(out.toSeq === tgt.toSeq, s"trial $trial t=$template d=($dx,$dy)")
    }
  }

  test("JBIG2 REFAGG dictionary + refining text region compose the refined page") {
    import graft.ingest.Jbig2
    val rnd = new scala.util.Random(53)
    for (trial <- 0 until 3; rTemplate <- Seq(0, 1)) {
      val base0 = Jbig2.Glyph(4, 5, Array.fill(20)(rnd.nextBoolean()))
      val base1 = Jbig2.Glyph(6, 5, Array.fill(30)(rnd.nextBoolean()))
      // dictionary-B symbols: refinements of the bases with a few pixels
      // flipped (dims match the reference; RDX=RDY=0)
      def near(g: Jbig2.Glyph): Jbig2.Glyph =
        Jbig2.Glyph(g.w, g.h, g.bits.map(b =>
          if (rnd.nextInt(6) == 0) !b else b))
      val r0 = near(base0); val r1 = near(base1)
      // per-instance inline refinement target of symbol 2 (= r0)
      val inline = r0.bits.map(b => if (rnd.nextInt(5) == 0) !b else b)
      val glyphs = IndexedSeq(base0, base1, r0, r1)
      val places = Seq(
        (0, 0, 0, None), (2, 5, 0, None), (3, 12, 0, None),
        (1, 0, 6, None), (2, 7, 6, Some(inline)))
      val (w, h) = (19, 12)
      val stream = Jbig2.encodeEmbeddedRefined(
        IndexedSeq(base0, base1), Seq((0, r0), (1, r1)), places, w, h,
        rTemplate = rTemplate)
      val out = Jbig2.decodeEmbedded(stream, w, h)
      assert(out.nonEmpty, s"trial $trial rt=$rTemplate: refined page refused")
      val expected = new Array[Boolean](w * h)
      places.foreach { case (si, x, y, inl) =>
        val g = glyphs(si)
        val bits = inl.getOrElse(g.bits)
        for (yy <- 0 until g.h; xx <- 0 until g.w)
          if (bits(yy * g.w + xx)) expected((y + yy) * w + (x + xx)) = true
      }
      assert(out.get.toSeq === expected.toSeq, s"trial $trial rt=$rTemplate")
    }
  }

  test("JBIG2 generic region and embedded stream round-trip; MMR leg matches G4") {
    import graft.ingest.Jbig2
    val rnd = new scala.util.Random(5)
    for ((w, h) <- Seq((8, 6), (31, 17), (64, 64));
         density <- Seq(0.1, 0.5);
         tpgdon <- Seq(false, true)) {
      val plane = Array.fill(w * h)(rnd.nextDouble() < density)
      val arith = Jbig2.encodeGenericArith(plane, w, h, tpgdon = tpgdon)
      val back = Jbig2.decodeGenericArith(arith, w, h,
        Array((3, -1), (-3, -1), (2, -2), (-2, -2)), tpgdon)
      assert(back.toSeq === plane.toSeq, s"arith ${w}x$h d=$density tp=$tpgdon")
    }
    // TPGDON compresses repeated rows (the reason it exists)
    val w = 64
    val stripes = Array.tabulate(w * 32)(i => (i / (w * 8)) % 2 == 0)
    val plainSz = Jbig2.encodeGenericArith(stripes, w, 32).length
    val tpSz = Jbig2.encodeGenericArith(stripes, w, 32, tpgdon = true).length
    assert(tpSz < plainSz, s"tpgdon $tpSz !< plain $plainSz")
    // embedded stream: both coders, page-composed
    for (mmr <- Seq(false, true)) {
      val plane = Array.fill(20 * 9)(rnd.nextBoolean())
      val stream = Jbig2.encodeEmbedded(plane, 20, 9, mmr = mmr)
      val out = Jbig2.decodeEmbedded(stream, 20, 9)
      assert(out.exists(_.toSeq == plane.toSeq), s"embedded mmr=$mmr")
    }
    // refusals: dict/page mismatch and truncated stream
    val pl = Array.fill(12)(true)
    val st = Jbig2.encodeEmbedded(pl, 4, 3, mmr = false)
    assert(Jbig2.decodeEmbedded(st, 5, 3).isEmpty)
    assert(Jbig2.decodeEmbedded(st.take(st.length / 2), 4, 3).isEmpty)
  }

  // ----------------------------------------------- JPEG luma-plane twin --

  test("decodeJpegLuma agrees with the stats path on fixtures and ImageIO output") {
    for (id <- Seq(0L, 1L, 5L, 77L)) {
      val bytes = Jpeg.encodeJpeg(id)
      val f = Jpeg.decodeJpeg(bytes)
      val (w, h, plane) = Jpeg.decodeJpegLuma(bytes)
      assert((w, h) === (f.width, f.height))
      assert(plane.map(_.toLong).sum === f.sumLuma)
      assert(plane(math.min(2, h - 1) * w + math.min(1, w - 1)).toLong === f.probeLuma)
    }
    // a real AC-coefficient stream (ImageIO encoder; grayscale — the JDK
    // writes RGB JPEGs 4:2:0-subsampled, outside this decoder's subset)
    val img = new java.awt.image.BufferedImage(24, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 24) {
      val v = (x * 10 + y * 5) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jb = bos.toByteArray
    val f = Jpeg.decodeJpeg(jb)
    val (w, h, plane) = Jpeg.decodeJpegLuma(jb)
    assert((w, h) === (f.width, f.height))
    assert(plane.map(_.toLong).sum === f.sumLuma)
  }

  // ----------------------------------------------- extraction fixtures --

  test("every fixture class extracts with closed-form luma stats") {
    def expected(docId: Long): (String, Int, Int, Long, Long) = {
      val did = (docId % 256).toInt
      (docId % 14) match {
        case 0L | 1L =>
          val (w, h) = PdfImageFixtures.rgbDims(docId)
          def lum(x: Int, y: Int) =
            (299 * ((did + x * y) % 256) + 587 * ((2 * did + 3 * x + 5 * y) % 256)
              + 114 * ((did + 7 * x + 13 * y) % 256)) / 1000
          val sum = (for (y <- 0 until h; x <- 0 until w) yield lum(x, y).toLong).sum
          ("raw", w, h, sum, lum(1, 2).toLong)
        case 2L | 4L =>
          val (w, h) = PdfImageFixtures.grayDims(docId)
          val sum = (for (y <- 0 until h; x <- 0 until w)
            yield PdfImageFixtures.grayPx(did, x, y).toLong).sum
          ("raw", w, h, sum, PdfImageFixtures.grayPx(did, 1, 2).toLong)
        case 3L =>
          val w = (24 + (docId % 2) * 8).toInt
          val h = (16 + (docId % 3) * 8).toInt
          val sum = (for (by <- 0 until h / 8; bx <- 0 until w / 8)
            yield 64L * Jpeg.blockY(did, bx, by)).sum
          ("dct", w, h, sum, Jpeg.blockY(did, 0, 0).toLong)
        case 5L =>
          val (w, h) = PdfImageFixtures.ccittDims(docId)
          def lum(x: Int, y: Int) =
            if (PdfImageFixtures.ccittBlack(did, x, y)) 0L else 255L
          val sum = (for (y <- 0 until h; x <- 0 until w) yield lum(x, y)).sum
          ("ccitt", w, h, sum, lum(1, 2))
        case 6L =>
          val (w, h) = PdfImageFixtures.grayDims(docId)
          val sum = (for (y <- 0 until h; x <- 0 until w)
            yield PdfImageFixtures.grayPx(did, x, y).toLong).sum
          ("inline", w, h, sum, PdfImageFixtures.grayPx(did, 1, 2).toLong)
        case 7L =>
          val (w, h) = PdfImageFixtures.jbig2Dims(docId)
          def lum(x: Int, y: Int) =
            if (PdfImageFixtures.jbig2Black(did, x, y)) 0L else 255L
          val sum = (for (y <- 0 until h; x <- 0 until w) yield lum(x, y)).sum
          ("jbig2", w, h, sum, lum(1, 2))
        case 8L =>
          val (gw, w, h) = PdfImageFixtures.symDims(docId)
          def lum(x: Int, y: Int) =
            if (PdfImageFixtures.symBlack(did, gw, x, y)) 0L else 255L
          val sum = (for (y <- 0 until h; x <- 0 until w) yield lum(x, y)).sum
          ("jbig2", w, h, sum, lum(1, 2))
        case 9L => // JPX refused, the raw-gray sibling survives
          val (w, h) = PdfImageFixtures.grayDims(docId)
          val sum = (for (y <- 0 until h; x <- 0 until w)
            yield PdfImageFixtures.grayPx(did, x, y).toLong).sum
          ("raw", w, h, sum, PdfImageFixtures.grayPx(did, 1, 2).toLong)
        case 10L => // refined JBIG2 (REFAGG dict + IARI text region)
          val (gw, w, h) = PdfImageFixtures.refDims(docId)
          def lum(x: Int, y: Int) =
            if (PdfImageFixtures.refBlack(did, gw, x, y)) 0L else 255L
          val sum = (for (y <- 0 until h; x <- 0 until w) yield lum(x, y)).sum
          ("jbig2", w, h, sum, lum(1, 2))
        case _ => // 11 Huffman-dict / 12 JBIG2Globals / 13 custom-table
          // Huffman: all compose the symBlack form
          val (gw, w, h) = PdfImageFixtures.symDims(docId)
          def lum(x: Int, y: Int) =
            if (PdfImageFixtures.symBlack(did, gw, x, y)) 0L else 255L
          val sum = (for (y <- 0 until h; x <- 0 until w) yield lum(x, y)).sum
          ("jbig2", w, h, sum, lum(1, 2))
      }
    }
    // 112 ids = 8 full rotations, covering the mmr/tpgdon/arith alternation
    // inside the JBIG2 class, the /Decode [1 0] CCITT sub-class, both
    // refinement GRTEMPLATEs, both Huffman collective-bitmap codings (in
    // the standard-table AND custom-table classes), and both
    // /JBIG2Globals dictionary codings several times over
    for (docId <- 0L until 112L) {
      val ims = PdfImages.extract(PdfImageFixtures.imagePdf(docId))
      assert(ims.length === 1, s"doc $docId: expected exactly one image " +
        "(the JPX-class sibling must survive its refused neighbor)")
      val im = ims.head
      val (codec, w, h, sum, probe) = expected(docId)
      assert(im.codec === codec, s"doc $docId")
      assert((im.width, im.height) === (w, h), s"doc $docId")
      assert(im.luma.map(_.toLong).sum === sum, s"doc $docId sum")
      assert(im.luma(2 * im.width + 1).toLong === probe, s"doc $docId probe")
    }
  }

  test("PDF-embedded gray image dhash equals the BMP-path dhash") {
    for (key <- 0L until 10L; perturb <- Seq(false, true)) {
      val pdfIm = PdfImages.extract(
        PdfImageFixtures.grayImagePdf(key, perturb)).head
      val viaPdf = Multimodal.dhashLuma(pdfIm.luma, pdfIm.width, pdfIm.height)
      val viaBmp = Multimodal.dhash(Multimodal.encodeBmpGray(key, perturb))
      assert(viaPdf === viaBmp, s"key=$key perturb=$perturb")
    }
  }

  test("inline images decode through Flate and AHx payloads too") {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val px = Array.tabulate[Byte](12)(i => (i * 17 + 3).toByte) // 4×3 gray
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val flate = "BI /W 4 /H 3 /BPC 8 /CS /G /F /Fl ID ".getBytes(iso) ++
      deflate(px) ++ " EI".getBytes(iso)
    val ahx = ("BI /W 4 /H 3 /BPC 8 /CS /G /F /AHx ID " +
      px.map("%02X".format(_)).mkString + "> EI").getBytes(iso)
    // two inline images in one stream, with a decoy operator between
    val content = flate ++ " 1 0 0 1 0 0 cm ".getBytes(iso) ++ ahx
    val ims = PdfImages.inlineImages(content, 1)
    assert(ims.length === 2)
    for (im <- ims) {
      assert((im.width, im.height, im.codec) === (4, 3, "inline"))
      assert(im.luma.toSeq === px.map(_ & 0xff).toSeq)
    }
    // RGB inline: luma is the ITU-601 integer combination
    val rgb = Array.tabulate[Byte](36)(i => (i * 5).toByte)
    val rgbIm = PdfImages.inlineImages(
      "BI /W 4 /H 3 /BPC 8 /CS /RGB ID ".getBytes(iso) ++ rgb ++
        " EI".getBytes(iso), 1)
    assert(rgbIm.length === 1)
    assert(rgbIm.head.luma(0) ===
      (299 * (rgb(0) & 0xff) + 587 * (rgb(1) & 0xff) + 114 * (rgb(2) & 0xff)) / 1000)
    // a garbled BI (no ID) is skipped without swallowing the stream
    assert(PdfImages.inlineImages("BI /W 4 garbage".getBytes(iso), 1).isEmpty)
  }

  test("undecodable sibling images never drop the decodable ones") {
    // a PDF with a JBIG2 image would extract nothing for that image but
    // must keep the page's other images; simulate via a corrupt G4 stream
    val good = PdfImageFixtures.imagePdf(0L) // class 0, raw RGB
    assert(PdfImages.extract(good).nonEmpty)
    // truncated/garbage CCITT payload refuses that image only
    val bad = PdfImageFixtures.imagePdf(5L) // class 5, ccitt
    val tampered = bad.clone()
    // find the stream of object 5 and flip bytes mid-stream
    val marker = "5 0 obj".getBytes("ISO-8859-1")
    val at = tampered.indexOfSlice(marker)
    assert(at > 0)
    val streamAt = tampered.indexOfSlice("stream\n".getBytes("ISO-8859-1"), at)
    var i = streamAt + 10
    while (i < math.min(streamAt + 30, tampered.length)) {
      tampered(i) = 0x55.toByte; i += 1
    }
    assert(PdfImages.extract(tampered).isEmpty) // refused, not garbled
  }
}
