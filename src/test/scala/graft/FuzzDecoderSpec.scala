package graft

import org.scalatest.funspec.AnyFunSpec
import graft.ingest.{CcittG4, EpubParser, RtfParser, TarSource, WarcSource, ZipSource}
import graft.ops.{Jpeg, Multimodal}

/** Mangled-input campaign over the from-scratch media decoders and archive
  * sources — the sibling of [[FuzzRefusalSpec]] with a DIFFERENT contract.
  *
  * The media decoders throw controlled exceptions on malformed input by
  * design (`decodePng(corrupt)` → IllegalArgumentException, pinned in
  * OpsSpec); the DataFrame seams (`decodeXFeatures`) catch per-row. So the
  * invariant here is not no-throw but **terminates-promptly-and-NonFatal**:
  *  - every decode on mangled bytes must COMPLETE within a wall budget —
  *    a spin (circular TIFF IFD chain, zero-size RIFF chunk, non-advancing
  *    LZW state) pins an executor core per corrupt file at crawl scale,
  *    the exact defect class the PDF-lexer campaign caught;
  *  - anything thrown must be NonFatal — a StackOverflowError or
  *    OutOfMemoryError escapes the per-row catch seam and kills the task
  *    (header-driven allocation must be bounds-checked BEFORE allocating).
  *
  * Deterministic corruption (splitmix64), no wall-clock in the mangling.
  */
class FuzzDecoderSpec extends AnyFunSpec {

  private def mix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def offsets(n: Int, k: Int, seed: Long): Seq[Int] =
    if (n <= 1) Seq.empty
    else (0 until k).map(i => 1 + (mix(seed + i) % (n - 1)).toInt.abs % (n - 1)).distinct

  private def mangled(b: Array[Byte], seed: Long): Seq[Array[Byte]] = {
    val truncs = offsets(b.length, 7, seed).map(b.take) :+ b.take(b.length / 2)
    val flips = offsets(b.length, 7, seed * 31 + 7).map { p =>
      val c = b.clone(); c(p) = (c(p) ^ (1 + (mix(seed + p) & 0x7f)).toByte).toByte; c
    }
    truncs ++ flips
  }

  private val garbage: Seq[Array[Byte]] =
    Seq(0, 1, 12, 128, 4096).map(n => Array.tabulate(n)(i => mix(31L + i).toByte))

  /** run on a worker thread with a join budget: a hang FAILS (and the
    * daemon thread is abandoned); a fatal throw FAILS; NonFatal is the
    * decoder refusing — allowed. */
  private def terminatesNonFatal(label: String)(body: => Any): Unit = {
    @volatile var thrown: Throwable = null
    val t = new Thread(() => try { body; () } catch { case e: Throwable => thrown = e })
    t.setDaemon(true)
    t.start()
    t.join(15000)
    if (t.isAlive) fail(s"$label still running after 15s — decoder loop does not terminate")
    thrown match {
      case null => ()
      case e if scala.util.control.NonFatal(e) => () // controlled refusal
      case e => fail(s"$label threw fatal ${e.getClass.getName}: ${e.getMessage}")
    }
  }

  private val mediaDecoders: Seq[(String, Long => Array[Byte], Array[Byte] => Any)] = Seq(
    ("bmp", Multimodal.encodeBmp, Multimodal.decodeBmp),
    ("wav", Multimodal.encodeWav, Multimodal.decodeWav),
    ("mulaw", Multimodal.encodeWavMulaw, Multimodal.decodeWavMulaw),
    ("avi", Multimodal.encodeAvi, Multimodal.decodeAvi),
    ("png", Multimodal.encodePng, Multimodal.decodePng),
    ("gif", Multimodal.encodeGif, Multimodal.decodeGif),
    ("tiff", Multimodal.encodeTiff, Multimodal.decodeTiff),
    ("jpeg", Jpeg.encodeJpeg, b => Jpeg.decodeJpeg(b))
  )

  describe("media decoders under truncation and byte flips") {
    for ((name, enc, dec) <- mediaDecoders) {
      it(s"$name decode terminates (NonFatal only) on mangled input") {
        for (docId <- Seq(0L, 7L)) {
          val base = enc(docId)
          (mangled(base, 100L * docId + name.hashCode) ++ garbage).zipWithIndex.foreach {
            case (m, i) => terminatesNonFatal(s"$name#$docId/$i")(dec(m))
          }
        }
      }
    }
  }

  describe("derived media transforms under mangling") {
    it("dhash / fingerprints / resize / resample terminate NonFatal") {
      val bmp = Multimodal.encodeBmp(3L)
      val wav = Multimodal.encodeWav(3L)
      val avi = Multimodal.encodeAvi(3L)
      (mangled(bmp, 11L) ++ garbage).zipWithIndex.foreach { case (m, i) =>
        terminatesNonFatal(s"dhash/$i")(Multimodal.dhash(m))
        terminatesNonFatal(s"resize/$i")(Multimodal.resizeBmpBilinear(m, 8, 8))
      }
      (mangled(wav, 13L) ++ garbage).zipWithIndex.foreach { case (m, i) =>
        terminatesNonFatal(s"afp/$i")(Multimodal.audioFingerprint(m))
        terminatesNonFatal(s"resample/$i")(Multimodal.resampleWavLinear(m, 6000))
      }
      (mangled(avi, 17L) ++ garbage).zipWithIndex.foreach { case (m, i) =>
        terminatesNonFatal(s"vfp/$i")(Multimodal.videoFingerprint(m))
      }
    }
  }

  describe("archive and markup sources under mangling") {
    it("WARC / TAR / ZIP / EPUB terminate NonFatal on mangled containers") {
      val warc = WarcSource.fixture(1L, Seq(("http://example.com/a", "<html><body>one</body></html>")))
      val tar = TarSource.fixture(1L, Seq(("a.txt", "alpha beta"), ("b.txt", "gamma")))
      val zip = ZipSource.fixture(1L, Seq(("a.txt", "alpha beta"), ("b.txt", "gamma")))
      val epub = EpubParser.fixture(1L, Seq(("ch1", Seq("first paragraph", "second"))))
      (mangled(warc, 21L) ++ garbage).zipWithIndex.foreach { case (m, i) =>
        terminatesNonFatal(s"warc/$i")(WarcSource.records(m))
      }
      (mangled(tar, 23L) ++ garbage).zipWithIndex.foreach { case (m, i) =>
        terminatesNonFatal(s"tar/$i")(TarSource.entries(m))
      }
      (mangled(zip, 27L) ++ garbage).zipWithIndex.foreach { case (m, i) =>
        terminatesNonFatal(s"zip/$i")(ZipSource.entries(m))
      }
      (mangled(epub, 29L) ++ garbage).zipWithIndex.foreach { case (m, i) =>
        terminatesNonFatal(s"epub/$i")(EpubParser.toMarkdown(m))
      }
    }

    it("RTF text mangles terminate NonFatal") {
      val rtf = RtfParser.fixture(1L, Seq("first paragraph", "second one"))
      val bytes = rtf.getBytes("ISO-8859-1")
      (mangled(bytes, 33L) ++ garbage).zipWithIndex.foreach { case (m, i) =>
        terminatesNonFatal(s"rtf/$i")(RtfParser.toText(new String(m, "ISO-8859-1")))
      }
    }

    it("standalone CCITT G4 terminates NonFatal on mangled streams") {
      // valid G4 bytes come from the PDF fixture path; raw garbage suffices
      // here — the codec walks a bit-level state machine where a wrong code
      // must refuse (None) rather than spin
      garbage.zipWithIndex.foreach { case (g, i) =>
        terminatesNonFatal(s"g4/$i")(CcittG4.decode(g, 48, 32))
      }
    }
  }
}
