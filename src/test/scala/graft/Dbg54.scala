package graft
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{Jbig2, PdfImageFixtures, PdfImages}
class Dbg54 extends AnyFunSuite {
  test("debug doc 54") {
    val docId = 54L
    val did = (docId % 256).toInt
    val (gw, w, h) = PdfImageFixtures.refDims(docId)
    info(s"gw=$gw w=$w h=$h rTemplate=${(docId / 11) % 2}")
    def bits(third: Int): Array[Boolean] =
      Array.tabulate(gw * h)(i => PdfImageFixtures.refBlack(did, gw, third * gw + i % gw, i / gw))
    val g0 = Jbig2.Glyph(gw, h, bits(0))
    val g1 = Jbig2.Glyph(gw, h, bits(1))
    val stream = Jbig2.encodeEmbeddedRefined(IndexedSeq(g0), Seq((0, g1)),
      Seq((0, 0, 0, None), (1, gw, 0, None), (0, 2 * gw, 0, Some(bits(2)))),
      w, h, rTemplate = ((docId / 11) % 2).toInt)
    info(s"stream len=${stream.length}")
    val dec = Jbig2.decodeEmbedded(stream, w, h)
    info(s"decodeEmbedded: ${dec.map(_.count(identity))}")
    val pdf = PdfImageFixtures.imagePdf(docId)
    val ims = PdfImages.extract(pdf)
    info(s"extract: ${ims.size}")
    assert(dec.nonEmpty)
    assert(ims.size == 1)
  }
}
