package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Exif

/** F12 head: EXIF orientation byte parser — round-trips through the
  * fixture writer in both endiannesses and both framings, plus the
  * malformed-input degradations the reference handles with a bare
  * `except: pass` (`image_processor.py:84-94`). */
class ExifSpec extends AnyFunSuite {

  test("round-trip: every orientation, both endians, both framings") {
    for {
      o <- 1 to 8
      le <- Seq(true, false)
      prefix <- Seq(true, false)
    } {
      val b = Exif.writeTiff(o, 640, 480, le, prefix)
      assert(Exif.orientation(b) == o, s"o=$o le=$le prefix=$prefix")
      assert(Exif.shortTag(b, Exif.WidthTag).contains(640))
      assert(Exif.shortTag(b, Exif.HeightTag).contains(480))
    }
  }

  test("rotation mapping matches the reference: 3/6/8 -> 180/-90/90") {
    assert(Exif.rotationDegrees(3) == 180)
    assert(Exif.rotationDegrees(6) == -90)
    assert(Exif.rotationDegrees(8) == 90)
    assert((Seq(1, 2, 4, 5, 7, 0, 9).map(Exif.rotationDegrees)).forall(_ == 0))
  }

  test("malformed input degrades to orientation 1") {
    // empty / truncated header
    assert(Exif.orientation(Array.emptyByteArray) == 1)
    assert(Exif.orientation(Array[Byte]('I', 'I', 42, 0)) == 1)
    // wrong byte-order mark
    val b = Exif.writeTiff(6, 1, 1, littleEndian = true)
    b(0) = 'X'
    assert(Exif.orientation(b) == 1)
    // wrong magic
    val c = Exif.writeTiff(6, 1, 1, littleEndian = true)
    c(2) = 43
    assert(Exif.orientation(c) == 1)
    // truncated mid-IFD: cut after the first entry
    val full = Exif.writeTiff(6, 1, 1, littleEndian = true)
    assert(Exif.orientation(full.take(8 + 2 + 12)) == 1)
    // orientation tag absent entirely (only width/height): craft by
    // retagging 274 -> 275 (little-endian: low byte at e+0)
    val noTag = Exif.writeTiff(6, 1, 1, littleEndian = true)
    val e = 8 + 2 + 12 * 2
    noTag(e) = (275 & 0xff).toByte
    noTag(e + 1) = ((275 >> 8) & 0xff).toByte
    assert(Exif.orientation(noTag) == 1)
  }

  test("big-endian value is read from the correct inline half") {
    // BE SHORT value sits in the FIRST two bytes of the value field —
    // a parser that always reads little-endian would return 0 here
    val b = Exif.writeTiff(8, 2, 2, littleEndian = false)
    assert(Exif.orientation(b) == 8)
  }
}
