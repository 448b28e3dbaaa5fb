package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ImageCodec, ImageOps}

/** Seeded random-plane invariants for the round-8 pixel kernels (the
  * SURVEY §5 property strategy, applied to codec + geometry): codec
  * round-trip identity on arbitrary content and dims, resize geometry
  * laws, rotation conservation, bilinear convexity. Pure JVM. */
class PixelKernelFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260813L)

  private def randomPlane(maxW: Int = 40, maxH: Int = 40): ImageOps.Gray = {
    val w = 1 + rnd.nextInt(maxW)
    val h = 1 + rnd.nextInt(maxH)
    ImageOps.Gray(w, h, Array.fill(w * h)(rnd.nextInt(256).toByte))
  }

  test("codec: encode->decode identity on 60 random planes x 3 containers") {
    for (_ <- 1 to 60) {
      val img = randomPlane()
      for (fmt <- Seq("png", "bmp", "gif")) {
        val dec = ImageCodec.decode(ImageCodec.encode(img, fmt))
          .getOrElse(fail(s"$fmt undecodable at ${img.w}x${img.h}"))
        assert(dec.w == img.w && dec.h == img.h, fmt)
        assert(dec.px.sameElements(img.px),
          s"$fmt not lossless at ${img.w}x${img.h}")
      }
    }
  }

  test("resizeNN: integer upscale then downscale is the identity") {
    for (_ <- 1 to 40) {
      val img = randomPlane(16, 16)
      val k = 2 + rnd.nextInt(3)
      val up = ImageOps.resizeNN(img, img.w * k, img.h * k)
      // each source pixel owns a k x k block
      for (_ <- 1 to 10) {
        val x = rnd.nextInt(up.w); val y = rnd.nextInt(up.h)
        assert(up(x, y) == img(x / k, y / k))
      }
      assert(ImageOps.resizeNN(up, img.w, img.h).px.sameElements(img.px),
        s"round trip broke at ${img.w}x${img.h} k=$k")
    }
  }

  test("rotateNN: outputs are source pixels or fill; 0 deg is identity") {
    for (_ <- 1 to 40) {
      val img = randomPlane(32, 16)
      assert(ImageOps.rotateNN(img, 0).px.sameElements(img.px))
      val a = rnd.nextInt(91) - 45
      val rot = ImageOps.rotateNN(img, a, fill = 255)
      val src = img.px.map(_ & 0xff).toSet + 255
      assert(rot.px.forall(b => src.contains(b & 0xff)),
        s"rotation invented a pixel value at angle $a")
      assert(rot.w == img.w && rot.h == img.h)
    }
  }

  test("resizeBilinear: convexity — outputs stay inside the source range") {
    for (_ <- 1 to 40) {
      val img = randomPlane(24, 24)
      val dw = 1 + rnd.nextInt(48); val dh = 1 + rnd.nextInt(48)
      val out = ImageOps.resizeBilinear(img, dw, dh)
      assert(out.w == dw && out.h == dh)
      val lo = img.px.map(_ & 0xff).min
      val hi = img.px.map(_ & 0xff).max
      assert(out.px.forall { b =>
        val v = b & 0xff; v >= lo && v <= hi
      }, s"bilinear left [$lo,$hi] at ${img.w}x${img.h}->${dw}x$dh")
    }
  }

  test("deskew: total on arbitrary content, applied angle inside the band") {
    for (_ <- 1 to 30) {
      val img = randomPlane(32, 16)
      val (fixed, applied) = ImageOps.deskew(img)
      assert(applied >= -45 && applied <= 45)
      assert(fixed.w == img.w && fixed.h == img.h)
    }
  }
}
