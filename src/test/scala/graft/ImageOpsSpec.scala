package graft

import graft.functions.ImageOps
import graft.functions.ImageOps.Gray

/** Mirrors the reference's image-preprocessing unit tests
  * (`tests/unit/test_preprocessing.py:149-293`): binarize domain,
  * crop-to-content placement, dpi upscale decision, blank/size
  * validation, layout classification by aspect ratio. */
class ImageOpsSpec extends SparkSpec {

  /** white w×h canvas with a black rectangle at (x0,y0,w0,h0) */
  private def canvas(w: Int, h: Int, rects: (Int, Int, Int, Int)*): Gray = {
    val px = Array.fill(w * h)(255.toByte)
    for ((x0, y0, w0, h0) <- rects; y <- y0 until (y0 + h0); x <- x0 until (x0 + w0))
      px(y * w + x) = 0.toByte
    Gray(w, h, px)
  }

  test("F16 binarize output domain is exactly {0, 255}") {
    val img = Gray(4, 1, Array(10, 127, 128, 250).map(_.toByte))
    val b = ImageOps.binarizeFixed(img)
    assert(b.px.map(_ & 0xff).toSeq == Seq(0, 0, 255, 255))
  }

  test("F13 quadrant rotations preserve pixels and swap dims") {
    val img = canvas(300, 200, (10, 20, 30, 40))
    val r90 = ImageOps.rotate90cw(img)
    assert(r90.w == 200 && r90.h == 300)
    assert(ImageOps.rotate180(ImageOps.rotate180(img)).px.sameElements(img.px))
    // content survives rotation
    assert(ImageOps.contentBBox(r90).isDefined)
  }

  test("F21 crop-to-content finds the padded box (reference crop fixture)") {
    val img = canvas(800, 600, (200, 150, 100, 80))
    val Some((x, y, w, h)) = ImageOps.contentBBox(img)
    assert(x == 190 && y == 140) // 10 px padding
    assert(w == 120 && h == 100)
    val cropped = ImageOps.cropToContent(img)
    assert(cropped.w == 120 && cropped.h == 100)
    // blank image: unchanged
    val blank = canvas(200, 200)
    assert(ImageOps.cropToContent(blank).w == 200)
  }

  test("F18 dpi estimate and upscale decision") {
    assert(math.abs(ImageOps.estimateDpi(850) - 100.0) < 1e-9)
    assert(ImageOps.upscaleFactor(850, 300).exists(f => math.abs(f - 3.0) < 1e-9))
    assert(ImageOps.upscaleFactor(2550, 300).isEmpty) // already 300 dpi
  }

  test("F23 validation: size window and blank rejection (reference blank fixture)") {
    assert(!ImageOps.validate(canvas(800, 600))) // blank white
    assert(ImageOps.validate(canvas(800, 600, (100, 100, 200, 200))))
    assert(!ImageOps.validate(canvas(50, 50, (0, 0, 40, 40)))) // too small
  }

  test("F19 layout: aspect-ratio classes in reading order (reference layout fixture)") {
    val img = canvas(800, 600,
      (50, 50, 600, 40), // aspect 15 -> line
      (50, 150, 300, 100), // aspect 3 -> paragraph
      (50, 300, 100, 100)) // aspect 1 -> square
    val blocks = ImageOps.detectBlocks(img)
    assert(blocks.map(_._5) == Seq("line", "paragraph", "square"))
    // reading order: sorted by y
    assert(blocks.map(_._2) == blocks.map(_._2).sorted)
  }
}
