package graft.functions

/** Pure-Scala grayscale image kernels (SURVEY.md §2.9 F13/F16/F18/F21/
  * F23) — deterministic pixel math over row-major byte planes, no codec
  * dependency (decode stays behind the Multimodal seam). Semantics from
  * `src/preprocessing/image_processor.py`; fixtures mirror the
  * reference's own unit tests (white background, black content).
  *
  * Pixels: unsigned bytes 0..255, 0 = black, 255 = white.
  */
object ImageOps {

  final case class Gray(w: Int, h: Int, px: Array[Byte]) {
    require(px.length == w * h, s"plane size ${px.length} != $w x $h")
    def apply(x: Int, y: Int): Int = px(y * w + x) & 0xff
  }

  /** F16: fixed-threshold binarization (`image_processor.py:230-236`,
    * threshold 127 → {0, 255}). */
  def binarizeFixed(img: Gray, threshold: Int = 127): Gray =
    Gray(img.w, img.h, img.px.map { b =>
      if ((b & 0xff) > threshold) 255.toByte else 0.toByte
    })

  /** F13 (surrogate): rotate by quadrant — the deterministic core of
    * deskew/auto-rotate (the Hough/minAreaRect angle estimation stays
    * behind the seam; quadrant rotation is what EXIF auto-rotate needs,
    * `image_processor.py:88-104`). */
  def rotate180(img: Gray): Gray = Gray(img.w, img.h, img.px.reverse)

  def rotate90cw(img: Gray): Gray = {
    val out = new Array[Byte](img.px.length)
    var y = 0
    while (y < img.h) {
      var x = 0
      while (x < img.w) {
        // (x, y) -> (h-1-y, x) in the (h x w) output
        out(x * img.h + (img.h - 1 - y)) = img.px(y * img.w + x)
        x += 1
      }
      y += 1
    }
    Gray(img.h, img.w, out)
  }

  /** F21: crop to content — bounding box of pixels darker than 240,
    * plus padding, clamped to the frame (`image_processor.py:371-398`).
    * Returns None for blank images (reference returns input unchanged). */
  def contentBBox(img: Gray, darkerThan: Int = 240, pad: Int = 10)
      : Option[(Int, Int, Int, Int)] = {
    var minX = Int.MaxValue; var minY = Int.MaxValue
    var maxX = -1; var maxY = -1
    var y = 0
    while (y < img.h) {
      var x = 0
      while (x < img.w) {
        if (img(x, y) < darkerThan) {
          if (x < minX) minX = x
          if (x > maxX) maxX = x
          if (y < minY) minY = y
          if (y > maxY) maxY = y
        }
        x += 1
      }
      y += 1
    }
    if (maxX < 0) None
    else {
      val x0 = math.max(0, minX - pad)
      val y0 = math.max(0, minY - pad)
      val x1 = math.min(img.w - 1, maxX + pad)
      val y1 = math.min(img.h - 1, maxY + pad)
      Some((x0, y0, x1 - x0 + 1, y1 - y0 + 1))
    }
  }

  def cropToContent(img: Gray, darkerThan: Int = 240, pad: Int = 10): Gray =
    contentBBox(img, darkerThan, pad) match {
      case None => img
      case Some((x0, y0, w, h)) =>
        val out = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          System.arraycopy(img.px, (y0 + y) * img.w + x0, out, y * w, w)
          y += 1
        }
        Gray(w, h, out)
    }

  /** F18: DPI estimate (width / 8.5 in letter width) and the cubic-
    * upscale factor decision (`image_processor.py:264-286`). */
  def estimateDpi(widthPx: Int): Double = widthPx / 8.5

  def upscaleFactor(widthPx: Int, targetDpi: Int = 300): Option[Double] = {
    val dpi = estimateDpi(widthPx)
    if (dpi < 0.8 * targetDpi) Some(targetDpi / dpi) else None
  }

  /** F23/P5: validation — dims within [100, 10000]² and content ratio
    * (non-white share) ≥ 1 % (`image_processor.py:422-446`). */
  def validate(img: Gray): Boolean = {
    if (img.w < 100 || img.h < 100 || img.w > 10000 || img.h > 10000)
      return false
    var dark = 0L
    var i = 0
    while (i < img.px.length) {
      if ((img.px(i) & 0xff) < 250) dark += 1
      i += 1
    }
    dark.toDouble / img.px.length >= 0.01
  }

  /** F19 (projection-profile surrogate): horizontal dark-row bands →
    * block rows, classified by aspect ratio like the reference
    * (`image_processor.py:288-335`: >5 line, >2 paragraph, 0.8-1.2
    * square, else text_block), returned in reading order (B7). */
  def detectBlocks(img: Gray, darkerThan: Int = 128)
      : Seq[(Int, Int, Int, Int, String)] = {
    val rowHasInk = Array.tabulate(img.h) { y =>
      var x = 0
      var ink = false
      while (x < img.w && !ink) { ink = img(x, y) < darkerThan; x += 1 }
      ink
    }
    val bands = Seq.newBuilder[(Int, Int)]
    var y = 0
    while (y < img.h) {
      if (rowHasInk(y)) {
        var e = y
        while (e < img.h && rowHasInk(e)) e += 1
        bands += ((y, e - 1))
        y = e
      } else y += 1
    }
    bands.result().map { case (y0, y1) =>
      var minX = Int.MaxValue
      var maxX = -1
      var yy = y0
      while (yy <= y1) {
        var x = 0
        while (x < img.w) {
          if (img(x, yy) < darkerThan) {
            if (x < minX) minX = x
            if (x > maxX) maxX = x
          }
          x += 1
        }
        yy += 1
      }
      val w = maxX - minX + 1
      val h = y1 - y0 + 1
      val aspect = w.toDouble / h
      val kind =
        if (aspect > 5.0) "line"
        else if (aspect > 2.0) "paragraph"
        else if (aspect >= 0.8 && aspect <= 1.2) "square"
        else "text_block"
      (minX, y0, w, h, kind)
    }
  }
}
