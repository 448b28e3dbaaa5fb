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

  /** F16 DEFAULT path: 11-tap Gaussian kernel, σ = 2.0 (OpenCV's
    * derived sigma for ksize 11: 0.3·((11−1)/2 − 1) + 0.8), quantized
    * to 1/1024ths like the trig tables — round(1024·exp(−i²/8)) for
    * i ∈ [−5, 5]. Pinned as integer literals so the DuckDB oracle
    * embeds the identical weights. */
  val Gauss11: Array[Int] =
    Array(45, 139, 332, 621, 904, 1024, 904, 621, 332, 139, 45)
  val Gauss11Sum: Long = Gauss11.map(_.toLong).sum // 5106
  /** 2-D normalizer for the separable kernel: (Σw)². */
  val Gauss11Norm2: Long = Gauss11Sum * Gauss11Sum

  /** F16 DEFAULT: adaptive-Gaussian binarization —
    * `cv2.adaptiveThreshold(img, 255, ADAPTIVE_THRESH_GAUSSIAN_C,
    * THRESH_BINARY, 11, 2)` semantics (`image_processor.py:217-222`,
    * the reference's default `method='adaptive'`): per-pixel threshold
    * is the Gaussian-weighted 11×11 neighborhood mean minus C, border
    * replicated (BORDER_REPLICATE), out = 255 iff src > T. All
    * arithmetic stays integral: the separable weighted sums are exact
    * longs and the compare is cross-multiplied —
    * `(px + C) · (Σw)² > Σ_xy w·px` — so no division ever happens and
    * any engine with 64-bit integers replays it bit-for-bit. */
  def binarizeAdaptiveGaussian(img: Gray, c: Int = 2): Gray = {
    val r = Gauss11.length / 2
    // horizontal pass: h(x,y) = Σ_dx w[dx+r] · px(clamp(x+dx), y)
    val hp = new Array[Long](img.px.length)
    var y = 0
    while (y < img.h) {
      var x = 0
      while (x < img.w) {
        var s = 0L
        var dx = -r
        while (dx <= r) {
          val xx = math.max(0, math.min(img.w - 1, x + dx))
          s += Gauss11(dx + r) * img(xx, y).toLong
          dx += 1
        }
        hp(y * img.w + x) = s
        x += 1
      }
      y += 1
    }
    val out = new Array[Byte](img.px.length)
    y = 0
    while (y < img.h) {
      var x = 0
      while (x < img.w) {
        var s = 0L
        var dy = -r
        while (dy <= r) {
          val yy = math.max(0, math.min(img.h - 1, y + dy))
          s += Gauss11(dy + r) * hp(yy * img.w + x)
          dy += 1
        }
        val px = img(x, y)
        out(y * img.w + x) =
          if ((px + c).toLong * Gauss11Norm2 > s) 255.toByte else 0.toByte
        x += 1
      }
      y += 1
    }
    Gray(img.w, img.h, out)
  }

  /** F16 second path: Otsu's threshold (`image_processor.py:223-226`,
    * `cv2.threshold(..., THRESH_BINARY + THRESH_OTSU)`): the t ∈
    * [0, 254] maximizing between-class variance
    * σ²(t) = (sum0·w1 − sum1·w0)² / (w0·w1) over the 256-bin
    * histogram. The numerator A = sum0·w1 − sum1·w0 is an exact long
    * (|A| ≤ 255·n², within double's exact-integer range for any
    * realistic plane), and the score is the fixed op sequence
    * `(double)A · (double)A / (double)(w0·w1)` — each step correctly
    * rounded under IEEE-754, so any engine replaying the same sequence
    * produces bit-identical scores and the same argmax. First maximum
    * wins; a constant plane (no valid split)
    * thresholds at its own value, mapping everything to 0. */
  def otsuThreshold(img: Gray): Int = {
    val hist = new Array[Long](256)
    var i = 0
    while (i < img.px.length) { hist(img.px(i) & 0xff) += 1; i += 1 }
    val n = img.px.length.toLong
    var total = 0L
    i = 0
    while (i < 256) { total += i * hist(i); i += 1 }
    var w0 = 0L; var sum0 = 0L
    var bestT = -1; var bestScore = -1.0
    var t = 0
    while (t < 255) {
      w0 += hist(t); sum0 += t.toLong * hist(t)
      val w1 = n - w0
      if (w0 > 0 && w1 > 0) {
        val a = sum0 * w1 - (total - sum0) * w0
        val score = a.toDouble * a.toDouble / (w0 * w1).toDouble
        if (score > bestScore) { bestScore = score; bestT = t }
      }
      t += 1
    }
    if (bestT < 0) img.px(0) & 0xff else bestT
  }

  def binarizeOtsu(img: Gray): Gray = binarizeFixed(img, otsuThreshold(img))

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

  /** F18: REAL pixel resize, nearest-neighbor with half-pixel centers —
    * source pixel for output x is floor((x+½)·srcW/dstW), i.e.
    * ((2x+1)·srcW) / (2·dstW) in pure nonnegative integer math
    * (cv2.resize INTER_NEAREST geometry; `image_processor.py:264-286`
    * upscales for DPI, thumbnails downscale the same way). Exactly
    * replayable by any engine with integer division. */
  def resizeNN(img: Gray, dstW: Int, dstH: Int): Gray = {
    require(dstW > 0 && dstH > 0, s"bad resize target ${dstW}x$dstH")
    val out = new Array[Byte](dstW * dstH)
    var y = 0
    while (y < dstH) {
      val sy = ((2 * y + 1) * img.h) / (2 * dstH)
      var x = 0
      while (x < dstW) {
        val sx = ((2 * x + 1) * img.w) / (2 * dstW)
        out(y * dstW + x) = img.px(sy * img.w + sx)
        x += 1
      }
      y += 1
    }
    Gray(dstW, dstH, out)
  }

  /** F18: bilinear resize in 10-bit fixed point — cv2 INTER_LINEAR
    * geometry (src = (dst+½)·scale − ½, edge-clamped) with weights
    * quantized to 1/1024ths and symmetric rounding, so the result is
    * integer-deterministic across platforms (no FP accumulation).
    * Typed-spec'd against hand-computed fixtures; the oracle probes
    * ride [[resizeNN]], whose arithmetic SQL replays more cheaply. */
  def resizeBilinear(img: Gray, dstW: Int, dstH: Int): Gray = {
    require(dstW > 0 && dstH > 0, s"bad resize target ${dstW}x$dstH")
    val S = 1024
    val out = new Array[Byte](dstW * dstH)
    // fixed-point source coordinate for output index i on an axis of
    // srcN/dstN: ((2i+1)·srcN·S/(2·dstN)) − S/2, clamped at 0
    def coords(dstN: Int, srcN: Int): (Array[Int], Array[Int], Array[Int]) = {
      val i0 = new Array[Int](dstN); val i1 = new Array[Int](dstN)
      val fr = new Array[Int](dstN)
      var i = 0
      while (i < dstN) {
        val fp = math.max(0, ((2 * i + 1) * srcN * S) / (2 * dstN) - S / 2)
        val base = fp / S
        i0(i) = math.min(srcN - 1, base)
        i1(i) = math.min(srcN - 1, base + 1)
        fr(i) = fp % S
        i += 1
      }
      (i0, i1, fr)
    }
    val (x0, x1, fx) = coords(dstW, img.w)
    val (y0, y1, fy) = coords(dstH, img.h)
    var y = 0
    while (y < dstH) {
      var x = 0
      while (x < dstW) {
        val p00 = img(x0(x), y0(y)); val p01 = img(x1(x), y0(y))
        val p10 = img(x0(x), y1(y)); val p11 = img(x1(x), y1(y))
        val top = p00 * (S - fx(x)) + p01 * fx(x)
        val bot = p10 * (S - fx(x)) + p11 * fx(x)
        val v = (top * (S - fy(y)) + bot * fy(y) + S * S / 2) / (S * S)
        out(y * dstW + x) = math.min(255, v).toByte
        x += 1
      }
      y += 1
    }
    Gray(dstW, dstH, out)
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

  /** F14/F17 core: grayscale morphology — erode = window minimum,
    * dilate = window maximum, window clipped to the frame (pixels
    * outside contribute nothing, the neutral-border convention). The
    * anchor is the window's top-left-of-center, matching OpenCV's
    * default for even kernels (`image_processor.py:188-191` 2×2 open,
    * `:240-262` line kernels). */
  def erode(img: Gray, kw: Int, kh: Int): Gray =
    morph(img, kw, kh, min = true)

  def dilate(img: Gray, kw: Int, kh: Int): Gray =
    morph(img, kw, kh, min = false)

  private def morph(img: Gray, kw: Int, kh: Int, min: Boolean): Gray = {
    val ax = (kw - 1) / 2
    val ay = (kh - 1) / 2
    val out = new Array[Byte](img.px.length)
    var y = 0
    while (y < img.h) {
      var x = 0
      while (x < img.w) {
        var best = if (min) 255 else 0
        var dy = -ay
        while (dy < kh - ay) {
          val yy = y + dy
          if (yy >= 0 && yy < img.h) {
            var dx = -ax
            while (dx < kw - ax) {
              val xx = x + dx
              if (xx >= 0 && xx < img.w) {
                val v = img(xx, yy)
                if (if (min) v < best else v > best) best = v
              }
              dx += 1
            }
          }
          dy += 1
        }
        out(y * img.w + x) = best.toByte
        x += 1
      }
      y += 1
    }
    Gray(img.w, img.h, out)
  }

  /** MORPH_OPEN with iterations: erode ×n then dilate ×n (OpenCV's
    * `morphologyEx(..., iterations=n)` semantics). Removes bright
    * structures smaller than the kernel on dark-content planes (and
    * vice versa for close). */
  def open(img: Gray, kw: Int, kh: Int, iterations: Int = 1): Gray = {
    var e = img
    for (_ <- 1 to iterations) e = erode(e, kw, kh)
    for (_ <- 1 to iterations) e = dilate(e, kw, kh)
    e
  }

  def close(img: Gray, kw: Int, kh: Int, iterations: Int = 1): Gray = {
    var d = img
    for (_ <- 1 to iterations) d = dilate(d, kw, kh)
    for (_ <- 1 to iterations) d = erode(d, kw, kh)
    d
  }

  /** Saturating pixel subtraction (cv2.subtract). */
  def subtractSat(a: Gray, b: Gray): Gray = {
    require(a.w == b.w && a.h == b.h)
    Gray(a.w, a.h, Array.tabulate(a.px.length)(i =>
      math.max(0, (a.px(i) & 0xff) - (b.px(i) & 0xff)).toByte))
  }

  /** cv2.addWeighted(a, wa, b, wb, 0) with uint8 saturation+rounding. */
  def addWeighted(a: Gray, wa: Double, b: Gray, wb: Double): Gray = {
    require(a.w == b.w && a.h == b.h)
    Gray(a.w, a.h, Array.tabulate(a.px.length) { i =>
      val v = wa * (a.px(i) & 0xff) + wb * (b.px(i) & 0xff)
      math.max(0, math.min(255, math.round(v))).toByte
    })
  }

  /** F17: morphological noise removal — close+open (specks), then
    * long-kernel line detection and saturating line subtraction
    * (`image_processor.py:238-262`; kernel length scaled to the plane:
    * the reference's 25 px assumes ~2000 px scans). */
  def removeNoise(img: Gray, lineLen: Int = 9): Gray = {
    val cleaned = open(close(img, 1, 1), 1, 1) // 1×1: identity, as in ref
    val hLines = open(cleaned, lineLen, 1, iterations = 2)
    val vLines = open(cleaned, 1, lineLen, iterations = 2)
    subtractSat(subtractSat(cleaned, hLines), vLines)
  }

  /** F20: table-structure mask — long-kernel open in both axes,
    * blended 0.5/0.5 (`image_processor.py:337-368`); the contour stage
    * is [[tableBoxes]]. */
  def tableMask(img: Gray, lineLen: Int = 9): Gray =
    addWeighted(open(img, lineLen, 1, iterations = 2), 0.5,
      open(img, 1, lineLen, iterations = 2), 0.5)

  /** F20: connected dark regions of the table mask → bounding boxes with
    * area above the threshold (the contour+boundingRect stage; 4-connex
    * flood fill instead of cv2.findContours). */
  def tableBoxes(mask: Gray, darkerThan: Int = 128, minArea: Int = 8)
      : Seq[(Int, Int, Int, Int)] = {
    val seen = new Array[Boolean](mask.px.length)
    val boxes = Seq.newBuilder[(Int, Int, Int, Int)]
    var i = 0
    while (i < mask.px.length) {
      if (!seen(i) && (mask.px(i) & 0xff) < darkerThan) {
        var minX = Int.MaxValue; var minY = Int.MaxValue
        var maxX = -1; var maxY = -1
        var area = 0
        val stack = scala.collection.mutable.ArrayDeque(i)
        seen(i) = true
        while (stack.nonEmpty) {
          val j = stack.removeLast()
          val (x, y) = (j % mask.w, j / mask.w)
          area += 1
          if (x < minX) minX = x
          if (x > maxX) maxX = x
          if (y < minY) minY = y
          if (y > maxY) maxY = y
          for ((nx, ny) <- Seq((x - 1, y), (x + 1, y), (x, y - 1), (x, y + 1)))
            if (nx >= 0 && nx < mask.w && ny >= 0 && ny < mask.h) {
              val nj = ny * mask.w + nx
              if (!seen(nj) && (mask.px(nj) & 0xff) < darkerThan) {
                seen(nj) = true
                stack += nj
              }
            }
        }
        if (area >= minArea)
          boxes += ((minX, minY, maxX - minX + 1, maxY - minY + 1))
      }
      i += 1
    }
    boxes.result()
  }

  /** F15: contrast enhancement — contrast-limited histogram equalization
    * (single tile: the probe planes are smaller than one reference
    * 8×8-grid tile) followed by the reference's gamma-1.2 LUT
    * (`image_processor.py:198-215`). Clip = clipLimit·N/256 (≥1);
    * clipped mass is redistributed equally; LUT = round(cdf·255/N). */
  def claheLut(img: Gray, clipLimit: Double = 2.0): Array[Int] = {
    val n = img.px.length
    val hist = new Array[Long](256)
    img.px.foreach(b => hist(b & 0xff) += 1)
    val clip = math.max(1.0, clipLimit * n / 256.0)
    var excess = 0.0
    val clipped = hist.map { c =>
      if (c > clip) { excess += c - clip; clip } else c.toDouble
    }
    val share = excess / 256.0
    var cdf = 0.0
    clipped.map { c =>
      cdf += c + share
      math.max(0, math.min(255, math.round(cdf * 255.0 / n))).toInt
    }
  }

  def enhanceContrast(img: Gray, clipLimit: Double = 2.0): Gray = {
    val lut = claheLut(img, clipLimit)
    Gray(img.w, img.h,
      img.px.map(b => GammaLut(lut(b & 0xff)).toByte))
  }

  /** The reference's gamma-correction LUT (γ = 1.2,
    * `image_processor.py:207-212`: ((i/255)^(1/γ))·255 truncated to
    * uint8) — precomputed so the SQL oracle embeds identical entries. */
  val GammaLut: Array[Int] =
    Array.tabulate(256)(i =>
      (math.pow(i / 255.0, 1.0 / 1.2) * 255.0).toInt)

  /** F22: OCR enhancement — crop to content, CLAHE+gamma, 3×3 sharpen
    * (center 9, neighbors −1, replicated border), blended 0.7/0.3
    * (`image_processor.py:400-420`). */
  def sharpen3x3(img: Gray): Gray = {
    def at(x: Int, y: Int): Int =
      img(math.max(0, math.min(img.w - 1, x)),
        math.max(0, math.min(img.h - 1, y)))
    Gray(img.w, img.h, Array.tabulate(img.px.length) { i =>
      val (x, y) = (i % img.w, i / img.w)
      var s = 10 * at(x, y) // 9·center + center − all 9 window cells
      var dy = -1
      while (dy <= 1) {
        var dx = -1
        while (dx <= 1) { s -= at(x + dx, y + dy); dx += 1 }
        dy += 1
      }
      math.max(0, math.min(255, s)).toByte
    })
  }

  def enhanceForOcr(img: Gray): Gray = {
    val cropped = cropToContent(img)
    val contrasted = enhanceContrast(cropped)
    addWeighted(contrasted, 0.7, sharpen3x3(contrasted), 0.3)
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

  /** F12/F13 tail: Hough-style content-angle estimation — the
    * codec-free core of the reference's `_detect_text_angle`
    * (`/root/reference/src/preprocessing/image_processor.py:113-141`:
    * Canny → HoughLines(1 px, 1°) → keep nearly-horizontal angles
    * θ·180/π − 90 ∈ [−45, 45] → median). Deterministic surrogate sized
    * to the probe planes: edge pixels are the dark pixels themselves
    * (the planes are sparse ink on white — no gradient pass needed);
    * the (ρ, θ) accumulator votes at 1° steps over θ ∈ [45°, 135°]
    * (exactly the nearly-horizontal band the reference keeps) with
    * cos/sin quantized to integer 1/1024ths, so every vote, bin and
    * vote count is INTEGER arithmetic — engine-exact, no libm in the
    * oracle. ρ bins are 1 px wide, offset +64 px so the dividend stays
    * positive (truncating and flooring division agree). Each
    * accumulator cell at or above the vote threshold is one detected
    * line contributing angle θ − 90; the result is the median (even
    * count → mean of the middle two, like np.median). */
  object Hough {
    val ThetaMinDeg = 45
    val ThetaMaxDeg = 135
    val Scale = 1024
    val OffsetQ = 64 * Scale // keeps x·cos + y·sin positive for w,h ≤ 64

    val cosQ: Array[Int] = Array.tabulate(ThetaMaxDeg - ThetaMinDeg + 1)(i =>
      math.round(math.cos(math.toRadians(ThetaMinDeg + i)) * Scale).toInt)
    val sinQ: Array[Int] = Array.tabulate(ThetaMaxDeg - ThetaMinDeg + 1)(i =>
      math.round(math.sin(math.toRadians(ThetaMinDeg + i)) * Scale).toInt)
  }

  /** F13 warp trig: cos/sin quantized to integer 1/1024ths over the
    * deskew band [−45°, 45°] (index = angle + 45) — same quantization
    * discipline as [[Hough]], so an oracle can replay the warp with the
    * kernel's own tables embedded as integer literals. */
  object Warp {
    val MaxDeg = 45
    val Scale = 1024
    // keeps every rounded-NN numerator nonnegative for planes ≤ 64×64
    val OffsetQ = 2 * Scale * 64

    val cosQ: Array[Int] = Array.tabulate(2 * MaxDeg + 1)(i =>
      math.round(math.cos(math.toRadians(i - MaxDeg)) * Scale).toInt)
    val sinQ: Array[Int] = Array.tabulate(2 * MaxDeg + 1)(i =>
      math.round(math.sin(math.toRadians(i - MaxDeg)) * Scale).toInt)
  }

  /** F13: arbitrary-angle rotation about the image center by
    * nearest-neighbor inverse mapping — the deterministic core of the
    * reference's `cv2.warpAffine(M, borderValue=white)` deskew
    * (`image_processor.py:143-180`), in pure integer math. For each
    * OUTPUT pixel, the source position is found by rotating the
    * center-relative coordinate back by `angleDeg`; out-of-frame
    * sources fill white. Coordinates are doubled so the (w−1)/2 center
    * stays integral; trig rides [[Warp]]'s 1/1024 tables; the final NN
    * round is floor(v + ½) via one nonnegative integer division —
    * bit-identical in any engine with integer `//`. */
  def rotateNN(img: Gray, angleDeg: Int, fill: Int = 255): Gray = {
    require(angleDeg >= -Warp.MaxDeg && angleDeg <= Warp.MaxDeg,
      s"rotateNN supports [−45°, 45°] (deskew band), got $angleDeg")
    require(img.w <= 64 && img.h <= 64,
      s"rotateNN supports planes up to 64x64 (OffsetQ contract), " +
        s"got ${img.w}x${img.h}")
    val c = Warp.cosQ(angleDeg + Warp.MaxDeg)
    val s = Warp.sinQ(angleDeg + Warp.MaxDeg)
    val out = new Array[Byte](img.px.length)
    var y = 0
    while (y < img.h) {
      val uy = 2 * y - (img.h - 1) // doubled offset from center
      var x = 0
      while (x < img.w) {
        val ux = 2 * x - (img.w - 1)
        // inverse-rotated doubled source coords, ×Scale
        val ax = c * ux + s * uy
        val ay = -s * ux + c * uy
        // src = floor((a/Scale + dim-1)/2 + 1/2), kept nonnegative
        val sx = (ax + Warp.Scale * img.w + Warp.OffsetQ) / (2 * Warp.Scale) - 64
        val sy = (ay + Warp.Scale * img.h + Warp.OffsetQ) / (2 * Warp.Scale) - 64
        out(y * img.w + x) =
          (if (sx >= 0 && sx < img.w && sy >= 0 && sy < img.h)
            img(sx, sy)
          else fill).toByte
        x += 1
      }
      y += 1
    }
    Gray(img.w, img.h, out)
  }

  /** F11 image-side flags (`image_processor.py:18-79` preprocess
    * signature, proto DocumentConfig:224-231): which stages run, in
    * the reference's fixed order rotate → deskew → denoise → contrast
    * → binarize. */
  final case class PreprocessConfig(
      autoRotate: Boolean = true,
      deskew: Boolean = true,
      denoise: Boolean = true,
      enhanceContrast: Boolean = true,
      binarize: Boolean = false)

  /** F11 image-side compose: the reference's `preprocess` chain
    * (`image_processor.py:18-79`) behind one flag-driven entry over
    * the library's real kernels. Stage mapping, with declared
    * deviations:
    *  - autoRotate: EXIF-quadrant rotation (tag 274: 3→180, 6→90 cw,
    *    8→90 ccw — `image_processor.py:88-96`). The reference's
    *    content-angle half runs the SAME estimator the deskew stage
    *    runs one line later; this compose delegates content
    *    straightening to deskew instead of estimating twice.
    *  - deskew: [[deskew]] (Hough estimate → NN counter-warp, q146).
    *  - denoise: the declared 2×2 morphological-open surrogate of
    *    fastNlMeans+MORPH_OPEN (`:182-195`, q102 family).
    *  - enhanceContrast: [[enhanceContrast]] (CLAHE + γ=1.2, q103).
    *  - binarize: [[binarizeAdaptiveGaussian]] — the reference's
    *    DEFAULT method (q158).
    * Returns the processed plane and the deskew angle applied (0 when
    * the stage is off or no skew detected). */
  def preprocessImage(img: Gray, cfg: PreprocessConfig,
      exifOrientation: Int = 1): (Gray, Int) = {
    var im = img
    if (cfg.autoRotate) im = exifOrientation match {
      case 3 => rotate180(im)
      case 6 => rotate90cw(im)
      case 8 => rotate90cw(rotate180(im))
      case _ => im
    }
    var applied = 0
    if (cfg.deskew) {
      val (g, a) = deskew(im)
      im = g; applied = a
    }
    if (cfg.denoise) im = open(im, 2, 2)
    if (cfg.enhanceContrast) im = enhanceContrast(im)
    if (cfg.binarize) im = binarizeAdaptiveGaussian(im)
    (im, applied)
  }

  /** F13 end-to-end deskew: estimate the skew with [[houghAngle]],
    * round half-up to whole degrees, clamp to the warp band, rotate by
    * the NEGATED angle to correct (`image_processor.py:143-180`:
    * `getRotationMatrix2D(center, angle)` un-rotates the detected
    * skew). Returns (corrected plane, applied-angle-in-degrees). */
  def deskew(img: Gray): (Gray, Int) = {
    val (skew, _) = houghAngle(img)
    val a = math.max(-Warp.MaxDeg,
      math.min(Warp.MaxDeg, math.floor(skew + 0.5).toInt))
    (rotateNN(img, -a), -a)
  }

  /** Returns (median angle in degrees ∈ [−45, 45], number of detected
    * line cells); (0.0, 0) when nothing reaches the vote threshold —
    * the reference's `return 0.0` for `lines is None`. */
  def houghAngle(img: Gray, darkerThan: Int = 128, voteThreshold: Int = 3)
      : (Double, Long) = {
    import Hough._
    require(img.w <= 64 && img.h <= 64,
      s"houghAngle supports planes up to 64x64 (OffsetQ contract), " +
        s"got ${img.w}x${img.h}")
    val nTheta = ThetaMaxDeg - ThetaMinDeg + 1
    // Flat primitive accumulator: θ index × ρ bin. OffsetQ keeps the
    // numerator positive for planes up to 64×64, so bin < 256. This is
    // the per-document hot loop of q117 (~nTheta votes per dark pixel)
    // — a boxed HashMap here costs an alloc + hash per vote.
    val nBins = 256
    val votes = new Array[Int](nTheta * nBins)
    var y = 0
    while (y < img.h) {
      var x = 0
      while (x < img.w) {
        if (img(x, y) < darkerThan) {
          var t = 0
          while (t < nTheta) {
            val bin = (x * cosQ(t) + y * sinQ(t) + OffsetQ) / Scale
            votes(t * nBins + bin) += 1
            t += 1
          }
        }
        x += 1
      }
      y += 1
    }
    val angles = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < votes.length) {
      if (votes(i) >= voteThreshold) angles += (i / nBins) + ThetaMinDeg - 90
      i += 1
    }
    if (angles.isEmpty) (0.0, 0L)
    else {
      val a = angles.sorted
      val n = a.length
      val med =
        if (n % 2 == 1) a(n / 2).toDouble
        else (a(n / 2 - 1) + a(n / 2)) / 2.0
      (med, n.toLong)
    }
  }

  // ---- Perceptual hashes (image near-dup dedup) --------------------
  // The downsample-then-compare fingerprints a LAION/DataComp-style
  // multimodal corpus build dedups images with (Krawetz's aHash/dHash).
  // The reference pipeline has no image dedup stage at all — every
  // submitted image is loaded and OCR'd unconditionally
  // (`src/workers/ocr_worker.py:118-190`, no content hash anywhere in
  // its tree) — so these extend the curation surface the same way
  // MinHash (q28/q29) extends text dedup. All arithmetic is exact integer math so a SQL
  // oracle can replay every bit.

  /** Block-sum downsample: partition the plane into a `gw`×`gh` grid
    * (frame dimensions must divide evenly) and return each cell's
    * pixel-value sum, row-major. Keeping SUMS (not means) avoids a
    * division that engines could round differently — every comparison
    * downstream is between same-size cells, so the scale factor
    * cancels. */
  def cellSums(img: Gray, gw: Int, gh: Int): Array[Int] = {
    require(img.w % gw == 0 && img.h % gh == 0,
      s"grid ${gw}x$gh must tile frame ${img.w}x${img.h}")
    val bw = img.w / gw
    val bh = img.h / gh
    Array.tabulate(gw * gh) { c =>
      val x0 = (c % gw) * bw
      val y0 = (c / gw) * bh
      var s = 0
      var dy = 0
      while (dy < bh) {
        var dx = 0
        while (dx < bw) { s += img(x0 + dx, y0 + dy); dx += 1 }
        dy += 1
      }
      s
    }
  }

  /** 63-bit DIFFERENCE hash over a 64-cell grid: bit `i` set iff
    * cell i's sum exceeds cell i+1's (row-major neighbor gradient —
    * robust to global brightness shifts because only the SIGN of the
    * local gradient survives). 63 comparisons keep the hash strictly
    * positive in a signed 64-bit lane on both engines (the q104
    * SimHash width rule). */
  def dHash63(cells: Array[Int]): Long = {
    require(cells.length == 64, s"dHash wants 64 cells, got ${cells.length}")
    var h = 0L
    var i = 0
    while (i < 63) {
      if (cells(i) > cells(i + 1)) h |= 1L << i
      i += 1
    }
    h
  }

  /** 63-bit AVERAGE hash: bit `i` set iff cell i is brighter than the
    * frame mean — `cells(i) * 64 > total` in exact integer cross-
    * multiplication (no division, no rounding channel). */
  def aHash63(cells: Array[Int]): Long = {
    require(cells.length == 64, s"aHash wants 64 cells, got ${cells.length}")
    var total = 0L
    var i = 0
    while (i < 64) { total += cells(i); i += 1 }
    var h = 0L
    i = 0
    while (i < 63) {
      if (cells(i).toLong * 64 > total) h |= 1L << i
      i += 1
    }
    h
  }

  /** PRODUCTION-WIDTH difference hash over a 256-cell (16×16) grid:
    * the same neighbor-gradient-sign rule as [[dHash63]], widened to
    * 252 comparisons (cells g vs g+1 for g in 0..251) packed into FOUR
    * 63-bit lanes — lane l holds comparisons 63l..63l+62 in its low
    * bits. Each lane stays strictly positive in a signed 64-bit word
    * (the q104 width rule), so both engines' BIGINT arithmetic and the
    * DuckDB `2**i` oracle chains are exact. Brightness-shift invariance
    * is inherited bit-for-bit from the narrow form (only the SIGN of
    * the local gradient survives). Comparisons 252..254 are dropped —
    * 252 = 4·63 keeps the lane layout uniform. */
  def dHashWide(cells: Array[Int]): Array[Long] = {
    require(cells.length == 256,
      s"dHashWide wants 256 cells, got ${cells.length}")
    val lanes = new Array[Long](4)
    var g = 0
    while (g < 252) {
      if (cells(g) > cells(g + 1)) lanes(g / 63) |= 1L << (g % 63)
      g += 1
    }
    lanes
  }
}
