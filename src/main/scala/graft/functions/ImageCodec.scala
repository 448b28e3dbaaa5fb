package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** S9: REAL image decode/encode on pure-JDK `javax.imageio` — no native
  * dependency, headless-safe. Closes the last stubbed §2 operator: the
  * reference decodes uploaded bytes with `cv2.imdecode`
  * (`src/ocr/service.py:447-464`); we decode PNG / BMP / GIF / JPEG /
  * TIFF with the JDK's built-in readers and hand the gray plane to the
  * existing pure-Scala kernels ([[ImageOps]]: binarize, morphology,
  * CLAHE, Hough, crop).
  *
  * Losslessness contract (pinned by ImageCodecSpec): for an 8-bit gray
  * plane, encode→decode is the IDENTITY for png/bmp/gif (png writes
  * 8-bit grayscale; bmp/gif write 256-entry gray palettes — all exact).
  * JPEG decodes for real but is lossy by design, so it is covered by
  * dimension/plausibility tests, never by a pixel-identity oracle.
  *
  * Scale note (100 TB): codec work is per-row CPU inside a
  * `mapPartitions` seam — embarrassingly parallel, no shuffle; the
  * expensive part at cluster scale is the scan of the binary column,
  * which stays pruned to the payload rows that request decoding.
  */
object ImageCodec {

  // ImageIO on a server JVM: no display required for raster codecs.
  System.setProperty("java.awt.headless", "true")
  // Skip the on-disk cache for ImageInputStream (pure in-memory byte work).
  ImageIO.setUseCache(false)

  /** Encode a gray plane via the JDK writer. `format`: "png" | "bmp" |
    * "gif" (lossless for 8-bit gray) | "jpg" (lossy). */
  def encode(img: ImageOps.Gray, format: String): Array[Byte] = {
    val buf = new BufferedImage(img.w, img.h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = buf.getRaster
    var y = 0
    while (y < img.h) {
      var x = 0
      while (x < img.w) {
        raster.setSample(x, y, 0, img(x, y))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    val writers = ImageIO.getImageWritersByFormatName(format)
    if (!writers.hasNext)
      throw new IllegalArgumentException(s"no JDK writer for format: $format")
    val writer = writers.next()
    try {
      // The JDK GIF writer interlaces by DEFAULT, and the JDK reader
      // de-interlaces small heights (<8 rows) incorrectly — rows come
      // back permuted (found by PixelKernelFuzzSpec at 28×4). Force
      // sequential row order; identical for png/bmp, corrective for gif.
      val param = writer.getDefaultWriteParam
      if (param.canWriteProgressive)
        param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      val ios = ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(buf, null, null), param)
      } finally ios.close()
    } finally writer.dispose()
    bos.toByteArray
  }

  /** Encode a SEQUENCE of gray planes as one animated GIF container —
    * the real multi-frame container the video leg decodes (GIF is the
    * one animation format the pure JDK writes; each frame lands as a
    * full-size 256-entry gray-palette image, so the round trip is the
    * identity per frame, same as the still-GIF contract). */
  def encodeGifFrames(frames: Seq[ImageOps.Gray]): Array[Byte] = {
    require(frames.nonEmpty, "encodeGifFrames wants at least one frame")
    val writers = ImageIO.getImageWritersByFormatName("gif")
    if (!writers.hasNext)
      throw new IllegalArgumentException("no JDK gif writer")
    val writer = writers.next()
    val bos = new ByteArrayOutputStream()
    try {
      val param = writer.getDefaultWriteParam
      if (param.canWriteProgressive)
        param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      val ios = ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        frames.foreach { f =>
          val buf = new BufferedImage(f.w, f.h, BufferedImage.TYPE_BYTE_GRAY)
          val raster = buf.getRaster
          var y = 0
          while (y < f.h) {
            var x = 0
            while (x < f.w) { raster.setSample(x, y, 0, f(x, y)); x += 1 }
            y += 1
          }
          writer.writeToSequence(
            new javax.imageio.IIOImage(buf, null, null), param)
        }
        writer.endWriteSequence()
      } finally ios.close()
    } finally writer.dispose()
    bos.toByteArray
  }

  /** Decode EVERY frame of a multi-frame container (animated GIF; a
    * single-frame image yields one plane). Frames are decoded
    * independently — no disposal-method composition — which is exact
    * for full-size frames like [[encodeGifFrames]]'s output; a partial-
    * frame animation would need compositing a production video decoder
    * does anyway. Nil on undecodable bytes. */
  def decodeFrames(bytes: Array[Byte]): Seq[ImageOps.Gray] = {
    if (bytes == null || bytes.length == 0) return Nil
    val iis =
      try ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (iis == null) return Nil
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Nil
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        (0 until n).flatMap { i =>
          val img = try reader.read(i) catch { case _: Exception => null }
          Option(img).map(toGray)
        }
      } finally reader.dispose()
    } catch { case _: Exception => Nil }
    finally iis.close()
  }

  /** BufferedImage → gray plane: single-band true-gray reads raw
    * samples; palette/color collapses by integer BT.601 luma (exact
    * identity when r==g==b, which is what the gray palettes decode to). */
  private def toGray(img: BufferedImage): ImageOps.Gray = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Byte](w * h)
    val raster = img.getRaster
    val singleBand = raster.getNumBands == 1 &&
      !img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel] &&
      img.getColorModel.getComponentSize(0) <= 8
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v =
          if (singleBand) raster.getSample(x, y, 0)
          else {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            (r * 299 + g * 587 + b * 114 + 500) / 1000
          }
        out(y * w + x) = v.toByte
        x += 1
      }
      y += 1
    }
    ImageOps.Gray(w, h, out)
  }

  /** Decode any JDK-readable image to a gray plane. Gray/indexed-gray
    * sources come back bit-exact (single raster band); color sources
    * collapse by integer BT.601 luma (r*299+g*587+b*114+500)/1000 —
    * which is also exact-identity when r==g==b. None on undecodable or
    * empty bytes — a deliberate DEVIATION from the reference, whose
    * `_prepare_image` RAISES ValueError when cv2.imdecode returns None
    * (`ocr/service.py:455-458`); here undecodable inputs route to the
    * DLQ-style fallback instead of failing the task. */
  def decode(bytes: Array[Byte]): Option[ImageOps.Gray] = {
    if (bytes == null || bytes.length == 0) return None
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    // gray-plane conversion: [[toGray]] — raw-sample fast path ONLY
    // for true 8-bit grayscale (an indexed-COLOR palette image also
    // has one raster band, but its samples are palette indices, not
    // intensities — those go through getRGB + luma; >8-bit gray
    // likewise, getSample would truncate to the low byte).
    Option(img).map(toGray)
  }

  /** Container sniff by magic bytes (the reference trusts the client's
    * mime type then lets cv2 sniff; we sniff directly). Returns
    * "png" | "bmp" | "gif" | "jpeg" | "tiff" | "unknown". */
  def sniffFormat(bytes: Array[Byte]): String = {
    def at(i: Int): Int = if (bytes != null && i < bytes.length) bytes(i) & 0xff else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "png"
    else if (at(0) == 'B' && at(1) == 'M') "bmp"
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') "gif"
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "jpeg"
    else if ((at(0) == 'I' && at(1) == 'I' && at(2) == 42 && at(3) == 0) ||
      (at(0) == 'M' && at(1) == 'M' && at(2) == 0 && at(3) == 42)) "tiff"
    else "unknown"
  }
}
