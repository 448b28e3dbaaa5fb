package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ImageCodec, ImageOps}
import graft.multimodal.Multimodal

/** S9 real decode: pins the losslessness contract q145's oracle rides
  * on (gray encode→decode identity for png/bmp/gif), the color-collapse
  * and JPEG paths SQL can't reach, corrupt-byte behavior, and the
  * end-to-end hand-off from DECODED planes into the existing ImageOps
  * kernels. Pure JVM — no SparkSession needed. */
class ImageCodecSpec extends AnyFunSuite {

  private def plane(w: Int, h: Int)(f: (Int, Int) => Int): ImageOps.Gray =
    ImageOps.Gray(w, h, Array.tabulate(w * h)(i => f(i % w, i / w).toByte))

  // every gray value 0..255 appears: full-range identity check
  private val fullRange = plane(32, 16)((x, y) => (y * 32 + x) % 256)

  test("png/bmp/gif: 8-bit gray encode→decode is the pixel-exact identity") {
    for (fmt <- Seq("png", "bmp", "gif")) {
      val bytes = ImageCodec.encode(fullRange, fmt)
      assert(bytes.length > 0, fmt)
      val dec = ImageCodec.decode(bytes).getOrElse(fail(s"$fmt undecodable"))
      assert(dec.w == 32 && dec.h == 16, fmt)
      assert(dec.px.sameElements(fullRange.px), s"$fmt not lossless")
    }
  }

  test("tiff: 8-bit gray round trip is lossless too (5th JDK container)") {
    val bytes = ImageCodec.encode(fullRange, "tiff")
    assert(ImageCodec.sniffFormat(bytes) == "tiff")
    val dec = ImageCodec.decode(bytes).getOrElse(fail("tiff undecodable"))
    assert(dec.w == 32 && dec.h == 16)
    assert(dec.px.sameElements(fullRange.px), "tiff not lossless")
  }

  test("magic-byte sniff identifies each container") {
    assert(ImageCodec.sniffFormat(ImageCodec.encode(fullRange, "png")) == "png")
    assert(ImageCodec.sniffFormat(ImageCodec.encode(fullRange, "bmp")) == "bmp")
    assert(ImageCodec.sniffFormat(ImageCodec.encode(fullRange, "gif")) == "gif")
    assert(ImageCodec.sniffFormat(ImageCodec.encode(fullRange, "jpg")) == "jpeg")
    assert(ImageCodec.sniffFormat(Array[Byte](1, 2, 3, 4)) == "unknown")
    assert(ImageCodec.sniffFormat(Array.empty[Byte]) == "unknown")
  }

  test("jpeg: decodes for real (dims exact, pixels near, never identical-by-assumption)") {
    val src = plane(48, 32)((x, y) => 128 + ((x + y) % 2) * 8)
    val bytes = ImageCodec.encode(src, "jpg")
    val dec = ImageCodec.decode(bytes).getOrElse(fail("jpeg undecodable"))
    assert(dec.w == 48 && dec.h == 32)
    // lossy but bounded: mean absolute error under 16 gray levels
    val mae = dec.px.zip(src.px)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.sum.toDouble / src.px.length
    assert(mae < 16.0, s"jpeg MAE $mae")
  }

  test("color input collapses by integer BT.601 luma; gray rgb is exact") {
    // build an RGB png by hand via ImageIO to exercise the 3-band path
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000) // red   -> 299*255/1000 = 76 (with +500 round: 76)
    img.setRGB(1, 0, 0x00ff00) // green -> 150
    img.setRGB(2, 0, 0x0000ff) // blue  -> 29
    img.setRGB(3, 0, 0xffffff) // white -> 255
    img.setRGB(0, 1, 0x000000)
    img.setRGB(1, 1, 0x808080) // gray rgb -> exactly 0x80
    img.setRGB(2, 1, 0x123456)
    img.setRGB(3, 1, 0x654321)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val dec = ImageCodec.decode(bos.toByteArray).getOrElse(fail("undecodable"))
    def luma(r: Int, g: Int, b: Int) = (r * 299 + g * 587 + b * 114 + 500) / 1000
    assert(dec(0, 0) == luma(255, 0, 0))
    assert(dec(1, 0) == luma(0, 255, 0))
    assert(dec(2, 0) == luma(0, 0, 255))
    assert(dec(3, 0) == 255 && dec(0, 1) == 0 && dec(1, 1) == 0x80)
    assert(dec(2, 1) == luma(0x12, 0x34, 0x56))
    assert(dec(3, 1) == luma(0x65, 0x43, 0x21))
  }

  test("indexed-COLOR palettes collapse by luma, never return raw indices") {
    // a 256-color palette image whose index 0 is pure red: the raster
    // has ONE band of palette indices — decode must emit luma(255,0,0)
    // = 76, not the index value 0
    val cmap = new Array[Int](256)
    cmap(0) = 0xffff0000 // red
    cmap(1) = 0xff00ff00 // green
    for (i <- 2 until 256) cmap(i) = 0xff000000 | (i << 16) | (i << 8) | i
    val icm = new java.awt.image.IndexColorModel(
      8, 256, cmap, 0, false, -1, java.awt.image.DataBuffer.TYPE_BYTE)
    val img = new java.awt.image.BufferedImage(
      4, 1, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    img.getRaster.setSample(0, 0, 0, 0) // red
    img.getRaster.setSample(1, 0, 0, 1) // green
    img.getRaster.setSample(2, 0, 0, 128) // gray 128
    img.getRaster.setSample(3, 0, 0, 255) // gray 255
    for (fmt <- Seq("png", "gif", "bmp")) {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), fmt)
      val dec = ImageCodec.decode(bos.toByteArray)
        .getOrElse(fail(s"$fmt undecodable"))
      assert(dec(0, 0) == (255 * 299 + 500) / 1000, s"$fmt red -> luma")
      assert(dec(1, 0) == (255 * 587 + 500) / 1000, s"$fmt green -> luma")
      assert(dec(2, 0) == 128 && dec(3, 0) == 255, s"$fmt gray entries exact")
    }
  }

  test("corrupt / truncated / empty / null bytes decode to None, never throw") {
    assert(ImageCodec.decode(null).isEmpty)
    assert(ImageCodec.decode(Array.empty[Byte]).isEmpty)
    assert(ImageCodec.decode(Array.fill[Byte](64)(0x41)).isEmpty)
    val png = ImageCodec.encode(fullRange, "png")
    // PNG magic intact but body truncated mid-IDAT
    assert(ImageCodec.decode(png.take(24)).isEmpty)
    // flipped bits in the middle
    val mangled = png.clone(); for (i <- 30 until math.min(60, mangled.length))
      mangled(i) = (~mangled(i)).toByte
    assert(ImageCodec.decode(mangled).isEmpty || ImageCodec.decode(mangled).nonEmpty)
    // ^ some decoders salvage; the contract is only "never throw"
  }

  test("decoded planes feed the existing kernels end-to-end (binarize, morph, CLAHE, hough, crop)") {
    val src = plane(32, 16)((x, y) =>
      if (y == 5 || (x > 8 && x < 20 && y > 9 && y < 13)) 40 else 255)
    val dec = ImageCodec.decode(ImageCodec.encode(src, "png"))
      .getOrElse(fail("undecodable"))
    // identity means every kernel result matches the direct path bit-for-bit
    assert(ImageOps.binarizeFixed(dec).px
      .sameElements(ImageOps.binarizeFixed(src).px))
    assert(ImageOps.open(dec, 2, 2).px.sameElements(ImageOps.open(src, 2, 2).px))
    assert(ImageOps.enhanceContrast(dec).px
      .sameElements(ImageOps.enhanceContrast(src).px))
    assert(ImageOps.houghAngle(dec) == ImageOps.houghAngle(src))
    assert(ImageOps.contentBBox(dec, 240, 2) == ImageOps.contentBBox(src, 240, 2))
    // and the hough line row is actually detected on the decoded plane
    val (_, nLines) = ImageOps.houghAngle(dec)
    assert(nLines > 0)
  }

  test("resizeImages: real decode->resize->re-encode, passthrough on junk") {
    val spark = TestSpark.spark
    import spark.implicits._
    val src = plane(32, 16)((x, y) => ((x * 8 + y * 16) % 256))
    val png = ImageCodec.encode(src, "png")
    val payloads = Seq(
      Multimodal.Payload(1L, "image", "png", png),
      Multimodal.Payload(2L, "image", "png", Array.fill[Byte](9)(3))).toDS()
    val out = Multimodal.resizeImages(payloads, 16, 8).collect()
      .map(r => r.id -> r).toMap
    val ok = out(1L)
    assert(ok.srcWidth == 32 && ok.srcHeight == 16)
    assert(ok.dstWidth == 16 && ok.dstHeight == 8 && ok.scale == 0.5)
    // the emitted bytes are a REAL png of the resized plane
    val back = ImageCodec.decode(ok.content).getOrElse(fail("not decodable"))
    assert(back.w == 16 && back.h == 8)
    assert(back.px.sameElements(ImageOps.resizeNN(src, 16, 8).px))
    // junk passes through unchanged, no throw
    val bad = out(2L)
    assert(bad.srcWidth == 0 && bad.scale == 0.0 &&
      bad.content.sameElements(Array.fill[Byte](9)(3)))
  }

  test("ImageIODecoder: real dims + pixel-hash for images, stub fallback elsewhere") {
    val src = plane(20, 10)((x, y) => (x * 12 + y * 7) % 256)
    val png = ImageCodec.encode(src, "png")
    val bmp = ImageCodec.encode(src, "bmp")
    val dec = new Multimodal.ImageIODecoder
    val fPng = dec.decode(Multimodal.Payload(1L, "image", "png", png))
    val fBmp = dec.decode(Multimodal.Payload(2L, "image", "bmp", bmp))
    assert(fPng.width == 20 && fPng.height == 10 && fPng.nFrames == 1)
    // hash is over DECODED pixels: two containers of the same image agree
    assert(fPng.contentHash == fBmp.contentHash)
    assert(fPng.embedding.sameElements(fBmp.embedding))
    // histogram embedding sums to ~ n/n - 8*0.5 = 1 - 4 = -3
    assert(math.abs(fPng.embedding.sum - (1.0f - 4.0f)) < 1e-4)
    // undecodable image bytes and non-image modalities fall back to stub
    val stub = new Multimodal.StubDecoder
    def same(a: Multimodal.Features, b: Multimodal.Features): Boolean =
      (a.id, a.modality, a.byteLength, a.width, a.height, a.nFrames, a.contentHash) ==
        (b.id, b.modality, b.byteLength, b.width, b.height, b.nFrames, b.contentHash) &&
        a.embedding.sameElements(b.embedding)
    val junk = Multimodal.Payload(3L, "image", "png", Array.fill[Byte](16)(7))
    assert(same(dec.decode(junk), stub.decode(junk)))
    val vid = Multimodal.Payload(4L, "video", "mp4", png)
    assert(same(dec.decode(vid), stub.decode(vid)))
  }
}
