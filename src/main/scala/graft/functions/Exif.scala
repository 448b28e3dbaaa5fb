package graft.functions

/** F12 head: EXIF orientation — the part of the reference's
  * `auto_rotate` that needs no codec at all
  * (`/root/reference/src/preprocessing/image_processor.py:84-94`: read
  * orientation tag 274 from `image._getexif()`, rotate 180/−90/90 for
  * values 3/6/8). EXIF is a TIFF byte structure, so this is pure byte
  * arithmetic — the RIFF-walk pattern [[WavCodec]] already uses:
  * byte-order mark (`II`/`MM`), magic 42, IFD0 walk over 12-byte
  * entries, inline SHORT value. A leading `Exif\0\0` marker (the JPEG
  * APP1 payload framing) is skipped when present. Malformed or
  * truncated input degrades to orientation 1 (normal), mirroring the
  * reference's bare `except: pass`.
  */
object Exif {

  val OrientationTag = 274 // 0x0112
  val WidthTag = 256 // 0x0100 ImageWidth
  val HeightTag = 257 // 0x0101 ImageLength

  /** Orientation → rotation degrees, exactly the reference's mapping
    * (`image_processor.py:88-94`): 3 → 180, 6 → −90, 8 → 90, else 0. */
  def rotationDegrees(orientation: Int): Int = orientation match {
    case 3 => 180
    case 6 => -90
    case 8 => 90
    case _ => 0
  }

  private def u16(b: Array[Byte], off: Int, le: Boolean): Int =
    if (le) (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def u32(b: Array[Byte], off: Int, le: Boolean): Long =
    if (le)
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    else
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** Value of a SHORT-typed, count-1 IFD0 tag, or None when the tag is
    * absent or the structure is malformed/truncated. */
  def shortTag(bytes: Array[Byte], tag: Int): Option[Int] = {
    val base =
      if (bytes.length >= 6 && bytes(0) == 'E' && bytes(1) == 'x' &&
        bytes(2) == 'i' && bytes(3) == 'f' && bytes(4) == 0 &&
        bytes(5) == 0) 6
      else 0
    if (bytes.length < base + 8) return None
    val le = bytes(base) == 'I' && bytes(base + 1) == 'I'
    val be = bytes(base) == 'M' && bytes(base + 1) == 'M'
    if (!le && !be) return None
    if (u16(bytes, base + 2, le) != 42) return None
    val ifdOff = u32(bytes, base + 4, le)
    if (ifdOff < 0 || base + ifdOff + 2 > bytes.length) return None
    val ifd = base + ifdOff.toInt
    val n = u16(bytes, ifd, le)
    var i = 0
    while (i < n) {
      val e = ifd + 2 + 12 * i
      if (e + 12 > bytes.length) return None
      if (u16(bytes, e, le) == tag) {
        // type 3 = SHORT, count 1 → value inline in the first 2 bytes
        // of the 4-byte value field
        return if (u16(bytes, e + 2, le) == 3 && u32(bytes, e + 4, le) == 1L)
          Some(u16(bytes, e + 8, le))
        else None
      }
      i += 1
    }
    None
  }

  /** EXIF orientation (1-8), defaulting to 1 like the reference when
    * the tag or the whole structure is missing. */
  def orientation(bytes: Array[Byte]): Int =
    shortTag(bytes, OrientationTag).getOrElse(1)

  /** Minimal well-formed TIFF fixture: header + IFD0 with SHORT entries
    * for width (256), height (257) and orientation (274), ascending tag
    * order per the TIFF spec, inline values, zero next-IFD pointer.
    * Used by the typed spec and the q116 synthesizer. */
  def writeTiff(orientationV: Int, width: Int, height: Int,
      littleEndian: Boolean, exifPrefix: Boolean = false): Array[Byte] = {
    val entries = Seq((WidthTag, width), (HeightTag, height),
      (OrientationTag, orientationV))
    val base = if (exifPrefix) 6 else 0
    val out = new Array[Byte](base + 8 + 2 + entries.size * 12 + 4)
    def p16(off: Int, v: Int): Unit =
      if (littleEndian) {
        out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      } else {
        out(off) = ((v >> 8) & 0xff).toByte; out(off + 1) = (v & 0xff).toByte
      }
    def p32(off: Int, v: Long): Unit =
      if (littleEndian) {
        out(off) = (v & 0xff).toByte
        out(off + 1) = ((v >> 8) & 0xff).toByte
        out(off + 2) = ((v >> 16) & 0xff).toByte
        out(off + 3) = ((v >> 24) & 0xff).toByte
      } else {
        out(off) = ((v >> 24) & 0xff).toByte
        out(off + 1) = ((v >> 16) & 0xff).toByte
        out(off + 2) = ((v >> 8) & 0xff).toByte
        out(off + 3) = (v & 0xff).toByte
      }
    if (exifPrefix) {
      out(0) = 'E'; out(1) = 'x'; out(2) = 'i'; out(3) = 'f'
      out(4) = 0; out(5) = 0
    }
    val bom: Byte = if (littleEndian) 'I' else 'M'
    out(base) = bom; out(base + 1) = bom
    p16(base + 2, 42)
    p32(base + 4, 8L) // IFD0 immediately after the header
    val ifd = base + 8
    p16(ifd, entries.size)
    entries.zipWithIndex.foreach { case ((tag, v), i) =>
      val e = ifd + 2 + 12 * i
      p16(e, tag)
      p16(e + 2, 3) // SHORT
      p32(e + 4, 1L) // count
      p16(e + 8, v) // inline value; bytes e+10..e+11 stay zero
    }
    p32(ifd + 2 + entries.size * 12, 0L) // no IFD1
    out
  }
}
