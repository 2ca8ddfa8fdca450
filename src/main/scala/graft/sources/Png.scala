package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal PNG codec — pure JDK (`java.util.zip`), no imaging
  * libraries. Scope: 8-bit RGBA (color type 6), non-interlaced; the
  * encoder emits filter-0 scanlines, the decoder handles all five
  * standard filters. Backs the A11 CZML image embedding
  * (`calc/gdal_to_czml.py:19-78` renders a PNG and base64-embeds it)
  * and the multimodal image-decode path.
  */
object Png {

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** Encode ARGB ints (row-major, w×h) → PNG bytes. */
  def encode(w: Int, h: Int, argb: Array[Int]): Array[Byte] = {
    require(argb.length == w * h, s"expected ${w * h} pixels, got ${argb.length}")
    val raw = new Array[Byte](h * (1 + w * 4)) // filter byte + RGBA per row
    for (y <- 0 until h) {
      raw(y * (1 + w * 4)) = 0 // filter type 0 (None)
      for (x <- 0 until w) {
        val p = argb(y * w + x)
        val off = y * (1 + w * 4) + 1 + x * 4
        raw(off) = ((p >> 16) & 0xff).toByte     // R
        raw(off + 1) = ((p >> 8) & 0xff).toByte  // G
        raw(off + 2) = (p & 0xff).toByte         // B
        raw(off + 3) = ((p >>> 24) & 0xff).toByte // A
      }
    }
    val out = new ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = new ByteArrayOutputStream()
    writeInt(ihdr, w); writeInt(ihdr, h)
    ihdr.write(8); ihdr.write(6); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    writeChunk(out, "IHDR", ihdr.toByteArray)
    writeChunk(out, "IDAT", deflate(raw))
    writeChunk(out, "IEND", Array.empty)
    out.toByteArray
  }

  /** Decode PNG bytes → (w, h, ARGB ints). Validates the subset the
    * encoder produces plus all scanline filters.
    */
  def decode(png: Array[Byte]): (Int, Int, Array[Int]) = {
    require(png.length > 8 && png.take(8).sameElements(Signature), "not a PNG")
    var pos = 8
    var w = 0; var h = 0
    val idat = new ByteArrayOutputStream()
    var done = false
    while (!done && pos + 8 <= png.length) {
      val len = readInt(png, pos)
      // a corrupt length would otherwise drive copyOfRange into a
      // multi-GB zero-padded allocation (it pads past the source end)
      require(len >= 0 && pos + 8 + len.toLong + 4 <= png.length,
        s"PNG chunk overruns file (len=$len at $pos)")
      val typ = new String(png, pos + 4, 4, "ASCII")
      val data = java.util.Arrays.copyOfRange(png, pos + 8, pos + 8 + len)
      typ match {
        case "IHDR" =>
          require(data.length >= 13, "IHDR chunk too short")
          w = readInt(data, 0); h = readInt(data, 4)
          // cap implausible dims before any w*h-derived allocation
          // (2²⁶ px = 256 MB ARGB — far above any engine-embedded use)
          require(w > 0 && h > 0 && w.toLong * h <= (1L << 26),
            s"implausible PNG dimensions ${w}x$h")
          require(data(8) == 8 && data(9) == 6, "only 8-bit RGBA supported")
          require(data(12) == 0, "interlaced PNG not supported")
        case "IDAT" => idat.write(data)
        case "IEND" => done = true
        case _ => () // ancillary chunks ignored
      }
      pos += 8 + len + 4 // length + type + data + crc
    }
    require(done && w > 0, "PNG ends before IHDR/IEND")
    val raw = inflate(idat.toByteArray, h * (1 + w * 4))
    val stride = w * 4
    val cur = new Array[Byte](stride)
    val prev = new Array[Byte](stride)
    val outPix = new Array[Int](w * h)
    for (y <- 0 until h) {
      val filter = raw(y * (1 + stride)) & 0xff
      System.arraycopy(raw, y * (1 + stride) + 1, cur, 0, stride)
      unfilter(filter, cur, prev, bpp = 4)
      for (x <- 0 until w) {
        val o = x * 4
        outPix(y * w + x) =
          ((cur(o + 3) & 0xff) << 24) | ((cur(o) & 0xff) << 16) |
            ((cur(o + 1) & 0xff) << 8) | (cur(o + 2) & 0xff)
      }
      System.arraycopy(cur, 0, prev, 0, stride)
    }
    (w, h, outPix)
  }

  private def unfilter(filter: Int, cur: Array[Byte], prev: Array[Byte], bpp: Int): Unit = {
    def a(i: Int) = if (i >= bpp) cur(i - bpp) & 0xff else 0
    def b(i: Int) = prev(i) & 0xff
    def c(i: Int) = if (i >= bpp) prev(i - bpp) & 0xff else 0
    filter match {
      case 0 => ()
      case 1 => for (i <- cur.indices) cur(i) = ((cur(i) & 0xff) + a(i)).toByte
      case 2 => for (i <- cur.indices) cur(i) = ((cur(i) & 0xff) + b(i)).toByte
      case 3 => for (i <- cur.indices) cur(i) = ((cur(i) & 0xff) + (a(i) + b(i)) / 2).toByte
      case 4 => for (i <- cur.indices) {
        val p = a(i) + b(i) - c(i)
        val pa = math.abs(p - a(i)); val pb = math.abs(p - b(i)); val pc = math.abs(p - c(i))
        val pred = if (pa <= pb && pa <= pc) a(i) else if (pb <= pc) b(i) else c(i)
        cur(i) = ((cur(i) & 0xff) + pred).toByte
      }
      case other => throw new IllegalArgumentException(s"unknown PNG filter $other")
    }
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var off = 0
    while (off < expected && !inf.finished()) {
      val n =
        try inf.inflate(out, off, expected - off)
        catch { case e: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException(s"corrupt deflate stream: ${e.getMessage}") }
      // zero progress + input exhausted = truncated/corrupt stream;
      // fail instead of spinning forever inside an executor task
      require(n > 0 || !(inf.needsInput() || inf.needsDictionary()),
        s"truncated deflate stream: $off of $expected")
      off += n
    }
    inf.end()
    require(off == expected, s"short inflate: $off of $expected")
    out
  }

  private def writeChunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    writeInt(out, data.length)
    val typeBytes = typ.getBytes("ASCII")
    out.write(typeBytes); out.write(data)
    val crc = new CRC32()
    crc.update(typeBytes); crc.update(data)
    writeInt(out, crc.getValue.toInt)
  }

  private def writeInt(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  private def readInt(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xff) << 24) | ((a(off + 1) & 0xff) << 16) |
      ((a(off + 2) & 0xff) << 8) | (a(off + 3) & 0xff)
}
