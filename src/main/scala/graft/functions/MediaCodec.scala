package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Pure-JVM media codecs as native Catalyst expressions — the r6 VERDICT
  * ask that retires the multimodal decode STUB: WAV/RIFF-PCM and
  * BI_RGB BMP are plain byte arithmetic, so the container build and the
  * parse both run inside whole-stage codegen (one static call per row,
  * no UDF, no native lib, no egress). The audio/vision feature operators
  * ([[graft.mm.Multimodal.audioEnergy]] / `vadSegments` / `sceneCuts` /
  * `decodeFeatures`) consume TRUE decoded PCM samples and luma pixels
  * instead of raw container bytes.
  *
  * Every function is TOTAL and deterministic: encoders produce a valid
  * container for any payload, decoders return an EMPTY array on any
  * malformed input (wrong magic, truncated chunk, unsupported
  * format/bpp/compression) rather than null or an exception — the
  * SQL-friendly "no rows decoded" value, and what keeps `defineCodeGen`
  * applicable (non-null in ⇒ non-null out).
  *
  * Encoding conventions (the fixture side — deterministic from a text
  * payload so the DuckDB oracle can re-derive every decoded value from
  * first principles WITHOUT parsing a container, which makes the
  * hash-compare a genuine round-trip proof of the parser):
  *  - WAV: RIFF/WAVE, fmt 16-byte PCM header (format 1, mono, 8 kHz,
  *    16-bit), one data chunk; sample_i = (payload[i] − 128) · 256,
  *    little-endian.
  *  - BMP: 14-byte file header + 40-byte BITMAPINFOHEADER (24 bpp,
  *    BI_RGB, bottom-up), pixel j = (B,G,R) = payload[3j..3j+2]
  *    (zero-padded past the payload), row-major top-down pixel order,
  *    rows written bottom-up with 4-byte stride alignment — the real
  *    BMP layout, so the decoder must undo BOTH the row flip and the
  *    padding to round-trip.
  */
object MediaCodec {

  val WavSampleRate = 8000

  private def wle16(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte
    out(off + 1) = ((v >>> 8) & 0xff).toByte
  }

  private def wle32(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte
    out(off + 1) = ((v >>> 8) & 0xff).toByte
    out(off + 2) = ((v >>> 16) & 0xff).toByte
    out(off + 3) = ((v >>> 24) & 0xff).toByte
  }

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def tag4(b: Array[Byte], off: Int, s: String): Boolean =
    b(off) == s.charAt(0).toByte && b(off + 1) == s.charAt(1).toByte &&
      b(off + 2) == s.charAt(2).toByte && b(off + 3) == s.charAt(3).toByte

  /** Real RIFF/WAVE PCM16 mono container around the payload-derived
    * samples. 44 + 2·len bytes. */
  def wavEncode(payload: Array[Byte]): Array[Byte] = {
    val n = payload.length
    // same Long-guard posture as bmpEncode: a >1 GiB payload would wrap
    // n*2 negative and throw instead of honoring the total contract
    if (44L + 2L * n > Int.MaxValue) return Array.emptyByteArray
    val dataSize = n * 2
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    wle32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    wle32(out, 16, 16)               // fmt chunk size
    wle16(out, 20, 1)                // PCM
    wle16(out, 22, 1)                // mono
    wle32(out, 24, WavSampleRate)
    wle32(out, 28, WavSampleRate * 2) // byte rate
    wle16(out, 32, 2)                // block align
    wle16(out, 34, 16)               // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    wle32(out, 40, dataSize)
    var i = 0
    while (i < n) {
      wle16(out, 44 + i * 2, (((payload(i) & 0xff) - 128) * 256) & 0xffff)
      i += 1
    }
    out
  }

  /** Real RIFF parser: validate magics, WALK the chunk list (word-
    * aligned, arbitrary chunk order and count) to the PCM16-mono fmt and
    * the data chunk, sign-extend the little-endian samples. Empty array
    * on anything malformed or unsupported. */
  def wavSamples(content: Array[Byte]): Array[Int] = {
    if (content.length < 12 || !tag4(content, 0, "RIFF") ||
        !tag4(content, 8, "WAVE")) return Array.emptyIntArray
    var off = 12
    var fmtOk = false
    var dataOff = -1
    var dataLen = 0
    while (off + 8 <= content.length) {
      val sz = le32(content, off + 4)
      // Long arithmetic: a crafted ~2^31 chunk size must resolve to
      // "malformed → empty", not wrap negative past the bound check and
      // index out of range (the decoder runs over untrusted binary)
      if (sz < 0 || off.toLong + 8L + sz > content.length)
        return Array.emptyIntArray
      if (tag4(content, off, "fmt ") && sz >= 16)
        fmtOk = le16(content, off + 8) == 1 &&   // PCM
          le16(content, off + 10) == 1 &&         // mono
          le16(content, off + 22) == 16           // 16-bit
      else if (tag4(content, off, "data") && dataOff < 0) {
        dataOff = off + 8
        dataLen = sz
      }
      off += 8 + sz + (sz & 1) // RIFF chunks are 2-byte aligned
    }
    if (!fmtOk || dataOff < 0 || dataLen % 2 != 0) return Array.emptyIntArray
    val ns = dataLen / 2
    val res = new Array[Int](ns)
    var i = 0
    while (i < ns) {
      res(i) = (le16(content, dataOff + i * 2) << 16) >> 16 // sign-extend
      i += 1
    }
    res
  }

  /** Real 24 bpp BI_RGB bottom-up BMP around the payload-derived pixels.
    * Pixel count = max(1, ceil(len/3)) padded to full rows with black;
    * height = ceil(pixels/width); rows 4-byte aligned. */
  def bmpEncode(payload: Array[Byte], width: Int): Array[Byte] = {
    if (width <= 0) return Array.emptyByteArray
    val nPx = math.max(1, (payload.length + 2) / 3)
    val height = (nPx + width - 1) / width
    // Long sizing: bmp_encode is a registered SQL function, so width is
    // caller-controlled — a huge width must resolve to "unencodable →
    // empty", not an Int-overflowed negative allocation size
    val imgSizeL = ((width.toLong * 3 + 3) / 4) * 4 * height
    if (54L + imgSizeL > Int.MaxValue) return Array.emptyByteArray
    val rowStride = (((width.toLong * 3 + 3) / 4) * 4).toInt
    val imgSize = imgSizeL.toInt
    val out = new Array[Byte](54 + imgSize)
    out(0) = 'B'; out(1) = 'M'
    wle32(out, 2, 54 + imgSize)
    wle32(out, 10, 54)               // pixel-array offset
    wle32(out, 14, 40)               // BITMAPINFOHEADER
    wle32(out, 18, width)
    wle32(out, 22, height)           // positive = bottom-up
    wle16(out, 26, 1)                // planes
    wle16(out, 28, 24)               // bpp
    wle32(out, 30, 0)                // BI_RGB
    wle32(out, 34, imgSize)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val p = y * width + x
        val base = 54 + (height - 1 - y) * rowStride + x * 3
        def pb(i: Int): Byte =
          if (i < payload.length) payload(i) else 0
        out(base) = pb(3 * p)         // B
        out(base + 1) = pb(3 * p + 1) // G
        out(base + 2) = pb(3 * p + 2) // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Real BMP parser → integer luma plane in row-major TOP-DOWN order
    * (undoing the bottom-up file layout and the row padding). Luma is
    * the Rec.709 integer form (2126·R + 7152·G + 722·B) / 10000 —
    * division exact-integer so the value is engine-portable. Empty
    * array on malformed/unsupported input. */
  def bmpLuma(content: Array[Byte]): Array[Int] = {
    if (content.length < 54 || content(0) != 'B'.toByte ||
        content(1) != 'M'.toByte) return Array.emptyIntArray
    val offBits = le32(content, 10)
    val hdrSize = le32(content, 14)
    val width = le32(content, 18)
    val height = le32(content, 22)
    if (hdrSize < 40 || width <= 0 || height <= 0 ||
        le16(content, 26) != 1 ||     // planes
        le16(content, 28) != 24 ||    // bpp
        le32(content, 30) != 0)       // BI_RGB only
      return Array.emptyIntArray
    // stride in LONG: a crafted width near 2^30 overflows width*3 in Int,
    // turning the stride negative and defeating the size guard below —
    // the path to a multi-GB allocation or negative-offset read on
    // untrusted binary
    val rowStrideL = ((width.toLong * 3 + 3) / 4) * 4
    if (offBits < 54 || width.toLong * height > Int.MaxValue ||
        offBits.toLong + rowStrideL * height > content.length)
      return Array.emptyIntArray
    val rowStride = rowStrideL.toInt // ≤ content.length after the guard
    val res = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val rowOff = offBits + (height - 1 - y) * rowStride
      var x = 0
      while (x < width) {
        val b = content(rowOff + x * 3) & 0xff
        val g = content(rowOff + x * 3 + 1) & 0xff
        val r = content(rowOff + x * 3 + 2) & 0xff
        res(y * width + x) = (2126 * r + 7152 * g + 722 * b) / 10000
        x += 1
      }
      y += 1
    }
    res
  }

  // ---------------------------------------------------------------- PNG

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def wbe32(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = ((v >>> 24) & 0xff).toByte
    out(off + 1) = ((v >>> 16) & 0xff).toByte
    out(off + 2) = ((v >>> 8) & 0xff).toByte
    out(off + 3) = (v & 0xff).toByte
  }

  /** The PNG Paeth predictor (RFC 2083 §6.6), shared by encode filter
    * and decode reconstruction so the two stay inverse by construction. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Real PNG: signature + IHDR (8-bit truecolor RGB, no interlace) +
    * one zlib-deflated IDAT + IEND, CRC32 on every chunk. Pixel j =
    * payload[3j..3j+2] as (R, G, B), zero-padded to W·H, row-major
    * TOP-DOWN (PNG native order). Row y is written with filter type
    * y % 5 — every PNG filter (None/Sub/Up/Average/Paeth) appears in
    * any image of ≥ 5 rows, so a luma round-trip through [[pngLuma]]
    * proves the WHOLE unfilter matrix, not just the trivial row. */
  def pngEncode(payload: Array[Byte], width: Int): Array[Byte] = {
    if (width <= 0) return Array.emptyByteArray
    val nPx = math.max(1, (payload.length + 2) / 3)
    val height = (nPx + width - 1) / width
    val rowBytesL = 3L * width
    val rawL = height.toLong * (1L + rowBytesL)
    // Long guard (the wavEncode/bmpEncode posture): width is
    // caller-controlled SQL input — unencodable sizes → empty, never a
    // wrapped negative allocation
    if (rawL > Int.MaxValue - 4096) return Array.emptyByteArray
    val rowBytes = rowBytesL.toInt
    // unfiltered plane, top-down
    val plane = new Array[Byte](height * rowBytes)
    var i = 0
    val lim = math.min(payload.length, plane.length)
    while (i < lim) { plane(i) = payload(i); i += 1 }
    // filtered scanlines: 1 filter byte + filtered row bytes per row
    val raw = new Array[Byte](rawL.toInt)
    var y = 0
    while (y < height) {
      val f = y % 5
      val ro = y * (rowBytes + 1)
      raw(ro) = f.toByte
      var x = 0
      while (x < rowBytes) {
        val v = plane(y * rowBytes + x) & 0xff
        val a = if (x >= 3) plane(y * rowBytes + x - 3) & 0xff else 0
        val b = if (y > 0) plane((y - 1) * rowBytes + x) & 0xff else 0
        val c = if (y > 0 && x >= 3) plane((y - 1) * rowBytes + x - 3) & 0xff else 0
        val filt = f match {
          case 0 => v
          case 1 => v - a
          case 2 => v - b
          case 3 => v - ((a + b) >> 1)
          case 4 => v - paeth(a, b, c)
        }
        raw(ro + 1 + x) = (filt & 0xff).toByte
        x += 1
      }
      y += 1
    }
    // zlib stream (deflate + adler32 — what IDAT carries)
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val buf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) buf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val idat = buf.toByteArray
    val totalL = 8L + (12L + 13L) + (12L + idat.length) + 12L
    if (totalL > Int.MaxValue) return Array.emptyByteArray
    val out = new Array[Byte](totalL.toInt)
    System.arraycopy(PngSig, 0, out, 0, 8)
    var off = 8
    def chunk(tag: String, data: Array[Byte]): Unit = {
      wbe32(out, off, data.length)
      var k = 0
      while (k < 4) { out(off + 4 + k) = tag.charAt(k).toByte; k += 1 }
      System.arraycopy(data, 0, out, off + 8, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(out, off + 4, 4 + data.length)
      wbe32(out, off + 8 + data.length, crc.getValue.toInt)
      off += 12 + data.length
    }
    val ihdr = new Array[Byte](13)
    wbe32(ihdr, 0, width); wbe32(ihdr, 4, height)
    ihdr(8) = 8    // bit depth
    ihdr(9) = 2    // color type: truecolor RGB
    // compression 0, filter 0, interlace 0 already zero
    chunk("IHDR", ihdr)
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out
  }

  /** Real PNG parser → integer luma plane, row-major top-down (PNG's
    * native order — the work here is the FILTER matrix, not a flip):
    * validate the signature, walk the chunk list verifying each CRC32,
    * require an 8-bit non-interlaced gray (0) or RGB (2) IHDR,
    * concatenate the IDAT stream, inflate it to EXACTLY the expected
    * scanline bytes, reconstruct every row through the
    * None/Sub/Up/Average/Paeth inverse, then fold RGB to the same
    * Rec.709 integer luma as [[bmpLuma]]. Empty array on anything
    * malformed: bad magic/CRC, unsupported depth/color/interlace, a
    * filter byte > 4, an inflate error, or a stream that is shorter or
    * longer than the plane the header promises. All size arithmetic in
    * Long — width/height are untrusted u32s, and the inflate target is
    * allocated from the HEADER (never the stream), so a deflate bomb
    * caps out at the header-promised plane or dies on the guard. */
  def pngLuma(content: Array[Byte]): Array[Int] = {
    if (content.length < 8) return Array.emptyIntArray
    var k = 0
    while (k < 8) {
      if (content(k) != PngSig(k)) return Array.emptyIntArray
      k += 1
    }
    var off = 8
    var w = -1; var h = -1; var colorType = -1
    var headerOk = false; var sawEnd = false
    val idat = new java.io.ByteArrayOutputStream()
    while (off + 12 <= content.length && !sawEnd) {
      val len = be32(content, off)
      // Long bound: a crafted ~2^31 length must resolve to malformed,
      // not wrap past the check into an out-of-range read
      if (len < 0 || off.toLong + 12L + len > content.length)
        return Array.emptyIntArray
      val crc = new java.util.zip.CRC32()
      crc.update(content, off + 4, 4 + len)
      if (crc.getValue.toInt != be32(content, off + 8 + len))
        return Array.emptyIntArray
      if (tag4(content, off + 4, "IHDR")) {
        if (len != 13 || headerOk) return Array.emptyIntArray
        w = be32(content, off + 8); h = be32(content, off + 12)
        colorType = content(off + 17) & 0xff
        if (w <= 0 || h <= 0 || (content(off + 16) & 0xff) != 8 ||
            (colorType != 0 && colorType != 2) ||
            content(off + 18) != 0 || content(off + 19) != 0 ||
            content(off + 20) != 0) return Array.emptyIntArray
        headerOk = true
      } else if (tag4(content, off + 4, "IDAT")) {
        if (!headerOk) return Array.emptyIntArray
        idat.write(content, off + 8, len)
      } else if (tag4(content, off + 4, "IEND")) {
        if (len != 0) return Array.emptyIntArray
        sawEnd = true
      }
      off += 12 + len
    }
    if (!headerOk || !sawEnd) return Array.emptyIntArray
    val bpp = if (colorType == 2) 3 else 1
    if (w.toLong * h > Int.MaxValue) return Array.emptyIntArray
    val rowBytesL = w.toLong * bpp
    val rawL = h.toLong * (1L + rowBytesL)
    if (rawL > Int.MaxValue - 8) return Array.emptyIntArray
    // deflate-bomb guard: deflate expands at most ~1032:1, so a
    // header-promised plane beyond that ratio of the compressed IDAT
    // bytes can never be filled — refuse BEFORE allocating it. Without
    // this a few-hundred-byte crafted PNG with a large-but-in-bounds
    // IHDR forces a ~2 GiB allocation (overflow was guarded; memory
    // amplification was not). Additive slack covers tiny planes whose
    // fixed stream framing dominates the ratio.
    if (rawL > idat.size().toLong * 1032L + 1024L) return Array.emptyIntArray
    val raw = new Array[Byte](rawL.toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var total = 0
    try {
      var stalled = false
      while (total < raw.length && !inf.finished() && !stalled) {
        val n = inf.inflate(raw, total, raw.length - total)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) stalled = true
        total += n
      }
      // exact-plane contract: truncated (total < expected) and oversized
      // (stream continues past the plane) streams are both malformed
      if (total < raw.length) return Array.emptyIntArray
      if (!inf.finished() && inf.inflate(new Array[Byte](1)) != 0)
        return Array.emptyIntArray
    } catch {
      case _: java.util.zip.DataFormatException => return Array.emptyIntArray
    } finally inf.end()
    val rowBytes = rowBytesL.toInt
    val res = new Array[Int](w * h)
    val prev = new Array[Byte](rowBytes)
    val cur = new Array[Byte](rowBytes)
    var y = 0
    while (y < h) {
      val ro = y * (rowBytes + 1)
      val f = raw(ro) & 0xff
      if (f > 4) return Array.emptyIntArray
      var x = 0
      while (x < rowBytes) {
        val v = raw(ro + 1 + x) & 0xff
        val a = if (x >= bpp) cur(x - bpp) & 0xff else 0
        val b = prev(x) & 0xff
        val c = if (x >= bpp) prev(x - bpp) & 0xff else 0
        val rec = f match {
          case 0 => v
          case 1 => v + a
          case 2 => v + b
          case 3 => v + ((a + b) >> 1)
          case 4 => v + paeth(a, b, c)
        }
        cur(x) = (rec & 0xff).toByte
        x += 1
      }
      var px = 0
      while (px < w) {
        res(y * w + px) =
          if (bpp == 3) {
            val r = cur(3 * px) & 0xff
            val g = cur(3 * px + 1) & 0xff
            val bl = cur(3 * px + 2) & 0xff
            (2126 * r + 7152 * g + 722 * bl) / 10000
          } else cur(px) & 0xff
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, rowBytes)
      y += 1
    }
    res
  }

  // ---------------------------------------------------------------- AVI

  /** Rows per AVI video frame — fixed so the frame geometry is a pure
    * function of (payload length, width) and the DuckDB oracle can
    * re-derive every frame boundary with no container parse. */
  val AviFrameRows = 4

  /** Real RIFF/AVI container around the payload-derived frames
    * (VERDICT r8 "Next round" #7): LIST hdrl (avih + LIST strl
    * (strh 'vids'/'DIB ' + strf BITMAPINFOHEADER)) followed by LIST movi
    * holding one uncompressed '00db' DIB frame per [[AviFrameRows]]-row
    * slab of pixels. Frame pixel layout is exactly the BMP pixel array
    * ([[bmpEncode]]): 24 bpp BI_RGB, bottom-up rows, 4-byte row
    * alignment, channel order (B, G, R) = payload bytes (3p, 3p+1,
    * 3p+2), zero-padded past the payload — so pixel p of frame f reads
    * payload bytes starting at 3·(f·width·[[AviFrameRows]] + p).
    * Same Long-guard posture as the other encoders: an unencodable
    * request returns empty rather than wrapping an Int. */
  def aviEncode(payload: Array[Byte], width: Int): Array[Byte] = {
    // the strh rcFrame right/bottom fields are u16 — a width past 0xFFFF
    // would silently truncate in that header field (decode reads geometry
    // from strf and would round-trip, but an external consumer reading
    // rcFrame would see wrong dimensions), so refuse it like the other
    // Long-guard paths refuse unencodable requests (ADVICE r9)
    if (width <= 0 || width > 0xFFFF) return Array.emptyByteArray
    val h = AviFrameRows
    val fpp = width.toLong * h                 // pixels per frame
    val nPx = math.max(1L, (payload.length + 2L) / 3L)
    val nFrames = ((nPx + fpp - 1) / fpp)
    val rowStrideL = ((width.toLong * 3 + 3) / 4) * 4
    val frameBytesL = rowStrideL * h           // multiple of 4: no pad byte
    val hdrlL = 4L + (8 + 56) + (12 + (8 + 56) + (8 + 40))
    val moviL = 4L + nFrames * (8 + frameBytesL)
    val riffL = 4L + (8 + hdrlL) + (8 + moviL)
    if (8L + riffL > Int.MaxValue) return Array.emptyByteArray
    val out = new Array[Byte]((8 + riffL).toInt)
    var o = 0
    def tag(s: String): Unit = { var i = 0; while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 }; o += 4 }
    def u32(v: Long): Unit = { wle32(out, o, v.toInt); o += 4 }
    def u16(v: Int): Unit = { wle16(out, o, v); o += 2 }
    tag("RIFF"); u32(riffL); tag("AVI ")
    tag("LIST"); u32(hdrlL); tag("hdrl")
    tag("avih"); u32(56)
    u32(40000); u32(0); u32(0); u32(0)         // usec/frame, maxbps, pad, flags
    u32(nFrames); u32(0); u32(1); u32(frameBytesL) // frames, initial, streams, bufsize
    u32(width); u32(h); u32(0); u32(0); u32(0); u32(0) // w, h, reserved[4]
    tag("LIST"); u32(12 + (8 + 56) + (8 + 40) - 8); tag("strl")
    tag("strh"); u32(56)
    tag("vids"); tag("DIB ")
    u32(0); u16(0); u16(0); u32(0)             // flags, prio, lang, initial
    u32(1); u32(25)                            // scale, rate (25 fps)
    u32(0); u32(nFrames); u32(frameBytesL); u32(0xFFFFFFFFL) // start, len, bufsize, quality
    u32(0)                                     // sample size
    u16(0); u16(0); u16(width); u16(h)         // rcFrame
    tag("strf"); u32(40)
    u32(40); u32(width); u32(h)                // biSize, biWidth, biHeight (bottom-up)
    u16(1); u16(24); u32(0)                    // planes, bpp, BI_RGB
    u32(frameBytesL); u32(0); u32(0); u32(0); u32(0)
    tag("LIST"); u32(moviL); tag("movi")
    val rowStride = rowStrideL.toInt
    var f = 0L
    while (f < nFrames) {
      tag("00db"); u32(frameBytesL)
      val base = o
      var y = 0
      while (y < h) {
        var x = 0
        while (x < width) {
          val p = f * fpp + y.toLong * width + x
          val src = 3L * p
          val rowOff = base + (h - 1 - y) * rowStride + x * 3
          def pb(i: Long): Byte =
            if (i < payload.length && i < nPx * 3) payload(i.toInt) else 0
          out(rowOff) = pb(src)                // B
          out(rowOff + 1) = pb(src + 1)        // G
          out(rowOff + 2) = pb(src + 2)        // R
          x += 1
        }
        y += 1
      }
      o = base + frameBytesL.toInt
      f += 1
    }
    out
  }

  /** Real AVI parser → one Rec.709 integer luma plane per video frame
    * (row-major TOP-DOWN, undoing the DIB bottom-up layout and row
    * padding). Walks the RIFF chunk list (arbitrary order/extras),
    * pulls frame geometry from the strf BITMAPINFOHEADER under
    * LIST hdrl → LIST strl (24 bpp BI_RGB only), then decodes every
    * '00db' chunk under LIST movi whose size matches the header-implied
    * frame size exactly; non-'00db' movi entries (e.g. interleaved
    * audio) are skipped. Null/empty on anything malformed. Memory
    * posture: unlike PNG (compressed, needs the deflate-ratio cap),
    * every allocation here is ≤ 4/3 of bytes actually present in the
    * chunk being decoded — no header-promised amplification exists. */
  def aviFrameLumas(content: Array[Byte]): Array[Array[Int]] = {
    val empty = Array.empty[Array[Int]]
    if (content.length < 12 || !tag4(content, 0, "RIFF") ||
        !tag4(content, 8, "AVI ")) return empty
    var off = 12
    var w = -1; var h = -1; var fmtOk = false
    var moviOff = -1; var moviEnd = -1
    while (off + 8 <= content.length) {
      val sz = le32(content, off + 4)
      // Long arithmetic on untrusted u32 sizes (the wavSamples posture)
      if (sz < 0 || off.toLong + 8L + sz > content.length) return empty
      if (tag4(content, off, "LIST") && sz >= 4) {
        if (tag4(content, off + 8, "hdrl")) {
          // walk hdrl children; strf may sit directly here or under a
          // nested LIST strl — both accepted
          var c = off + 12
          val end = off + 8 + sz
          while (c + 8 <= end) {
            val csz = le32(content, c + 4)
            if (csz < 0 || c.toLong + 8L + csz > end) return empty
            // Commit-on-valid, latch-first: a later strf (e.g. the audio
            // stream's WAVEFORMAT in a second LIST strl) must neither
            // clobber an already-accepted video format nor scribble on
            // w/h while failing validation (ADVICE r9 — the old code let
            // every strf overwrite fmtOk/w/h, so video+audio files
            // decoded to empty).
            def readStrf(at: Int, asz: Int): Unit = {
              if (fmtOk || asz < 40) return
              val lw = le32(content, at + 12)
              val lh = le32(content, at + 16)
              val ok = le32(content, at + 8) >= 40 &&
                le16(content, at + 20) == 1 &&   // planes
                le16(content, at + 22) == 24 &&  // bpp
                le32(content, at + 24) == 0 &&   // BI_RGB
                lw > 0 && lh > 0 && lw.toLong * lh <= Int.MaxValue
              if (ok) { w = lw; h = lh; fmtOk = true }
            }
            if (tag4(content, c, "strf")) readStrf(c, csz)
            else if (tag4(content, c, "LIST") && csz >= 4 &&
                tag4(content, c + 8, "strl")) {
              // within a strl, the strf is read only when the stream's
              // strh declares fccType 'vids' — an audio strl's strf is a
              // WAVEFORMAT, not a BITMAPINFOHEADER, and must be ignored
              // wholesale rather than validated-and-failed
              var g = c + 12
              val gend = c + 8 + csz
              var vids = false
              while (g + 8 <= gend) {
                val gsz = le32(content, g + 4)
                if (gsz < 0 || g.toLong + 8L + gsz > gend) return empty
                if (tag4(content, g, "strh") && gsz >= 4)
                  vids = tag4(content, g + 8, "vids")
                else if (tag4(content, g, "strf") && vids) readStrf(g, gsz)
                g += 8 + gsz + (gsz & 1)
              }
            }
            c += 8 + csz + (csz & 1)
          }
        } else if (tag4(content, off + 8, "movi") && moviOff < 0) {
          moviOff = off + 12
          moviEnd = off + 8 + sz
        }
      }
      off += 8 + sz + (sz & 1)
    }
    if (!fmtOk || moviOff < 0) return empty
    val rowStrideL = ((w.toLong * 3 + 3) / 4) * 4
    if (rowStrideL * h > Int.MaxValue) return empty
    val frameBytes = (rowStrideL * h).toInt
    val rowStride = rowStrideL.toInt
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    var c = moviOff
    while (c + 8 <= moviEnd) {
      val csz = le32(content, c + 4)
      if (csz < 0 || c.toLong + 8L + csz > moviEnd) return empty
      if (tag4(content, c, "00db")) {
        if (csz != frameBytes) return empty
        val res = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          val rowOff = c + 8 + (h - 1 - y) * rowStride
          var x = 0
          while (x < w) {
            val b = content(rowOff + x * 3) & 0xff
            val g = content(rowOff + x * 3 + 1) & 0xff
            val r = content(rowOff + x * 3 + 2) & 0xff
            res(y * w + x) = (2126 * r + 7152 * g + 722 * b) / 10000
            x += 1
          }
          y += 1
        }
        frames += res
      }
      c += 8 + csz + (csz & 1)
    }
    frames.toArray
  }

  // ArrayData bridges for codegen (UnsafeArrayData: no per-element boxing)
  def wavSamplesData(content: Array[Byte]): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(wavSamples(content))

  def bmpLumaData(content: Array[Byte]): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(bmpLuma(content))

  def pngLumaData(content: Array[Byte]): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(pngLuma(content))

  def aviFrameLumasData(content: Array[Byte]): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      aviFrameLumas(content)
        .map(f => UnsafeArrayData.fromPrimitiveArray(f): AnyRef))
}

/** `wav_encode(payload BINARY) → BINARY` — see [[MediaCodec.wavEncode]]. */
case class WavEncode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wav_encode requires BINARY input, got ${child.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_encode"
  override protected def nullSafeEval(input: Any): Any =
    MediaCodec.wavEncode(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaCodec.wavEncode($c)")
  override protected def withNewChildInternal(newChild: Expression): WavEncode =
    copy(child = newChild)
}

object WavEncode {
  val info = new ExpressionInfo(classOf[WavEncode].getName, "wav_encode")
}

/** `wav_pcm_samples(content BINARY) → ARRAY<INT>` — see
  * [[MediaCodec.wavSamples]]; empty array on malformed input. */
case class WavPcmSamples(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wav_pcm_samples requires BINARY input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "wav_pcm_samples"
  override protected def nullSafeEval(input: Any): Any =
    MediaCodec.wavSamplesData(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaCodec.wavSamplesData($c)")
  override protected def withNewChildInternal(newChild: Expression): WavPcmSamples =
    copy(child = newChild)
}

object WavPcmSamples {
  val info = new ExpressionInfo(classOf[WavPcmSamples].getName, "wav_pcm_samples")
}

/** `bmp_encode(payload BINARY, width INT) → BINARY` — see
  * [[MediaCodec.bmpEncode]]. */
case class BmpEncode(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bmp_encode requires (BINARY, INT), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bmp_encode"
  override protected def nullSafeEval(payload: Any, width: Any): Any =
    MediaCodec.bmpEncode(payload.asInstanceOf[Array[Byte]],
      width.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (p, w) => s"graft.functions.MediaCodec.bmpEncode($p, $w)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BmpEncode =
    copy(left = newLeft, right = newRight)
}

object BmpEncode {
  val info = new ExpressionInfo(classOf[BmpEncode].getName, "bmp_encode")
}

/** `bmp_luma(content BINARY) → ARRAY<INT>` — see [[MediaCodec.bmpLuma]];
  * empty array on malformed input. */
case class BmpLuma(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bmp_luma requires BINARY input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bmp_luma"
  override protected def nullSafeEval(input: Any): Any =
    MediaCodec.bmpLumaData(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaCodec.bmpLumaData($c)")
  override protected def withNewChildInternal(newChild: Expression): BmpLuma =
    copy(child = newChild)
}

object BmpLuma {
  val info = new ExpressionInfo(classOf[BmpLuma].getName, "bmp_luma")
}

/** `png_encode(payload BINARY, width INT) → BINARY` — see
  * [[MediaCodec.pngEncode]]. */
case class PngEncode(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"png_encode requires (BINARY, INT), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_encode"
  override protected def nullSafeEval(payload: Any, width: Any): Any =
    MediaCodec.pngEncode(payload.asInstanceOf[Array[Byte]],
      width.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (p, w) => s"graft.functions.MediaCodec.pngEncode($p, $w)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PngEncode =
    copy(left = newLeft, right = newRight)
}

object PngEncode {
  val info = new ExpressionInfo(classOf[PngEncode].getName, "png_encode")
}

/** `png_luma(content BINARY) → ARRAY<INT>` — see [[MediaCodec.pngLuma]];
  * empty array on malformed input. */
case class PngLuma(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"png_luma requires BINARY input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "png_luma"
  override protected def nullSafeEval(input: Any): Any =
    MediaCodec.pngLumaData(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaCodec.pngLumaData($c)")
  override protected def withNewChildInternal(newChild: Expression): PngLuma =
    copy(child = newChild)
}

object PngLuma {
  val info = new ExpressionInfo(classOf[PngLuma].getName, "png_luma")
}

/** `avi_encode(payload BINARY, width INT) → BINARY` — see
  * [[MediaCodec.aviEncode]]. */
case class AviEncode(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"avi_encode requires (BINARY, INT), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "avi_encode"
  override protected def nullSafeEval(payload: Any, width: Any): Any =
    MediaCodec.aviEncode(payload.asInstanceOf[Array[Byte]],
      width.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (p, w) => s"graft.functions.MediaCodec.aviEncode($p, $w)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AviEncode =
    copy(left = newLeft, right = newRight)
}

object AviEncode {
  val info = new ExpressionInfo(classOf[AviEncode].getName, "avi_encode")
}

/** `avi_frame_lumas(content BINARY) → ARRAY<ARRAY<INT>>` — one decoded
  * luma plane per video frame; see [[MediaCodec.aviFrameLumas]]. Empty
  * array on malformed input. */
case class AviFrameLumas(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"avi_frame_lumas requires BINARY input, got ${child.dataType.catalogString}")
  override def dataType: DataType =
    ArrayType(ArrayType(IntegerType, containsNull = false),
      containsNull = false)
  override def prettyName: String = "avi_frame_lumas"
  override protected def nullSafeEval(input: Any): Any =
    MediaCodec.aviFrameLumasData(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MediaCodec.aviFrameLumasData($c)")
  override protected def withNewChildInternal(newChild: Expression): AviFrameLumas =
    copy(child = newChild)
}

object AviFrameLumas {
  val info = new ExpressionInfo(classOf[AviFrameLumas].getName, "avi_frame_lumas")
}
