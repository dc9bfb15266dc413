package graft.multimodal

import java.io.ByteArrayOutputStream

/** A second REAL compressed image codec, library-free — and a genuinely
  * different compression FAMILY from [[Png]]: GIF87a compresses with
  * LZW dictionary coding (variable-width codes growing 9→12 bits,
  * LSB-first bit packing, 255-byte sub-block framing), where PNG's zlib
  * is LZ77+Huffman. A corpus crawl contains both; an engine that can
  * only open one of them quarantines half its images.
  *
  * Scope: GIF87a, one image, 256-entry global color table, no
  * interlace — the indexed-color case. The codec operates on the INDEX
  * plane (one byte per pixel); the grayscale palette (i,i,i) makes the
  * index↔color mapping trivially invertible, so a round-trip is
  * byte-lossless and checksum-oracle-able exactly like mm09's PNG path.
  *
  * LZW per the GIF spec: initial code size 8 ⇒ clear = 256, EOI = 257,
  * first dynamic code 258; code width starts at 9 bits and grows when
  * the next code to be ASSIGNED would not fit (encoder and decoder grow
  * in lockstep); at 4096 entries the encoder emits CLEAR and resets.
  * `GifSpec` exercises the 9→12-bit growth path on a plane large enough
  * to cross each width boundary.
  */
object Gif {

  private val Header = "GIF87a".getBytes("US-ASCII")
  private val MinCodeSize = 8
  private val ClearCode = 256
  private val EoiCode = 257
  private val MaxCode = 4096

  /** Encode an index plane (row-major, 1 byte/pixel) as a valid GIF87a
    * with a 256-entry grayscale global color table. */
  def encode(indices: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(indices.length == w * h, s"need ${w * h} bytes, got ${indices.length}")
    require(w > 0 && w <= 0xffff && h > 0 && h <= 0xffff, "geometry out of range")
    val out = new ByteArrayOutputStream()
    out.write(Header)
    // logical screen descriptor: size, GCT present / 8-bit / 256 entries
    out.write(w & 0xff); out.write(w >>> 8)
    out.write(h & 0xff); out.write(h >>> 8)
    out.write(0xf7); out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    // image descriptor: full-screen, no local table, no interlace
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(w & 0xff); out.write(w >>> 8)
    out.write(h & 0xff); out.write(h >>> 8)
    out.write(0)
    out.write(MinCodeSize)
    writeSubBlocks(out, compress(indices))
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** LZW compression of the index stream (GIF variant: variable code
    * width, LSB-first). Dictionary keys are (prefix code << 8 | byte) —
    * prefix < 4096 and byte < 256 pack collision-free into one Int. */
  private def compress(data: Array[Byte]): Array[Byte] = {
    val out = new BitWriter
    var dict = new java.util.HashMap[Int, Int]()
    var nextCode = EoiCode + 1
    var codeSize = MinCodeSize + 1
    out.write(ClearCode, codeSize)
    var cur = data(0) & 0xff
    var i = 1
    while (i < data.length) {
      val c = data(i) & 0xff
      val key = (cur << 8) | c
      val hit = dict.getOrDefault(key, -1)
      if (hit >= 0) {
        cur = hit
      } else {
        out.write(cur, codeSize)
        if (nextCode < MaxCode) {
          dict.put(key, nextCode)
          // grow when the JUST-ASSIGNED code no longer fits the width
          if (nextCode == (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
          nextCode += 1
        } else {
          // table full: reset (exercised only by large planes)
          out.write(ClearCode, codeSize)
          dict = new java.util.HashMap[Int, Int]()
          nextCode = EoiCode + 1
          codeSize = MinCodeSize + 1
        }
        cur = c
      }
      i += 1
    }
    out.write(cur, codeSize)
    out.write(EoiCode, codeSize)
    out.finish()
  }

  final case class GifImage(width: Int, height: Int, indices: Array[Byte])

  /** Decode a GIF87a produced by [[encode]] (or any single-image,
    * GCT-only, non-interlaced GIF87a). Validates framing loudly — a
    * container truncated anywhere reads as the truncation error, never
    * an index exception. */
  def decode(bytes: Array[Byte]): GifImage =
    try decode0(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException("truncated GIF")
    }

  private def decode0(bytes: Array[Byte]): GifImage = {
    require(bytes.length > 13 + 768, "truncated GIF")
    var p = 0
    require((0 until 6).forall(k => bytes(k) == Header(k)), "bad GIF87a header")
    p = 6
    def u16(): Int = {
      val v = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8); p += 2; v
    }
    val sw = u16(); val sh = u16()
    val packed = bytes(p) & 0xff; p += 3 // packed, bg, aspect
    require((packed & 0x80) != 0, "global color table required")
    val gctSize = 2 << (packed & 0x07)
    val palette = new Array[Byte](gctSize * 3)
    System.arraycopy(bytes, p, palette, 0, gctSize * 3)
    p += gctSize * 3
    require((bytes(p) & 0xff) == 0x2c, "expected image descriptor")
    p += 1
    val (left, top) = (u16(), u16())
    val (iw, ih) = (u16(), u16())
    require(left == 0 && top == 0 && iw == sw && ih == sh,
      "sub-rectangle images out of scope")
    val ipacked = bytes(p) & 0xff; p += 1
    require((ipacked & 0x80) == 0, "local color table out of scope")
    require((ipacked & 0x40) == 0, "interlace out of scope")
    val minCode = bytes(p) & 0xff; p += 1
    require(minCode == MinCodeSize, s"unexpected min code size $minCode")
    // concatenate sub-blocks
    val comp = new ByteArrayOutputStream()
    var blockLen = bytes(p) & 0xff; p += 1
    while (blockLen != 0) {
      comp.write(bytes, p, blockLen)
      p += blockLen
      blockLen = bytes(p) & 0xff; p += 1
    }
    require((bytes(p) & 0xff) == 0x3b, "missing GIF trailer")
    val indices = decompress(comp.toByteArray, iw * ih)
    GifImage(iw, ih, indices)
  }

  /** LZW decompression, the decoder side of [[compress]] — prefix table
    * entries are (prevCode, firstByte, lastByte, length) flattened into
    * parallel arrays for allocation-free sequence expansion. */
  private def decompress(data: Array[Byte], expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var outPos = 0
    val prev = new Array[Int](MaxCode)
    val last = new Array[Byte](MaxCode)
    val first = new Array[Byte](MaxCode)
    val len = new Array[Int](MaxCode)
    def resetTable(): (Int, Int) = {
      var c = 0
      while (c < 256) {
        prev(c) = -1; last(c) = c.toByte; first(c) = c.toByte; len(c) = 1
        c += 1
      }
      (EoiCode + 1, MinCodeSize + 1)
    }
    var (nextCode, codeSize) = resetTable()
    val in = new BitReader(data)
    def emit(code: Int): Unit = {
      // expand back-to-front at the target position
      val l = len(code)
      require(outPos + l <= expected, "LZW output overruns the pixel count")
      var c = code
      var k = outPos + l - 1
      while (c != -1) { out(k) = last(c); k -= 1; c = prev(c) }
      outPos += l
    }
    var prevCode = -1
    var stop = false
    while (!stop) {
      val code = in.read(codeSize)
      if (code == ClearCode) {
        val r = resetTable(); nextCode = r._1; codeSize = r._2
        prevCode = -1
      } else if (code == EoiCode) {
        stop = true
      } else {
        require(code < nextCode || (code == nextCode && prevCode != -1),
          s"corrupt LZW stream: code $code, table $nextCode")
        if (prevCode == -1) {
          emit(code)
        } else {
          if (code == nextCode) {
            // the KwKwK case: new entry = prev sequence + its first byte
            require(nextCode < MaxCode, "table overflow")
            prev(nextCode) = prevCode
            first(nextCode) = first(prevCode)
            last(nextCode) = first(prevCode)
            len(nextCode) = len(prevCode) + 1
            nextCode += 1
            // the decoder's table lags the encoder's by ONE entry (the
            // entry for code k materialises only when code k+1 arrives),
            // so it must widen one entry earlier: post-add nextCode ==
            // 2^cs − 1 here pairs with the encoder's == 2^cs
            if (nextCode == (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
            emit(code)
          } else {
            if (nextCode < MaxCode) {
              prev(nextCode) = prevCode
              first(nextCode) = first(prevCode)
              last(nextCode) = first(code)
              len(nextCode) = len(prevCode) + 1
              nextCode += 1
              if (nextCode == (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
            }
            emit(code)
          }
        }
        prevCode = code
      }
    }
    require(outPos == expected, s"decoded $outPos pixels, wanted $expected")
    out
  }

  private def writeSubBlocks(out: ByteArrayOutputStream, data: Array[Byte]): Unit = {
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n)
      out.write(data, off, n)
      off += n
    }
  }

  /** LSB-first bit packer (GIF's bit order). */
  private final class BitWriter {
    private val buf = new ByteArrayOutputStream()
    private var acc = 0L
    private var nBits = 0
    def write(code: Int, width: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += width
      while (nBits >= 8) {
        buf.write((acc & 0xff).toInt)
        acc >>>= 8
        nBits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nBits > 0) buf.write((acc & 0xff).toInt)
      buf.toByteArray
    }
  }

  /** LSB-first bit reader. Reading past the end returns EOI so a
    * truncated stream fails the pixel-count check, not an index error. */
  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var acc = 0L
    private var nBits = 0
    def read(width: Int): Int = {
      while (nBits < width) {
        if (pos >= data.length) return EoiCode
        acc |= (data(pos) & 0xffL) << nBits
        pos += 1
        nBits += 8
      }
      val v = (acc & ((1L << width) - 1)).toInt
      acc >>>= width
      nBits -= width
      v
    }
  }
}
