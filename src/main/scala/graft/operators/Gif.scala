package graft.operators

/** GIF87a — a sixth REAL no-external-libs codec (reference scope:
  * the multimodal ingest family, SURVEY §2.F): the palette-indexed
  * LZW format that is still everywhere in scraped web corpora.
  *
  * Subset: GIF87a/89a header, one global color table, a single
  * non-interlaced image covering the logical screen, variable-length
  * GIF-LZW raster data (code sizes 3–12 bits, LSB-first bit packing,
  * 255-byte sub-blocks). GIF89a extension blocks (0x21) are SKIPPED
  * per spec (label + size-chained sub-blocks); anything outside the
  * subset — interlaced images, local color tables, missing global
  * table, truncated streams, out-of-range codes — fails LOUDLY with
  * the doc id, never silently degrades (the m-family contract).
  *
  * LZW is LOSSLESS, so unlike m8's JPEG the decoded indices must
  * equal the source bytes EXACTLY — the spec asserts byte-for-byte
  * round-trips, not bounded error. Encoder/decoder code-size sync:
  * the encoder grows its code width when `nextCode == (1<<size)+1`
  * (after registering), the decoder when `nextCode == (1<<size)` —
  * the decoder lags one table entry behind, so the thresholds differ
  * by exactly one; both reach each width at the same code index.
  */
object Gif {

  /** Deterministic GIF87a synthesizer: grayscale 256-entry global
    * palette (index i → rgb(i,i,i)), pixels = `px` row-major. */
  def synth(width: Int, height: Int, px: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && px.length == width * height,
      s"synthGif: bad dims $width x $height for ${px.length} pixels")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF87a".getBytes("US-ASCII"))
    u16(width); u16(height)
    out.write(0xf7) // global table present, 8 bpp, 256 entries
    out.write(0)    // background index
    out.write(0)    // no aspect ratio
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(width); u16(height)
    out.write(0x00) // no local table, not interlaced
    out.write(8)    // LZW minimum code size
    val compressed = lzwEncode(px, 8)
    var off = 0
    while (off < compressed.length) {
      val n = math.min(255, compressed.length - off)
      out.write(n); out.write(compressed, off, n); off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Deterministic ANIMATED GIF89a synthesizer (round 19): the same
    * grayscale palette, one graphic-control extension + image
    * descriptor + LZW raster per frame — the multi-frame visual
    * container a video-ish ingest path decimates. Every frame covers
    * the logical screen (no partial-frame composition in the subset).
    */
  def synthAnimated(width: Int, height: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && frames.nonEmpty &&
      frames.forall(_.length == width * height),
      s"synthAnimated: bad dims $width x $height for ${frames.size} frames")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(width); u16(height)
    out.write(0xf7); out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    frames.foreach { px =>
      // graphic control extension: 10cs delay, no transparency
      out.write(0x21); out.write(0xf9); out.write(0x04)
      out.write(0x00); u16(10); out.write(0x00); out.write(0x00)
      out.write(0x2c)
      u16(0); u16(0); u16(width); u16(height)
      out.write(0x00)
      out.write(8)
      val compressed = lzwEncode(px, 8)
      var off = 0
      while (off < compressed.length) {
        val n = math.min(255, compressed.length - off)
        out.write(n); out.write(compressed, off, n); off += n
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** GIF-variant LZW: emits CLEAR first, grows 9→12 bits, re-CLEARs
    * when the table would pass 4096 codes; LSB-first bit packing. */
  private[operators] def lzwEncode(data: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var codeSize = minCodeSize + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += codeSize
      while (bitCnt >= 8) { out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8 }
    }
    var table = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    var nextCode = eoi + 1
    emit(clear)
    if (data.nonEmpty) {
      var w = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        table.get((w, k)) match {
          case Some(c) => w = c
          case None =>
            emit(w)
            if (nextCode == 4096) {
              emit(clear)
              table = scala.collection.mutable.HashMap.empty
              nextCode = eoi + 1; codeSize = minCodeSize + 1
            } else {
              table((w, k)) = nextCode; nextCode += 1
              if (nextCode == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
            }
            w = k
        }
        i += 1
      }
      emit(w)
      // PHANTOM code-size step before EOI: the decoder registers one
      // more table entry after the final data code (it always lags
      // one add behind), so if that entry lands exactly on a power of
      // two the decoder reads EOI one bit wider — mirror the bump
      // without a table entry or the widths desync on boundary-sized
      // rasters
      nextCode += 1
      if (nextCode == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
    }
    emit(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  private[operators] def lzwDecode(data: Array[Byte], minCodeSize: Int,
      expected: Int, docId: Long): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(expected)
    var bitPos = 0
    var codeSize = minCodeSize + 1
    def read(): Int = {
      require(bitPos + codeSize <= data.length * 8,
        s"doc $docId: truncated GIF LZW stream")
      var v = 0; var got = 0
      while (got < codeSize) {
        val byte = data(bitPos >> 3) & 0xff
        val avail = 8 - (bitPos & 7)
        val take = math.min(avail, codeSize - got)
        v |= (((byte >> (bitPos & 7)) & ((1 << take) - 1)) << got)
        got += take; bitPos += take
      }
      v
    }
    // table entries: (prefix code or -1, final byte); root codes are
    // their own byte value
    var prefix = new Array[Int](4096); var suffix = new Array[Int](4096)
    var nextCode = eoi + 1
    def reset(): Unit = { nextCode = eoi + 1; codeSize = minCodeSize + 1 }
    def expand(code: Int): Array[Byte] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var c = code
      while (c >= clear) { buf += suffix(c).toByte; c = prefix(c) }
      buf += c.toByte
      buf.reverseIterator.toArray
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = read()
      if (code == eoi) done = true
      else if (code == clear) { reset(); prev = -1 }
      else {
        require(code < nextCode || (code == nextCode && prev >= 0),
          s"doc $docId: GIF LZW code $code out of range (next=$nextCode)")
        val entry: Array[Byte] =
          if (code < clear) Array(code.toByte)
          else if (code < nextCode) expand(code)
          else { // KwKwK: the entry being defined right now
            val p = expand(prev); p :+ p(0)
          }
        out.write(entry, 0, entry.length)
        if (prev >= 0 && nextCode < 4096) {
          prefix(nextCode) = prev
          suffix(nextCode) = entry(0) & 0xff
          nextCode += 1
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    require(out.size == expected,
      s"doc $docId: GIF raster decoded ${out.size} of $expected pixels")
    out.toByteArray
  }

  /** Decoded single-image GIF: palette-resolved gray levels (the
    * synth palette is gray; arbitrary palettes resolve via the
    * integer luma 77R+150G+29B >> 8). */
  final case class Decoded(width: Int, height: Int, gray: Array[Byte])

  def decode(b: Array[Byte], docId: Long): Decoded = {
    require(b.length >= 13, s"doc $docId: GIF too short")
    val magic = new String(b, 0, 6, "US-ASCII")
    require(magic == "GIF87a" || magic == "GIF89a",
      s"doc $docId: not a GIF payload ($magic)")
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    var i = 6
    i += 4 // logical screen w/h (the image descriptor's dims are used)
    val flags = b(i) & 0xff; i += 3
    require((flags & 0x80) != 0, s"doc $docId: GIF without a global color table")
    val tableSize = 2 << (flags & 7)
    require(i + tableSize * 3 <= b.length, s"doc $docId: truncated GIF palette")
    val luma = new Array[Byte](tableSize)
    var t = 0
    while (t < tableSize) {
      val r = b(i) & 0xff; val g = b(i + 1) & 0xff; val bl = b(i + 2) & 0xff
      luma(t) = ((77 * r + 150 * g + 29 * bl) >> 8).toByte
      i += 3; t += 1
    }
    // block walk: skip 0x21 extensions, decode the first 0x2c image
    while (i < b.length && (b(i) & 0xff) == 0x21) {
      i += 2 // introducer + label
      require(i < b.length, s"doc $docId: truncated GIF extension block")
      while ((b(i) & 0xff) != 0) {
        i += 1 + (b(i) & 0xff)
        require(i < b.length, s"doc $docId: truncated GIF extension block")
      }
      i += 1
    }
    require(i < b.length && (b(i) & 0xff) == 0x2c,
      s"doc $docId: no GIF image descriptor" +
        (if (i < b.length) s" (found 0x${(b(i) & 0xff).toHexString})" else " (EOF)"))
    require(i + 11 <= b.length, s"doc $docId: truncated GIF image descriptor")
    val w = u16(i + 5); val h = u16(i + 7)
    val imgFlags = b(i + 9) & 0xff
    require((imgFlags & 0x40) == 0, s"doc $docId: interlaced GIF unsupported")
    require((imgFlags & 0x80) == 0, s"doc $docId: local color table unsupported")
    require(w > 0 && h > 0, s"doc $docId: degenerate GIF image $w x $h")
    i += 10
    val minCodeSize = b(i) & 0xff; i += 1
    require(minCodeSize >= 2 && minCodeSize <= 8,
      s"doc $docId: bad GIF LZW minimum code size $minCodeSize")
    // unchain the 255-byte sub-blocks
    val raster = new java.io.ByteArrayOutputStream()
    require(i < b.length, s"doc $docId: GIF raster data missing")
    var bs = b(i) & 0xff; i += 1
    while (bs != 0) {
      require(i + bs <= b.length, s"doc $docId: truncated GIF sub-block")
      raster.write(b, i, bs); i += bs
      require(i < b.length, s"doc $docId: GIF missing block terminator")
      bs = b(i) & 0xff; i += 1
    }
    val idx = lzwDecode(raster.toByteArray, minCodeSize, w * h, docId)
    val gray = new Array[Byte](w * h)
    var p = 0
    while (p < idx.length) {
      val ix = idx(p) & 0xff
      require(ix < tableSize, s"doc $docId: GIF index $ix outside palette")
      gray(p) = luma(ix); p += 1
    }
    Decoded(w, h, gray)
  }

  /** Feature contract identical to BmpCodec/PgmCodec:
    * `[n_bytes, n_pixels, mean_pixel, width, height]` with
    * width/height RE-DERIVED from the bytes. */
  final class GifCodec extends Multimodal.MediaCodec {
    override def decode(r: Multimodal.MediaRow): Array[Double] = {
      val d = Gif.decode(r.payload, r.doc_id)
      var sum = 0L; var i = 0
      while (i < d.gray.length) { sum += (d.gray(i) & 0xff); i += 1 }
      Array(r.payload.length.toDouble, d.gray.length.toDouble,
        math.round(sum.toDouble / d.gray.length * 1e6) / 1e6,
        d.width.toDouble, d.height.toDouble)
    }
  }

  /** Decode EVERY frame of a (possibly animated) GIF — the
    * multi-frame walk [[decode]] stops short of: skip extensions,
    * decode each 0x2c image descriptor with the shared palette, stop
    * at the 0x3b trailer. Same loud-failure subset rules per frame.
    */
  def decodeFrames(b: Array[Byte], docId: Long): Seq[Decoded] = {
    require(b.length >= 13, s"doc $docId: GIF too short")
    val magic = new String(b, 0, 6, "US-ASCII")
    require(magic == "GIF87a" || magic == "GIF89a",
      s"doc $docId: not a GIF payload ($magic)")
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    var i = 6
    i += 4
    val flags = b(i) & 0xff; i += 3
    require((flags & 0x80) != 0, s"doc $docId: GIF without a global color table")
    val tableSize = 2 << (flags & 7)
    require(i + tableSize * 3 <= b.length, s"doc $docId: truncated GIF palette")
    val luma = new Array[Byte](tableSize)
    var t = 0
    while (t < tableSize) {
      val r = b(i) & 0xff; val g = b(i + 1) & 0xff; val bl = b(i + 2) & 0xff
      luma(t) = ((77 * r + 150 * g + 29 * bl) >> 8).toByte
      i += 3; t += 1
    }
    val frames = scala.collection.mutable.ArrayBuffer.empty[Decoded]
    var done = false
    while (!done) {
      require(i < b.length, s"doc $docId: GIF stream ends without trailer")
      (b(i) & 0xff) match {
        case 0x21 =>
          i += 2
          require(i < b.length, s"doc $docId: truncated GIF extension block")
          while ((b(i) & 0xff) != 0) {
            i += 1 + (b(i) & 0xff)
            require(i < b.length, s"doc $docId: truncated GIF extension block")
          }
          i += 1
        case 0x2c =>
          require(i + 11 <= b.length,
            s"doc $docId: truncated GIF image descriptor")
          val w = u16(i + 5); val h = u16(i + 7)
          val imgFlags = b(i + 9) & 0xff
          require((imgFlags & 0x40) == 0, s"doc $docId: interlaced GIF unsupported")
          require((imgFlags & 0x80) == 0, s"doc $docId: local color table unsupported")
          require(w > 0 && h > 0, s"doc $docId: degenerate GIF image $w x $h")
          i += 10
          val minCodeSize = b(i) & 0xff; i += 1
          require(minCodeSize >= 2 && minCodeSize <= 8,
            s"doc $docId: bad GIF LZW minimum code size $minCodeSize")
          val raster = new java.io.ByteArrayOutputStream()
          require(i < b.length, s"doc $docId: GIF raster data missing")
          var bs = b(i) & 0xff; i += 1
          while (bs != 0) {
            require(i + bs <= b.length, s"doc $docId: truncated GIF sub-block")
            raster.write(b, i, bs); i += bs
            require(i < b.length, s"doc $docId: GIF missing block terminator")
            bs = b(i) & 0xff; i += 1
          }
          val idx = lzwDecode(raster.toByteArray, minCodeSize, w * h, docId)
          val gray = new Array[Byte](w * h)
          var p = 0
          while (p < idx.length) {
            val ix = idx(p) & 0xff
            require(ix < tableSize, s"doc $docId: GIF index $ix outside palette")
            gray(p) = luma(ix); p += 1
          }
          frames += Decoded(w, h, gray)
        case 0x3b => done = true
        case other =>
          throw new IllegalArgumentException(
            s"doc $docId: unexpected GIF block 0x${other.toHexString}")
      }
    }
    require(frames.nonEmpty, s"doc $docId: GIF carries no image frames")
    frames.toSeq
  }

  /** FRAME SAMPLING over an animated GIF — the video-ingest
    * decimation step (m6's stride rule) on a real multi-frame VISUAL
    * container: every `stride`-th frame (0, stride, 2·stride, …) is
    * decoded into features, the rest are skipped after the block
    * walk. Emits `[n_frames, n_sampled, mean gray over the sampled
    * frames (6 dp), width, height]` — exact integer sums underneath,
    * so the readout is engine-independent.
    */
  final class FrameSampleGifCodec(stride: Int) extends Multimodal.MediaCodec {
    require(stride > 0, s"FrameSampleGifCodec: stride $stride")
    override def decode(r: Multimodal.MediaRow): Array[Double] = {
      val frames = Gif.decodeFrames(r.payload, r.doc_id)
      val sampled = frames.zipWithIndex.collect {
        case (f, ix) if ix % stride == 0 => f
      }
      var sum = 0L; var n = 0L
      sampled.foreach { f =>
        var i = 0
        while (i < f.gray.length) { sum += (f.gray(i) & 0xff); i += 1 }
        n += f.gray.length
      }
      Array(frames.size.toDouble, sampled.size.toDouble,
        math.round(sum.toDouble / n * 1e6) / 1e6,
        frames.head.width.toDouble, frames.head.height.toDouble)
    }
  }
}
