package graft.operators

/** Baseline-sequential JPEG (ITU-T T.81) — the fifth REAL
  * no-external-libs codec in the m-family, covering the dominant
  * real-world image interchange format. Two halves:
  *
  *  - [[Jpeg.synth]]: a deterministic encoder (the ingest stand-in,
  *    like `synthBmp`/`synthPng` — no image libraries in this
  *    container, so payloads are synthesized but real): forward DCT,
  *    flat quantization, canonical-Huffman entropy coding (a single
  *    all-9-bit table — legal per the spec, and it forces the decoder
  *    through the generic DHT machinery rather than hard-coded Annex K
  *    tables), optional restart markers, grayscale, 4:4:4 or 4:2:0
  *    YCbCr (2×2 box-filtered chroma).
  *  - [[Jpeg.decode]]: a full decoder for the supported subset —
  *    marker walk (DQT/SOF0/DHT/DRI/SOS, APPn/COM skipped), canonical
  *    Huffman decode with byte-stuffing and restart handling, DC
  *    prediction, dequantize + de-zigzag + separable float IDCT, level
  *    shift and clamp; full-res-luma subsampled layouts (4:2:0,
  *    4:2:2, 4:4:0) reconstruct luma from the h0·v0 interleaved
  *    blocks per MCU (T.81 A.2.3). FAILS LOUDLY on progressive (SOF2)
  *    and every other non-baseline frame type, arithmetic coding,
  *    12-bit precision, subsampled-luma layouts, and
  *    truncated/corrupt streams.
  *
  * Decode quality is spec-proven round-trip: a constant-gray image
  * survives encode→decode EXACTLY (DC-only blocks, flat q=1), and
  * patterned/color images reconstruct their mean luma within the
  * quantization error bound (TextMultimodalSpec).
  */
object Jpeg {

  /** JPEG zigzag scan order: zigzag index → natural (row-major) index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** cosTable(x)(u) = cos((2x+1)·u·π / 16) — shared by both DCTs. */
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  /** Forward 8×8 DCT (T.81 A.3.3), input level-shifted spatial. */
  private def fdct(f: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var sum = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            sum += f(y * 8 + x) * CosT(x)(u) * CosT(y)(v)
            y += 1
          }
          x += 1
        }
        val cu = if (u == 0) InvSqrt2 else 1.0
        val cv = if (v == 0) InvSqrt2 else 1.0
        out(v * 8 + u) = 0.25 * cu * cv * sum
        v += 1
      }
      u += 1
    }
    out
  }

  /** Inverse 8×8 DCT (T.81 A.3.3), output spatial (pre-level-shift). */
  private def idct(coef: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var sum = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val cu = if (u == 0) InvSqrt2 else 1.0
            val cv = if (v == 0) InvSqrt2 else 1.0
            sum += cu * cv * coef(v * 8 + u) * CosT(x)(u) * CosT(y)(v)
            v += 1
          }
          u += 1
        }
        out(y * 8 + x) = 0.25 * sum
        y += 1
      }
      x += 1
    }
    out
  }

  /** Bit category of a DC-diff / AC value (T.81 table F.1). */
  private def cat(v: Int): Int = {
    var a = math.abs(v)
    var c = 0
    while (a != 0) { a >>= 1; c += 1 }
    c
  }

  // ------------------------------------------------------------------
  // Encoder
  // ------------------------------------------------------------------

  /** MSB-first bit writer with 0xFF byte stuffing; flush pads with
    * 1-bits (T.81 F.1.2.3).
    */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def write(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0)
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flushAligned(): Unit = while (n != 0) write(1, 1)
  }

  /** The encoder's single Huffman layout: every symbol gets a 9-bit
    * canonical code (code = symbol's index in the value list). Legal —
    * ≤ 511 codes at one length, the all-ones code never assigned — and
    * deliberately NOT the Annex K tables, so decoders must honor DHT.
    */
  private val DcSyms: Array[Int] = (0 to 11).toArray
  private val AcSyms: Array[Int] = {
    // EOB, ZRL, and every (run 0-15, size 1-10) symbol
    val b = Array.newBuilder[Int]
    b += 0x00
    b += 0xf0
    for (run <- 0 to 15; size <- 1 to 10) b += (run << 4) | size
    b.result()
  }
  private def symIndex(syms: Array[Int]): Map[Int, Int] = syms.zipWithIndex.toMap
  private val DcCode = symIndex(DcSyms)
  private val AcCode = symIndex(AcSyms)

  /** Encode one level-shifted 8×8 block; returns the new DC predictor. */
  private def encodeBlock(bw: BitWriter, block: Array[Double], q: Int,
      prevDc: Int): Int = {
    val coef = fdct(block)
    val zz = new Array[Int](64)
    var i = 0
    while (i < 64) {
      zz(i) = math.round(coef(Zigzag(i)) / q).toInt
      i += 1
    }
    def extendBits(v: Int, c: Int): Int = if (v >= 0) v else v + (1 << c) - 1
    val diff = zz(0) - prevDc
    val dc = cat(diff)
    bw.write(DcCode(dc), 9)
    if (dc > 0) bw.write(extendBits(diff, dc), dc)
    var run = 0
    i = 1
    while (i < 64) {
      if (zz(i) == 0) run += 1
      else {
        while (run >= 16) { bw.write(AcCode(0xf0), 9); run -= 16 }
        val c = cat(zz(i))
        bw.write(AcCode((run << 4) | c), 9)
        bw.write(extendBits(zz(i), c), c)
        run = 0
      }
      i += 1
    }
    if (run > 0) bw.write(AcCode(0x00), 9) // EOB
    zz(0)
  }

  /** Deterministic baseline JPEG encoder. `planes` is 1 (grayscale,
    * `gray(y*w+x)`) or 3 (RGB interleaved `rgb(3*(y*w+x)+c)`, encoded
    * as YCbCr — 4:4:4, or 4:2:0 with `chromaSub = 2`). `q` is the
    * flat quantization step (1 =
    * near-lossless, bigger = lossier). `restartInterval` > 0 emits DRI
    * + RSTn markers every that many MCUs. Edge pixels replicate into
    * partial blocks, per the usual practice.
    */
  def synth(width: Int, height: Int, pixels: Array[Byte], planes: Int = 1,
      q: Int = 1, restartInterval: Int = 0, chromaSub: Int = 1): Array[Byte] = {
    require(width > 0 && height > 0, "degenerate dimensions")
    require(planes == 1 || planes == 3, "1 (gray) or 3 (RGB) planes")
    require(q >= 1 && q <= 255, "flat quant step in [1, 255]")
    require(pixels.length >= width * height * planes, "short pixel array")
    require(chromaSub == 1 || (chromaSub == 2 && planes == 3),
      "chromaSub 1 (4:4:4) or 2 (4:2:0, RGB only)")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xdb) // DQT: table 0, flat q
    u16(2 + 65); u8(0x00)
    (0 until 64).foreach(_ => u8(q))
    marker(0xc0) // SOF0: baseline
    u16(8 + 3 * planes); u8(8); u16(height); u16(width); u8(planes)
    (1 to planes).foreach { id =>
      u8(id)
      u8(if (id == 1 && chromaSub == 2) 0x22 else 0x11)
      u8(0)
    }
    def dht(cls: Int, syms: Array[Int]): Unit = {
      marker(0xc4)
      u16(2 + 1 + 16 + syms.length); u8(cls << 4)
      (1 to 16).foreach(l => u8(if (l == 9) syms.length else 0))
      syms.foreach(u8)
    }
    dht(0, DcSyms); dht(1, AcSyms)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    marker(0xda) // SOS
    u16(6 + 2 * planes); u8(planes)
    (1 to planes).foreach { id => u8(id); u8(0x00) }
    u8(0); u8(63); u8(0)
    // component planes, level-shifted, edge-replicated to block grid
    def sample(comp: Int, x: Int, y: Int): Double = {
      val cx = math.min(x, width - 1)
      val cy = math.min(y, height - 1)
      if (planes == 1) (pixels(cy * width + cx) & 0xff) - 128.0
      else {
        val p = 3 * (cy * width + cx)
        val r = pixels(p) & 0xff
        val g = pixels(p + 1) & 0xff
        val b = pixels(p + 2) & 0xff
        comp match {
          case 0 => 0.299 * r + 0.587 * g + 0.114 * b - 128.0
          case 1 => -0.168736 * r - 0.331264 * g + 0.5 * b // +128 − 128
          case _ => 0.5 * r - 0.418688 * g - 0.081312 * b
        }
      }
    }
    val bw = new BitWriter(out)
    val prevDc = new Array[Int](planes)
    var rstCount = 0
    var mcu = 0
    // 4:2:0 MCUs span 16×16 pixels: 4 full-res luma blocks in raster
    // (by, bx) order, then one Cb and one Cr block whose samples are
    // the 2×2 box average of the full-res chroma plane (the standard
    // downsampling filter); 4:4:4 degenerates to the 8×8 single-block
    // MCU. Grids below re-derive from the luma factor so both layouts
    // share one loop.
    val lh = if (chromaSub == 2) 2 else 1
    val subX = (width + 8 * lh - 1) / (8 * lh)
    val subY = (height + 8 * lh - 1) / (8 * lh)
    var my = 0
    while (my < subY) {
      var mx = 0
      while (mx < subX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flushAligned()
          marker(0xd0 + (rstCount % 8))
          rstCount += 1
          java.util.Arrays.fill(prevDc, 0)
        }
        var comp = 0
        while (comp < planes) {
          val nBlk = if (comp == 0) lh * lh else 1
          var blk = 0
          while (blk < nBlk) {
            val bx = blk % lh
            val by = blk / lh
            val block = new Array[Double](64)
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                block(y * 8 + x) =
                  if (comp == 0)
                    sample(comp, (mx * lh + bx) * 8 + x, (my * lh + by) * 8 + y)
                  else if (lh == 1)
                    sample(comp, mx * 8 + x, my * 8 + y)
                  else {
                    val px = mx * 16 + 2 * x
                    val py = my * 16 + 2 * y
                    (sample(comp, px, py) + sample(comp, px + 1, py) +
                      sample(comp, px, py + 1) + sample(comp, px + 1, py + 1)) / 4.0
                  }
                x += 1
              }
              y += 1
            }
            prevDc(comp) = encodeBlock(bw, block, q, prevDc(comp))
            blk += 1
          }
          comp += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flushAligned()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Decoder
  // ------------------------------------------------------------------

  /** Canonical Huffman decode tables from a DHT segment (T.81 F.2.2.3:
    * mincode/maxcode/valptr per code length).
    */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader, docId: Long): Int = {
      var code = br.nextBit(docId)
      var l = 1
      while (maxCode(l) < code) {
        code = (code << 1) | br.nextBit(docId)
        l += 1
        require(l <= 16, s"doc $docId: corrupt Huffman stream")
      }
      vals(valPtr(l) + code - minCode(l))
    }
  }

  /** MSB-first bit reader over the entropy-coded scan with 0xFF00
    * un-stuffing. A bare marker inside entropy data (other than via
    * [[expectRestart]]) means truncation/corruption → loud failure.
    */
  private final class BitReader(b: Array[Byte], start: Int) {
    var pos: Int = start
    private var acc = 0
    private var n = 0
    def nextBit(docId: Long): Int = {
      if (n == 0) {
        require(pos < b.length, s"doc $docId: truncated scan data")
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          require(pos < b.length, s"doc $docId: truncated scan data")
          val m = b(pos) & 0xff
          require(m == 0x00,
            s"doc $docId: unexpected marker 0xff${m.toHexString} in scan")
          pos += 1
        }
        acc = v
        n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    /** Byte-align and consume the expected RSTn marker. */
    def expectRestart(idx: Int, docId: Long): Unit = {
      n = 0
      require(pos + 1 < b.length, s"doc $docId: truncated at restart")
      require((b(pos) & 0xff) == 0xff && (b(pos + 1) & 0xff) == 0xd0 + idx,
        s"doc $docId: expected RST$idx, got " +
          f"0x${b(pos) & 0xff}%02x${b(pos + 1) & 0xff}%02x")
      pos += 2
    }
  }

  /** Decoded image: luma plane (row-major, w×h) + dimensions. */
  final case class Image(width: Int, height: Int, nComponents: Int,
      luma: Array[Int])

  private def extend(v: Int, c: Int): Int =
    if (v < (1 << (c - 1))) v - (1 << c) + 1 else v

  /** Decode a baseline-sequential JPEG. Loud failure on every
    * non-baseline feature — see the object doc for the subset.
    */
  def decode(b: Array[Byte], docId: Long = -1L): Image = {
    require(b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
      s"doc $docId: not a JPEG payload (no SOI)")
    var pos = 2
    def u8(): Int = {
      require(pos < b.length, s"doc $docId: truncated JPEG segment")
      val v = b(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = {
      require(pos + 1 < b.length, s"doc $docId: truncated JPEG segment")
      val v = ((b(pos) & 0xff) << 8) | (b(pos + 1) & 0xff); pos += 2; v
    }
    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var width = 0
    var height = 0
    var nComp = 0
    var compQ: Array[Int] = null // per-component quant table id
    var compHV: Array[Int] = null // per-component sampling byte (h<<4|v)
    var dri = 0
    var scanComp: Array[(Int, Int)] = null // (dcTab, acTab) in scan order
    var scanStart = -1
    while (scanStart < 0) {
      require(pos + 4 <= b.length, s"doc $docId: truncated marker segment")
      require(u8() == 0xff, s"doc $docId: marker sync lost")
      var m = u8()
      while (m == 0xff) m = u8() // fill bytes are legal
      m match {
        case 0xdb => // DQT (may hold several tables)
          val end = pos + u16() - 2
          while (pos < end) {
            val pq = u8()
            require((pq >> 4) == 0, s"doc $docId: 16-bit quant tables unsupported")
            val id = pq & 0x0f
            qtabs(id) = Array.fill(64)(u8())
          }
        case 0xc0 => // SOF0 baseline
          u16()
          require(u8() == 8, s"doc $docId: only 8-bit precision supported")
          height = u16(); width = u16(); nComp = u8()
          require(width > 0 && height > 0,
            s"doc $docId: degenerate dimensions $width x $height")
          require(nComp == 1 || nComp == 3,
            s"doc $docId: $nComp components unsupported")
          compQ = new Array[Int](nComp)
          compHV = new Array[Int](nComp)
          var i = 0
          while (i < nComp) {
            u8() // component id (we rely on declaration order)
            compHV(i) = u8()
            compQ(i) = u8()
            i += 1
          }
          // supported sampling layouts: grayscale 1×1; color 4:4:4
          // (all 1×1); color with FULL-RES luma + 1×1 chroma — 4:2:0
          // (luma 2×2), 4:2:2 (2×1), 4:4:0 (1×2). Anything else
          // (subsampled luma, >2 factors) fails loudly.
          if (nComp == 1)
            require(compHV(0) == 0x11,
              s"doc $docId: grayscale subsampling unsupported (1x1 only)")
          else {
            val h0 = compHV(0) >> 4; val v0 = compHV(0) & 0x0f
            require(h0 >= 1 && h0 <= 2 && v0 >= 1 && v0 <= 2,
              s"doc $docId: luma sampling ${h0}x$v0 unsupported")
            require(compHV(1) == 0x11 && compHV(2) == 0x11,
              s"doc $docId: subsampled-chroma-only layouts supported " +
                "(chroma factors must be 1x1)")
          }
        case 0xc4 => // DHT (may hold several tables)
          val end = pos + u16() - 2
          while (pos < end) {
            val tc = u8()
            val bits = Array.fill(16)(u8())
            val vals = Array.fill(bits.sum)(u8())
            val h = new Huff(bits, vals)
            if ((tc >> 4) == 0) dcTabs(tc & 0x0f) = h else acTabs(tc & 0x0f) = h
          }
        case 0xdd => // DRI
          u16(); dri = u16()
        case 0xda => // SOS
          u16()
          val ns = u8()
          require(ns == nComp, s"doc $docId: multi-scan JPEG unsupported")
          scanComp = Array.fill(ns) {
            u8() // component id
            val t = u8()
            (t >> 4, t & 0x0f)
          }
          require(u8() == 0 && u8() == 63 && u8() == 0,
            s"doc $docId: non-baseline spectral selection")
          scanStart = pos
        case 0xc2 =>
          throw new IllegalArgumentException(
            s"doc $docId: progressive JPEG (SOF2) unsupported — baseline only")
        case x if x >= 0xc1 && x <= 0xcf && x != 0xc4 && x != 0xc8 && x != 0xcc =>
          throw new IllegalArgumentException(
            s"doc $docId: non-baseline frame type SOF${x - 0xc0} unsupported")
        case 0xcc =>
          throw new IllegalArgumentException(
            s"doc $docId: arithmetic coding unsupported")
        case 0xd9 =>
          throw new IllegalArgumentException(s"doc $docId: EOI before scan data")
        case _ => // APPn, COM, anything else with a length: skip
          val len = u16()
          require(len >= 2 && pos + len - 2 <= b.length,
            s"doc $docId: truncated segment")
          pos += len - 2
      }
    }
    require(width > 0, s"doc $docId: SOS before SOF0")
    // the MCU spans 8·hmax × 8·vmax pixels; with 1×1 chroma enforced
    // above, hmax/vmax are the luma factors, so the luma plane
    // reconstructs at full resolution from h0·v0 blocks per MCU in
    // raster (by, bx) order — T.81 A.2.3 interleaving
    val h0 = if (compHV == null) 1 else compHV(0) >> 4
    val v0 = if (compHV == null) 1 else compHV(0) & 0x0f
    val mcusX = (width + 8 * h0 - 1) / (8 * h0)
    val mcusY = (height + 8 * v0 - 1) / (8 * v0)
    val luma = new Array[Int](width * height)
    val br = new BitReader(b, scanStart)
    val prevDc = new Array[Int](nComp)
    var rstIdx = 0
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (dri > 0 && mcu > 0 && mcu % dri == 0) {
          br.expectRestart(rstIdx % 8, docId)
          rstIdx += 1
          java.util.Arrays.fill(prevDc, 0)
        }
        var comp = 0
        while (comp < nComp) {
          val (dcId, acId) = scanComp(comp)
          val dcTab = dcTabs(dcId)
          val acTab = acTabs(acId)
          val qt = qtabs(compQ(comp))
          require(dcTab != null && acTab != null && qt != null,
            s"doc $docId: scan references an undefined table")
          val ch = if (comp == 0) h0 else 1
          val cv = if (comp == 0) v0 else 1
          var blk = 0
          while (blk < ch * cv) {
            val bx = blk % ch
            val by = blk / ch
            val coef = new Array[Double](64)
            val c = dcTab.decode(br, docId)
            require(c <= 11, s"doc $docId: invalid DC category $c")
            var v = 0
            var i = 0
            while (i < c) { v = (v << 1) | br.nextBit(docId); i += 1 }
            prevDc(comp) += (if (c == 0) 0 else extend(v, c))
            coef(0) = prevDc(comp).toDouble * qt(0)
            var zi = 1
            var eob = false
            while (zi < 64 && !eob) {
              val sym = acTab.decode(br, docId)
              if (sym == 0x00) eob = true
              else if (sym == 0xf0) zi += 16
              else {
                zi += sym >> 4
                val ac = sym & 0x0f
                require(zi < 64, s"doc $docId: AC run past block end")
                var av = 0
                var j = 0
                while (j < ac) { av = (av << 1) | br.nextBit(docId); j += 1 }
                coef(Zigzag(zi)) = extend(av, ac).toDouble * qt(zi)
                zi += 1
              }
            }
            if (comp == 0) { // only luma is featurized
              val px = idct(coef)
              var y = 0
              while (y < 8) {
                val iy = (my * v0 + by) * 8 + y
                if (iy < height) {
                  var x = 0
                  while (x < 8) {
                    val ix = (mx * h0 + bx) * 8 + x
                    if (ix < width) {
                      val p = math.round(px(y * 8 + x) + 128.0).toInt
                      luma(iy * width + ix) = math.max(0, math.min(255, p))
                    }
                    x += 1
                  }
                }
                y += 1
              }
            }
            // chroma blocks MUST be entropy-decoded (the stream is
            // sequential — their bits interleave with the next
            // block's), which happened above; only the luma plane is
            // reconstructed since the feature contract reads luma
            // alone.
            blk += 1
          }
          comp += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    Image(width, height, nComp, luma)
  }

  /** The m-family codec: decodes the payload as baseline JPEG and
    * emits `[n_bytes, n_pixels, mean_luma, width, height]` with
    * width/height RE-DERIVED from the bytes (the [[Multimodal.BmpCodec]]
    * contract).
    */
  final class JpegCodec extends Multimodal.MediaCodec {
    override def decode(r: Multimodal.MediaRow): Array[Double] = {
      val img = Jpeg.decode(r.payload, r.doc_id)
      var sum = 0L
      var i = 0
      while (i < img.luma.length) { sum += img.luma(i); i += 1 }
      val mean = sum.toDouble / img.luma.length
      Array(r.payload.length.toDouble,
        (img.width.toLong * img.height).toDouble,
        math.round(mean * 1e6) / 1e6, img.width.toDouble, img.height.toDouble)
    }
  }
}
