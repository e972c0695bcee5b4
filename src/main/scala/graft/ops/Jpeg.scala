package graft.ops

/** Baseline JPEG (SOF0) pixel codec, pure JVM — the third real image
  * pixel path next to PNG (Multimodal.decodePngPixels) and GIF
  * (Multimodal.decodeGifPixels).
  *
  * Scope: 8-bit baseline sequential, 3 components, 4:4:4 sampling, one
  * interleaved scan, standard zigzag, no restart markers, no
  * progressive/arithmetic coding — exactly what [[encode]] emits and a
  * common web shape. Anything else returns None (errors are data).
  *
  * Dual-derivation structure (mirrors the PNG/GIF goldens): the entropy
  * and marker layer — huffman tables, bit packing, 0xFF byte stuffing,
  * DC prediction, zigzag — is written by [[encode]] and independently
  * parsed by [[decode]]; the transform math (IDCT, YCbCr→RGB) is shared
  * deterministic code ([[idct8x8]], [[ycbcrToRgb]]), so generation-time
  * truth equals decode output bit-for-bit iff the bitstream layer
  * round-trips. JPEG is lossy, so truth is computed from the QUANTIZED
  * coefficients (dequant → IDCT), never from the source pixels.
  */
object Jpeg {

  // ---- standard quantization tables (quality 50 base) ----
  // The quant matrices, bits/values huffman specs and zigzag order below
  // are the NORMATIVE example tables of the JPEG standard (ITU-T T.81 /
  // ISO 10918-1, Annex K.1-K.3) — fixed public constants every baseline
  // codec ships verbatim, not code derived from any implementation.
  val qLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  val qChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Zigzag order: zigzag(i) = natural index of the i-th coefficient. */
  val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // ---- standard Annex K huffman tables: (bits per length 1..16, values) ----
  private val dcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcLumaVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val dcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val dcChromaVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val acLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val acLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)
  private val acChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val acChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical huffman codes from a (bits, values) spec: parallel arrays
    * of (code, length) per value, plus decode tables.
    */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // encode side: code/size per symbol value
    val codeOf = new java.util.HashMap[Integer, Integer]()
    val sizeOf = new java.util.HashMap[Integer, Integer]()
    // decode side: min/max code and value-pointer per code length
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        valPtr(len) = k
        minCode(len) = code
        var i = 0
        while (i < bits(len)) {
          codeOf.put(vals(k), code)
          sizeOf.put(vals(k), len)
          code += 1
          k += 1
          i += 1
        }
        maxCode(len) = code - 1 // -1 when no codes of this length
        if (bits(len) == 0) maxCode(len) = -1
        code <<= 1
        len += 1
      }
    }
  }

  private val dcL = new HuffTable(dcLumaBits, dcLumaVals)
  private val dcC = new HuffTable(dcChromaBits, dcChromaVals)
  private val acL = new HuffTable(acLumaBits, acLumaVals)
  private val acC = new HuffTable(acChromaBits, acChromaVals)

  // ---- shared transform math (deterministic, both derivations) ----

  /** Float IDCT of one dequantized 8x8 block → level-shifted clamped
    * 0..255 samples. Separable 1-D passes; double precision keeps this
    * bit-deterministic across JVMs (strictfp semantics are the default
    * on JDK 17+).
    */
  def idct8x8(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var u = 0
    // rows
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        u = 0
        while (u < 8) {
          val cu = if (u == 0) 0.70710678118654752 else 1.0
          sum += cu * coef(y * 8 + u) * Math.cos((2 * x + 1) * u * Math.PI / 16)
          u += 1
        }
        tmp(y * 8 + x) = sum / 2.0
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      y = 0
      while (y < 8) {
        var sum = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) 0.70710678118654752 else 1.0
          sum += cv * tmp(v * 8 + x) * Math.cos((2 * y + 1) * v * Math.PI / 16)
          v += 1
        }
        val s = Math.round(sum / 2.0 + 128.0).toInt
        out(y * 8 + x) = if (s < 0) 0 else if (s > 255) 255 else s
        y += 1
      }
      x += 1
    }
  }

  /** Forward DCT of one level-shifted 8x8 block (golden-gen only). */
  def fdct8x8(samples: Array[Int], out: Array[Double]): Unit = {
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var sum = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            sum += (samples(y * 8 + x) - 128) *
              Math.cos((2 * x + 1) * u * Math.PI / 16) *
              Math.cos((2 * y + 1) * v * Math.PI / 16)
            x += 1
          }
          y += 1
        }
        val cu = if (u == 0) 0.70710678118654752 else 1.0
        val cv = if (v == 0) 0.70710678118654752 else 1.0
        out(v * 8 + u) = sum * cu * cv / 4.0
        u += 1
      }
      v += 1
    }
  }

  /** JFIF YCbCr → RGB (shared by truth and decode). */
  def ycbcrToRgb(yv: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def clamp(d: Double): Int = {
      val r = Math.round(d).toInt
      if (r < 0) 0 else if (r > 255) 255 else r
    }
    (clamp(yv + 1.402 * (cr - 128)),
      clamp(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
      clamp(yv + 1.772 * (cb - 128)))
  }

  /** RGB → JFIF YCbCr (golden-gen only). */
  def rgbToYcbcr(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    def clamp(d: Double): Int = {
      val v = Math.round(d).toInt
      if (v < 0) 0 else if (v > 255) 255 else v
    }
    (clamp(0.299 * r + 0.587 * g + 0.114 * b),
      clamp(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b),
      clamp(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b))
  }

  // ---- bit IO ----

  private final class BitWriter {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      nBits += len
      while (nBits >= 8) {
        val b = ((acc >> (nBits - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nBits -= 8
      }
    }
    def flush(): Unit = {
      if (nBits > 0) {
        val pad = 8 - nBits
        put((1 << pad) - 1, pad) // pad with 1s per the spec
      }
    }
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var nBits = 0
    var bad = false
    /** Read `len` bits MSB-first, honoring 0xFF00 stuffing. */
    def get(len: Int): Int = {
      while (nBits < len && !bad) {
        if (pos >= b.length) { bad = true }
        else {
          val v = b(pos) & 0xff
          pos += 1
          if (v == 0xff) {
            if (pos < b.length && (b(pos) & 0xff) == 0x00) pos += 1
            else { bad = true } // a real marker inside entropy data
          }
          acc = (acc << 8) | v
          nBits += 8
        }
      }
      if (bad) return 0
      val r = ((acc >> (nBits - len)) & ((1L << len) - 1)).toInt
      nBits -= len
      r
    }
  }

  private def decodeHuffSymbol(r: BitReader, t: HuffTable): Int = {
    var code = r.get(1)
    var len = 1
    while (len <= 16) {
      if (t.maxCode(len) >= 0 && code <= t.maxCode(len))
        return t.values(t.valPtr(len) + code - t.minCode(len))
      code = (code << 1) | r.get(1)
      len += 1
    }
    r.bad = true
    0
  }

  /** Signed magnitude category decode (JPEG "extend"). */
  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  private def category(v: Int): Int = {
    var a = Math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  // ---- encode (golden-gen only) ----

  /** Encode interleaved YCbCr 4:4:4 blocks. `quantized` holds, per MCU,
    * three zigzagged quantized 64-coefficient blocks (Y, Cb, Cr).
    * Exposed so the golden generator derives truth pixels from these
    * SAME coefficients without touching the bitstream.
    */
  def encodeFromCoefficients(width: Int, height: Int,
      quantized: Array[Array[Int]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }
    marker(0xd8) // SOI
    // DQT x2
    marker(0xdb); w16(67); w8(0)
    var i = 0
    while (i < 64) { w8(qLuma(zigzag(i))); i += 1 }
    marker(0xdb); w16(67); w8(1)
    i = 0
    while (i < 64) { w8(qChroma(zigzag(i))); i += 1 }
    // SOF0: 8-bit, 3 components, all 1x1 sampling
    marker(0xc0); w16(17); w8(8); w16(height); w16(width); w8(3)
    w8(1); w8(0x11); w8(0) // Y  -> qt 0
    w8(2); w8(0x11); w8(1) // Cb -> qt 1
    w8(3); w8(0x11); w8(1) // Cr -> qt 1
    // DHT x4
    def dht(clazz: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4)
      w16(2 + 1 + 16 + vals.length)
      w8((clazz << 4) | id)
      var l = 1
      while (l <= 16) { w8(bits(l)); l += 1 }
      vals.foreach(w8)
    }
    dht(0, 0, dcLumaBits, dcLumaVals)
    dht(1, 0, acLumaBits, acLumaVals)
    dht(0, 1, dcChromaBits, dcChromaVals)
    dht(1, 1, acChromaBits, acChromaVals)
    // SOS
    marker(0xda); w16(12); w8(3)
    w8(1); w8(0x00) // Y: DC 0 / AC 0
    w8(2); w8(0x11) // Cb: DC 1 / AC 1
    w8(3); w8(0x11)
    w8(0); w8(63); w8(0)
    // entropy-coded data
    val bw = new BitWriter
    val prevDc = new Array[Int](3)
    var m = 0
    while (m < quantized.length) {
      val comp = m % 3
      val blk = quantized(m)
      val (dcT, acT) = if (comp == 0) (dcL, acL) else (dcC, acC)
      // DC
      val diff = blk(0) - prevDc(comp)
      prevDc(comp) = blk(0)
      val n = category(diff)
      bw.put(dcT.codeOf.get(n), dcT.sizeOf.get(n))
      if (n > 0) bw.put(if (diff < 0) diff + (1 << n) - 1 else diff, n)
      // AC with run-length + ZRL + EOB
      var k = 1
      var run = 0
      while (k < 64) {
        val v = blk(k)
        if (v == 0) run += 1
        else {
          while (run > 15) { bw.put(acT.codeOf.get(0xf0), acT.sizeOf.get(0xf0)); run -= 16 }
          val s = category(v)
          val sym = (run << 4) | s
          bw.put(acT.codeOf.get(sym), acT.sizeOf.get(sym))
          bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.put(acT.codeOf.get(0x00), acT.sizeOf.get(0x00)) // EOB
      m += 1
    }
    bw.flush()
    out.write(bw.out.toByteArray)
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** RGB pixels → (jpeg bytes, truth pixels). Truth is dequant+IDCT of
    * the same quantized coefficients the bitstream carries (JPEG is
    * lossy: the source pixels are NOT the truth, the coefficients are).
    */
  def encodeWithTruth(img: Multimodal.PixelImage): (Array[Byte], Multimodal.PixelImage) = {
    require(img.channels == 3 && img.width % 8 == 0 && img.height % 8 == 0,
      "golden JPEGs are RGB with multiple-of-8 dims")
    val w = img.width
    val h = img.height
    val bw = w / 8
    val bh = h / 8
    // component planes
    val planes = Array.ofDim[Int](3, w * h)
    var p = 0
    while (p < w * h) {
      val (yv, cb, cr) = rgbToYcbcr(img.pixels(p * 3) & 0xff,
        img.pixels(p * 3 + 1) & 0xff, img.pixels(p * 3 + 2) & 0xff)
      planes(0)(p) = yv; planes(1)(p) = cb; planes(2)(p) = cr
      p += 1
    }
    val mcus = new Array[Array[Int]](bw * bh * 3)
    val truthPlanes = Array.ofDim[Int](3, w * h)
    val samples = new Array[Int](64)
    val freq = new Array[Double](64)
    val recon = new Array[Int](64)
    val deq = new Array[Int](64)
    var by = 0
    var mi = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        var comp = 0
        while (comp < 3) {
          val qt = if (comp == 0) qLuma else qChroma
          var i = 0
          while (i < 64) {
            val x = bx * 8 + i % 8
            val y = by * 8 + i / 8
            samples(i) = planes(comp)(y * w + x)
            i += 1
          }
          fdct8x8(samples, freq)
          val zz = new Array[Int](64)
          i = 0
          while (i < 64) {
            val nat = zigzag(i)
            zz(i) = Math.round(freq(nat) / qt(nat)).toInt
            i += 1
          }
          mcus(mi) = zz
          // truth: dequantize + shared IDCT
          i = 0
          while (i < 64) { deq(zigzag(i)) = zz(i) * qt(zigzag(i)); i += 1 }
          idct8x8(deq, recon)
          i = 0
          while (i < 64) {
            val x = bx * 8 + i % 8
            val y = by * 8 + i / 8
            truthPlanes(comp)(y * w + x) = recon(i)
            i += 1
          }
          comp += 1
          mi += 1
        }
        bx += 1
      }
      by += 1
    }
    val truth = new Array[Byte](w * h * 3)
    p = 0
    while (p < w * h) {
      val (r, g, b) = ycbcrToRgb(truthPlanes(0)(p), truthPlanes(1)(p), truthPlanes(2)(p))
      truth(p * 3) = r.toByte; truth(p * 3 + 1) = g.toByte; truth(p * 3 + 2) = b.toByte
      p += 1
    }
    (encodeFromCoefficients(w, h, mcus), Multimodal.PixelImage(w, h, 3, truth))
  }

  // ---- decode (the kernel) ----

  def decode(b: Array[Byte]): Option[Multimodal.PixelImage] = {
    try {
      if (b == null || b.length < 4 ||
          (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
      var width = 0
      var height = 0
      var nComp = 0
      val qtOf = new Array[Int](4) // component -> quant table id
      val qts = Array.ofDim[Int](4, 64) // natural order
      val dcTables = new Array[HuffTable](4)
      val acTables = new Array[HuffTable](4)
      val compDc = new Array[Int](3)
      val compAc = new Array[Int](3)
      var i = 2
      var sosAt = -1
      while (sosAt < 0 && i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None
        val marker = b(i + 1) & 0xff
        if (marker == 0xd9) return None // EOI before SOS
        else if (marker >= 0xd0 && marker <= 0xd7) { i += 2 }
        else {
          val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
          val seg = i + 4
          val segEnd = i + 2 + len
          if (segEnd > b.length) return None
          marker match {
            case 0xdb => // DQT (possibly several tables per segment)
              var j = seg
              while (j < segEnd) {
                val pq = (b(j) >> 4) & 0x0f
                val tq = b(j) & 0x0f
                if (pq != 0 || tq > 3 || j + 65 > segEnd) return None
                var k = 0
                while (k < 64) { qts(tq)(zigzag(k)) = b(j + 1 + k) & 0xff; k += 1 }
                j += 65
              }
            case 0xc4 => // DHT
              var j = seg
              while (j < segEnd) {
                val tc = (b(j) >> 4) & 0x0f
                val th = b(j) & 0x0f
                if (th > 3 || j + 17 > segEnd) return None
                val bits = new Array[Int](17)
                var total = 0
                var k = 1
                while (k <= 16) { bits(k) = b(j + k) & 0xff; total += bits(k); k += 1 }
                if (j + 17 + total > segEnd) return None
                val vals = new Array[Int](total)
                k = 0
                while (k < total) { vals(k) = b(j + 17 + k) & 0xff; k += 1 }
                if (tc == 0) dcTables(th) = new HuffTable(bits, vals)
                else acTables(th) = new HuffTable(bits, vals)
                j += 17 + total
              }
            case 0xc0 => // SOF0 baseline
              if (len < 8) return None
              if ((b(seg) & 0xff) != 8) return None
              height = ((b(seg + 1) & 0xff) << 8) | (b(seg + 2) & 0xff)
              width = ((b(seg + 3) & 0xff) << 8) | (b(seg + 4) & 0xff)
              nComp = b(seg + 5) & 0xff
              if (nComp != 3 || width <= 0 || height <= 0) return None
              var c = 0
              while (c < 3) {
                val samp = b(seg + 6 + c * 3 + 1) & 0xff
                if (samp != 0x11) return None // 4:4:4 only
                qtOf(c) = b(seg + 6 + c * 3 + 2) & 0x0f
                c += 1
              }
            case m if m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
              return None // progressive / extended / arithmetic
            case 0xdd => return None // restart intervals unsupported
            case 0xda => // SOS
              if (len < 6) return None
              val ns = b(seg) & 0xff
              if (ns != 3) return None
              var c = 0
              while (c < 3) {
                compDc(c) = (b(seg + 2 + c * 2) >> 4) & 0x0f
                compAc(c) = b(seg + 2 + c * 2) & 0x0f
                c += 1
              }
              sosAt = segEnd
            case _ => () // APPn / COM / etc: skip
          }
          i = segEnd
        }
      }
      if (sosAt < 0 || width == 0) return None
      var c = 0
      while (c < 3) {
        if (dcTables(compDc(c)) == null || acTables(compAc(c)) == null) return None
        c += 1
      }
      val bw = (width + 7) / 8
      val bh = (height + 7) / 8
      val planes = Array.ofDim[Int](3, bw * 8 * bh * 8)
      val r = new BitReader(b, sosAt)
      val prevDc = new Array[Int](3)
      val coef = new Array[Int](64)
      val recon = new Array[Int](64)
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          c = 0
          while (c < 3) {
            val dcT = dcTables(compDc(c))
            val acT = acTables(compAc(c))
            val qt = qts(qtOf(c))
            java.util.Arrays.fill(coef, 0)
            // DC
            val n = decodeHuffSymbol(r, dcT)
            val diff = extend(r.get(n), n)
            prevDc(c) += diff
            coef(0) = prevDc(c) * qt(0)
            // AC
            var k = 1
            while (k < 64) {
              val sym = decodeHuffSymbol(r, acT)
              if (r.bad) return None
              if (sym == 0x00) k = 64 // EOB
              else if (sym == 0xf0) k += 16 // ZRL
              else {
                k += (sym >> 4) & 0x0f
                if (k > 63) return None
                val s = sym & 0x0f
                coef(zigzag(k)) = extend(r.get(s), s) * qt(zigzag(k))
                k += 1
              }
            }
            if (r.bad) return None
            idct8x8(coef, recon)
            var ii = 0
            while (ii < 64) {
              val x = bx * 8 + ii % 8
              val y = by * 8 + ii / 8
              planes(c)(y * bw * 8 + x) = recon(ii)
              ii += 1
            }
            c += 1
          }
          bx += 1
        }
        by += 1
      }
      // crop to real dims + color convert
      val px = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val sp = y * bw * 8 + x
          val (rr, gg, bb2) = ycbcrToRgb(planes(0)(sp), planes(1)(sp), planes(2)(sp))
          val dp = (y * width + x) * 3
          px(dp) = rr.toByte; px(dp + 1) = gg.toByte; px(dp + 2) = bb2.toByte
          x += 1
        }
        y += 1
      }
      Some(Multimodal.PixelImage(width, height, 3, px))
    } catch { case _: Exception => None }
  }
}
