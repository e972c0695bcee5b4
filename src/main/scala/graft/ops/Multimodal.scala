package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * BINARY columns with typed metadata structs; per-row media kernels
  * run in mapPartitions exactly like the HTML cascade.
  *
  * [[decodeMeta]] is a REAL pure-JVM header decoder for PNG, GIF and
  * JPEG (signature sniff → format-specific dimension/channel parse; no
  * codec jar needed for header metadata), with the deterministic GRFT
  * fake format kept for the video/frame-sampling tests.
  *
  * All three image formats additionally have REAL pixel paths
  * ([[decodePixels]] sniffing into [[decodePngPixels]] /
  * [[decodeGifPixels]] / [[Jpeg.decode]], then [[resizePixels]] /
  * [[resizeImages]]): PNG = IDAT zlib inflate + all five scanline
  * unfilters (pure java.util.zip); GIF = a from-scratch LZW
  * decompressor + palette mapping; JPEG = baseline huffman decode +
  * dequant + IDCT + YCbCr->RGB ([[Jpeg]]); all feed an integer
  * box-filter downscale. [[frameSampleStub]] remains the one
  * metadata-only transform (video codecs are out of sandbox scope).
  */
object Multimodal {

  /** Fake media header: magic(4) | kind(1) | width(4) | height(4) |
    * channels(1) | payloadLen(4), big-endian, then payload bytes.
    */
  final case class MediaMeta(kind: String, width: Int, height: Int,
      channels: Int, payload_len: Int, valid: Boolean)

  private val Magic = Array[Byte]('G', 'R', 'F', 'T')
  private val kinds = Array("image", "audio", "video")

  /** Deterministic fake payload for row `id` (test/bench data source). */
  def fakeMedia(id: Long): Array[Byte] = {
    var h = id * 0x9e3779b97f4a7c15L
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    val kind = (Math.floorMod(h, 3)).toInt
    val width = 64 + (Math.floorMod(h >> 8, 1024)).toInt
    val height = 64 + (Math.floorMod(h >> 18, 1024)).toInt
    val channels = 1 + (Math.floorMod(h >> 28, 4)).toInt
    val payloadLen = 128 + (Math.floorMod(h >> 30, 4096)).toInt
    val bb = java.nio.ByteBuffer.allocate(18 + payloadLen)
    bb.put(Magic).put(kind.toByte).putInt(width).putInt(height)
      .put(channels.toByte).putInt(payloadLen)
    var i = 0
    while (i < payloadLen) { bb.put((h >> (i % 56)).toByte); i += 1 }
    bb.array()
  }

  /** Header decoder kernel: sniffs the payload signature and parses
    * real PNG / GIF / JPEG headers (pure JVM — dimensions and channel
    * count need no codec), falling back to the GRFT fake format used by
    * the video tests. Unknown/truncated payloads come back as
    * `("unknown", valid=false)` rows — errors are data, never task
    * exceptions, same convention as the HTML cascade.
    */
  def decodeMeta(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.length < 6)
      return MediaMeta("unknown", 0, 0, 0, 0, valid = false)
    try {
      if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
        decodePng(bytes)
      else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8')
        decodeGif(bytes)
      else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
        decodeJpeg(bytes)
      else if (bytes(0) == 'G' && bytes(1) == 'R' && bytes(2) == 'F' && bytes(3) == 'T')
        decodeGrft(bytes)
      else MediaMeta("unknown", 0, 0, 0, 0, valid = false)
    } catch {
      case _: Exception => MediaMeta("unknown", 0, 0, 0, 0, valid = false)
    }
  }

  private def beU32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
    ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def beU16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** PNG: 8-byte signature, then the IHDR chunk — width/height are
    * big-endian u32 at offsets 16/20; color type at 25 maps to the
    * channel count (spec: gray=1, rgb=3, palette=1, gray+a=2, rgba=4).
    */
  private def decodePng(b: Array[Byte]): MediaMeta = {
    if (b.length < 26 || b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
      return MediaMeta("image", 0, 0, 0, b.length, valid = false)
    val w = beU32(b, 16)
    val h = beU32(b, 20)
    val channels = (b(25) & 0xff) match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => 0
    }
    MediaMeta("image", w.toInt, h.toInt, channels, b.length,
      valid = w > 0 && h > 0 && channels > 0)
  }

  /** GIF87a/89a: logical screen width/height are little-endian u16 at
    * offsets 6/8; palette-indexed RGB → 3 channels.
    */
  private def decodeGif(b: Array[Byte]): MediaMeta = {
    if (b.length < 13) return MediaMeta("image", 0, 0, 0, b.length, valid = false)
    val w = leU16(b, 6)
    val h = leU16(b, 8)
    MediaMeta("image", w, h, 3, b.length, valid = w > 0 && h > 0)
  }

  /** JPEG: walk the marker segments from SOI until a start-of-frame
    * (SOF0..SOF15 except the DHT/DAC markers C4/C8/CC); the frame
    * header carries height/width as big-endian u16 and the component
    * count (1=gray, 3=YCbCr).
    */
  private def decodeJpeg(b: Array[Byte]): MediaMeta = {
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return MediaMeta("image", 0, 0, 0, b.length, valid = false)
      val marker = b(i + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) { // EOI / SOS: no frame seen
        return MediaMeta("image", 0, 0, 0, b.length, valid = false)
      } else if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        if (i + 9 >= b.length) return MediaMeta("image", 0, 0, 0, b.length, valid = false)
        val h = beU16(b, i + 5)
        val w = beU16(b, i + 7)
        val channels = b(i + 9) & 0xff
        return MediaMeta("image", w, h, channels, b.length, valid = w > 0 && h > 0)
      } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2 // standalone markers carry no length
      } else {
        i += 2 + beU16(b, i + 2)
      }
    }
    MediaMeta("image", 0, 0, 0, b.length, valid = false)
  }

  /** The deterministic GRFT fake format (video/audio plumbing tests). */
  private def decodeGrft(bytes: Array[Byte]): MediaMeta = {
    if (bytes.length < 18) return MediaMeta("unknown", 0, 0, 0, 0, valid = false)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.position(4)
    val kind = kinds(math.min(bb.get().toInt, 2))
    val w = bb.getInt; val h = bb.getInt
    val c = bb.get().toInt; val pl = bb.getInt
    MediaMeta(kind, w, h, c, pl, valid = bytes.length >= 18 + pl)
  }

  // ---- real audio/video container headers (pure JVM, no codec) ----

  /** Audio/video container metadata parsed from real headers:
    * WAV (RIFF chunks → channels/sample-rate/duration) and MP4
    * (ISO-BMFF box walk → mvhd timescale/duration, trak count).
    */
  final case class AvMeta(kind: String, channels: Int, sample_rate: Int,
      duration_ms: Long, n_tracks: Int, valid: Boolean)

  def decodeAvMeta(bytes: Array[Byte]): AvMeta = {
    try {
      if (bytes == null || bytes.length < 12)
        AvMeta("unknown", 0, 0, 0L, 0, valid = false)
      else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')
        decodeWav(bytes)
      else if (bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p')
        decodeMp4(bytes)
      else AvMeta("unknown", 0, 0, 0L, 0, valid = false)
    } catch {
      case _: Exception => AvMeta("unknown", 0, 0, 0L, 0, valid = false)
    }
  }

  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
    ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** WAV: walk RIFF chunks for `fmt ` (channels, sample rate, bits) and
    * `data` (payload size → sample count → duration).
    */
  private def decodeWav(b: Array[Byte]): AvMeta = {
    var channels = 0
    var sampleRate = 0
    var bitsPerSample = 16
    var dataLen = -1L
    // Offsets walked in Long arithmetic: leU32 is unsigned, so the word-
    // aligned step 8+size+(size&1) is always >= 8 and the walk provably
    // terminates. (Int truncation here once let a corrupt size of
    // 0xFFFFFFF8 produce a zero step and wedge the task forever.)
    var i = 12L
    while (i + 8 <= b.length) {
      val ii = i.toInt
      val id = new String(b, ii, 4, "US-ASCII")
      val size = leU32(b, ii + 4)
      if (id == "fmt " && ii + 24 <= b.length) {
        channels = leU16(b, ii + 10)
        sampleRate = leU32(b, ii + 12).toInt
        if (size >= 16) bitsPerSample = leU16(b, ii + 22)
      } else if (id == "data") dataLen = size
      i += 8L + size + (size & 1L) // chunks are word-aligned
    }
    if (channels <= 0 || sampleRate <= 0 || dataLen < 0)
      return AvMeta("audio", channels, sampleRate, 0L, 1, valid = false)
    val bytesPerSample = math.max(1, bitsPerSample / 8) * channels
    val nSamples = dataLen / bytesPerSample
    AvMeta("audio", channels, sampleRate, nSamples * 1000L / sampleRate, 1,
      valid = true)
  }

  /** MP4 (ISO-BMFF): walk the top-level boxes to `moov`, read `mvhd`
    * (v0: timescale u32 / duration u32 at offsets 12/16 of the box
    * body; v1: u32 timescale at 20, u64 duration at 24) and count
    * `trak` children.
    */
  private def decodeMp4(b: Array[Byte]): AvMeta = {
    var timescale = 0L
    var duration = -1L
    var tracks = 0
    // Box offsets in Long arithmetic with an explicit size >= 8 gate at
    // both nesting levels: beU32 is unsigned, so every accepted step
    // advances by >= 8 and both walks provably terminate (no reliance on
    // a truncated negative index throwing).
    var i = 0L
    while (i + 8 <= b.length) {
      val ii = i.toInt
      val size = beU32(b, ii)
      val typ = new String(b, ii + 4, 4, "US-ASCII")
      if (size < 8) return AvMeta("video", 0, 0, 0L, tracks, valid = false)
      if (typ == "moov") {
        var j = i + 8
        val end = math.min(b.length.toLong, i + size)
        while (j + 8 <= end) {
          val jj = j.toInt
          val s2 = beU32(b, jj)
          val t2 = new String(b, jj + 4, 4, "US-ASCII")
          if (s2 < 8) return AvMeta("video", 0, 0, 0L, tracks, valid = false)
          if (t2 == "mvhd" && j + 8 < end) {
            val version = b(jj + 8) & 0xff
            if (version == 0 && j + 24 <= end) {
              timescale = beU32(b, jj + 20)
              duration = beU32(b, jj + 24)
            } else if (version == 1 && j + 36 <= end) {
              timescale = beU32(b, jj + 28)
              duration = (beU32(b, jj + 32) << 32) | beU32(b, jj + 36)
            }
          } else if (t2 == "trak") tracks += 1
          j += s2
        }
      }
      i += size
    }
    if (timescale <= 0 || duration < 0)
      AvMeta("video", 0, 0, 0L, tracks, valid = false)
    else AvMeta("video", 0, 0, duration * 1000L / timescale, tracks, valid = true)
  }

  /** Minimal valid WAV with deterministic silence payload. */
  def makeWav(channels: Int, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2)
      .putShort((channels * 2).toShort)
      .putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < dataLen) { bb.put(((i * 31) & 0xff).toByte); i += 1 }
    bb.array()
  }

  /** Minimal valid MP4: ftyp + moov(mvhd v0 + `nTracks` trak stubs). */
  def makeMp4(timescale: Int, duration: Int, nTracks: Int): Array[Byte] = {
    val ftyp = java.nio.ByteBuffer.allocate(20)
    ftyp.putInt(20).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(512)
      .put("mp41".getBytes("US-ASCII"))
    val mvhd = java.nio.ByteBuffer.allocate(108)
    mvhd.putInt(108).put("mvhd".getBytes("US-ASCII"))
      .putInt(0) // version 0 + flags
      .putInt(0).putInt(0) // creation/modification
      .putInt(timescale).putInt(duration)
    // rate/volume/reserved/matrix/predefined/nextTrack: zero-filled
    val trak = java.nio.ByteBuffer.allocate(16)
    trak.putInt(16).put("trak".getBytes("US-ASCII"))
      .putInt(8).put("free".getBytes("US-ASCII"))
    val moovLen = 8 + 108 + 16 * nTracks
    val out = java.nio.ByteBuffer.allocate(20 + moovLen)
    out.put(ftyp.array())
    out.putInt(moovLen).put("moov".getBytes("US-ASCII"))
    out.put(mvhd.array())
    var t = 0
    while (t < nTracks) { out.put(trak.array()); t += 1 }
    out.array()
  }

  /** Deterministic audio/video corpus row: WAV for even ids, MP4 for
    * odd. Returns (payload, kind, channels, sample_rate, duration_ms,
    * n_tracks).
    */
  def goldenAv(id: Long): (Array[Byte], String, Int, Int, Long, Int) = {
    var h = id * 0xc2b2ae3d27d4eb4fL
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    if (id % 2 == 0) {
      val channels = 1 + Math.floorMod(h, 2L).toInt
      val rate = Array(8000, 16000, 22050, 44100)(Math.floorMod(h >> 8, 4L).toInt)
      val nSamples = 500 + Math.floorMod(h >> 16, 3500L).toInt
      (makeWav(channels, rate, nSamples), "audio", channels, rate,
        nSamples.toLong * 1000L / rate, 1)
    } else {
      val timescale = Array(600, 1000, 90000)(Math.floorMod(h, 3L).toInt)
      val duration = (timescale * (1 + Math.floorMod(h >> 8, 300L))).toInt
      val tracks = 1 + Math.floorMod(h >> 24, 3L).toInt
      (makeMp4(timescale, duration, tracks), "video", 0, 0,
        duration.toLong * 1000L / timescale, tracks)
    }
  }

  /** media(id, payload BINARY) → audio/video metadata columns. */
  def decodeAv(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val m = decodeAvMeta(bytes)
        (id, m.kind, m.channels, m.sample_rate, m.duration_ms, m.n_tracks, m.valid)
      })
      .toDF("id", "kind", "channels", "sample_rate", "duration_ms", "n_tracks", "valid")
  }

  // ---- deterministic real-format encoders (golden/test data) ----

  /** Minimal structurally-valid PNG: signature + IHDR (real CRC32) +
    * IEND. colorType ∈ {0 gray, 2 rgb, 6 rgba}.
    */
  def makePng(width: Int, height: Int, colorType: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    writePngChunk(out, "IHDR", ihdr)
    writePngChunk(out, "IEND", Array.empty)
    out.toByteArray
  }

  private def writePngChunk(out: java.io.ByteArrayOutputStream,
      typ: String, data: Array[Byte]): Unit = {
    val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len)
    val body = typ.getBytes("US-ASCII") ++ data
    out.write(body)
    val crc = new java.util.zip.CRC32()
    crc.update(body)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  /** Minimal GIF89a: header + logical screen descriptor + trailer. */
  def makeGif(width: Int, height: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(14)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GIF89a".getBytes("US-ASCII"))
    bb.putShort(width.toShort).putShort(height.toShort)
    bb.put(0.toByte).put(0.toByte).put(0.toByte) // packed, bg, aspect
    bb.put(0x3b.toByte) // trailer
    bb.array()
  }

  /** Minimal JPEG: SOI + APP0(JFIF) + SOF0 frame header + EOI. */
  def makeJpeg(width: Int, height: Int, components: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0xff, 0xd8).map(_.toByte)) // SOI
    // APP0 JFIF segment (so the scanner exercises segment skipping)
    val app0 = Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    out.write(Array(0xff, 0xe0).map(_.toByte))
    out.write(Array(((app0.length + 2) >> 8) & 0xff, (app0.length + 2) & 0xff).map(_.toByte))
    out.write(app0)
    // SOF0
    val sofLen = 8 + 3 * components
    out.write(Array(0xff, 0xc0, (sofLen >> 8) & 0xff, sofLen & 0xff, 8).map(_.toByte))
    out.write(Array((height >> 8) & 0xff, height & 0xff,
      (width >> 8) & 0xff, width & 0xff, components).map(_.toByte))
    var c = 0
    while (c < components) {
      out.write(Array(c + 1, 0x11, 0).map(_.toByte))
      c += 1
    }
    out.write(Array(0xff, 0xd9).map(_.toByte)) // EOI
    out.toByteArray
  }

  /** Deterministic real-format media row for id: cycles PNG/GIF/JPEG
    * with hash-derived dimensions spanning both resize branches.
    * Returns (payload, width, height, channels).
    */
  def goldenMedia(id: Long): (Array[Byte], Int, Int, Int) = {
    var h = id * 0x9e3779b97f4a7c15L
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    val width = 16 + Math.floorMod(h, 1500).toInt
    val height = 16 + Math.floorMod(h >> 16, 1500).toInt
    Math.floorMod(id, 3L).toInt match {
      case 0 =>
        val colorType = Array(0, 2, 6)(Math.floorMod(h >> 32, 3).toInt)
        val ch = colorType match { case 0 => 1; case 2 => 3; case _ => 4 }
        (makePng(width, height, colorType), width, height, ch)
      case 1 => (makeGif(width, height), width, height, 3)
      case _ =>
        val comps = if (Math.floorMod(h >> 40, 4) == 0L) 1 else 3
        (makeJpeg(width, height, comps), width, height, comps)
    }
  }

  /** media(id, payload BINARY) → typed metadata columns; the pooled-
    * kernel mapPartitions shape shared with the HTML cascade.
    */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // a real decoder would init its (pooled) codec context here,
        // once per partition — same pattern as CascadeExtractor.pooled()
        it.map { case (id, bytes) =>
          val m = decodeMeta(bytes)
          (id, m.kind, m.width, m.height, m.channels, m.payload_len, m.valid)
        }
      }
      .toDF("id", "kind", "width", "height", "channels", "payload_len", "valid")
  }

  /** Real feature extraction from the payload bytes (no codec needed):
    * header metadata joined with content statistics — byte entropy
    * (Shannon, over the 256-bucket byte histogram), zero-byte ratio,
    * and aspect ratio. The mapPartitions kernel reuses one histogram
    * buffer per partition (pooled, like the HTML parser).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val hist = new Array[Long](256) // pooled per partition
        it.map { case (id, bytes) =>
          val m = decodeMeta(bytes)
          java.util.Arrays.fill(hist, 0L)
          var i = 0
          val n = if (bytes == null) 0 else bytes.length
          while (i < n) { hist(bytes(i) & 0xff) += 1; i += 1 }
          var entropy = 0.0
          var zeros = 0L
          if (n > 0) {
            var b = 0
            while (b < 256) {
              val c = hist(b)
              if (c > 0) {
                val p = c.toDouble / n
                entropy -= p * (math.log(p) / math.log(2.0))
              }
              b += 1
            }
            zeros = hist(0)
          }
          val aspect = if (m.height > 0) m.width.toDouble / m.height else 0.0
          (id, m.kind, m.valid, n, entropy, zeros.toDouble / math.max(n, 1), aspect)
        }
      }
      .toDF("id", "kind", "valid", "n_bytes", "byte_entropy", "zero_ratio", "aspect_ratio")
  }

  // ---- real PNG pixel path (decode + resize, pure java.util.zip) ----

  /** A fully-decoded 8-bit image: interleaved channel bytes, row-major. */
  final case class PixelImage(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  /** Full PNG decode: chunk walk → concatenated IDAT zlib inflate →
    * per-scanline unfilter (None/Sub/Up/Average/Paeth per the PNG spec
    * §9). Supports the non-palette 8-bit color types (gray / rgb /
    * gray+alpha / rgba), non-interlaced — the shapes [[makePngPixels]]
    * emits and the overwhelming web majority. Returns None for
    * palette/16-bit/interlaced/corrupt payloads (callers surface
    * valid=false rows; errors are data).
    */
  def decodePngPixels(b: Array[Byte]): Option[PixelImage] = {
    try {
      if (b == null || b.length < 33 ||
          (b(0) & 0xff) != 0x89 || b(1) != 'P' || b(2) != 'N' || b(3) != 'G' ||
          b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
        return None
      val w = beU32(b, 16).toInt
      val h = beU32(b, 20).toInt
      val bitDepth = b(24) & 0xff
      val colorType = b(25) & 0xff
      val interlace = b(28) & 0xff
      val channels = colorType match {
        case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
        case _ => return None // palette (3) needs PLTE handling
      }
      if (bitDepth != 8 || interlace != 0 || w <= 0 || h <= 0) return None
      // gather IDAT payloads (offsets walked in Long like the AV parsers)
      val idat = new java.io.ByteArrayOutputStream()
      var i = 8L
      var done = false
      while (!done && i + 8 <= b.length) {
        val len = beU32(b, i.toInt)
        val typ = new String(b, i.toInt + 4, 4, "US-ASCII")
        if (typ == "IEND") done = true
        else if (typ == "IDAT") {
          if (i + 8 + len > b.length) return None
          idat.write(b, i.toInt + 8, len.toInt)
        }
        i += 12L + len // len + type + crc
      }
      val stride = w * channels
      val raw = new Array[Byte]((stride + 1) * h)
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        // truncated stream or preset-dictionary stream: no progress possible
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        off += n
      }
      inf.end()
      if (off != raw.length) return None
      // unfilter in place into the output buffer
      val out = new Array[Byte](stride * h)
      val bpp = channels
      var y = 0
      while (y < h) {
        val ft = raw(y * (stride + 1)) & 0xff
        val src = y * (stride + 1) + 1
        val dst = y * stride
        var x = 0
        while (x < stride) {
          val cur = raw(src + x) & 0xff
          val left = if (x >= bpp) out(dst + x - bpp) & 0xff else 0
          val up = if (y > 0) out(dst - stride + x) & 0xff else 0
          val ul = if (y > 0 && x >= bpp) out(dst - stride + x - bpp) & 0xff else 0
          val v = ft match {
            case 0 => cur
            case 1 => cur + left
            case 2 => cur + up
            case 3 => cur + ((left + up) >> 1)
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
              val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
              cur + pred
            case _ => return None
          }
          out(dst + x) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Some(PixelImage(w, h, channels, out))
    } catch { case _: Exception => None }
  }

  /** GIF frame enumeration (pure JVM): header + logical screen
    * descriptor + global color table, extension-block skip, then EVERY
    * image descriptor decoded through a from-scratch LZW decompressor
    * (variable code width 3..12 bits, clear/EOI codes, 4096-entry
    * dictionary) and mapped through the palette to interleaved RGB.
    * Animated GIFs yield one PixelImage per frame. Restricted to the
    * tractable-and-common shape: full-frame, non-interlaced frames on
    * the global palette (no disposal compositing); anything else —
    * local palettes, interlacing, partial frames, corrupt streams —
    * returns None (errors are data).
    */
  def decodeGifFrames(b: Array[Byte], maxFrames: Int = 4096): Option[Seq[PixelImage]] = {
    try {
      if (b == null || b.length < 14 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8')
        return None
      val sw = leU16(b, 6)
      val sh = leU16(b, 8)
      val packed = b(10) & 0xff
      if ((packed & 0x80) == 0) return None // no global color table
      val gctSize = 2 << (packed & 0x07)
      var i = 13
      val palette = new Array[Byte](gctSize * 3)
      if (i + palette.length > b.length) return None
      System.arraycopy(b, i, palette, 0, palette.length)
      i += palette.length
      val frames = scala.collection.mutable.ArrayBuffer.empty[PixelImage]
      var done = false
      while (!done && i < b.length && frames.length < maxFrames) {
        (b(i) & 0xff) match {
          case 0x21 => // extension: label + sub-blocks
            i += 2
            while (i < b.length && b(i) != 0) i += 1 + (b(i) & 0xff)
            i += 1
          case 0x3b => done = true
          case 0x2c =>
            val r = decodeOneGifFrame(b, i, sw, sh, palette, gctSize)
            if (r == null) return None
            frames += r._1
            i = r._2
          case _ => return None
        }
      }
      if (frames.isEmpty) None else Some(frames.toSeq)
    } catch { case _: Exception => None }
  }

  /** Single-frame convenience view of [[decodeGifFrames]]. */
  def decodeGifPixels(b: Array[Byte]): Option[PixelImage] =
    decodeGifFrames(b, maxFrames = 1).flatMap(_.headOption)

  /** One image descriptor + LZW stream starting at `i0` (which points at
    * the 0x2C separator). Returns (frame, nextIndex) or null on any
    * unsupported/corrupt shape.
    */
  private def decodeOneGifFrame(b: Array[Byte], i0: Int, sw: Int, sh: Int,
      palette: Array[Byte], gctSize: Int): (PixelImage, Int) = {
    var i = i0
    if (i + 10 > b.length) return null
    // descriptor: 0x2C, left u16, top u16, width u16, height u16, packed
    val iw = leU16(b, i + 5)
    val ih = leU16(b, i + 7)
    val ipacked = b(i + 9) & 0xff
    if ((ipacked & 0x80) != 0) return null // local color table unsupported
    if ((ipacked & 0x40) != 0) return null // interlaced unsupported
    if (iw <= 0 || ih <= 0 || iw != sw || ih != sh) return null // full-frame only
    i += 10
    if (i >= b.length) return null
    val minCodeSize = b(i) & 0xff
    i += 1
    if (minCodeSize < 2 || minCodeSize > 8) return null
    // concatenate data sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    while (i < b.length && b(i) != 0) {
      val len = b(i) & 0xff
      if (i + 1 + len > b.length) return null
      data.write(b, i + 1, len)
      i += 1 + len
    }
    if (i >= b.length) return null
    i += 1 // block terminator
    val bytes = data.toByteArray
    // LZW decode into index buffer
    val nPix = iw * ih
    val indices = new Array[Byte](nPix)
    var out = 0
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    // dictionary as prefix/suffix arrays
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var dictSize = eoi + 1
    var codeWidth = minCodeSize + 1
    var prev = -1
    var bitPos = 0
    val totalBits = bytes.length * 8
    var finished = false
    while (!finished && out < nPix) {
      if (bitPos + codeWidth > totalBits) { finished = true }
      else {
        // read little-endian bit-packed code
        var code = 0
        var k = 0
        while (k < codeWidth) {
          val bit = bitPos + k
          if ((bytes(bit >> 3) >> (bit & 7) & 1) != 0) code |= 1 << k
          k += 1
        }
        bitPos += codeWidth
        if (code == clear) {
          dictSize = eoi + 1
          codeWidth = minCodeSize + 1
          prev = -1
        } else if (code == eoi) {
          finished = true
        } else {
          // expand a code into `stack` (bytes in reverse); roots are
          // codes < clear, table entries are >= eoi+1
          def expand(c0: Int): Int = {
            var sp = 0
            var cur = c0
            while (cur >= eoi + 1) {
              if (cur >= dictSize || sp >= stack.length - 1) return -1
              stack(sp) = suffix(cur); sp += 1
              cur = prefix(cur)
            }
            if (cur >= clear) return -1 // clear/eoi inside a chain: corrupt
            stack(sp) = cur.toByte; sp += 1
            sp
          }
          var sp = 0
          if (code < dictSize) {
            sp = expand(code)
          } else if (code == dictSize && prev >= 0) {
            // KwKwK: entry = expand(prev) + firstChar(expand(prev))
            sp = expand(prev)
            if (sp > 0) {
              val first = stack(sp - 1) // last pushed = first byte
              // prepend first at the BOTTOM of the reversed stack
              System.arraycopy(stack, 0, stack, 1, sp)
              stack(0) = first
              sp += 1
            }
          } else return null
          if (sp <= 0) return null
          if (out + sp > nPix) return null
          var w = sp - 1
          while (w >= 0) { indices(out) = stack(w); out += 1; w -= 1 }
          // new dictionary entry: expand(prev) + first byte just written
          if (prev >= 0 && dictSize < 4096) {
            prefix(dictSize) = prev
            suffix(dictSize) = indices(out - sp) // first byte of this output
            dictSize += 1
            if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
          }
          prev = code
        }
      }
    }
    if (out != nPix) return null
    // palette map to RGB
    val px = new Array[Byte](nPix * 3)
    var p = 0
    while (p < nPix) {
      val idx = indices(p) & 0xff
      if (idx >= gctSize) return null
      px(p * 3) = palette(idx * 3)
      px(p * 3 + 1) = palette(idx * 3 + 1)
      px(p * 3 + 2) = palette(idx * 3 + 2)
      p += 1
    }
    (PixelImage(iw, ih, 3, px), i)
  }

  /** Integer box-filter downscale preserving aspect ratio: output pixel
    * (ox, oy) averages the exact source block [ox*w/ow, (ox+1)*w/ow) x
    * [oy*h/oh, (oy+1)*h/oh) per channel with floor division — fully
    * deterministic integer math, so generation-time truth and the
    * kernel agree bit-for-bit. Images already within maxSide pass
    * through untouched.
    */
  def resizePixels(img: PixelImage, maxSide: Int): PixelImage = {
    val maxDim = math.max(img.width, img.height)
    if (maxDim <= maxSide) return img
    val ow = math.max(1, img.width.toLong * maxSide / maxDim).toInt
    val oh = math.max(1, img.height.toLong * maxSide / maxDim).toInt
    val c = img.channels
    val out = new Array[Byte](ow * oh * c)
    var oy = 0
    while (oy < oh) {
      val y0 = (oy.toLong * img.height / oh).toInt
      val y1 = math.max(y0 + 1, ((oy + 1).toLong * img.height / oh).toInt)
      var ox = 0
      while (ox < ow) {
        val x0 = (ox.toLong * img.width / ow).toInt
        val x1 = math.max(x0 + 1, ((ox + 1).toLong * img.width / ow).toInt)
        val count = (y1 - y0).toLong * (x1 - x0)
        var ch = 0
        while (ch < c) {
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            val rowBase = (y * img.width) * c + ch
            while (x < x1) { sum += img.pixels(rowBase + x * c) & 0xff; x += 1 }
            y += 1
          }
          out((oy * ow + ox) * c + ch) = (sum / count).toByte
          ch += 1
        }
        ox += 1
      }
      oy += 1
    }
    PixelImage(ow, oh, c, out)
  }

  /** CRC32 of an interleaved pixel buffer (the pixel-evidence checksum
    * carried by the resize oracle).
    */
  def pixelCrc(img: PixelImage): Long = {
    val crc = new java.util.zip.CRC32()
    crc.update(img.pixels)
    crc.getValue
  }

  /** REAL pixel-level resize over a binary image column (PNG or GIF,
    * sniffed): decode (PNG inflate+unfilter / GIF LZW+palette) →
    * box-filter downscale → checksum. Pooled mapPartitions kernel;
    * undecodable payloads yield valid=false rows. At 100 TB this is the
    * same per-row embarrassingly-parallel shape as the HTML cascade —
    * no shuffle, scan-partition parallelism.
    */
  def resizeImages(media: DataFrame, maxSide: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodePixels(bytes) match {
          case Some(img) =>
            val res = resizePixels(img, maxSide)
            (id, img.width, img.height, img.channels,
              res.width, res.height, pixelCrc(img), pixelCrc(res), true)
          case None => (id, 0, 0, 0, 0, 0, 0L, 0L, false)
        }
      })
      .toDF("id", "width", "height", "channels",
        "out_width", "out_height", "raw_crc", "out_crc", "valid")
  }

  /** Deterministic procedural pixels for golden row `id` — the SOURCE
    * both derivations share: GoldenGen encodes them into a real PNG
    * (per-row filters + zlib) and separately computes truth checksums
    * straight from this array; the kernel must recover the identical
    * pixels from the PNG bytes alone.
    */
  def goldenPixels(id: Long): PixelImage = {
    var h = id * 0x9e3779b97f4a7c15L
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    val w = 16 + Math.floorMod(h, 110).toInt
    val ht = 16 + Math.floorMod(h >> 16, 110).toInt
    val colorType = Array(0, 2, 4, 6)(Math.floorMod(h >> 32, 4).toInt)
    val c = colorType match { case 0 => 1; case 2 => 3; case 4 => 2; case _ => 4 }
    val px = new Array[Byte](w * ht * c)
    var i = 0
    while (i < px.length) {
      // smooth gradients + hash noise: compressible but filter-exercising
      val y = i / (w * c); val x = (i % (w * c)) / c; val ch = i % c
      px(i) = ((x * (ch + 3) + y * 7 + (h >> (i % 48)).toInt) & 0xff).toByte
      i += 1
    }
    PixelImage(w, ht, c, px)
  }

  /** Deterministic indexed GIF golden for row `id`: procedural palette +
    * index plane. Returns (payload, truth RGB image), where the truth is
    * the palette mapping computed DIRECTLY from the procedural arrays —
    * the LZW encoder never touches it, so encode and decode stay
    * independent derivations.
    */
  def goldenGif(id: Long): (Array[Byte], PixelImage) = {
    var h = id * 0x9e3779b97f4a7c15L
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    val w = 16 + Math.floorMod(h, 110).toInt
    val ht = 16 + Math.floorMod(h >> 16, 110).toInt
    val palette = new Array[Byte](768)
    var p = 0
    while (p < 256) {
      palette(p * 3) = ((p * 7 + (h >> 8)) & 0xff).toByte
      palette(p * 3 + 1) = ((p * 13 + (h >> 24)) & 0xff).toByte
      palette(p * 3 + 2) = ((p * 29 + (h >> 40)) & 0xff).toByte
      p += 1
    }
    val indices = new Array[Byte](w * ht)
    var i = 0
    while (i < indices.length) {
      val y = i / w; val x = i % w
      // gradient bands + hash noise: repetitive enough to exercise LZW
      // dictionary growth, noisy enough to exercise CLEAR resets
      indices(i) = ((x / 3 + y * 5 + ((h >> (i % 40)) & 7)) & 0xff).toByte
      i += 1
    }
    val rgb = new Array[Byte](w * ht * 3)
    i = 0
    while (i < indices.length) {
      val idx = indices(i) & 0xff
      rgb(i * 3) = palette(idx * 3)
      rgb(i * 3 + 1) = palette(idx * 3 + 1)
      rgb(i * 3 + 2) = palette(idx * 3 + 2)
      i += 1
    }
    (makeGifPixels(w, ht, indices, palette), PixelImage(w, ht, 3, rgb))
  }

  /** Color type for the golden row (drives encode; derived from the
    * same hash as [[goldenPixels]]).
    */
  def goldenColorType(id: Long): Int = {
    var h = id * 0x9e3779b97f4a7c15L
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    Array(0, 2, 4, 6)(Math.floorMod(h >> 32, 4).toInt)
  }

  /** Real PNG encode of an 8-bit image: per-scanline filter chosen by a
    * deterministic row rotation (None/Sub/Up/Average/Paeth) so the
    * decoder's unfilter paths all get exercised, then one zlib stream.
    */
  def makePngPixels(img: PixelImage, colorType: Int): Array[Byte] = {
    val stride = img.width * img.channels
    val bpp = img.channels
    val filtered = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      val ft = y % 5 // rotate through all five filter types
      filtered(y * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = img.pixels(y * stride + x) & 0xff
        val left = if (x >= bpp) img.pixels(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) img.pixels((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) img.pixels((y - 1) * stride + x - bpp) & 0xff else 0
        val enc = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            cur - pred
        }
        filtered(y * (stride + 1) + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    deflater.setInput(filtered)
    deflater.finish()
    val zipped = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zipped.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(img.width).putInt(img.height)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    writePngChunk(out, "IHDR", ihdr)
    writePngChunk(out, "IDAT", zipped.toByteArray)
    writePngChunk(out, "IEND", Array.empty)
    out.toByteArray
  }

  /** Real GIF89a encode of an indexed image: global 256-color palette +
    * from-scratch LZW compressor (variable width, CLEAR on dictionary
    * overflow, EOI) packed into <=255-byte sub-blocks. Golden-gen only —
    * the decoder must recover the exact palette-mapped RGB pixels.
    */
  def makeGifPixels(width: Int, height: Int, indices: Array[Byte],
      palette: Array[Byte]): Array[Byte] =
    makeAnimatedGif(width, height, Seq(indices), palette)

  /** Real animated GIF89a: global palette + one full-size frame per
    * index plane, each behind a graphic-control extension (fixed 4/100s
    * delay). Golden-gen only; [[decodeGifFrames]] must recover every
    * frame's palette-mapped RGB exactly.
    */
  def makeAnimatedGif(width: Int, height: Int, frames: Seq[Array[Byte]],
      palette: Array[Byte]): Array[Byte] = {
    require(palette.length == 768, "expect a full 256-entry RGB palette")
    require(frames.nonEmpty && frames.forall(_.length == width * height))
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) } // little-endian
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(width); w16(height)
    w8(0x80 | 0x07) // global color table, 256 entries
    w8(0); w8(0)    // bg index, aspect
    out.write(palette)
    if (frames.length > 1) {
      // NETSCAPE2.0 looping application extension (the standard marker
      // that makes multi-frame GIFs animate; also exercises the
      // decoder's extension skipping)
      w8(0x21); w8(0xff); w8(11)
      out.write("NETSCAPE2.0".getBytes("US-ASCII"))
      w8(3); w8(1); w16(0); w8(0)
    }
    frames.foreach { indices =>
      if (frames.length > 1) { // graphic control extension per frame
        w8(0x21); w8(0xf9); w8(4)
        w8(0); w16(4); w8(0); w8(0) // no disposal, 4/100s delay
      }
      w8(0x2c) // image descriptor
      w16(0); w16(0); w16(width); w16(height)
      w8(0) // no local table, not interlaced
      val mcs = 8
      w8(mcs)
      // LZW compress
      val clear = 1 << mcs
      val eoi = clear + 1
      var dictSize = eoi + 1
      var codeWidth = mcs + 1
      val dict = new java.util.HashMap[Integer, Integer]()
      val bits = new java.io.ByteArrayOutputStream()
      var acc = 0L
      var nAcc = 0
      def emit(code: Int): Unit = {
        acc |= code.toLong << nAcc
        nAcc += codeWidth
        while (nAcc >= 8) { bits.write((acc & 0xff).toInt); acc >>>= 8; nAcc -= 8 }
      }
      emit(clear)
      var cur = indices(0) & 0xff
      var i = 1
      while (i < indices.length) {
        val b = indices(i) & 0xff
        val key = Integer.valueOf((cur << 8) | b)
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          emit(cur)
          if (dictSize == 4096) {
            emit(clear)
            dict.clear()
            dictSize = eoi + 1
            codeWidth = mcs + 1
          } else {
            dict.put(key, Integer.valueOf(dictSize))
            dictSize += 1
            // the decoder trails one entry behind: it reaches 2^w (and
            // widens) exactly when our dict holds 2^w + 1 entries
            if (dictSize == (1 << codeWidth) + 1 && codeWidth < 12) codeWidth += 1
          }
          cur = b
        }
        i += 1
      }
      emit(cur)
      emit(eoi)
      if (nAcc > 0) bits.write((acc & 0xff).toInt)
      // package into sub-blocks
      val payload = bits.toByteArray
      var off = 0
      while (off < payload.length) {
        val len = math.min(255, payload.length - off)
        w8(len)
        out.write(payload, off, len)
        off += len
      }
      w8(0) // block terminator
    }
    w8(0x3b) // trailer
    out.toByteArray
  }

  /** Format-sniffing pixel decode: PNG, GIF or baseline JPEG. */
  def decodePixels(bytes: Array[Byte]): Option[PixelImage] = {
    if (bytes == null || bytes.length < 6) None
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') decodePngPixels(bytes)
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') decodeGifPixels(bytes)
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) Jpeg.decode(bytes)
    else None
  }

  /** Deterministic JPEG golden for row `id`: procedural smooth RGB →
    * baseline 4:4:4 encode. Truth pixels come from the QUANTIZED
    * coefficients (dequant + shared IDCT), computed inside
    * [[Jpeg.encodeWithTruth]] without touching the bitstream — JPEG is
    * lossy, so the coefficients, not the source pixels, are the truth.
    */
  def goldenJpeg(id: Long): (Array[Byte], PixelImage) = {
    var h = id * 0x9e3779b97f4a7c15L
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    val w = 8 * (2 + Math.floorMod(h, 14).toInt)        // 16..112, %8==0
    val ht = 8 * (2 + Math.floorMod(h >> 16, 14).toInt)
    val px = new Array[Byte](w * ht * 3)
    var i = 0
    while (i < px.length) {
      val y = i / (w * 3); val x = (i % (w * 3)) / 3; val ch = i % 3
      // smooth gradients (JPEG-friendly) with mild per-row variation
      px(i) = ((x * (ch + 2) / 2 + y * 3 + ((h >> (ch * 8)) & 63)) & 0xff).toByte
      i += 1
    }
    Jpeg.encodeWithTruth(PixelImage(w, ht, 3, px))
  }

  /** Aspect-fit output dimensions: METADATA-ONLY projection computing
    * the (out_width, out_height) a maxSide-bounded aspect-preserving
    * resize would produce. No pixels move here — the real pixel resize
    * (decode + box filter) is [[resizeImages]]; this is the cheap
    * planning/projection companion used by multimodal_decode.
    */
  def aspectFit(decoded: DataFrame, maxSide: Int = 256): DataFrame =
    decoded
      .withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
          .otherwise(lit(maxSide) / greatest(col("width"), col("height"))))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))
      .drop("scale")

  /** STUB frame sampler for video rows: emits every `stride`-th frame
    * index up to a deterministic fake frame count.
    */
  def frameSampleStub(decoded: DataFrame, stride: Int = 10): DataFrame =
    decoded.where(col("kind") === "video")
      .withColumn("n_frames", (col("payload_len") / 16).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(stride))))
      .select("id", "frame_idx", "n_frames")

  /** REAL frame sampling over animated GIF payloads: decode every frame
    * (LZW + palette), keep each `stride`-th, emit per-frame dimensions
    * and a pixel CRC. One row in, a few rows out — the flat-map kernel
    * shape; undecodable payloads yield one valid=false row so errors
    * stay data. Frame decode is per-row work: at 100 TB it parallelizes
    * with the scan like every other kernel here.
    */
  def frameSample(media: DataFrame, stride: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        decodeGifFrames(bytes) match {
          case Some(frames) =>
            frames.zipWithIndex
              .filter { case (_, idx) => idx % stride == 0 }
              .map { case (f, idx) =>
                (id, idx, frames.length, f.width, f.height, pixelCrc(f), true)
              }
          case None => Seq((id, -1, 0, 0, 0, 0L, false))
        }
      }
      .toDF("id", "frame_idx", "n_frames", "width", "height", "frame_crc", "valid")
  }

  /** Deterministic animated-GIF golden for row `id`: 3..10 procedural
    * frames evolving from a base plane. Returns (payload, per-frame
    * truth RGB images) with truth computed straight from the index
    * planes + palette (never through the LZW encoder).
    */
  def goldenAnimGif(id: Long): (Array[Byte], Seq[PixelImage]) = {
    var h = id * 0x9e3779b97f4a7c15L
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    val w = 16 + Math.floorMod(h, 70).toInt
    val ht = 16 + Math.floorMod(h >> 16, 70).toInt
    val nFrames = 3 + Math.floorMod(h >> 32, 8).toInt
    val palette = new Array[Byte](768)
    var p = 0
    while (p < 256) {
      palette(p * 3) = ((p * 3 + (h >> 8)) & 0xff).toByte
      palette(p * 3 + 1) = ((p * 17 + (h >> 24)) & 0xff).toByte
      palette(p * 3 + 2) = ((p * 31 + (h >> 40)) & 0xff).toByte
      p += 1
    }
    val frames = (0 until nFrames).map { f =>
      val idx = new Array[Byte](w * ht)
      var i = 0
      while (i < idx.length) {
        val y = i / w; val x = i % w
        // per-frame drift: a moving gradient (motion the sampler sees)
        idx(i) = ((x / 2 + y * 3 + f * 11 + ((h >> (i % 32)) & 3)) & 0xff).toByte
        i += 1
      }
      idx
    }
    val truth = frames.map { idx =>
      val rgb = new Array[Byte](w * ht * 3)
      var i = 0
      while (i < idx.length) {
        val pi = idx(i) & 0xff
        rgb(i * 3) = palette(pi * 3)
        rgb(i * 3 + 1) = palette(pi * 3 + 1)
        rgb(i * 3 + 2) = palette(pi * 3 + 2)
        i += 1
      }
      PixelImage(w, ht, 3, rgb)
    }
    (makeAnimatedGif(w, ht, frames, palette), truth)
  }
}
