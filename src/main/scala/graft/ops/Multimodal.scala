package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * BINARY columns with typed metadata structs; per-row media kernels
  * run in mapPartitions exactly like the HTML cascade.
  *
  * The actual codec work is STUBBED (this container ships no image/
  * audio libraries — see the builder contract): [[decodeMeta]] parses
  * our deterministic fake header, and [[resizeStub]]/[[frameSampleStub]]
  * transform metadata only. The Spark-side plumbing — schema, binary
  * handling, partitioning, batch shape — is real and tested; swapping
  * in a real decoder replaces only the marked kernel bodies.
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

  /** STUB decoder kernel: parses the fake header. A real implementation
    * would hand `bytes` to an image/audio codec here; everything around
    * it (null handling, batching, schema) is production-shaped.
    */
  def decodeMeta(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.length < 18 ||
        bytes(0) != 'G' || bytes(1) != 'R' || bytes(2) != 'F' || bytes(3) != 'T')
      return MediaMeta("unknown", 0, 0, 0, 0, valid = false)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.position(4)
    val kind = kinds(math.min(bb.get().toInt, 2))
    val w = bb.getInt; val h = bb.getInt
    val c = bb.get().toInt; val pl = bb.getInt
    MediaMeta(kind, w, h, c, pl, valid = bytes.length >= 18 + pl)
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

  /** STUB resize: metadata-only transform preserving aspect ratio. */
  def resizeStub(decoded: DataFrame, maxSide: Int = 256): DataFrame =
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
}
