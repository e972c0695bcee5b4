package graft.text

/** One emitted chunk. `start`/`end` are character offsets into the
  * (stripped) source text of the chunk's own sentence/window body — the
  * overlap prefix seeded from the previous chunk is provenance-wise part
  * of the previous region, so spans cover the non-overlap body.
  */
final case class Chunk(chunk_id: Int, text: String, start: Int, end: Int)

/** A chunk with the reference's full per-chunk metadata
  * (core/processors/chunking.py:50-58): chunk_size = len(chunk),
  * total_chunks = len(chunks), overlap_size = configured overlap.
  */
final case class ChunkMeta(chunk_id: Int, text: String, start: Int, end: Int,
    chunk_size: Int, total_chunks: Int, overlap_size: Int)

/** Chunking configuration — reference defaults
  * (core/processors/chunking.py:17-28, config/default.yml:32-36).
  */
final case class ChunkConfig(
    chunkSize: Int = 512,
    overlap: Int = 50,
    minChunkSize: Int = 50,
    preserveSentences: Boolean = true)

/** Reimplementation of the reference chunker's exact semantics
  * (core/processors/chunking.py:72-186):
  *
  *  - sentence mode: split on `(?<=[.!?])\s+` of the stripped text;
  *    greedily pack sentences joined by " " into <= chunkSize chars;
  *    on overflow emit if >= minChunkSize, seed the next chunk with the
  *    last `overlap` chars of the previous advanced past the first
  *    space (+" "+sentence); emit the final chunk if >= min.
  *  - character mode: fixed windows with a break-point search (sentence
  *    end within the last 100 chars, else whitespace within the last
  *    50), overlap stepping, min-size filter; a text at/below chunkSize
  *    returns as one chunk verbatim (no strip, no min check — reference
  *    behavior, chunking.py:118-119).
  *
  * All string semantics are Python's (PyText.strip / isPySpace).
  */
object Chunker {

  def chunk(text: String, cfg: ChunkConfig = ChunkConfig()): Array[Chunk] = {
    if (text == null || PyText.strip(text).isEmpty) return Array.empty
    if (cfg.preserveSentences) bySentences(text, cfg) else byCharacters(text, cfg)
  }

  /** chunk() plus the reference's per-chunk metadata projection
    * (chunking.py:50-58).
    */
  def chunkWithMeta(text: String, cfg: ChunkConfig = ChunkConfig()): Array[ChunkMeta] = {
    val cs = chunk(text, cfg)
    cs.map(c => ChunkMeta(c.chunk_id, c.text, c.start, c.end,
      c.text.length, cs.length, cfg.overlap))
  }

  /** Sentences of the stripped text with their (start, end) offsets. */
  private def sentencesWithOffsets(stripped: String): Array[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val n = stripped.length
    var start = 0
    var i = 0
    while (i < n) {
      val c = stripped.charAt(i)
      if ((c == '.' || c == '!' || c == '?') && i + 1 < n &&
          PyText.isPySpace(stripped.charAt(i + 1))) {
        out += ((start, i + 1))
        i += 1
        while (i < n && PyText.isPySpace(stripped.charAt(i))) i += 1
        start = i
      } else i += 1
    }
    out += ((start, n))
    out.toArray
  }

  private def bySentences(text: String, cfg: ChunkConfig): Array[Chunk] = {
    val stripped = PyText.strip(text)
    val sents = sentencesWithOffsets(stripped)
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Chunk]
    var current = ""
    var bodyStart = -1 // offset of first sentence in current's body
    var bodyEnd = -1

    def emit(): Unit = {
      val t = PyText.strip(current)
      if (t.length >= cfg.minChunkSize)
        chunks += Chunk(chunks.length, t, bodyStart, bodyEnd)
    }

    var si = 0
    while (si < sents.length) {
      val (ss, se) = sents(si)
      val sentence = stripped.substring(ss, se)
      if (current.nonEmpty && current.length + sentence.length + 1 > cfg.chunkSize) {
        emit()
        if (cfg.overlap > 0 && chunks.nonEmpty) {
          val ov = overlapText(current, cfg.overlap)
          current = if (ov.nonEmpty) ov + " " + sentence else sentence
        } else current = sentence
        bodyStart = ss; bodyEnd = se
      } else {
        if (current.nonEmpty) { current = current + " " + sentence; bodyEnd = se }
        else { current = sentence; bodyStart = ss; bodyEnd = se }
      }
      si += 1
    }
    if (PyText.strip(current).nonEmpty) emit()
    chunks.toArray
  }

  /** `_get_overlap_text` (chunking.py:174-186). */
  private def overlapText(text: String, overlap: Int): String = {
    if (text.length <= overlap) return text
    val tail = text.substring(text.length - overlap)
    val spaceIdx = tail.indexOf(' ')
    if (spaceIdx > 0) tail.substring(spaceIdx + 1) else tail
  }

  private def byCharacters(text: String, cfg: ChunkConfig): Array[Chunk] = {
    if (text.length <= cfg.chunkSize)
      return Array(Chunk(0, text, 0, text.length))
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Chunk]
    var start = 0
    var done = false
    while (start < text.length && !done) {
      val end = start + cfg.chunkSize
      if (end >= text.length) {
        appendStripped(chunks, text, start, text.length, cfg.minChunkSize)
        done = true
      } else {
        val bp = findBreakPoint(text, start, end)
        val chunkEnd = if (bp > 0) start + bp else end
        appendStripped(chunks, text, start, chunkEnd, cfg.minChunkSize)
        var next = if (bp > 0) start + bp - cfg.overlap else end - cfg.overlap
        // reference progress guard (chunking.py:155-156), reproduced as
        // Python parses it: max(next, len(last_chunk) + next - overlap)
        if (chunks.nonEmpty)
          next = math.max(next, chunks.last.text.length + next - cfg.overlap)
        // divergence guard (documented): the reference can fail to
        // advance when overlap >= chunkSize; a Spark task must not hang
        if (next <= start) next = end
        start = next
      }
    }
    chunks.toArray
  }

  private def appendStripped(
      chunks: scala.collection.mutable.ArrayBuffer[Chunk],
      text: String, from: Int, to: Int, minSize: Int): Unit = {
    var a = from
    var b = to
    while (a < b && PyText.isPySpace(text.charAt(a))) a += 1
    while (b > a && PyText.isPySpace(text.charAt(b - 1))) b -= 1
    if (b - a >= minSize)
      chunks += Chunk(chunks.length, text.substring(a, b), a, b)
  }

  /** `_find_break_point` (chunking.py:160-172) over text[start:end). */
  private def findBreakPoint(text: String, start: Int, end: Int): Int = {
    val len = end - start
    // sentence endings within the last 100 chars (exclusive lower bound)
    var i = len - 1
    val lo1 = math.max(0, len - 100)
    while (i > lo1) {
      val c = text.charAt(start + i)
      if (c == '.' || c == '!' || c == '?') return i + 1
      i -= 1
    }
    // whitespace within the last 50 chars
    i = len - 1
    val lo2 = math.max(0, len - 50)
    while (i > lo2) {
      if (PyText.isPySpace(text.charAt(start + i))) return i
      i -= 1
    }
    0
  }
}
