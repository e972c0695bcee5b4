package graft.text

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets
import java.util.Base64

/** Bit-parity with the reference chunker: golden/chunker_oracle.txt was
  * produced by executing the reference's own ChunkingProcessor
  * (core/processors/chunking.py) on 83 (text, config) cases. Our Scala
  * chunker must reproduce every chunk byte-for-byte.
  *
  * One reference case is intentionally absent: char-mode (100,20,10) on
  * a text whose break-point lands before the overlap — the reference
  * loops forever there (chunking.py:150-156 can move `start` backwards);
  * we terminate via a documented progress guard.
  */
class ChunkerSpec extends AnyFunSuite {

  private val oracle = Paths.get("src/test/resources/golden/chunker_oracle.txt")

  test("83 reference-executed cases match byte-for-byte") {
    val lines = new String(Files.readAllBytes(oracle), StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty)
    assert(lines.length == 83)
    val dec = Base64.getDecoder
    def d(s: String) = new String(dec.decode(s), StandardCharsets.UTF_8)
    var checked = 0
    lines.foreach { line =>
      val parts = line.split("\\|", -1)
      val Array(tid, cs, ov, ps, mn) = parts.take(5)
      val text = d(parts(5))
      val expected =
        if (parts(6).isEmpty) Array.empty[String]
        else parts(6).split(",", -1).map(d)
      val cfg = ChunkConfig(cs.toInt, ov.toInt, mn.toInt, ps == "1")
      val actual = Chunker.chunk(text, cfg).map(_.text)
      assert(actual.toSeq == expected.toSeq,
        s"case $tid cfg=($cs,$ov,$ps,$mn):\n expected ${expected.length} chunks, got ${actual.length}" +
        expected.zipAll(actual, "<missing>", "<extra>").zipWithIndex
          .collect { case ((e, a), i) if e != a => s"\n  [$i] exp=${e.take(80)}… got=${a.take(80)}…" }
          .mkString)
      checked += 1
    }
    assert(checked == 83)
  }

  test("reference hang case terminates here (documented divergence)") {
    val text = "Sentence one is quite short. " + "y" * 600 +
      ". Sentence after the monster one. Final bit here."
    val chunks = Chunker.chunk(text, ChunkConfig(100, 20, 10, preserveSentences = false))
    assert(chunks.nonEmpty) // terminated — the reference loops forever
  }

  test("spans point into the stripped source text") {
    val text = "  First sentence here. Second sentence is longer than the first. Third one. Fourth sentence to overflow the chunk size now."
    val stripped = PyText.strip(text)
    val chunks = Chunker.chunk(text, ChunkConfig(60, 15, 5, preserveSentences = true))
    assert(chunks.nonEmpty)
    chunks.foreach { c =>
      assert(c.start >= 0 && c.end <= stripped.length && c.start < c.end)
      // the span's body text is a substring of the source region
      val body = stripped.substring(c.start, c.end)
      assert(c.text.endsWith(body.takeRight(math.min(20, body.length))))
    }
    assert(chunks.map(_.chunk_id).toSeq == chunks.indices.toSeq)
  }

  test("char-mode spans are exact substrings") {
    val text = ("alpha beta gamma delta " * 40).trim
    val chunks = Chunker.chunk(text, ChunkConfig(100, 20, 10, preserveSentences = false))
    chunks.foreach { c =>
      assert(text.substring(c.start, c.end) == c.text)
    }
  }
}
