package graft.extract

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.nio.ByteBuffer

/** Decode a crawled page's `html BINARY` column to a String.
  *
  * Deterministic sniffing order (modeled on the WHATWG encoding sniff;
  * the reference receives `str` and never decodes —
  * core/extractors/readability_extractor.py:36-38 — so this layer is
  * ours by contract, the input table carries bytes):
  *   1. BOM: UTF-8 / UTF-16LE / UTF-16BE
  *   2. `<meta charset=...>` or `<meta http-equiv=content-type
  *      content="...charset=...">` within the first 2048 bytes
  *   3. UTF-8 fallback
  * Malformed sequences are replaced (U+FFFD), never thrown.
  */
object PageCodec {

  private val sniffLimit = 2048

  def decode(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length == 0) return ""
    // BOM
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef &&
        (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf)
      return decodeWith(bytes, 3, StandardCharsets.UTF_8)
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe)
      return decodeWith(bytes, 2, StandardCharsets.UTF_16LE)
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      return decodeWith(bytes, 2, StandardCharsets.UTF_16BE)
    val cs = sniffMetaCharset(bytes).getOrElse(StandardCharsets.UTF_8)
    decodeWith(bytes, 0, cs)
  }

  private def decodeWith(bytes: Array[Byte], offset: Int, cs: Charset): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(ByteBuffer.wrap(bytes, offset, bytes.length - offset)).toString
  }

  /** Scan the ASCII-compatible prefix for a meta charset declaration. */
  private[extract] def sniffMetaCharset(bytes: Array[Byte]): Option[Charset] = {
    val n = math.min(bytes.length, sniffLimit)
    val prefix = new String(bytes, 0, n, StandardCharsets.ISO_8859_1).toLowerCase(java.util.Locale.ROOT)
    val key = "charset"
    var i = prefix.indexOf(key)
    while (i >= 0) {
      var j = i + key.length
      while (j < prefix.length && (prefix.charAt(j) == ' ' || prefix.charAt(j) == '\t')) j += 1
      if (j < prefix.length && prefix.charAt(j) == '=') {
        j += 1
        while (j < prefix.length &&
               (prefix.charAt(j) == ' ' || prefix.charAt(j) == '\t' ||
                prefix.charAt(j) == '"' || prefix.charAt(j) == '\'')) j += 1
        val start = j
        while (j < prefix.length && isCharsetChar(prefix.charAt(j))) j += 1
        if (j > start) {
          val name = prefix.substring(start, j)
          try {
            return Some(Charset.forName(name))
          } catch { case _: Exception => () } // unknown label → keep scanning
        }
      }
      i = prefix.indexOf(key, i + key.length)
    }
    None
  }

  private def isCharsetChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
    c == '-' || c == '_' || c == ':' || c == '.'
}
