package graft.html

/** HTML character-reference decoding, written from scratch.
  *
  * Covers all numeric references (`&#123;` / `&#x1F;`, with the WHATWG
  * C1-control remapping) and the named entities that actually occur in
  * web text with any frequency. Unknown names are passed through
  * verbatim, like browsers do for unterminated/unknown references.
  *
  * Behavior cross-checked against the reference engine's html.parser
  * text path (see /root/reference/src/scrag/core/extractors/base.py:84-98,
  * which relies on Python's HTMLParser convert_charrefs).
  */
object Entities {

  /** Frequent named entities (semicolon form). Subset of the HTML5 table. */
  private val named: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](512)
    def p(k: String, v: Int): Unit = m.put(k, new String(Character.toChars(v)))
    def ps(k: String, v: String): Unit = m.put(k, v)
    p("amp", '&'); p("lt", '<'); p("gt", '>'); p("quot", '"'); p("apos", '\'')
    p("nbsp", 0xa0); p("iexcl", 0xa1); p("cent", 0xa2); p("pound", 0xa3)
    p("curren", 0xa4); p("yen", 0xa5); p("brvbar", 0xa6); p("sect", 0xa7)
    p("uml", 0xa8); p("copy", 0xa9); p("ordf", 0xaa); p("laquo", 0xab)
    p("not", 0xac); p("shy", 0xad); p("reg", 0xae); p("macr", 0xaf)
    p("deg", 0xb0); p("plusmn", 0xb1); p("sup2", 0xb2); p("sup3", 0xb3)
    p("acute", 0xb4); p("micro", 0xb5); p("para", 0xb6); p("middot", 0xb7)
    p("cedil", 0xb8); p("sup1", 0xb9); p("ordm", 0xba); p("raquo", 0xbb)
    p("frac14", 0xbc); p("frac12", 0xbd); p("frac34", 0xbe); p("iquest", 0xbf)
    p("Agrave", 0xc0); p("Aacute", 0xc1); p("Acirc", 0xc2); p("Atilde", 0xc3)
    p("Auml", 0xc4); p("Aring", 0xc5); p("AElig", 0xc6); p("Ccedil", 0xc7)
    p("Egrave", 0xc8); p("Eacute", 0xc9); p("Ecirc", 0xca); p("Euml", 0xcb)
    p("Igrave", 0xcc); p("Iacute", 0xcd); p("Icirc", 0xce); p("Iuml", 0xcf)
    p("ETH", 0xd0); p("Ntilde", 0xd1); p("Ograve", 0xd2); p("Oacute", 0xd3)
    p("Ocirc", 0xd4); p("Otilde", 0xd5); p("Ouml", 0xd6); p("times", 0xd7)
    p("Oslash", 0xd8); p("Ugrave", 0xd9); p("Uacute", 0xda); p("Ucirc", 0xdb)
    p("Uuml", 0xdc); p("Yacute", 0xdd); p("THORN", 0xde); p("szlig", 0xdf)
    p("agrave", 0xe0); p("aacute", 0xe1); p("acirc", 0xe2); p("atilde", 0xe3)
    p("auml", 0xe4); p("aring", 0xe5); p("aelig", 0xe6); p("ccedil", 0xe7)
    p("egrave", 0xe8); p("eacute", 0xe9); p("ecirc", 0xea); p("euml", 0xeb)
    p("igrave", 0xec); p("iacute", 0xed); p("icirc", 0xee); p("iuml", 0xef)
    p("eth", 0xf0); p("ntilde", 0xf1); p("ograve", 0xf2); p("oacute", 0xf3)
    p("ocirc", 0xf4); p("otilde", 0xf5); p("ouml", 0xf6); p("divide", 0xf7)
    p("oslash", 0xf8); p("ugrave", 0xf9); p("uacute", 0xfa); p("ucirc", 0xfb)
    p("uuml", 0xfc); p("yacute", 0xfd); p("thorn", 0xfe); p("yuml", 0xff)
    p("OElig", 0x152); p("oelig", 0x153); p("Scaron", 0x160); p("scaron", 0x161)
    p("Yuml", 0x178); p("fnof", 0x192); p("circ", 0x2c6); p("tilde", 0x2dc)
    p("ensp", 0x2002); p("emsp", 0x2003); p("thinsp", 0x2009)
    p("zwnj", 0x200c); p("zwj", 0x200d); p("lrm", 0x200e); p("rlm", 0x200f)
    p("ndash", 0x2013); p("mdash", 0x2014)
    p("lsquo", 0x2018); p("rsquo", 0x2019); p("sbquo", 0x201a)
    p("ldquo", 0x201c); p("rdquo", 0x201d); p("bdquo", 0x201e)
    p("dagger", 0x2020); p("Dagger", 0x2021); p("bull", 0x2022)
    p("hellip", 0x2026); p("permil", 0x2030); p("prime", 0x2032)
    p("Prime", 0x2033); p("lsaquo", 0x2039); p("rsaquo", 0x203a)
    p("oline", 0x203e); p("frasl", 0x2044); p("euro", 0x20ac)
    p("trade", 0x2122); p("alefsym", 0x2135)
    p("larr", 0x2190); p("uarr", 0x2191); p("rarr", 0x2192); p("darr", 0x2193)
    p("harr", 0x2194); p("crarr", 0x21b5)
    p("forall", 0x2200); p("part", 0x2202); p("exist", 0x2203); p("empty", 0x2205)
    p("nabla", 0x2207); p("isin", 0x2208); p("notin", 0x2209); p("ni", 0x220b)
    p("prod", 0x220f); p("sum", 0x2211); p("minus", 0x2212); p("lowast", 0x2217)
    p("radic", 0x221a); p("prop", 0x221d); p("infin", 0x221e); p("ang", 0x2220)
    p("and", 0x2227); p("or", 0x2228); p("cap", 0x2229); p("cup", 0x222a)
    p("int", 0x222b); p("there4", 0x2234); p("sim", 0x223c); p("cong", 0x2245)
    p("asymp", 0x2248); p("ne", 0x2260); p("equiv", 0x2261); p("le", 0x2264)
    p("ge", 0x2265); p("sub", 0x2282); p("sup", 0x2283); p("nsub", 0x2284)
    p("sube", 0x2286); p("supe", 0x2287); p("oplus", 0x2295); p("otimes", 0x2297)
    p("perp", 0x22a5); p("sdot", 0x22c5)
    p("lceil", 0x2308); p("rceil", 0x2309); p("lfloor", 0x230a); p("rfloor", 0x230b)
    p("lang", 0x27e8); p("rang", 0x27e9)
    p("loz", 0x25ca); p("spades", 0x2660); p("clubs", 0x2663)
    p("hearts", 0x2665); p("diams", 0x2666)
    // Greek
    val gkU = "ΑΒΓΔΕΖΗΘΙΚΛΜΝΞΟΠΡ_ΣΤΥΦΧΨΩ"
    val namesU = Array("Alpha","Beta","Gamma","Delta","Epsilon","Zeta","Eta",
      "Theta","Iota","Kappa","Lambda","Mu","Nu","Xi","Omicron","Pi","Rho","_",
      "Sigma","Tau","Upsilon","Phi","Chi","Psi","Omega")
    var i = 0
    while (i < namesU.length) {
      if (namesU(i) != "_") {
        ps(namesU(i), gkU.charAt(i).toString)
        ps(namesU(i).toLowerCase(java.util.Locale.ROOT), (gkU.charAt(i) + 32).toChar.toString)
      }
      i += 1
    }
    ps("sigmaf", "ς"); ps("thetasym", "ϑ"); ps("upsih", "ϒ"); ps("piv", "ϖ")
    m
  }

  /** WHATWG remapping for numeric refs into the C1 control range. */
  private val c1Remap: Map[Int, Int] = Map(
    0x80 -> 0x20ac, 0x82 -> 0x201a, 0x83 -> 0x192, 0x84 -> 0x201e,
    0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x2c6,
    0x89 -> 0x2030, 0x8a -> 0x160, 0x8b -> 0x2039, 0x8c -> 0x152,
    0x8e -> 0x17d, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201c,
    0x94 -> 0x201d, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
    0x98 -> 0x2dc, 0x99 -> 0x2122, 0x9a -> 0x161, 0x9b -> 0x203a,
    0x9c -> 0x153, 0x9e -> 0x17e, 0x9f -> 0x178)

  /** Decode one reference starting at `i` (which points at '&').
    * Appends the decoded text to `out` and returns the index just past
    * the reference; if not a valid reference, appends '&' and returns i+1.
    */
  def decodeRef(s: CharSequence, i: Int, len: Int, out: java.lang.StringBuilder): Int = {
    if (i + 1 >= len) { out.append('&'); return i + 1 }
    var j = i + 1
    if (s.charAt(j) == '#') {
      j += 1
      var hex = false
      if (j < len && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) { hex = true; j += 1 }
      var cp = 0L
      val start = j
      while (j < len && cp <= 0x10ffff && isDigit(s.charAt(j), hex)) {
        cp = cp * (if (hex) 16 else 10) + digitVal(s.charAt(j)); j += 1
      }
      if (j == start) { out.append('&'); return i + 1 }
      if (j < len && s.charAt(j) == ';') j += 1
      var c = cp.toInt
      c1Remap.get(c).foreach(c = _)
      if (cp > 0x10ffff || c == 0 || (c >= 0xd800 && c <= 0xdfff)) c = 0xfffd
      out.appendCodePoint(c)
      j
    } else {
      // named: letters/digits up to 32 chars, then optional ';'
      var k = j
      while (k < len && k - j < 32 &&
             (Character.isLetterOrDigit(s.charAt(k)))) k += 1
      if (k == j) { out.append('&'); return i + 1 }
      val hasSemi = k < len && s.charAt(k) == ';'
      val name = s.subSequence(j, k).toString
      val v = named.get(name)
      if (v != null && hasSemi) { out.append(v); k + 1 }
      else if (v != null && !hasSemi && legacyBare(name)) { out.append(v); k }
      else { out.append('&'); i + 1 }
    }
  }

  /** Legacy refs browsers accept without the trailing semicolon. */
  private def legacyBare(name: String): Boolean = name match {
    case "amp" | "lt" | "gt" | "quot" | "nbsp" | "copy" | "reg" => true
    case _ => false
  }

  private def isDigit(c: Char, hex: Boolean): Boolean =
    (c >= '0' && c <= '9') ||
    (hex && ((c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))

  private def digitVal(c: Char): Int =
    if (c <= '9') c - '0'
    else if (c <= 'F') c - 'A' + 10
    else c - 'a' + 10

  /** Decode all references in `s` (used for attribute values / RCDATA). */
  def decodeAll(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    out.append(s, 0, i)
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      if (c == '&') i = decodeRef(s, i, len, out)
      else { out.append(c); i += 1 }
    }
    out.toString
  }
}
