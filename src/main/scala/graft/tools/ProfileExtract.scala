package graft.tools

import graft.extract._
import graft.table.SyntheticPages

/** Single-threaded stage breakdown of the cascade kernel:
  * runMain graft.tools.ProfileExtract [nPages=20000]
  * (no Spark — isolates kernel cost from scan/codec overhead)
  */
object ProfileExtract {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 20000
    val pages = (0L until n.toLong).map(id => SyntheticPages.pageFor(42L, id)).toArray
    val htmlBytes = pages.map(_.html)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val sink = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s $sec%8.3f s   ${n / sec}%9.0f pages/s   (sink=$sink)")
    }

    // warmup full path
    locally {
      val ex = new CascadeExtractor
      var i = 0; var s = 0L
      while (i < math.min(n, 4000)) {
        val r = ex.extract(pages(i).url, htmlBytes(i), CascadeConfig())
        s += (if (r.succeeded) 1 else 0); i += 1
      }
      println(s"warmup ok=$s")
    }

    time("decode (charset sniff)") {
      var i = 0; var s = 0L
      while (i < n) { s += (if (htmlBytes(i) == null) 0 else PageCodec.decode(htmlBytes(i)).length); i += 1 }
      s
    }

    val decoded = htmlBytes.map(b => if (b == null) null else PageCodec.decode(b))

    val parser = new HtmlParserHolder
    time("parse (tokenizer+DOM)") {
      var i = 0; var s = 0L
      while (i < n) { if (decoded(i) != null && decoded(i).nonEmpty) s += parser.p.parse(decoded(i)).size; i += 1 }
      s
    }

    val stats = new DomStats
    time("parse+stats") {
      var i = 0; var s = 0L
      while (i < n) {
        if (decoded(i) != null && decoded(i).nonEmpty) {
          val dom = parser.p.parse(decoded(i)); stats.compute(dom); s += dom.size
        }
        i += 1
      }
      s
    }

    for (strat <- Seq("http", "readability", "newspaper")) {
      time(s"parse+stats+$strat") {
        var i = 0; var s = 0L
        while (i < n) {
          if (decoded(i) != null && decoded(i).nonEmpty) {
            val dom = parser.p.parse(decoded(i)); stats.compute(dom)
            val r = strat match {
              case "http" => Extractors.bs4Strip(dom, stats)
              case "readability" => Extractors.readability(dom, stats)
              case "newspaper" => Extractors.newspaperLike(dom, stats)
            }
            s += (if (r.content == null) 0 else r.content.length)
          }
          i += 1
        }
        s
      }
    }

    time("full cascade") {
      val ex = new CascadeExtractor
      var i = 0; var s = 0L
      while (i < n) {
        val r = ex.extract(pages(i).url, htmlBytes(i), CascadeConfig())
        s += (if (r.extracted_text == null) 0 else r.extracted_text.length)
        i += 1
      }
      s
    }
  }

  // HtmlParser is package-visible bits; hold one instance
  private class HtmlParserHolder { val p = new graft.html.HtmlParser }
}
