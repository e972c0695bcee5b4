package graft.tools

import graft.extract.{CascadeConfig, CascadeExtractor}
import graft.table.SyntheticPages

/** Single-thread phase profile of the extraction kernel over the
  * synthetic corpus: total cascade time plus isolated parse and
  * per-strategy costs (usage: runMain graft.tools.ProfileExtract [n]).
  */
object ProfileExtract {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 30000
    val pages = (0L until n.toLong).map(id => SyntheticPages.pageFor(42L, id)).toArray
    val ex = CascadeExtractor.pooled()
    val cfg = CascadeConfig()
    // JIT warmup
    var warm = 0L
    pages.take(8000).foreach { p =>
      val r = ex.extract(p.url, p.html, cfg)
      if (r.extracted_text != null) warm += r.extracted_text.length
    }
    // timed full cascade
    (1 to 3).foreach { rep =>
      val t0 = System.nanoTime()
      var acc = 0L
      pages.foreach { p =>
        val r = ex.extract(p.url, p.html, cfg)
        if (r.extracted_text != null) acc += r.extracted_text.length
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"profile: rep=$rep full-cascade n=$n sec=$sec%.2f docs_per_sec=${n / sec}%.0f acc=$acc")
    }
    // parse-only and parse+stats phases
    locally {
      val parser = graft.html.HtmlParser.pooled()
      val htmls = pages.map(p => new String(p.html, java.nio.charset.StandardCharsets.UTF_8))
      parser.parse(htmls(0))
      (1 to 2).foreach { rep =>
        var t0 = System.nanoTime()
        var nodes = 0L
        htmls.foreach(h => nodes += parser.parse(h).size)
        val parseSec = (System.nanoTime() - t0) / 1e9
        val stats = new graft.extract.DomStats
        t0 = System.nanoTime()
        var acc = 0L
        htmls.foreach { h =>
          val d = parser.parse(h)
          stats.compute(d)
          acc += d.size
        }
        val bothSec = (System.nanoTime() - t0) / 1e9
        println(f"profile: rep=$rep parse-only sec=$parseSec%.2f (${n / parseSec}%.0f/s) " +
          f"parse+stats sec=$bothSec%.2f (${n / bothSec}%.0f/s) nodes=$nodes acc=$acc")
      }
    }
    // per-strategy isolation
    for (strat <- Seq("newspaper", "readability", "http")) {
      val c = CascadeConfig(strategies = Seq(strat), minContentLength = 1)
      pages.take(4000).foreach(p => ex.extract(p.url, p.html, c))
      val t0 = System.nanoTime()
      var acc = 0L
      pages.foreach { p =>
        val r = ex.extract(p.url, p.html, c)
        if (r.extracted_text != null) acc += r.extracted_text.length
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"profile: only=$strat sec=$sec%.2f docs_per_sec=${n / sec}%.0f acc=$acc")
    }
  }
}
