package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.html.{Dom, HtmlParser, TagDict}

/** Sitemap parsing (sitemaps.org XML) — the crawl-DISCOVERY input
  * feeding the frontier that [[graft.ops.CrawlOps.politenessSchedule]]
  * sequences and robots rules gate: one row per `<url>` entry with its
  * `<loc>`, optional `<lastmod>` and optional `<priority>`.
  *
  * DOM-based like [[Links]], and for the same reason: a regex over the
  * raw XML happily matches `<url>` blocks inside XML comments (real
  * sitemaps carry commented-out entries), while the arena parser turns
  * them into comment nodes that never surface. Entities in `<loc>`
  * (`&amp;` in query strings — REQUIRED escaping per the sitemap
  * protocol) are decoded by the parser's text pipeline.
  *
  * The arena parser is an HTML parser, which is exactly what a
  * production sitemap ingester wants: real-world sitemaps are served
  * with stray BOMs, unclosed tags and HTML error pages, and the
  * HTML5 recovery rules never throw. `<urlset>`/`<url>`/`<loc>` are
  * "unknown" elements to HTML5 and nest generically.
  *
  * SCALE: pure per-row kernel over (site, xml) rows — pooled parser,
  * zero exchanges, output is short strings.
  */
object Sitemap {

  private val UrlTag = TagDict.intern("url")
  private val LocTag = TagDict.intern("loc")
  private val LastmodTag = TagDict.intern("lastmod")
  private val PriorityTag = TagDict.intern("priority")

  /** Trimmed concatenated text of the first DESCENDANT of `entry`
    * with tag `tag` (document order), or null if absent.
    */
  private def childText(dom: Dom, entry: Int, tag: Int): String = {
    var found: String = null
    dom.walk(entry) { n =>
      if (found == null && dom.isElem(n) && dom.tag(n) == tag) {
        found = Links.textOf(dom, n).trim
        false
      } else dom.isElem(n) && found == null // descend only until found
    }
    found
  }

  /** (keyCol, xml) → (keyCol, entry_idx, loc, lastmod, priority), one
    * row per `<url>` entry carrying a non-empty `<loc>`, in document
    * order. lastmod/priority are null when the entry omits them.
    */
  def parseSitemaps(sitemaps: DataFrame, keyCol: String = "site_id"): DataFrame = {
    val spark = sitemaps.sparkSession
    import spark.implicits._
    sitemaps.select(col(keyCol).cast("long"), col("xml"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val parser = HtmlParser.pooled()
        it.flatMap { case (id, xml) =>
          val dom = parser.parse(if (xml == null) "" else xml)
          try {
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Long, String, String, String)]
            var idx = 0L
            dom.walk(0) { n =>
              if (dom.isElem(n) && dom.tag(n) == UrlTag) {
                val loc = childText(dom, n, LocTag)
                if (loc != null && loc.nonEmpty) {
                  out += ((id, idx, loc,
                    childText(dom, n, LastmodTag),
                    childText(dom, n, PriorityTag)))
                  idx += 1
                }
                false // entry consumed
              } else true
            }
            out
          } finally parser.release()
        }
      }
      .toDF(keyCol, "entry_idx", "loc", "lastmod", "priority")
  }
}
