package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.html.{Dom, HtmlParser, TagDict}

/** Out-link extraction over raw HTML — the link-graph producer feeding
  * the crawl/graph operators (anchor_topk's edges, graph_pagerank's
  * host graph, crawl frontier expansion).
  *
  * DOM-BASED, not regex: the page is parsed with the arena
  * [[HtmlParser]] (one pooled instance per partition, no per-row
  * allocation — the north rule's pooled-tokenizer discipline), and
  * anchors are DOM `a` elements with an `href` attribute. That
  * distinction is load-bearing on real web pages: markup inside
  * comments and string literals inside `<script>` bodies LOOK like
  * anchors to a regex but are comment/raw-text nodes to the parser —
  * the driver query plants both traps and the oracle expects neither.
  *
  * Anchor text is the concatenation of the element's descendant text
  * nodes in document order (entity-decoded by the parser). Host
  * resolution follows the crawler's rule: absolute `http(s)://` and
  * protocol-relative `//` hrefs resolve to their own authority,
  * everything else (rooted/relative paths, fragments, queries) stays
  * on the source page's host.
  *
  * SCALE: pure per-row kernel — parallelizes with the scan, zero
  * exchanges; emitted rows are (8-byte id, idx, short strings), never
  * the page body. Reference anchor: scrag's extractors walk the same
  * parsed DOM for titles/metadata (extractors/readability.py) — link
  * harvesting is the crawl-side sibling the reference leaves to its
  * fetcher.
  */
object Links {

  /** Authority (host) of an absolute URL, or null if not absolute. */
  private[extract] def hostOf(url: String): String = {
    if (url == null) return null
    val i = url.indexOf("://")
    if (i < 0) return null
    val s = i + 3
    var e = s
    while (e < url.length && url.charAt(e) != '/' && url.charAt(e) != '?' &&
      url.charAt(e) != '#') e += 1
    if (e == s) null else url.substring(s, e)
  }

  /** Destination host of an href found on a page hosted at `srcHost`. */
  private[extract] def resolveHost(href: String, srcHost: String): String =
    if (href.startsWith("http://") || href.startsWith("https://")) hostOf(href)
    else if (href.startsWith("//")) {
      // protocol-relative: authority runs to the next delimiter
      var e = 2
      while (e < href.length && href.charAt(e) != '/' && href.charAt(e) != '?' &&
        href.charAt(e) != '#') e += 1
      if (e == 2) srcHost else href.substring(2, e)
    } else srcHost

  /** Concatenated descendant text of `root` in document order. */
  private[extract] def textOf(dom: Dom, root: Int): String = {
    val sb = new StringBuilder
    dom.walk(root) { n =>
      if (dom.isText(n)) sb.append(dom.text(n))
      true
    }
    sb.toString
  }

  /** (keyCol, url, html) → (keyCol, link_idx, href, anchor, dst_host),
    * one row per DOM anchor carrying an href, in document order.
    */
  def extractLinks(pages: DataFrame, keyCol: String = "doc_id"): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col(keyCol).cast("long"), col("url"), col("html"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val parser = HtmlParser.pooled()
        it.flatMap { case (id, url, html) =>
          val dom = parser.parse(if (html == null) "" else html)
          try {
            val srcHost = hostOf(url)
            val out =
              scala.collection.mutable.ArrayBuffer
                .empty[(Long, Long, String, String, String)]
            var idx = 0L
            dom.walk(0) { n =>
              if (dom.isElem(n) && dom.tag(n) == TagDict.A) {
                val href = dom.attr(n, "href")
                if (href != null) {
                  out += ((id, idx, href, textOf(dom, n),
                    resolveHost(href, srcHost)))
                  idx += 1
                }
                false // subtree already consumed as anchor text
              } else true
            }
            out
          } finally parser.release()
        }
      }
      .toDF(keyCol, "link_idx", "href", "anchor", "dst_host")
  }
}
