package graft.html

import org.scalatest.funsuite.AnyFunSuite

class HtmlParserSpec extends AnyFunSuite {

  private def parse(s: String) = new HtmlParser().parse(s)

  private def textNodes(dom: Dom): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    dom.walk(0) { n => if (dom.isText(n)) out += dom.text(n); true }
    out.toSeq
  }

  test("basic nesting and text") {
    val dom = parse("<html><body><p>Hello <b>world</b>!</p></body></html>")
    assert(textNodes(dom) == Seq("Hello ", "world", "!"))
    val p = dom.findFirst(0, TagDict.P)
    assert(p >= 0)
    assert(dom.tag(dom.parent(p)) == TagDict.Body)
  }

  test("void elements take no children") {
    val dom = parse("<p>a<br>b<img src=x>c</p>")
    val br = dom.findFirst(0, TagDict.Br)
    assert(dom.firstChild(br) == -1)
    assert(textNodes(dom) == Seq("a", "b", "c"))
    val p = dom.findFirst(0, TagDict.P)
    // all three text nodes are children of the same <p>
    assert(dom.parent(dom.lastChild(p)) == p)
  }

  test("implicit p close on block start") {
    val dom = parse("<p>one<div>two</div>")
    val p = dom.findFirst(0, TagDict.P)
    val div = dom.findFirst(0, TagDict.Div)
    assert(dom.parent(div) != p) // div is a sibling, not a child, of p
  }

  test("li auto-close") {
    val dom = parse("<ul><li>a<li>b</ul>")
    val ul = dom.findFirst(0, TagDict.Ul)
    var lis = 0
    dom.walk(ul) { n =>
      if (dom.isElem(n) && dom.tag(n) == TagDict.Li) {
        assert(dom.parent(n) == ul); lis += 1
      }
      true
    }
    assert(lis == 2)
  }

  test("td/tr auto-close") {
    val dom = parse("<table><tr><td>a<td>b<tr><td>c</table>")
    var tds = 0
    var trs = 0
    dom.walk(0) { n =>
      if (dom.isElem(n) && dom.tag(n) == TagDict.Td) tds += 1
      if (dom.isElem(n) && dom.tag(n) == TagDict.Tr) trs += 1
      true
    }
    assert(tds == 3 && trs == 2)
  }

  test("attributes: quoted, unquoted, bare, duplicate-first-wins, entities") {
    val dom = parse("""<a href="x&amp;y" Class=foo disabled href="z">t</a>""")
    val a = dom.findFirst(0, TagDict.A)
    assert(dom.attr(a, "href") == "x&y")
    assert(dom.attr(a, "class") == "foo")
    assert(dom.attr(a, "disabled") == "")
  }

  test("script raw text is not parsed as markup") {
    val dom = parse("<script>if (a < b) { x = '<div>'; }</script><p>after</p>")
    val script = dom.findFirst(0, TagDict.Script)
    val child = dom.firstChild(script)
    assert(dom.isText(child))
    assert(dom.text(child).contains("a < b"))
    assert(dom.text(child).contains("<div>"))
    assert(textNodes(dom).exists(_ == "after"))
  }

  test("style raw text; case-insensitive close tag") {
    val dom = parse("<style>p { color: red }</STYLE><p>x</p>")
    val style = dom.findFirst(0, TagDict.Style)
    assert(dom.text(dom.firstChild(style)).contains("color: red"))
    assert(textNodes(dom).contains("x"))
  }

  test("title rcdata decodes entities") {
    val dom = parse("<title>Tom &amp; Jerry</title>")
    val t = dom.findFirst(0, TagDict.Title)
    assert(dom.text(dom.firstChild(t)) == "Tom & Jerry")
  }

  test("comments and doctype dropped") {
    val dom = parse("<!DOCTYPE html><!-- hidden --><p>shown</p>")
    assert(textNodes(dom) == Seq("shown"))
  }

  test("entities in text: named, numeric, bare legacy, unknown passthrough") {
    val dom = parse("<p>a&nbsp;b &#65; &#x42; &amp c &bogus; d</p>")
    assert(textNodes(dom) == Seq("a b A B & c &bogus; d"))
  }

  test("unclosed tags at EOF recover") {
    val dom = parse("<div><p>dangling")
    assert(textNodes(dom) == Seq("dangling"))
  }

  test("stray end tags ignored") {
    val dom = parse("</div><p>ok</p></span>")
    assert(textNodes(dom) == Seq("ok"))
  }

  test("stray < kept as text") {
    val dom = parse("<p>1 < 2 and 3 > 2</p>")
    assert(textNodes(dom) == Seq("1 < 2 and 3 > 2"))
  }

  test("self-closing honored") {
    val dom = parse("<div/><p>sib</p>")
    val div = dom.findFirst(0, TagDict.Div)
    val p = dom.findFirst(0, TagDict.P)
    assert(dom.parent(p) == dom.parent(div))
  }

  test("parser instance is reusable across rows") {
    val parser = new HtmlParser
    val d1 = parser.parse("<p>first</p>")
    assert(textNodes(d1) == Seq("first"))
    val d2 = parser.parse("<p>second</p>")
    assert(textNodes(d2) == Seq("second"))
    assert(d1 eq d2) // same pooled arena
  }

  test("adjacent text merged, whitespace-only nodes skipped") {
    val dom = parse("<div>  \n  </div><p>a&#32;b</p>")
    assert(textNodes(dom) == Seq("a b"))
  }

  test("deeply nested html does not blow the stack") {
    val sb = new StringBuilder
    (1 to 2000).foreach(_ => sb.append("<div>"))
    sb.append("deep")
    val dom = parse(sb.toString)
    assert(textNodes(dom).contains("deep"))
  }

  test("million-char text node is linear and survives") {
    val big = "x" * 1000000
    val dom = parse(s"<p>$big</p>")
    assert(textNodes(dom).head.length == 1000000)
  }
}
