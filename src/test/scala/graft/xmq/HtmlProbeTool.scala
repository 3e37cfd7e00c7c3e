package graft.xmq

import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Derives the reference HTML parser's pairwise auto-close behavior
  * empirically: for every (A, B) in the vocabulary, parse
  * `<!DOCTYPE html><html><body><A>x<B>y` with the binary and observe
  * whether B became a CHILD of A (no auto-close) or a SIBLING (B's start
  * implicitly closed A). libxml2's htmlCheckAutoClose is a context-free
  * pair lookup, so pairwise probing recovers the full relation. Prints the
  * pair list as Scala code for XmlParser's startClose table.
  *
  * usage: Test/runMain graft.xmq.HtmlProbeTool
  */
object HtmlProbeTool {
  private val Binary = "/tmp/refbuild/build/x86_64-pc-linux-gnu/release/xmq"

  val Vocab: Seq[String] = Seq(
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li", "dl", "dt",
    "dd", "div", "blockquote", "pre", "address", "span", "b", "i", "em",
    "strong", "code", "a", "font", "center", "form", "menu", "dir",
    "listing", "xmp", "table", "tr", "td", "th", "thead", "tbody", "tfoot",
    "caption", "colgroup", "select", "option", "optgroup", "fieldset",
    "legend", "section", "article", "noscript", "main", "nav", "u", "s",
    "small", "sub", "sup", "label", "button", "figure", "figcaption",
    "header", "footer", "aside", "details", "summary", "dfn", "kbd", "samp",
    "var", "cite", "abbr", "q", "ins", "del", "mark", "time", "ruby",
    "br", "hr", "img", "input", "textarea", "iframe", "object", "embed",
    "frameset", "noframes", "applet", "big", "strike", "tt", "nobr", "wbr")

  def main(args: Array[String]): Unit = {
    val tmp = Files.createTempDirectory("htmlprobe")
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (a <- Vocab; b <- Vocab) {
      val doc = s"<!DOCTYPE html><html><body><$a>x<$b>y</$b></$a></body></html>"
      val f = tmp.resolve(s"p-$a-$b.html")
      Files.write(f, doc.getBytes(StandardCharsets.UTF_8))
      val proc = new ProcessBuilder(Binary, f.toString, "to-xml").start()
      val out = new String(proc.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      proc.waitFor()
      // B sibling of A  ⇒  "</a>...<b" appears before any "<b" inside <a>
      val ai = out.indexOf(s"<$a")
      val closeA = out.indexOf(s"</$a>")
      val bi = out.indexOf(s"<$b", if (ai < 0) 0 else ai + 1)
      val closed =
        if (ai < 0) true // A itself vanished / was rehomed — record and review
        else bi >= 0 && closeA >= 0 && closeA < bi
      if (closed) pairs += ((b, a))
    }
    println(s"// ${pairs.size} auto-close pairs derived from the reference binary")
    val byNew = pairs.groupBy(_._1).toSeq.sortBy(_._1)
    byNew.foreach { case (b, ps) =>
      println(s"""    "$b" -> Set(${ps.map(p => "\"" + p._2 + "\"").sorted.mkString(", ")}),""")
    }

    // head-context: does <B> under an open <head> close it (land in body)?
    def run(doc: String, tag: String): String = {
      val f = tmp.resolve(s"h-$tag.html")
      Files.write(f, doc.getBytes(StandardCharsets.UTF_8))
      val proc = new ProcessBuilder(Binary, f.toString, "to-xml").start()
      val out = new String(proc.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      proc.waitFor(); out
    }
    val headVocab = Vocab ++ Seq("meta", "link", "style", "script", "base", "title")
    val closesHead = headVocab.filter { b =>
      // closed iff B ends up AFTER the head element (in implied body / html)
      val out = run(s"<!DOCTYPE html><html><head><$b>y</$b></html>", s"head-$b")
      val he = math.max(out.indexOf("</head>"), out.indexOf("<head/>"))
      val bi = out.indexOf(s"<$b")
      he >= 0 && bi >= 0 && he < bi
    }
    println(s"""    closesHead -> Set(${closesHead.map("\"" + _ + "\"").sorted.mkString(", ")})""")
    val closesTitle = Seq("body", "p", "div", "meta", "frameset").filter { b =>
      val out = run(s"<!DOCTYPE html><html><head><title>t<$b>y</html>", s"title-$b")
      val tc = out.indexOf("</title>")
      val bi = out.indexOf(s"<$b")
      tc >= 0 && bi >= 0 && tc < bi
    }
    println(s"""    closesTitle -> Set(${closesTitle.map("\"" + _ + "\"").sorted.mkString(", ")})""")
  }
}
