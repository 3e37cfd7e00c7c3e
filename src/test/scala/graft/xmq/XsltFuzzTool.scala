package graft.xmq

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import scala.util.Random

/** Differential fuzz for the transform command: random small XML documents
  * through stylesheets covering the common XSLT 1.0 constructs (value-of,
  * for-each, apply-templates, if/choose, attribute{}, copy-of, text output
  * method); our JDK-processor path must match the binary's libxslt output
  * byte-for-byte after the same to-xmq print.
  *
  * usage: Test/runMain graft.xmq.XsltFuzzTool <n-per-sheet> [seed]
  */
object XsltFuzzTool {
  private val Binary = "/tmp/refbuild/build/x86_64-pc-linux-gnu/release/xmq"

  private val sheets = Seq(
    "valueof" ->
      """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
        |<xsl:template match="/r"><out><xsl:value-of select="a"/>|<xsl:value-of select="count(//b)"/></out></xsl:template>
        |</xsl:stylesheet>""".stripMargin,
    "foreach" ->
      """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
        |<xsl:template match="/"><list><xsl:for-each select="//item"><e n="{@id}"><xsl:value-of select="."/></e></xsl:for-each></list></xsl:template>
        |</xsl:stylesheet>""".stripMargin,
    "apply" ->
      """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
        |<xsl:template match="a"><aa><xsl:apply-templates/></aa></xsl:template>
        |<xsl:template match="b"><bb v="{.}"/></xsl:template>
        |</xsl:stylesheet>""".stripMargin,
    "choose" ->
      """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
        |<xsl:template match="/"><xsl:for-each select="//item"><xsl:choose>
        |<xsl:when test="@id &gt; 2"><big><xsl:value-of select="@id"/></big></xsl:when>
        |<xsl:otherwise><small/></xsl:otherwise>
        |</xsl:choose></xsl:for-each></xsl:template>
        |</xsl:stylesheet>""".stripMargin,
    "copyof" ->
      """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
        |<xsl:template match="/"><wrap><xsl:copy-of select="//b"/></wrap></xsl:template>
        |</xsl:stylesheet>""".stripMargin,
    "textout" ->
      """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
        |<xsl:output method="text"/>
        |<xsl:template match="/"><xsl:for-each select="//item"><xsl:value-of select="@id"/>:<xsl:value-of select="."/><xsl:text>&#10;</xsl:text></xsl:for-each></xsl:template>
        |</xsl:stylesheet>""".stripMargin)

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100
    val seed = if (args.length > 1) args(1).toLong else 42L
    val rnd = new Random(seed)
    if (!Files.exists(java.nio.file.Paths.get(Binary))) {
      System.err.println(s"reference binary missing at $Binary")
      sys.exit(2)
    }

    def randomDoc(): String = {
      val sb = new StringBuilder("<r>")
      val names = Array("a", "b", "item")
      def elem(depth: Int): Unit = {
        val name = names(rnd.nextInt(names.length))
        sb.append('<').append(name)
        if (name == "item" || rnd.nextBoolean())
          sb.append(" id=\"").append(rnd.nextInt(6)).append('"')
        sb.append('>')
        rnd.nextInt(3) match {
          case 0 => sb.append("w" + rnd.nextInt(5))
          case 1 if depth < 2 => for (_ <- 0 until 1 + rnd.nextInt(2)) elem(depth + 1)
          case _ =>
        }
        sb.append("</").append(name).append('>')
      }
      for (_ <- 0 until 1 + rnd.nextInt(4)) elem(0)
      sb.append("</r>")
      sb.toString
    }

    val tmp = Files.createTempDirectory("xsltfuzz")
    var mismatches = 0
    for ((sname, sheet) <- sheets) {
      val sFile = tmp.resolve(s"$sname.xslt")
      Files.writeString(sFile, sheet)
      val cmds = if (sname == "textout") "to-text" else "to-xmq"
      for (i <- 0 until n) {
        val doc = randomDoc()
        val dFile = tmp.resolve(s"$sname-$i.xml")
        Files.write(dFile, doc.getBytes(StandardCharsets.UTF_8))
        val pb = new ProcessBuilder(Binary, dFile.toString, "transform", sFile.toString, cmds)
        val proc = pb.start()
        val ref = new String(proc.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
        proc.waitFor()
        val mine = Cli.run(doc.getBytes(StandardCharsets.UTF_8), "",
          s"transform $sFile $cmds", base = "/root/reference")
        val got = if (mine.ok) mine.output else s"ENGINE-ERROR: ${mine.error}\n"
        if (got != ref) {
          mismatches += 1
          if (mismatches <= 6) {
            System.err.println(s"=== MISMATCH $sname case $i doc=$doc")
            System.err.println(s"--- mine:\n$got--- ref:\n$ref")
          }
        }
      }
    }
    println(s"xslt differential fuzz: ${sheets.size * n} cases, $mismatches mismatches")
    if (mismatches > 0) sys.exit(1)
  }
}
