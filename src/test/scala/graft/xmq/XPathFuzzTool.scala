package graft.xmq

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import scala.util.Random

/** Differential fuzz for the XPath select pipeline vs the compiled reference
  * binary (libxml2 xpath): random small documents and random xpath
  * expressions from the supported grammar; `select <xpath> to-xmq --compact`
  * must match byte-for-byte (both engines receive the identical argv).
  *
  * usage: Test/runMain graft.xmq.XPathFuzzTool <n> [seed]
  */
object XPathFuzzTool {
  private val Binary = "/tmp/refbuild/build/x86_64-pc-linux-gnu/release/xmq"

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 300
    val seed = if (args.length > 1) args(1).toLong else 42L
    val rnd = new Random(seed)
    if (!Files.exists(java.nio.file.Paths.get(Binary))) {
      System.err.println(s"reference binary missing at $Binary")
      sys.exit(2)
    }

    val names = Array("a", "b", "c", "item")
    val attrs = Array("id", "k", "x")

    def randomDoc(): String = {
      val sb = new StringBuilder("<r>")
      def elem(depth: Int): Unit = {
        val name = names(rnd.nextInt(names.length))
        sb.append('<').append(name)
        if (rnd.nextBoolean())
          sb.append(' ').append(attrs(rnd.nextInt(attrs.length)))
            .append("=\"").append(rnd.nextInt(5)).append('"')
        sb.append('>')
        rnd.nextInt(3) match {
          case 0 => sb.append("t" + rnd.nextInt(4))
          case 1 if depth < 3 =>
            val k = 1 + rnd.nextInt(3)
            for (_ <- 0 until k) elem(depth + 1)
          case _ =>
        }
        sb.append("</").append(name).append('>')
      }
      val k = 1 + rnd.nextInt(4)
      for (_ <- 0 until k) elem(0)
      sb.append("</r>")
      sb.toString
    }

    def randomPred(): String = rnd.nextInt(10) match {
      case 0 => (1 + rnd.nextInt(3)).toString
      case 1 => "last()"
      case 2 => s"@${attrs(rnd.nextInt(attrs.length))}"
      case 3 => s"""@${attrs(rnd.nextInt(attrs.length))}="${rnd.nextInt(5)}""""
      case 4 => s"""${names(rnd.nextInt(names.length))}="t${rnd.nextInt(4)}""""
      case 5 => s"""contains(.,"t${rnd.nextInt(4)}")"""
      case 6 => s"not(@${attrs(rnd.nextInt(attrs.length))})"
      case 7 => s"@${attrs(rnd.nextInt(attrs.length))}>${rnd.nextInt(4)}"
      case 8 => s"position()<${1 + rnd.nextInt(4)}"
      case 9 => s"""@${attrs(rnd.nextInt(attrs.length))}="${rnd.nextInt(3)}" or ${names(rnd.nextInt(names.length))}"""
    }

    def randomPath(): String = {
      val sb = new StringBuilder
      val steps = 1 + rnd.nextInt(3)
      for (_ <- 0 until steps) {
        sb.append(if (rnd.nextBoolean()) "//" else "/")
        sb.append(if (rnd.nextInt(5) == 0) "*" else names(rnd.nextInt(names.length)))
        if (rnd.nextBoolean()) sb.append('[').append(randomPred()).append(']')
      }
      if (rnd.nextInt(6) == 0) sb.append(if (rnd.nextBoolean()) "/text()" else s"/@${attrs(rnd.nextInt(attrs.length))}")
      sb.toString
    }

    val tmp = Files.createTempDirectory("xpfuzz")
    var mismatches = 0
    for (i <- 0 until n; cmd <- Seq("select", "delete")) {
      val doc = randomDoc()
      val xpath = randomPath()
      val f = tmp.resolve(s"d$i-$cmd.xml")
      Files.write(f, doc.getBytes(StandardCharsets.UTF_8))
      val pb = new ProcessBuilder(Binary, f.toString, cmd, xpath, "to-xmq", "--compact")
      val proc = pb.start()
      val ref = new String(proc.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      proc.waitFor()
      val mine = Cli.run(doc.getBytes(StandardCharsets.UTF_8), "", s"$cmd $xpath to-xmq --compact")
      val got = if (mine.ok) mine.output else s"ENGINE-ERROR: ${mine.error}\n"
      if (got != ref) {
        mismatches += 1
        if (mismatches <= 8) {
          System.err.println(s"=== MISMATCH case $i cmd=$cmd xpath=$xpath doc=$doc")
          System.err.println(s"--- mine:\n$got--- ref:\n$ref")
        }
      }
    }
    println(s"xpath differential fuzz: ${2 * n} cases (select+delete), $mismatches mismatches")
    if (mismatches > 0) sys.exit(1)
  }
}
