package graft.xmq

import java.nio.charset.StandardCharsets

/** Scratch diff runner: sbt "Test/runMain graft.xmq.DebugFixtures format_003" */
object DebugFixtures {
  def main(args: Array[String]): Unit = {
    val pat = if (args.nonEmpty) args(0) else "format_"
    var pass = 0; var fail = 0
    for (p <- Fixtures.list(""".*\.test""") if p.getFileName.toString.contains(pat)) {
      val name = p.getFileName.toString
      val content = Fixtures.read(p)
      val input = Fixtures.section(content, "START.*", "COMPACT")
      val expCompact = Fixtures.section(content, "COMPACT", "XMQ")
      val expXmq = Fixtures.section(content, "XMQ", "END")
      def grep(n: String) = content.split("\n").filter(_.contains(n)).map(_.drop(n.length + 1)).mkString("")
      val args0 = grep("ARGS")
      val cmds = { val c = grep("CMDS"); if (c.trim.isEmpty) "to-xmq" else c }
      val bytes = input.getBytes(StandardCharsets.UTF_8)
      try {
        val r = Cli.run(bytes, args0, cmds)
        val okXmq = r.ok && r.output == expXmq
        var okCompact = true
        var cOut = ""
        if (expCompact.trim != "IGNORE") {
          val rc = Cli.run(bytes, args0, cmds + " --compact")
          cOut = if (rc.ok) rc.output else "ERR " + rc.error
          okCompact = rc.ok && rc.output == expCompact
        }
        if (okXmq && okCompact) pass += 1
        else {
          fail += 1
          println(s"==== $name  (args='$args0' cmds='$cmds')")
          if (!okXmq) {
            println(s"--- expected:\n$expXmq--- got:\n${if (r.ok) r.output else "ERR " + r.error}")
          }
          if (!okCompact) println(s"--- expected compact:\n$expCompact--- got compact:\n$cOut")
        }
      } catch {
        case e: Throwable => fail += 1; println(s"==== $name EXC: $e")
      }
    }
    println(s"pass=$pass fail=$fail")
  }
}
