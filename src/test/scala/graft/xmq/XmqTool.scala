package graft.xmq

import java.nio.file.{Files, Paths}

/** CLI shim for differential testing against the reference binary:
  * Test/runMain graft.xmq.XmqTool <file> <args...> -- <cmds...> */
object XmqTool {
  def main(argv: Array[String]): Unit = {
    val file = argv(0)
    val sep = argv.indexOf("--")
    val args = if (sep > 0) argv.slice(1, sep).mkString(" ") else ""
    val cmds = if (sep > 0) argv.drop(sep + 1).mkString(" ") else argv.drop(1).mkString(" ")
    val bytes = Files.readAllBytes(Paths.get(file))
    val r = Cli.run(bytes, args, cmds)
    if (r.ok) { System.out.write(r.output.getBytes(java.nio.charset.StandardCharsets.UTF_8)); System.out.flush() }
    else { System.err.println("ERROR: " + r.error); sys.exit(1) }
  }
}
