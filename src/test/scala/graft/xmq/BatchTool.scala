package graft.xmq

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Batch converter for differential fuzzing (one JVM for all files):
  * Test/runMain graft.xmq.BatchTool <inDir> <outDir> <cmds...> */
object BatchTool {
  def main(args: Array[String]): Unit = {
    val inDir = Paths.get(args(0))
    val outDir = Paths.get(args(1))
    val cmds = args.drop(2).mkString(" ")
    Files.createDirectories(outDir)
    Files.list(inDir).iterator().asScala.toSeq.sortBy(_.toString).foreach { f =>
      val r = Cli.run(Files.readAllBytes(f), "", cmds)
      val out = if (r.ok) r.output else "ERROR\n"
      Files.write(outDir.resolve(f.getFileName.toString + ".out"), out.getBytes("UTF-8"))
    }
    println("done")
  }
}
