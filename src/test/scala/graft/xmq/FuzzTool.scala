package graft.xmq

import java.nio.file.{Files, Paths}

/** Emits N synthesized corpus docs as files for differential fuzzing against
  * the reference binary: Test/runMain graft.xmq.FuzzTool <outDir> <n> */
object FuzzTool {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val n = args(1).toInt
    Files.createDirectories(outDir)
    graft.synth.SourceFiles.generate(n, seed = 1234).zipWithIndex.foreach { case (r, i) =>
      val ext = r.lang match {
        case "xml" => "xml"; case "json" => "json"; case "html" => "html"; case _ => "xmq"
      }
      Files.write(outDir.resolve(f"doc$i%04d.$ext"), r.content.getBytes("UTF-8"))
    }
    println(s"wrote $n docs to $outDir")
  }
}
