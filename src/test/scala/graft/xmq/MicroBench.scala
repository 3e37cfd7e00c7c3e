package graft.xmq

import graft.synth.SourceFiles
import graft.expr.XmqExprs

/** Single-thread round-trip microbenchmark: Test/runMain graft.xmq.MicroBench */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    val rows = SourceFiles.generate(n, seed = 42)
    val bytes = rows.map(_.content.length.toLong).sum
    println(s"rows=$n totalBytes=$bytes avg=${bytes / n}")
    // warmup
    rows.take(200).foreach(r => XmqExprs.roundtrip(r.content, r.lang))
    for (lang <- Seq("xml", "json", "xmq", "html")) {
      val rs = rows.filter(_.lang == lang)
      val t0 = System.nanoTime()
      var ok = 0
      rs.foreach { r => if (XmqExprs.roundtrip(r.content, r.lang) == r.content) ok += 1 }
      val secs = (System.nanoTime() - t0) / 1e9
      val mb = rs.map(_.content.length.toLong).sum / 1e6
      println(f"$lang%5s: ${rs.size} rows ok=$ok ${secs}%.3f s  ${rs.size / secs}%.0f rows/s  ${mb / secs}%.1f MB/s")
    }
  }
}
