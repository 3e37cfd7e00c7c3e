package graft.xmq

import java.nio.file.{Files, Paths}

/** Head-to-head single-node throughput vs the reference binary on one large
  * document: parse + print in both directions, best of N, cold and hot.
  * Test/runMain graft.xmq.BigDocBench <file.xml> <file.xmq> [reps]
  */
object BigDocBench {
  def main(args: Array[String]): Unit = {
    val xmlBytes = Files.readAllBytes(Paths.get(args(0)))
    val xmqBytes = Files.readAllBytes(Paths.get(args(1)))
    val reps = if (args.length > 2) args(2).toInt else 5

    def bench(name: String, inputMb: Double)(body: => Long): Unit = {
      var best = Double.MaxValue
      var cold = 0.0
      for (i <- 0 until reps) {
        val t0 = System.nanoTime()
        val sink = body
        val s = (System.nanoTime() - t0) / 1e9
        if (sink == Long.MinValue) println("?")
        if (i == 0) cold = s
        if (s < best) best = s
      }
      println(f"$name%-14s cold=${cold}%5.2f s (${inputMb / cold}%5.1f MB/s)  hot=${best}%5.2f s (${inputMb / best}%5.1f MB/s)")
    }

    val xmlMb = xmlBytes.length / 1e6
    val xmqMb = xmqBytes.length / 1e6
    bench("xml->xmq", xmlMb) {
      val doc = XmqEngine.parse(xmlBytes, XmqEngine.ParseFlags(forced = Xmq.XML))
      XmqEngine.toXmq(doc).length.toLong
    }
    bench("xmq->xml", xmqMb) {
      val doc = XmqEngine.parse(xmqBytes, XmqEngine.ParseFlags(forced = Xmq.XMQ))
      XmqEngine.toXml(doc).length.toLong
    }
  }
}
