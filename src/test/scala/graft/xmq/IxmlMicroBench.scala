package graft.xmq

/** Per-document ixml parse micro-timing (grammar compiled once — the
  * columnar shape). Test/runMain graft.xmq.IxmlMicroBench [n] */
object IxmlMicroBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val g = graft.xmq.ixml.IxmlReader.parse(
      "pair = key, -\":\", value.\nkey = ~[\":\"]+.\nvalue = [\"0\"-\"9\"]+.\n")
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      var i = 0; var acc = 0L
      while (i < n) {
        acc += graft.xmq.ixml.Earley.parse(g, s"source_$i:${i % 997}").children.length
        i += 1
      }
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$n parses: $s%.2f s = ${n / s}%.0f docs/s ($acc)")
    }
  }
}
