package graft.xmq

import java.nio.file.{Files, Paths}

/** One-shot ixml probe: parse <input-file> with <grammar-file> and print
  * the engine's to-xmq — the "mine" half of a hand-driven differential
  * probe against `xmq --ixml=<grammar> <input> to-xmq`.
  *
  * Test/runMain graft.xmq.IxmlProbeTool <grammar.ixml> <input>
  */
object IxmlProbeTool {
  def main(args: Array[String]): Unit = {
    val grammar = Files.readString(Paths.get(args(0)))
    val input = Files.readString(Paths.get(args(1)))
    print(XmqEngine.toXmq(graft.xmq.ixml.Ixml.parseToDoc(grammar, input)))
  }
}
