package graft.xmq

import org.scalatest.funsuite.AnyFunSuite
import graft.xmq.ixml.Ixml

/** Pins the one_parse ambiguity pick order against 20 recorded-from-binary
  * probes (input "b" in every case). yaep's build_parse_tree commits to the
  * FIRST origin-valid completion in state-set-core order
  * (yaep_tree.c:401-470), which layers candidates as:
  * scan-completed (terminal-ending) → completion-cascaded (consuming
  * nonterminal end) → trailing-epsilon parent-advances; the last DECLARED
  * alternative first among peers. Every expectation below is the byte
  * output of the compiled reference binary (xmq --ixml=g input to-xmq).
  */
class IxmlPickOrderSpec extends AnyFunSuite {

  private def parsed(grammar: String): String =
    XmqEngine.toXmq(Ixml.parseToDoc(grammar, "b"))

  private val Head =
    "r0(state      = ambiguous\n   xmlns:ixml = http://invisiblexml.org/NS)"
  private def text(s: String) = s"$Head = $s\n"
  private def child(name: String, s: String) = s"$Head\n{\n    $name = $s\n}\n"

  private val probes: Seq[(String, String, String)] = Seq(
    // (label, grammar, expected) — expected recorded from the binary
    ("C terminal beats NT both orders",
      "r0: r3 | \"b\".\nr3: \"b\".\n", text("b")),
    ("D terminal beats NT, declared first",
      "r0: \"b\" | r3.\nr3: \"b\".\n", text("b")),
    ("A consuming NT beats double-optional",
      "r0: r3 | \"b\"?, \"a\"?.\nr3: \"a\", \"z\" | \"b\".\n", child("r3", "b")),
    ("B same, declaration order swapped",
      "r0: \"b\"?, \"a\"? | r3.\nr3: \"a\", \"z\" | \"b\".\n", child("r3", "b")),
    ("E consuming NT beats trailing-optional terminal",
      "r0: r3 | \"b\", \"a\"?.\nr3: \"b\".\n", child("r3", "b")),
    ("H terminal beats two-level chain",
      "r0: r4 | \"b\".\nr4: r3.\nr3: \"b\".\n", text("b")),
    ("I terminal beats NT-plus-trailing-optional",
      "r0: r3, \"a\"? | \"b\".\nr3: \"b\".\n", text("b")),
    ("O terminal beats leading-optional-then-NT",
      "r0: \"a\"?, r3 | \"b\".\nr3: \"b\".\n", text("b")),
    ("P leading-optional terminal still scan-completes",
      "r0: r3 | \"a\"?, \"b\".\nr3: \"b\".\n", text("b")),
    ("K1 NT peers: last declared wins",
      "r0: r1x | r2x.\nr1x: \"b\".\nr2x: \"b\".\n", child("r2x", "b")),
    ("K2 NT peers swapped",
      "r0: r2x | r1x.\nr1x: \"b\".\nr2x: \"b\".\n", child("r1x", "b")),
    ("N consuming NT beats NT-plus-nullable",
      "r0: r1x, r5 | r2x.\nr1x: \"b\".\nr2x: \"b\".\nr5: \"a\"?.\n", child("r2x", "b")),
    ("N2 same, declaration order swapped",
      "r0: r2x | r1x, r5.\nr1x: \"b\".\nr2x: \"b\".\nr5: \"a\"?.\n", child("r2x", "b")),
    ("F optional-vs-optional terminal",
      "r0: \"b\"?, \"a\"? | \"b\", \"a\"?.\n", text("b")),
    ("M1 NT-plus-optional peers: last declared",
      "r0: r1x, \"a\"? | r2x, \"a\"?.\nr1x: \"b\".\nr2x: \"b\".\n", child("r2x", "b")),
    ("M2 same swapped",
      "r0: r2x, \"a\"? | r1x, \"a\"?.\nr1x: \"b\".\nr2x: \"b\".\n", child("r1x", "b")),
    ("Q1 scan tie: bare vs optional-prefixed terminal",
      "r0: \"b\" | \"a\"?, \"b\".\n", text("b")),
    ("Q2 scan tie swapped",
      "r0: \"a\"?, \"b\" | \"b\".\n", text("b")),
    ("Q3 equal-depth chains: last declared",
      "r0: r4 | r6.\nr4: r3.\nr6: r3.\nr3: \"b\".\n",
      s"$Head\n{\n    r6 {\n        r3 = b\n    }\n}\n"),
    ("Q4 depth does not trump declaration among cascades",
      "r0: r4 | r1x.\nr4: r3.\nr3: \"b\".\nr1x: \"b\".\n", child("r1x", "b"))
  )

  for ((label, grammar, expected) <- probes) {
    test(s"pick order: $label") {
      assert(parsed(grammar) == expected)
    }
  }
}
