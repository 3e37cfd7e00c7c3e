package graft.xmq

import org.scalatest.funsuite.AnyFunSuite

/** Round-3 CLI flag coverage: output-formatting options and meta flags,
  * expectations recorded from the reference binary (all verified byte-exact
  * by differential diff at implementation time). */
class CliFlagsSpec extends AnyFunSuite {

  private val doc = "alfa{beta=hello gamma=\"a b c\"}".getBytes("UTF-8")

  test("--indent= controls the xmq indentation width") {
    val r8 = Cli.run(doc, "", "to-xmq --indent=8")
    assert(r8.output ==
      "alfa {\n        beta  = hello\n        gamma = 'a b c'\n}\n")
    val r0 = Cli.run(doc, "", "to-xmq --indent=0")
    assert(r0.output == "alfa {\nbeta  = hello\ngamma = 'a b c'\n}\n")
  }

  test("--omit-decl drops the xml declaration") {
    val r = Cli.run(doc, "", "to-xml --omit-decl")
    assert(r.output == "<alfa><beta>hello</beta><gamma>a b c</gamma></alfa>\n")
    assert(Cli.run(doc, "", "to-xml").output.startsWith("<?xml version=\"1.0\""))
  }

  test("--prefer-double-quotes switches the quote character") {
    val r = Cli.run("a = 'hi there'".getBytes("UTF-8"), "", "to-xmq --prefer-double-quotes")
    assert(r.output == "a = \"hi there\"\n")
  }

  test("--ixml-fail-silent yields empty output, success, on parse failure") {
    val g = "doc: item+.\nitem: -\"(\", val, -\")\".\nval: [\"a\"-\"z\"]+."
    val gf = java.nio.file.Files.createTempFile("g", ".ixml")
    java.nio.file.Files.writeString(gf, g)
    val bad = Cli.run("(ab)(c9d)".getBytes("UTF-8"), s"--ixml=$gf --ixml-fail-silent", "to-xmq")
    assert(bad.ok && bad.output == "")
    val good = Cli.run("(ab)".getBytes("UTF-8"), s"--ixml=$gf --ixml-fail-silent", "to-xmq")
    assert(good.ok && good.output == "doc {\n    item {\n        val = ab\n    }\n}\n")
  }

  test("meta flags return their fixed texts") {
    assert(Cli.run(doc, "--version", "to-xmq").output == "xmq: 4.2.0-modified\n")
    assert(Cli.run(doc, "--license", "to-xmq").output == License.text)
    assert(Cli.run(doc, "--help", "to-xmq").output.startsWith("Usage: xmq"))
  }

  test("--clines input is rejected like the reference (rc=1, no output)") {
    val r = Cli.run("/a/b=\"x\"\n".getBytes("UTF-8"), "--clines", "to-xmq")
    assert(!r.ok && r.output == null)
  }
}
