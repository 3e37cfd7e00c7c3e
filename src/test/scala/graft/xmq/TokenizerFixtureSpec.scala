package graft.xmq

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths, Path}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

object Fixtures {
  val dir: Path = Paths.get("/root/reference/tests")
  def available: Boolean = Files.isDirectory(dir)
  def list(prefixRegex: String): Seq[Path] =
    if (!available) Seq.empty
    else Files.list(dir).iterator().asScala.toSeq
      .filter(p => p.getFileName.toString.matches(prefixRegex)).sortBy(_.getFileName.toString)

  /** Extract section: lines strictly between `startMarker` line and `endMarker` line
    * (mirrors the sed -n '/^A$/,/^B$/p | tail +2 | sed $d' in tests/test_single.sh). */
  def section(content: String, start: String, end: String): String = {
    val lines = content.split("\n", -1)
    val out = new StringBuilder
    var in = false
    var done = false
    for (l <- lines if !done) {
      if (!in && l.matches(start)) in = true
      else if (in && l.matches(end)) { done = true }
      else if (in) out.append(l).append('\n')
    }
    out.toString
  }

  def read(p: Path): String = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
}

/** Replays the reference tokenizer corpus (tests/001..047_*.test):
  * input xmq must produce identical debugtokens and debugcontent streams. */
class TokenizerFixtureSpec extends AnyFunSuite {
  assume(Fixtures.available, "reference corpus not present")

  for (p <- Fixtures.list("""\d\d\d_.*\.test""")) {
    val name = p.getFileName.toString
    test(s"tokenize $name") {
      val content = Fixtures.read(p)
      val input = Fixtures.section(content, "START", "DEBUG")
      val expTokens = Fixtures.section(content, "DEBUG", "CONTENT")
      val expContent = Fixtures.section(content, "CONTENT", "END")
      val bytes = input.getBytes(StandardCharsets.UTF_8)
      val gotTokens = Xmq.debugTokens(bytes)
      val gotContent = Xmq.debugContent(bytes)
      assert(gotTokens == expTokens, s"\n--- tokens expected:\n$expTokens--- got:\n$gotTokens")
      assert(gotContent == expContent, s"\n--- content expected:\n$expContent--- got:\n$gotContent")
    }
  }
}
