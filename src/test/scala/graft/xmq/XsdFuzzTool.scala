package graft.xmq

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import scala.util.Random

/** Differential fuzz for the validate command: random documents (some
  * violating the schema by construction) against fixed XSDs; the VERDICT
  * (valid → identical full output; invalid → identical abort banner) must
  * agree with the binary. Error detail text beyond the banner is only
  * compared when both engines word it identically (the two libxml2 families
  * the fixtures exercise are re-rendered; other Xerces texts differ).
  *
  * usage: Test/runMain graft.xmq.XsdFuzzTool <n-per-schema> [seed]
  */
object XsdFuzzTool {
  private val Binary = "/tmp/refbuild/build/x86_64-pc-linux-gnu/release/xmq"

  private val schemas = Seq(
    "seq" ->
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |<xs:element name="doc"><xs:complexType><xs:sequence>
        |<xs:element name="id" type="xs:integer"/>
        |<xs:element name="src" type="xs:string" minOccurs="0"/>
        |</xs:sequence></xs:complexType></xs:element>
        |</xs:schema>""".stripMargin,
    "list" ->
      """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |<xs:element name="list"><xs:complexType><xs:sequence>
        |<xs:element name="item" maxOccurs="unbounded"><xs:complexType>
        |<xs:attribute name="id" type="xs:integer" use="required"/>
        |</xs:complexType></xs:element>
        |</xs:sequence></xs:complexType></xs:element>
        |</xs:schema>""".stripMargin)

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 150
    val seed = if (args.length > 1) args(1).toLong else 42L
    val rnd = new Random(seed)
    if (!Files.exists(java.nio.file.Paths.get(Binary))) {
      System.err.println(s"reference binary missing at $Binary")
      sys.exit(2)
    }

    def randomDoc(schema: String): String = schema match {
      case "seq" =>
        val id = if (rnd.nextInt(4) == 0) "x" + rnd.nextInt(9) else rnd.nextInt(999).toString
        val src = if (rnd.nextBoolean()) s"<src>s${rnd.nextInt(9)}</src>" else ""
        val extra = if (rnd.nextInt(5) == 0) "<bogus/>" else ""
        s"<doc><id>$id</id>$src$extra</doc>"
      case _ =>
        val items = (0 until 1 + rnd.nextInt(4)).map { _ =>
          if (rnd.nextInt(4) == 0) "<item/>" // missing required attr
          else if (rnd.nextInt(6) == 0) s"""<item id="z"/>""" // bad type
          else s"""<item id="${rnd.nextInt(99)}"/>"""
        }.mkString
        s"<list>$items</list>"
    }

    val tmp = Files.createTempDirectory("xsdfuzz")
    var mismatches = 0
    for ((sname, schema) <- schemas) {
      val sFile = tmp.resolve(s"$sname.xsd")
      Files.writeString(sFile, schema)
      for (i <- 0 until n) {
        val doc = randomDoc(sname)
        val dFile = tmp.resolve(s"$sname-$i.xml")
        Files.write(dFile, doc.getBytes(StandardCharsets.UTF_8))
        val pb = new ProcessBuilder(Binary, dFile.toString, "validate", sFile.toString, "to-xmq")
        val proc = pb.start()
        val ref = new String(proc.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
        proc.waitFor()
        val mine = Cli.run(doc.getBytes(StandardCharsets.UTF_8), "",
          s"validate $sFile to-xmq", base = "/root/reference")
        val got = if (mine.ok) mine.output else s"ENGINE-ERROR: ${mine.error}\n"
        val refInvalid = ref.startsWith("xmq: Document cannot be validated")
        val gotInvalid = got.startsWith("xmq: Document cannot be validated")
        val agree =
          if (refInvalid || gotInvalid) refInvalid == gotInvalid // verdict only
          else got == ref // valid: full doc output byte-exact
        if (!agree) {
          mismatches += 1
          if (mismatches <= 6) {
            System.err.println(s"=== MISMATCH $sname case $i doc=$doc")
            System.err.println(s"--- mine:\n$got--- ref:\n$ref")
          }
        }
      }
    }
    println(s"xsd differential fuzz: ${schemas.size * n} cases, $mismatches mismatches")
    if (mismatches > 0) sys.exit(1)
  }
}
