package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.testkit.PdfBuilder

/** pdf2txt CLI surface (success paths only — failure paths call sys.exit,
  * which must not run inside the test JVM). */
class CliSpec extends AnyFunSuite {

  private def withCapturedOut(body: => Unit): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(bos)(body)
    new String(bos.toByteArray, "UTF-8")
  }

  private def writeFixture(f: PdfBuilder.Fixture): String = {
    val p = java.nio.file.Files.createTempFile("cli-spec", ".pdf")
    java.nio.file.Files.write(p, f.bytes)
    p.toString
  }

  test("extracts a file to stdout") {
    val path = writeFixture(PdfBuilder.f01MinimalFlate)
    val out = withCapturedOut(Cli.main(Array(path)))
    assert(out == "Hello World\n", s"got [$out]")
  }

  test("--pages prints page-delimited blocks for a multi-page file") {
    val path = writeFixture(PdfBuilder.f03Filters)
    val out = withCapturedOut(Cli.main(Array("--pages", path)))
    assert(out.contains("--- page 1 ---") && out.contains("--- page 4 ---"), out)
    assert(out.contains("flate+a85") && out.contains("predictor!"), out)
  }

  test("batch mode concatenates multiple files in argument order") {
    val p1 = writeFixture(PdfBuilder.f01MinimalFlate)
    val p2 = writeFixture(PdfBuilder.f28RunLength)
    val out = withCapturedOut(Cli.main(Array(p1, p2)))
    assert(out == "Hello World\nrle aaaaaaaaaa ok\n", s"got [$out]")
  }
}
