package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
// (mutation fuzz added below the original poison tests)
import graft.testkit.PdfBuilder

/** Poison-document robustness: random mutations of valid PDFs must either
  * extract or throw — never hang or kill the JVM (the 100 TB contract:
  * a poison document becomes an error span). Deterministic (seed=42). */
class FuzzSpec extends AnyFunSuite {

  test("single-byte mutations of every fixture terminate") {
    val r = new java.util.Random(42)
    PdfBuilder.all.foreach { f =>
      (1 to 40).foreach { _ =>
        val bytes = f.bytes.clone()
        bytes(r.nextInt(bytes.length)) = (r.nextInt(256) - 128).toByte
        try Pdf.pdf2txt(bytes)
        catch { case _: Throwable => } // any exception is fine; hangs are not
      }
    }
  }

  test("truncations at every eighth terminate") {
    PdfBuilder.all.foreach { f =>
      (1 to 7).foreach { k =>
        val bytes = f.bytes.take(f.bytes.length * k / 8)
        try Pdf.pdf2txt(bytes)
        catch { case _: Throwable => }
      }
    }
  }

  test("multi-byte mutations, insertions and deletions terminate") {
    val r = new java.util.Random(43)
    PdfBuilder.all.foreach { f =>
      (1 to 10).foreach { _ =>
        val b = f.bytes.clone()
        (1 to 1 + r.nextInt(8)).foreach(_ => b(r.nextInt(b.length)) = (r.nextInt(256) - 128).toByte)
        try Pdf.pdf2txt(b) catch { case _: Throwable => }
        // deletion of a random window
        val cut = r.nextInt(b.length - 1)
        val del = b.take(cut) ++ b.drop(cut + 1 + r.nextInt(math.min(32, b.length - cut - 1)))
        try Pdf.pdf2txt(del) catch { case _: Throwable => }
        // insertion of random bytes
        val ins = b.take(cut) ++ Array.fill(1 + r.nextInt(8))((r.nextInt(256) - 128).toByte) ++ b.drop(cut)
        try Pdf.pdf2txt(ins) catch { case _: Throwable => }
      }
    }
  }

  test("per-thread reused state never leaks across documents") {
    // interleave poison + valid docs on one thread: ThreadLocal scratch
    // (Inflater, layout worklists, crypt memo, width memos) must not
    // pollute the next document's result
    val clean = PdfBuilder.all.map(f => f.name -> Pdf.pdf2txt(f.bytes)).toMap
    val r = new java.util.Random(44)
    PdfBuilder.all.foreach { f =>
      val garbage = f.bytes.clone()
      (1 to 16).foreach(_ => garbage(r.nextInt(garbage.length)) = (r.nextInt(256) - 128).toByte)
      try Pdf.pdf2txt(garbage) catch { case _: Throwable => }
      assert(Pdf.pdf2txt(f.bytes) == clean(f.name), s"state leak after mutated ${f.name}")
    }
  }

  test("hostile structured inputs terminate with errors, not OOM") {
    // absurd /W range must fail the document, not the JVM
    val badW = "<< /Type /Font /Subtype /Type0 /BaseFont /T /Encoding /Identity-H " +
      "/DescendantFonts [6 0 R] >>"
    val badDescendant = "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /T /DW 1000 " +
      "/W [0 4000000000 500] >>"
    val content = "BT /F1 12 Tf 72 720 Td <0001> Tj ET"
    val doc = PdfBuilder.build(Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      4 -> PdfBuilder.streamObj("", content),
      5 -> badW,
      6 -> badDescendant), 1)
    intercept[Exception] { Pdf.pdf2txt(doc) }

    // absurd predictor columns return empty, not a 2 GB allocation
    val opts = Lex.getDictionaryData("<< /Predictor 12 /Columns 2000000000 >>", 0)
    assert(Filters.predictorDecode("abcdef", opts) == "")
  }
}
