package graft

/** Command-line front end mirroring the reference's `pdf2txt` binary
  * (reference: main.cc — `pdf2txt <in.pdf>` prints extracted text):
  *
  *   runMain graft.Cli file.pdf [file2.pdf ...]    text to stdout
  *   runMain graft.Cli --pages file.pdf            one block per page
  *
  * Errors on a file print to stderr and set a nonzero exit code, but do
  * not stop remaining files (batch-friendly, same posture as the
  * pipeline's error spans). */
object Cli {
  def main(args: Array[String]): Unit = {
    val (flags, files) = args.partition(_.startsWith("--"))
    val perPage = flags.contains("--pages")
    if (files.isEmpty) {
      System.err.println("usage: graft.Cli [--pages] <file.pdf> [more.pdf ...]")
      sys.exit(2)
    }
    var failed = 0
    files.foreach { f =>
      try {
        val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))
        if (perPage) {
          graft.pdf.Pdf.pdf2pages(bytes).zipWithIndex.foreach { case (t, i) =>
            println(s"--- page ${i + 1} ---")
            print(t)
          }
        } else print(graft.pdf.Pdf.pdf2txt(bytes))
      } catch {
        case e: Exception =>
          System.err.println(s"$f: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}")
          failed += 1
      }
    }
    if (failed > 0) sys.exit(1)
  }
}
