package graft.testkit

import java.io.ByteArrayOutputStream
import java.util.zip.GZIPOutputStream

/** Deterministic WARC (ISO 28500) archive fixtures: wrap the existing
  * HTML/PDF fixtures in crawl-archive records so the WARC source leg is
  * proven against by-construction expected text. Two storage variants —
  * plain concatenation and per-record gzip members (the Common Crawl
  * shipping shape) — must yield identical extractions. */
object WarcBuilder {

  /** (target URI, entity content-type, payload, expected extracted text,
    * expected output span kind) per response document. */
  final case class Doc(uri: String, contentType: String,
                       payload: Array[Byte], expected: String, kind: String)

  def docs: Seq[Doc] = {
    val h1 = HtmlBuilder.h01Article
    val h3 = HtmlBuilder.h03Markup
    val p1 = PdfBuilder.f01MinimalFlate
    Seq(
      Doc("http://example.org/articles/pipelines", "text/html; charset=utf-8",
        h1.bytes, h1.expected, "html_text"),
      Doc("http://example.org/docs/markup", "text/html", h3.bytes, h3.expected, "html_text"),
      Doc("http://example.org/papers/minimal.pdf", "application/pdf",
        p1.bytes, p1.expected, "pdf_text"))
  }

  private def crlf(s: String): Array[Byte] = s.replace("\n", "\r\n").getBytes("ISO-8859-1")

  private def record(headers: Seq[(String, String)], block: Array[Byte]): Array[Byte] = {
    val head = crlf("WARC/1.0\n" +
      headers.map { case (k, v) => s"$k: $v" }.mkString("\n") +
      s"\nContent-Length: ${block.length}\n\n")
    head ++ block ++ crlf("\n\n")
  }

  private def httpResponse(status: String, contentType: String, body: Array[Byte]): Array[Byte] =
    crlf(s"HTTP/1.1 $status\nContent-Type: $contentType\nContent-Length: ${body.length}\n\n") ++ body

  private def responseRecord(d: Doc, id: Int, status: String = "200 OK"): Array[Byte] = {
    val http = httpResponse(status, d.contentType, d.payload)
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> f"<urn:uuid:${id}%08d>",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Target-URI" -> d.uri,
      "Content-Type" -> "application/http; msgtype=response"), http)
  }

  /** A realistic archive: warcinfo + a request record (both bookkeeping,
    * skipped by extraction), the response docs, and a 404 response (an
    * error status is crawl bookkeeping too). */
  def archiveRecords: Seq[Array[Byte]] = {
    val info = record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> "<urn:uuid:00000000>",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "Content-Type" -> "application/warc-fields"),
      crlf("software: graft-testkit\nformat: WARC File Format 1.0\n"))
    val req = record(Seq(
      "WARC-Type" -> "request",
      "WARC-Record-ID" -> "<urn:uuid:00000001>",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Target-URI" -> docs.head.uri,
      "Content-Type" -> "application/http; msgtype=request"),
      crlf(s"GET /articles/pipelines HTTP/1.1\nHost: example.org\n\n"))
    val notFound = responseRecord(
      Doc("http://example.org/gone", "text/html",
        "<html><body>not here</body></html>".getBytes("UTF-8"), "", ""),
      99, status = "404 Not Found")
    (info +: req +: docs.zipWithIndex.map { case (d, i) => responseRecord(d, i + 2) }) :+ notFound
  }

  /** Plain WARC file: records concatenated. */
  def plain: Array[Byte] = archiveRecords.reduce(_ ++ _)

  /** Per-record gzip members concatenated (Common Crawl shape). */
  def gzipped: Array[Byte] = archiveRecords.map { r =>
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(r); gz.close()
    bos.toByteArray
  }.reduce(_ ++ _)

  /** Not a WARC file at all — exercises the whole-file error demotion. */
  def malformed: Array[Byte] =
    "WARC/1.0\r\nNoColonHeaderLine\r\n\r\n".getBytes("ISO-8859-1")
}
