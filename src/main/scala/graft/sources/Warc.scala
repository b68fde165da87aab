package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

/** WARC (ISO 28500) container reader — the standard interleaved web-crawl
  * archive format: a WARC file is a sequence of records (warcinfo, request,
  * response, metadata, …), each a version line + named header fields + a
  * Content-Length-delimited block, and crawl archives ship them as
  * concatenated per-record gzip members.
  *
  * This is a SOURCE-level operator, not a per-document kernel: one WARC
  * file expands into many documents (cardinality change), so it runs as a
  * flatMap BEFORE the extraction kernel — the extracted payloads then flow
  * through the same content-sniffed `ExtractJob.extract1` dispatch as any
  * other interleaved document.
  *
  * Scale notes: parsing is a strictly sequential single pass over an
  * InputStream (per-record allocation = that record's block only, never
  * the file), so a 1 GB crawl archive streams through an executor without
  * materializing; concatenated gzip members are handled by
  * GZIPInputStream's native multi-member mode.
  */
object Warc {

  /** One parsed WARC record: type + the headers extraction cares about,
    * with the HTTP envelope already split off for response records
    * (`httpStatus`/`contentType` from the envelope, `body` = entity). */
  final case class Record(recType: String, targetUri: String,
                          httpStatus: Int, contentType: String,
                          body: Array[Byte])

  private val GzipMagic0 = 0x1f.toByte
  private val GzipMagic1 = 0x8b.toByte

  def looksWarc(bytes: Array[Byte]): Boolean =
    (bytes.length >= 5 && bytes.startsWith("WARC/".getBytes("US-ASCII"))) ||
      (bytes.length >= 2 && bytes(0) == GzipMagic0 && bytes(1) == GzipMagic1)

  /** Parse every record of a (possibly per-record-gzipped) WARC file.
    * Strict: a malformed record raises IllegalArgumentException — callers
    * own the per-file error contract (see WarcOps). */
  def records(raw: Array[Byte]): Iterator[Record] = {
    val base = new ByteArrayInputStream(raw)
    val in: InputStream =
      if (raw.length >= 2 && raw(0) == GzipMagic0 && raw(1) == GzipMagic1)
        new GZIPInputStream(base) // reads concatenated members transparently
      else base
    records(new BufferedInputStream(in, 64 * 1024))
  }

  /** Streaming record iterator over an already-opened stream. */
  def records(in: InputStream): Iterator[Record] = new Iterator[Record] {
    private var nextRec: Record = _
    private var done = false
    private def advance(): Unit = {
      if (done || nextRec != null) return
      val version = readLineSkippingBlanks(in)
      if (version == null) { done = true; return }
      require(version.startsWith("WARC/"),
        s"expected WARC version line, got '${version.take(32)}'")
      val headers = readHeaders(in)
      val len = headers.getOrElse("content-length",
        throw new IllegalArgumentException("WARC record missing Content-Length"))
      val block = readN(in, len.trim.toInt)
      nextRec = parseRecord(headers, block)
    }
    override def hasNext: Boolean = { advance(); !done }
    override def next(): Record = {
      advance()
      if (done) throw new NoSuchElementException("end of WARC")
      val r = nextRec; nextRec = null; r
    }
  }

  /** The extraction feed: HTTP-2xx response records as (targetUri, entity
    * bytes) — requests, warcinfo, metadata and error statuses are crawl
    * bookkeeping, not documents. */
  def responses(raw: Array[Byte]): Iterator[(String, Array[Byte])] =
    records(raw).collect {
      case r if r.recType == "response" && r.httpStatus / 100 == 2 =>
        (r.targetUri, r.body)
    }

  // ---- record-level parsing ----

  private def parseRecord(headers: Map[String, String], block: Array[Byte]): Record = {
    val recType = headers.getOrElse("warc-type", "")
    val uri = headers.getOrElse("warc-target-uri", "")
    val warcCt = headers.getOrElse("content-type", "")
    if (recType == "response" && warcCt.startsWith("application/http")) {
      val (status, entityCt, body) = splitHttp(block)
      Record(recType, uri, status, entityCt, body)
    } else Record(recType, uri, 0, warcCt, block)
  }

  /** Split an HTTP response message: status line, entity Content-Type,
    * body after the first CRLFCRLF. */
  private def splitHttp(msg: Array[Byte]): (Int, String, Array[Byte]) = {
    val sep = indexOfCrlfCrlf(msg)
    require(sep >= 0, "HTTP payload has no header/body separator")
    val head = new String(msg, 0, sep, "ISO-8859-1")
    val lines = head.split("\r\n")
    val statusParts = lines.head.split(" ")
    require(statusParts.length >= 2 && statusParts.head.startsWith("HTTP/"),
      s"malformed HTTP status line '${lines.head.take(32)}'")
    val status = statusParts(1).toInt
    val ct = lines.tail.collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") =>
        l.substring("content-type:".length).trim
    }.getOrElse("")
    (status, ct, java.util.Arrays.copyOfRange(msg, sep + 4, msg.length))
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  // ---- stream primitives ----

  /** Read one CRLF-terminated ASCII line; null at clean EOF. */
  private def readLine(in: InputStream): String = {
    val sb = new StringBuilder(64)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
    sb.toString()
  }

  /** Version lines may be preceded by the previous record's trailing
    * CRLFCRLF (or inter-member padding) — skip empty lines. */
  private def readLineSkippingBlanks(in: InputStream): String = {
    var l = readLine(in)
    while (l != null && l.isEmpty) l = readLine(in)
    l
  }

  private def readHeaders(in: InputStream): Map[String, String] = {
    val m = Map.newBuilder[String, String]
    var l = readLine(in)
    while (l != null && l.nonEmpty) {
      val i = l.indexOf(':')
      require(i > 0, s"malformed WARC header '${l.take(32)}'")
      m += (l.substring(0, i).toLowerCase -> l.substring(i + 1).trim)
      l = readLine(in)
    }
    m.result()
  }

  private def readN(in: InputStream, n: Int): Array[Byte] = {
    require(n >= 0, s"negative Content-Length $n")
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException(s"WARC block truncated at $off/$n")
      off += r
    }
    buf
  }
}
