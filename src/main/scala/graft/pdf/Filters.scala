package graft.pdf

import java.util.zip.{Inflater, DataFormatException}
import scala.collection.mutable.ArrayBuffer
import Lex._

/** PDF stream filters: /FlateDecode, /LZWDecode, /ASCII85Decode,
  * /ASCIIHexDecode and the PNG/TIFF predictor post-pass.
  * Semantics mirror the reference (flate_decode.cc, lzw_decode.cc,
  * ascii85_decode.cc, ascii_hex_decode.cc, common.cc:501-589,683-695). */
object Filters {

  /** common.cc:125-133 */
  def getFilters(props: Dict): Seq[String] = {
    val filters = props.getOrElse("/Filter", err("decode: no /Filter"))
    if (filters.kind == Kind.NAME_OBJECT) return Seq(filters.raw)
    if (filters.kind != Kind.ARRAY) err(s"get_filters: wrong filter type: ${filters.kind}")
    getArrayData(filters.raw, 0).map(_.raw).toSeq
  }

  /** common.cc:135-163 */
  def getDecodeParams(src: Dict, nFilters: Int): Seq[Dict] = {
    src.get("/DecodeParms") match {
      case None => Seq.fill(nFilters)(newDict())
      case Some(o) if o.kind == Kind.DICTIONARY => Seq(getDictionaryData(o.raw, 0))
      case Some(o) if o.kind == Kind.ARRAY =>
        val result = ArrayBuffer.empty[Dict]
        var offset = 0
        var done = false
        while (!done) {
          offset = find(o.raw, "<<", offset)
          if (offset == NPOS) {
            if (result.isEmpty) err("get_decode_params: /DecodeParms must be dictionary or an array of dictionaries")
            done = true
          } else {
            val p = new Pos(offset)
            result += getDictionaryData(getDictionary(o.raw, p), 0)
            offset = p.i
          }
        }
        result.toSeq
      case Some(_) => err("get_decode_params: wrong type for /DecodeParms")
    }
  }

  /** common.cc:683-695 — apply the /Filter chain left-to-right. */
  def decode(content: String, props: Dict): String = {
    if (!props.contains("/Filter")) return content
    val filters = getFilters(props)
    val params = getDecodeParams(props, filters.size)
    if (filters.size != params.size) err("decode: different sizes for filters and decode_params")
    var result = content
    var i = 0
    while (i < filters.size) {
      result = filters(i) match {
        case "/FlateDecode" => flateDecode(result, params(i))
        case "/LZWDecode" => lzwDecode(result, params(i))
        case "/ASCII85Decode" => ascii85Decode(result, params(i))
        case "/ASCIIHexDecode" => asciiHexDecode(result, params(i))
        case "/RunLengthDecode" | "/RL" => runLengthDecode(result, params(i))
        case f => err(s"decode: unknown filter $f")
      }
      i += 1
    }
    result
  }

  // per-thread reused decoder state (north star: "mapPartitions with reused
  // decoder buffers") — one Inflater per executor thread, reset between
  // streams instead of reallocated per stream
  private val tlInflater = ThreadLocal.withInitial[Inflater](() => new Inflater())

  /** flate_decode.cc:43-55 — inflates straight into one growable byte
    * array, converted to the byte-string with a single latin-1 copy (no
    * per-byte appends, no intermediate stream). */
  def flateDecode(data: String, opts: Dict): String = {
    val in = toBytes(data)
    val inf = tlInflater.get()
    inf.reset()
    inf.setInput(in)
    var out = new Array[Byte](math.max(256, in.length * 4))
    var len = 0
    try {
      var progressed = true
      while (!inf.finished() && progressed) {
        if (len == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
        val n = inf.inflate(out, len, out.length - len)
        len += n
        // all input was provided up-front; no progress and input exhausted
        // means a truncated stream — the reference returns the partial data
        // when inflate leaves avail_out > 0
        progressed = n > 0 || (!inf.needsInput() && !inf.needsDictionary())
      }
      if (len == 0 && !inf.finished()) err("flate_decode: inflate error")
    } catch {
      case _: DataFormatException => err("flate_decode: inflate error")
    } finally inf.reset() // keep the thread-local instance alive for reuse
    val result = new String(out, 0, len, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (opts.isEmpty) result else predictorDecode(result, opts)
  }

  /** /RunLengthDecode (PDF 32000-1 §7.4.5; absent from the reference but
    * named in the mandate's filter list): length byte L — L<128 copies the
    * next L+1 bytes literally, L>128 repeats the next byte 257-L times,
    * L=128 is EOD. Truncated input yields the partial data (matching the
    * permissive posture of the other codecs here). */
  def runLengthDecode(data: String, opts: Dict): String = {
    val sb = new java.lang.StringBuilder(math.max(64, data.length))
    var i = 0
    var done = false
    while (!done && i < data.length) {
      val l = data.charAt(i) & 0xff
      i += 1
      if (l == 128) done = true
      else if (l < 128) {
        var k = 0
        while (k <= l && i < data.length) { sb.append(data.charAt(i)); i += 1; k += 1 }
      } else if (i < data.length) {
        val c = data.charAt(i)
        i += 1
        var k = 257 - l
        while (k > 0) { sb.append(c); k -= 1 }
      }
    }
    val result = sb.toString
    if (opts.isEmpty) result else predictorDecode(result, opts)
  }

  /** lzw_decode.cc:39-130 — PDF LZW (9→12-bit codes, clear=256, EOD=257). */
  def lzwDecode(bufStr: String, opts: Dict): String = {
    val masks = Array(0x01ff, 0x03ff, 0x07ff, 0x0fff)
    val CLEAR = 0x0100
    val EOD = 0x0101

    def initTable(): ArrayBuffer[Array[Byte]] = {
      val t = new ArrayBuffer[Array[Byte]](4096)
      var i = 0
      while (i <= 255) { t += Array(i.toByte); i += 1 }
      t += Array.emptyByteArray // dummy entry (never emitted)
      t
    }

    var mask = 0
    var codeLen = 9
    var table = initTable()
    var bufferSize = 0
    val bufferMax = 24
    var old = 0
    var buffer = 0L
    val out = new java.io.ByteArrayOutputStream(math.max(64, bufStr.length * 3))
    var len = bufStr.length
    var p = 0
    var character: Int = if (bufStr.nonEmpty) bufStr.charAt(0) & 0xff else 0

    while (len > 0) {
      while (bufferSize <= (bufferMax - 8) && len > 0) {
        buffer = (buffer << 8) | (bufStr.charAt(p) & 0xff)
        bufferSize += 8
        p += 1
        len -= 1
      }
      var continueOuter = false
      while (bufferSize >= codeLen && !continueOuter) {
        val code = ((buffer >> (bufferSize - codeLen)) & masks(mask)).toInt
        bufferSize -= codeLen
        if (code == CLEAR) {
          mask = 0; codeLen = 9; table = initTable()
        } else if (code == EOD) {
          len = 0
          continueOuter = true
        } else {
          var data: Array[Byte] = null
          if (code >= table.size) {
            if (old >= table.size) err("lzw_decode: value out of range")
            data = table(old) :+ character.toByte
          } else data = table(code)
          out.write(data, 0, data.length)
          character = data(0) & 0xff
          if (old < table.size) data = table(old)
          table += (data :+ character.toByte)
          old = code
          table.size match {
            case 511 | 1023 | 2047 => codeLen += 1; mask += 1
            case _ =>
          }
        }
      }
    }
    val result = fromBytes(out.toByteArray)
    if (opts.isEmpty) result else predictorDecode(result, opts)
  }

  /** ascii85_decode.cc:41-81 */
  def ascii85Decode(buf: String, opts: Dict): String = {
    val powers85 = Array(85L * 85 * 85 * 85, 85L * 85 * 85, 85L * 85, 85L, 1L)
    var count = 0
    var tuple = 0L
    var foundEnd = false
    var i = 0
    var len = buf.length
    val out = new java.lang.StringBuilder(buf.length)

    def widePut(t: Long, bytes: Int): Unit = {
      if (bytes >= 1) out.append(((t >> 24) & 0xff).toChar)
      if (bytes >= 2) out.append(((t >> 16) & 0xff).toChar)
      if (bytes >= 3) out.append(((t >> 8) & 0xff).toChar)
      if (bytes >= 4) out.append((t & 0xff).toChar)
    }

    while (len > 0 && !foundEnd) {
      val c = buf.charAt(i)
      c match {
        case 'z' =>
          if (count != 0) err("ascii85_decode: count is not zero")
          widePut(tuple, 4)
        case '~' =>
          i += 1; len -= 1
          if (len > 0 && buf.charAt(i) != '>') err("ascii85_decode: buffer is not >")
          foundEnd = true
        case '\n' | '\r' | '\t' | ' ' | '\u0000' | '\f' | '\b' | '\u007f' =>
        case _ =>
          if (c < '!' || c > 'u') err("ascii85_decode: *buffer is out of range")
          tuple += (c - '!').toLong * powers85(count)
          count += 1
          if (count == 5) { widePut(tuple, 4); count = 0; tuple = 0 }
      }
      len -= 1
      i += 1
    }
    // note: the reference drops a trailing partial group (no ~> flush logic)
    out.toString
  }

  /** ascii_hex_decode.cc:45-85 */
  def asciiHexDecode(buf: String, opts: Dict): String = {
    var low = true
    var decodedByte = 0
    val out = new java.lang.StringBuilder(buf.length / 2 + 1)
    var i = 0
    while (i < buf.length) {
      val c = buf.charAt(i)
      if (c == '>') {
        if (!low) out.append(((decodedByte << 4) | 0).toChar)
        return out.toString
      }
      if (c == '\u0000' || c == '\t' || c == '\n' || c == '\f' || c == '\r' || c == ' ') {
        i += 1
      } else {
        val v = Character.digit(c, 16)
        if (v < 0) err(s"ascii_hex_decode: bad hex char")
        if (low) { decodedByte = v; low = false }
        else {
          decodedByte = (decodedByte << 4) | v
          low = true
          out.append(decodedByte.toChar)
          decodedByte = 0
        }
        i += 1
      }
    }
    if (!low) out.append(((decodedByte << 4) | 0).toChar)
    out.toString
  }

  /** common.cc:501-589 — PNG predictors None/Sub/Up/Average + TIFF(2).
    * Byte-level state machine kept identical (incl. signed-char adds). */
  def predictorDecode(data: String, opts: Dict): String = {
    val predictor = getDictVal(opts, "/Predictor", 1L).toInt
    val colors = getDictVal(opts, "/Colors", 1L).toInt
    val bpcs = getDictVal(opts, "/BitsPerComponent", 8L).toInt
    val columns = getDictVal(opts, "/Columns", 1L).toInt
    if (predictor == 1) return data

    var nextByteIsPredictor = predictor >= 10
    var curPredictor = if (predictor >= 10) -1 else predictor
    var curRowIndex = 0
    val bpp = (bpcs * colors) >> 3
    val rows = (columns * colors * bpcs) >> 3
    // poison guard: a row longer than the whole payload can never flush —
    // the reference would allocate the giant row buffer and return ""
    if (rows > data.length || rows < 0) return ""
    val prev = new Array[Byte](rows)
    val out = new java.lang.StringBuilder(data.length)

    var p = 0
    var len = data.length
    while (len > 0) {
      len -= 1
      val b = data.charAt(p).toByte // signed, like C char
      if (nextByteIsPredictor) {
        curPredictor = b + 10
        nextByteIsPredictor = false
      } else {
        curPredictor match {
          case 2 =>
            if (bpcs == 8) {
              val prevLocal = if (curRowIndex - bpp < 0) 0 else prev(curRowIndex - bpp)
              prev(curRowIndex) = (b + prevLocal).toByte
            } else err("predictor_decode: tiff predictor other than 8 BPC is not implemented")
          case 10 => prev(curRowIndex) = b
          case 11 =>
            val localPrev = if (curRowIndex - bpp < 0) 0 else prev(curRowIndex - bpp)
            prev(curRowIndex) = (b + localPrev).toByte
          case 12 => prev(curRowIndex) = (prev(curRowIndex) + b).toByte
          case 13 =>
            val localPrev: Int = if (curRowIndex - bpp < 0) 0 else prev(curRowIndex - bpp)
            prev(curRowIndex) = (((localPrev + prev(curRowIndex)) >> 1) + b).toByte
          case 14 | 15 => err(s"predictor_decode: predictor $curPredictor is invalid")
          case _ =>
        }
        curRowIndex += 1
      }
      p += 1
      if (curRowIndex >= rows) {
        curRowIndex = 0
        nextByteIsPredictor = curPredictor >= 10
        var k = 0
        while (k < rows) { out.append((prev(k) & 0xff).toChar); k += 1 }
      }
    }
    out.toString
  }
}
