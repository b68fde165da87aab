package graft.pdf

import scala.collection.mutable

/** Malformed-PDF failure (reference: `pdf_error`, common.h:22-32). */
final class PdfError(msg: String) extends RuntimeException(msg)

/** PDF object kinds (reference: `pdf_object_t`, common.h:16). */
object Kind {
  final val DICTIONARY = 1
  final val ARRAY = 2
  final val STRING = 3
  final val VALUE = 4
  final val INDIRECT_OBJECT = 5
  final val NAME_OBJECT = 6
}

/** A lazily re-parsed PDF object: raw byte-string + kind tag
  * (reference keeps `pair<string, pdf_object_t>`, common.h:34-35). */
final case class Obj(raw: String, kind: Int)

/** Mutable scan cursor standing in for C++ `size_t&` out-params. */
final class Pos(var i: Int)

/** Byte-string PDF object lexer. All `String`s here are byte-strings:
  * one char == one byte (0..255), decoded only at span output. Mirrors the
  * semantics of the reference lexer (common.cc) without copying its shape.
  */
object Lex {
  final val NPOS: Int = Int.MaxValue

  /** dict_t: string-keyed sorted map, first-wins on duplicate keys
    * (std::map + emplace semantics, common.h:34). */
  type Dict = mutable.TreeMap[String, Obj]
  type Arr = mutable.ArrayBuffer[Obj]

  def newDict(): Dict = mutable.TreeMap.empty[String, Obj]
  def emplace(d: Dict, k: String, v: Obj): Unit = if (!d.contains(k)) d.update(k, v)

  def err(msg: String): Nothing = throw new PdfError(msg)

  @inline def isBlank(c: Char): Boolean = c == '\r' || c == '\n' || c == ' ' || c == '\t'
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  // ---- find helpers (C++ find/find_first_of/_not_of with e-variants) ----
  // The handful of charset constants are memoized as 256-entry membership
  // tables: the scan inner loop becomes one load instead of an indexOf over
  // the set per byte (byte-strings only ever hold chars 0..255).
  private val classCache = new java.util.concurrent.ConcurrentHashMap[String, Array[Boolean]]()
  private def mkClass(set: String): Array[Boolean] = {
    val t = new Array[Boolean](256)
    var i = 0
    while (i < set.length) { t(set.charAt(i) & 0xff) = true; i += 1 }
    t
  }
  private def charClass(set: String): Array[Boolean] = {
    var t = classCache.get(set)
    if (t == null) { t = mkClass(set); classCache.put(set, t) }
    t
  }

  // precomputed tables for the two hottest scans (no map probe per call)
  private[pdf] val CLS_TOKEN_END: Array[Boolean] = mkClass(" \r\n\t/[(<")
  private[pdf] val CLS_SPACES: Array[Boolean] = mkClass("\r\n \t")

  def findFirstOf(s: String, t: Array[Boolean], from: Int): Int = {
    if (from == NPOS) return NPOS
    var i = math.max(from, 0)
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 256 && t(c)) return i
      i += 1
    }
    NPOS
  }
  def findFirstNotOf(s: String, t: Array[Boolean], from: Int): Int = {
    if (from == NPOS) return NPOS
    var i = math.max(from, 0)
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 256 || !t(c)) return i
      i += 1
    }
    NPOS
  }

  def findFirstOf(s: String, set: String, from: Int): Int =
    findFirstOf(s, charClass(set), from)
  def findFirstNotOf(s: String, set: String, from: Int): Int =
    findFirstNotOf(s, charClass(set), from)
  def find(s: String, sub: String, from: Int): Int = {
    if (from == NPOS || from > s.length) return NPOS
    val r = s.indexOf(sub, from); if (r < 0) NPOS else r
  }
  def find(s: String, c: Char, from: Int): Int = {
    if (from == NPOS || from > s.length) return NPOS
    val r = s.indexOf(c, from); if (r < 0) NPOS else r
  }
  def rfind(s: String, sub: String): Int = { val r = s.lastIndexOf(sub); if (r < 0) NPOS else r }

  def efindFirst(s: String, set: String, from: Int): Int = {
    val r = findFirstOf(s, set, from)
    if (r == NPOS) err(s"efind_first: for $set in pos $from failed")
    r
  }
  def efindFirstNot(s: String, set: String, from: Int): Int = {
    val r = findFirstNotOf(s, set, from)
    if (r == NPOS) err(s"efind_first_not: for $set in pos $from failed")
    r
  }
  def efind(s: String, sub: String, from: Int): Int = {
    val r = find(s, sub, from)
    if (r == NPOS) err(s"efind: for $sub in pos $from failed")
    r
  }
  def efind(s: String, c: Char, from: Int): Int = {
    val r = find(s, c, from)
    if (r == NPOS) err(s"efind: for $c in pos $from failed")
    r
  }

  /** common.cc:272-277 */
  def skipSpaces(s: String, off: Int, validate: Boolean = true): Int = {
    val r = findFirstNotOf(s, CLS_SPACES, off)
    if (validate && r == NPOS) err("skip_spaces: no data after space")
    r
  }

  /** common.cc:287-300 — whitespace + '%' comments. */
  def skipComments(s: String, off0: Int, validate: Boolean = true): Int = {
    var off = off0
    while (true) {
      off = skipSpaces(s, off, validate)
      if (off == NPOS || s.charAt(off) != '%') return off
      off = findFirstOf(s, "\r\n", off)
      if (off == NPOS) {
        if (validate) err("skip_comments: no data after comments")
        return off
      }
    }
    off
  }

  /** common.cc:279-285 — content-stream token. */
  def getToken(s: String, pos: Pos): String = {
    val start = pos.i
    var i = findFirstOf(s, CLS_TOKEN_END, pos.i + 1)
    if (i == NPOS) i = s.length
    pos.i = i
    s.substring(start, i)
  }

  /** common.cc:591-609 */
  def strictStoul(str: String, base: Int = 10): Long = {
    if (str.isEmpty) err("strict_stoul: string is empty")
    if (str.indexOf('-') >= 0) err(s"strict_stoul: $str is not unsigned number")
    parseLongPrefixFull(str, base, s"strict_stoul: $str is not unsigned number")
  }

  /** common.cc:611-628 */
  def strictStol(str: String, base: Int = 10): Long = {
    if (str.isEmpty) err("strict_stol: string is empty")
    parseLongPrefixFull(str, base, s"strict_stol: $str is not number")
  }

  // stoul/stol parse an optional sign + digits and require full consumption
  // (pos == size) like the reference's strict_* wrappers.
  private def parseLongPrefixFull(str: String, base: Int, msg: String): Long = {
    var i = 0
    while (i < str.length && isCppSpace(str.charAt(i))) i += 1
    var neg = false
    if (i < str.length && (str.charAt(i) == '+' || str.charAt(i) == '-')) {
      neg = str.charAt(i) == '-'; i += 1
    }
    var v = 0L
    var any = false
    while (i < str.length) {
      val d = Character.digit(str.charAt(i), base)
      if (d < 0) err(msg)
      v = v * base + d
      any = true
      i += 1
    }
    if (!any) err(msg)
    if (neg) -v else v
  }

  /** C's stof: parse leading float, ignore trailing junk; throws if none.
    * Integer fast path (<=7 digits => exact float, no FloatingDecimal
    * allocation — PDF operands are overwhelmingly small integers);
    * fractions/exponents keep the correctly-rounded parseFloat. */
  def stof(str: String): Float = stofSlice(str, 0, str.length)

  /** stof over a slice [from, to) — no substring on the integer path. */
  def stofSlice(str: String, from: Int, to: Int): Float = {
    var i = from
    while (i < to && isBlank(str.charAt(i))) i += 1
    var j = i
    var neg = false
    if (j < to && (str.charAt(j) == '+' || str.charAt(j) == '-')) {
      neg = str.charAt(j) == '-'; j += 1
    }
    val digStart = j
    var seen = false
    var intVal = 0
    while (j < to && isDigit(str.charAt(j))) {
      intVal = intVal * 10 + (str.charAt(j) - '0'); j += 1; seen = true
    }
    val intDigits = j - digStart
    var isInt = true
    if (j < to && str.charAt(j) == '.') {
      isInt = false
      j += 1
      while (j < to && isDigit(str.charAt(j))) { j += 1; seen = true }
    }
    if (seen && j < to && (str.charAt(j) == 'e' || str.charAt(j) == 'E')) {
      var k = j + 1
      if (k < to && (str.charAt(k) == '+' || str.charAt(k) == '-')) k += 1
      var eseen = false
      while (k < to && isDigit(str.charAt(k))) { k += 1; eseen = true }
      if (eseen) { j = k; isInt = false }
    }
    if (!seen) err(s"stof: invalid float '${str.substring(from, to)}'")
    if (isInt && intDigits <= 7) { if (neg) -intVal.toFloat else intVal.toFloat }
    else java.lang.Float.parseFloat(str.substring(i, j))
  }

  // ---- object classification & extraction (common.cc:165-187, 302-499) ----

  private def isIndirectNumber(s: String, pos: Pos): Boolean = {
    if (pos.i >= s.length || !isDigit(s.charAt(pos.i))) return false
    pos.i = findFirstNotOf(s, "0123456789", pos.i)
    if (pos.i == NPOS) return false
    if (!isCppSpace(s.charAt(pos.i))) return false
    pos.i = findFirstNotOf(s, "\n\t\r ", pos.i)
    pos.i != NPOS
  }

  @inline private def isCppSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\u000B' || c == '\f'

  private def isIndirectObject(s: String, offset: Int): Boolean = {
    val p = new Pos(offset)
    var i = 0
    while (i < 2) {
      if (!isIndirectNumber(s, p)) return false
      i += 1
    }
    p.i < s.length && s.charAt(p.i) == 'R'
  }

  /** common.cc:302-320 */
  def getObjectType(s: String, pos: Pos): Int = {
    pos.i = skipComments(s, pos.i)
    if (pos.i + 1 == s.length) err("get_object_type: not enough data")
    s.charAt(pos.i) match {
      case '[' => Kind.ARRAY
      case '(' => Kind.STRING
      case '<' => if (s.charAt(pos.i + 1) == '<') Kind.DICTIONARY else Kind.STRING
      case '/' => Kind.NAME_OBJECT
      case _ => if (isIndirectObject(s, pos.i)) Kind.INDIRECT_OBJECT else Kind.VALUE
    }
  }

  /** common.cc:322-358 — balanced `<< >>`, string-aware. Scan-only form:
    * advances pos past the dictionary without materializing it. */
  def scanDictionary(s: String, pos: Pos): Unit = {
    var prevs = 0
    var end = pos.i + 2
    while (end < s.length) {
      val c = s.charAt(end)
      val cNext = if (end + 1 < s.length) s.charAt(end + 1) else { err("get_dictionary: can`t find dictionary end delimiter") }
      if (c == '<' && cNext == '<') { prevs += 1; end += 2 }
      else if (c == '(' || c == '<') {
        val p = new Pos(end); scanString(s, p); end = p.i
      }
      else if (c == '>' && cNext == '>') {
        if (prevs == 0) {
          pos.i = end + 2
          return
        }
        prevs -= 1; end += 2
      }
      else end += 1
    }
    err("get_dictionary: can`t find dictionary end delimiter")
  }

  def getDictionary(s: String, pos: Pos): String = {
    val start = pos.i
    scanDictionary(s, pos)
    s.substring(start, pos.i)
  }

  /** common.cc:360-366 */
  def getNameObject(s: String, pos: Pos): String = {
    val start = pos.i
    var r = findFirstOf(s, "\r\t\n /](<>", pos.i + 1)
    if (r == NPOS) r = s.length
    pos.i = r
    s.substring(start, r)
  }

  /** common.cc:368-374 */
  def getValue(s: String, pos: Pos): String = {
    val start = pos.i
    var r = findFirstOf(s, "\r\t\n /][(<>", pos.i + 1)
    if (r == NPOS) r = s.length
    pos.i = r
    s.substring(start, r)
  }

  /** common.cc:376-382 */
  def getIndirectObject(s: String, pos: Pos): String = {
    val start = pos.i
    pos.i = efind(s, 'R', pos.i) + 1
    s.substring(start, pos.i)
  }

  /** common.cc:384-419 — scan past a raw `(..)` / `<..>` string. */
  def scanString(s: String, pos: Pos): Unit = {
    val delim = s.charAt(pos.i)
    if (delim != '(' && delim != '<') err("get_string: string must start with '(' or '<'")
    val endDelim = if (delim == '(') ')' else '>'
    var prevs = 0
    var escaped = false
    pos.i += 1
    while (true) {
      if (pos.i >= s.length) err("get_string: out of range")
      val c = s.charAt(pos.i)
      if (c == '\\') { escaped = !escaped; pos.i += 1 }
      else if (escaped) { escaped = false; pos.i += 1 }
      else if (c == delim) { prevs += 1; pos.i += 1 }
      else if (c == endDelim) {
        if (prevs == 0) { pos.i += 1; return }
        prevs -= 1; pos.i += 1
      }
      else pos.i += 1
    }
    err("unreachable")
  }

  /** raw `(..)` / `<..>` string incl. delimiters. */
  def getString(s: String, pos: Pos): String = {
    val init = pos.i
    scanString(s, pos)
    s.substring(init, pos.i)
  }

  /** common.cc:427-464 — scan past a raw `[..]`, string/dict-aware.
    * (The extracted array is always a contiguous slice of the input: the
    * reference's char-by-char rebuild appends every consumed byte.) */
  def scanArray(s: String, pos: Pos): Unit = {
    pos.i += 1
    var prevs = 0
    while (true) {
      if (pos.i >= s.length) err(s"get_array: no array in ${pos.i}")
      s.charAt(pos.i) match {
        case '(' =>
          scanString(s, pos)
        case '<' =>
          if (pos.i + 1 >= s.length) err("get_array: out of range")
          if (s.charAt(pos.i + 1) == '<') scanDictionary(s, pos)
          else scanString(s, pos)
        case '[' =>
          prevs += 1; pos.i += 1
        case ']' =>
          if (prevs == 0) { pos.i += 1; return }
          prevs -= 1; pos.i += 1
        case _ =>
          pos.i += 1
      }
    }
    err("unreachable")
  }

  /** raw `[..]` incl. delimiters. */
  def getArray(s: String, pos: Pos): String = {
    val start = pos.i
    scanArray(s, pos)
    s.substring(start, pos.i)
  }

  /** TYPE2FUNC dispatch (common.cc:196-201). */
  def extract(kind: Int, s: String, pos: Pos): String = kind match {
    case Kind.DICTIONARY => getDictionary(s, pos)
    case Kind.ARRAY => getArray(s, pos)
    case Kind.STRING => getString(s, pos)
    case Kind.VALUE => getValue(s, pos)
    case Kind.INDIRECT_OBJECT => getIndirectObject(s, pos)
    case Kind.NAME_OBJECT => getNameObject(s, pos)
    case _ => err(s"extract: unknown kind $kind")
  }

  /** common.cc:466-483 */
  def getDictionaryData(s: String, offset0: Int): Dict = {
    var offset = efind(s, "<<", offset0) + 2
    val result = newDict()
    while (true) {
      offset = skipComments(s, offset)
      if (s.charAt(offset) == '>' && offset + 1 < s.length && s.charAt(offset + 1) == '>') return result
      if (s.charAt(offset) != '/') err("get_dictionary_data: Can`t find name key")
      val end = efindFirst(s, "\r\t\n /<[(", offset + 1)
      val key = s.substring(offset, end)
      val pos = new Pos(end)
      val kind = getObjectType(s, pos)
      val v = extract(kind, s, pos)
      emplace(result, key, Obj(v, kind))
      offset = pos.i
    }
    result
  }

  /** common.cc:485-499 */
  def getArrayData(s: String, offset0: Int): Arr = {
    var offset = efind(s, '[', offset0) + 1
    val result = new Arr
    while (true) {
      offset = skipComments(s, offset)
      if (s.charAt(offset) == ']') return result
      val pos = new Pos(offset)
      val kind = getObjectType(s, pos)
      val v = extract(kind, s, pos)
      result += Obj(v, kind)
      offset = pos.i
    }
    result
  }

  // ---- literal/hex string decode (common.cc:28-103, 421-424) ----

  private def getOctalChar(str: String, pos: Pos): Char = {
    var j = pos.i
    while (j < str.length && isDigit(str.charAt(j))) j += 1
    var len = j - pos.i
    if (len > 3) len = if (str.charAt(pos.i) == 0) 4 else 3
    val v = strictStoul(str.substring(pos.i, pos.i + len), 8)
    if (v > 255) err(s"get_octal_char: octal number $v is larger than 8 bit")
    pos.i += len - 1
    v.toChar
  }

  private def getUnescapedChar(str: String, pos: Pos): Char = {
    if (pos.i == str.length - 2) return '\u0000'
    pos.i += 1
    str.charAt(pos.i) match {
      case 'n' => '\n'
      case 'r' => '\r'
      case 't' => '\t'
      case 'b' => '\b'
      case 'f' => '\f'
      case c @ (')' | '(' | '\\') => c
      case c => if (isDigit(c)) getOctalChar(str, pos) else c
    }
  }

  private def unescapeString(str: String): String = {
    // fast path: no escapes (the overwhelmingly common case) -> one slice
    if (str.indexOf('\\') < 0) {
      if (str.length <= 2) return ""
      return str.substring(1, str.length - 1)
    }
    val sb = new java.lang.StringBuilder(str.length)
    val pos = new Pos(1)
    while (pos.i < str.length - 1) {
      if (str.charAt(pos.i) == '\\') sb.append(getUnescapedChar(str, pos))
      else sb.append(str.charAt(pos.i))
      pos.i += 1
    }
    sb.toString
  }

  private def hexDecodeString(arg: String): String = {
    val hex = new java.lang.StringBuilder(arg.length)
    var i = 1
    while (i < arg.length - 1) {
      val c = arg.charAt(i)
      if (c != '\n' && c != '\r' && c != ' ') hex.append(c)
      i += 1
    }
    val sb = new java.lang.StringBuilder(hex.length / 2 + 1)
    i = 0
    while (i < hex.length) {
      val end = math.min(i + 2, hex.length)
      sb.append(strictStoul(hex.substring(i, end), 16).toChar)
      i += 2
    }
    sb.toString
  }

  /** common.cc:421-424 */
  def decodeString(str: String): String =
    if (str.nonEmpty && str.charAt(0) == '<') hexDecodeString(str) else unescapeString(str)

  /** decodeString over a slice: the escape-free literal fast path decodes
    * straight from the buffer (one slice, no intermediate raw substring);
    * hex/escaped strings fall back through the full decoder. */
  def decodeStringSlice(s: String, from: Int, to: Int): String = {
    if (to - from >= 2 && s.charAt(from) == '(') {
      val bs = s.indexOf('\\', from)
      if (bs < 0 || bs >= to - 1) return s.substring(from + 1, to - 1)
    }
    decodeString(s.substring(from, to))
  }

  // ---- numbers / ids (common.cc:630-719, 793-823) ----

  def findNumber(s: String, off0: Int): Int = {
    var off = off0
    while (off < s.length && !isDigit(s.charAt(off))) off += 1
    off
  }

  def efindNumber(s: String, off: Int): Int = {
    val r = findNumber(s, off)
    if (r >= s.length) err("efind_number: can`t find number")
    r
  }

  /** common.cc:630-644 — parse `id gen R` reference lists. */
  def getSet(array: String): mutable.ArrayBuffer[(Long, Long)] = {
    val result = mutable.ArrayBuffer.empty[(Long, Long)]
    var offset = findNumber(array, 0)
    while (offset < array.length) {
      var end = efindFirst(array, "  \r\n\t", offset)
      val id = strictStoul(array.substring(offset, end))
      offset = efindNumber(array, end)
      end = efindFirst(array, "  \r\n\t", offset)
      val gen = strictStoul(array.substring(offset, end))
      result += ((id, gen))
      offset = efind(array, 'R', end)
      offset = findNumber(array, offset)
    }
    result
  }

  /** common.cc:710-719 */
  def getIdGen(data: String): (Long, Long) = {
    var offset = 0
    var end = efindFirst(data, "\r\t\n ", offset)
    val id = strictStoul(data.substring(offset, end))
    offset = efindNumber(data, end)
    end = efindFirst(data, "\r\t\n ", offset)
    val gen = strictStoul(data.substring(offset, end))
    (id, gen)
  }

  /** common.cc:749-755 — count UTF-8 lead bytes. */
  def utf8Length(s: String): Int = {
    var len = 0
    var i = 0
    while (i < s.length) {
      if ((s.charAt(i) & 0xc0) != 0x80) len += 1
      i += 1
    }
    len
  }

  /** common.cc:793-799 — big-endian byte-string → uint. */
  def string2num(s: String): Int = {
    if (s.isEmpty) err("string2num: string is empty")
    var result = 0
    var i = 0
    while (i < s.length) {
      result = (result << 8) | (s.charAt(i) & 0xff)
      i += 1
    }
    result
  }

  /** common.cc:812-823 — uint → UTF-16BE-ish byte-string (min 2 bytes). */
  def num2string(n0: Int): String = {
    if (n0 == 0) return "\u0000\u0000"
    var n = n0
    var result = ""
    while (n != 0) {
      result = (n & 0xff).toChar.toString + result
      n >>>= 8
    }
    if (result.length == 1) result = "\u0000" + result
    result
  }

  // ---- dict/array convenience (common.cc:105-122, 721-791) ----

  def getDictVal(dict: Dict, key: String, default: Long): Long =
    dict.get(key).map(o => strictStoul(o.raw)).getOrElse(default)

  def getDictValF(dict: Dict, key: String, default: Float): Float =
    dict.get(key).map(o => stof(o.raw)).getOrElse(default)

  /** 2x3 affine multiply (common.cc:757-765); float math for parity. */
  def matMul(m1: Array[Float], m2: Array[Float]): Array[Float] = Array(
    m2(0) * m1(0) + m2(2) * m1(1),
    m2(1) * m1(0) + m2(3) * m1(1),
    m2(0) * m1(2) + m2(2) * m1(3),
    m2(1) * m1(2) + m2(3) * m1(3),
    m2(0) * m1(4) + m2(2) * m1(5) + m2(4),
    m2(1) * m1(4) + m2(3) * m1(5) + m2(5))

  // shared: every consumer (Coordinates tm/ctm, XObject matrices) only
  // REASSIGNS matrices, never mutates them in place
  val identityMatrix: Array[Float] = Array(1f, 0f, 0f, 1f, 0f, 0f)

  /** common.cc:732-735 */
  def applyMatrixNorm(m: Array[Float], x: Float, y: Float): (Float, Float) =
    (m(0) * x + m(2) * y, m(1) * x + m(3) * y)

  /** coordinates.cc:62-65 */
  def applyMatrixPt(m: Array[Float], x: Float, y: Float): (Float, Float) =
    (m(0) * x + m(2) * y + m(4), m(1) * x + m(3) * y + m(5))

  // ---- byte-string <-> bytes ----
  // ISO-8859-1 maps bytes 0..255 to chars 0..255 1:1, and on JDK 9+ both
  // directions hit the compact-string fast path (single arraycopy — the
  // byte-string String is ALREADY a latin-1 byte[] internally, so the
  // kernel stores 1 byte per input byte, not 2).
  def fromBytes(b: Array[Byte]): String =
    new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)

  def toBytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Final conversion of a kernel byte-string (UTF-8 bytes) to a JVM String. */
  def toUtf8(s: String): String = new String(toBytes(s), java.nio.charset.StandardCharsets.UTF_8)
}

/** Content-interpreter operand stack: (kind, slice) entries over the page
  * content buffer. Every extract function returns a CONTIGUOUS slice of
  * its input, so operands live as (start, end) index pairs and only
  * materialize a substring when a consumer needs the payload (shows,
  * names); numeric operands parse in place via stofSlice. */
final class OpStack(val buffer: String) {
  private var kinds = new Array[Int](64)
  private var starts = new Array[Int](64)
  private var ends = new Array[Int](64)
  private var n = 0

  def size: Int = n
  def isEmpty: Boolean = n == 0

  def push(kind: Int, start: Int, end: Int): Unit = {
    if (n == kinds.length) {
      kinds = java.util.Arrays.copyOf(kinds, n * 2)
      starts = java.util.Arrays.copyOf(starts, n * 2)
      ends = java.util.Arrays.copyOf(ends, n * 2)
    }
    kinds(n) = kind
    starts(n) = start
    ends(n) = end
    n += 1
  }

  @inline private def checkNonEmpty(): Unit = if (n == 0) Lex.err("pop: stack is empty")

  /** pop as (kind, raw substring) — payload consumers. */
  def popStr(): (Int, String) = {
    checkNonEmpty()
    n -= 1
    (kinds(n), buffer.substring(starts(n), ends(n)))
  }

  /** pop parsed as float, no substring on the integer path. */
  def popF(): Float = {
    checkNonEmpty()
    n -= 1
    Lex.stofSlice(buffer, starts(n), ends(n))
  }

  /** pop a string operand decoded in place (escape-free fast path). */
  def popDecoded(): String = {
    checkNonEmpty()
    n -= 1
    Lex.decodeStringSlice(buffer, starts(n), ends(n))
  }
}
