package graft.pdf

import java.nio.charset.Charset
import Lex._

/** Base-encoding decoder (reference: charset_converter.cc). */
final class CharsetConverter private (val encode: Int, val charset: Option[Charset], val encoding: String) {

  def isVertical: Boolean = CharsetConverter.verticalFonts.contains(encoding)
  def isEmpty: Boolean = encode == Encodings.NONE

  /** charset_converter.cc:95-123 — whole-string decode + advance width. */
  def getString(s: String, fonts: Fonts): (String, Float) = encode match {
    case Encodings.UTF8 => (s, fonts.getWidth(s))
    case Encodings.IDENTITY =>
      (Encodings.toUtf8ByteString(s, Charset.forName("UTF-16BE")), CharsetConverter.widthIdentity(s, fonts))
    case Encodings.DEFAULT | Encodings.MAC_EXPERT | Encodings.MAC_ROMAN | Encodings.WIN =>
      val table = Encodings.standardEncodingArrays(encode)
      // fast path: every byte maps to itself (ASCII body of the standard
      // encodings) — return the input string, no per-show rebuild
      var id = 0
      while (id < s.length) {
        val v = table(s.charAt(id) & 0xff)
        if (v == null || v.length != 1 || v.charAt(0) != s.charAt(id)) id = s.length + 1
        else id += 1
      }
      if (id == s.length) (s, fonts.getWidth(s))
      else {
        val sb = new java.lang.StringBuilder(s.length)
        var i = 0
        while (i < s.length) {
          val v = table(s.charAt(i) & 0xff)
          if (v != null) sb.append(v)
          i += 1
        }
        (sb.toString, fonts.getWidth(s))
      }
    case Encodings.OTHER => (Encodings.toUtf8ByteString(s, charset.get), fonts.getWidth(s))
    case e => err(s"get_string: wrong encode value: $e")
  }

  /** charset_converter.cc:125-132 — single-byte fallback decode.
    * null = unmapped (Option avoided on the per-byte hot path). */
  def getCharOrNull(c: Char): String = {
    val enc =
      if (encode == Encodings.MAC_EXPERT || encode == Encodings.MAC_ROMAN || encode == Encodings.WIN) encode
      else Encodings.DEFAULT
    Encodings.standardEncodingArrays(enc)(c & 0xff)
  }
}

object CharsetConverter {
  /** empty converter (encode == NONE), charset_converter.cc:27-29 */
  def none(): CharsetConverter = new CharsetConverter(Encodings.NONE, None, "")

  /** charset_converter.cc:31-63 */
  def apply(encoding: String): CharsetConverter = {
    if (encoding.isEmpty) new CharsetConverter(Encodings.DEFAULT, None, encoding)
    else if (encoding == "/WinAnsiEncoding") new CharsetConverter(Encodings.WIN, None, encoding)
    else if (encoding == "/MacRomanEncoding") new CharsetConverter(Encodings.MAC_ROMAN, None, encoding)
    else if (encoding == "/MacExpertEncoding") new CharsetConverter(Encodings.MAC_EXPERT, None, encoding)
    else if (encoding == "/Identity-H" || encoding == "/Identity-V" || !Encodings.cidCharsets.contains(encoding))
      new CharsetConverter(Encodings.IDENTITY, None, encoding)
    else {
      val csName = Encodings.cidCharsets(encoding)
      if (csName.isEmpty) new CharsetConverter(Encodings.UTF8, None, encoding)
      else Encodings.charsetFor(csName) match {
        case Some(cs) => new CharsetConverter(Encodings.OTHER, Some(cs), encoding)
        // JDK lacks the charset: degrade to Identity (reference relies on
        // boost/iconv having it; unknown names degrade the same way,
        // charset_converter.cc:53-57)
        case None => new CharsetConverter(Encodings.IDENTITY, None, encoding)
      }
    }
  }

  /** charset_converter.cc:19-24 */
  private def widthIdentity(s: String, fonts: Fonts): Float = {
    var result = 0f
    var i = 0
    while (i < s.length) {
      result += fonts.getWidth(string2num(s.substring(i, math.min(i + 2, s.length))))
      i += 2
    }
    result
  }

  /** charset_converter.cc:65-93 — CMap names whose text is vertical. */
  val verticalFonts: Set[String] = Set(
    "/Identity-V", "/UniCNS-UCS2-V", "/GBK-EUC_V", "/GBpc-EUC-V",
    "/GBT-V", "/GBT-EUC-V", "/GBTpc-EUC-V", "/GBKp-EUC-V", "/GBK2K-V",
    "/UniGB-UCS2-V", "/UniGB-UTF8-V", "/UniGB-UTF16-V", "/UniGB-UTF32-V",
    "/B5-V", "/B5pc-V", "/ETen-B5-V", "/ETenms-B5-V", "/CNS1-V",
    "/CNS2-V", "/CNS-EUC-V", "/UniCNS-UTF8-V", "/UniCNS-UTF16-V",
    "/UniCNS-UTF32-V", "/ETHK-B5-V", "/HKdla-B5-V", "/HKdlb-B5-V",
    "/HKgccs-B5-V", "/HKm314-B5-V", "/HKm471-B5-V",
    "/HKscs-B5-V", "/V", "/RKSJ-V", "/EUC-V", "/83pv-RKSJ-V", "/Add-V",
    "/Add-RKSJ-V", "/Ext-V", "/Ext-RKSJ-V", "/NWP-V",
    "/90pv-RKSJ-V", "/90ms-RKSJ-V", "/90msp-RKSJ-V",
    "/78-V", "/78-RKSJ-V", "/78ms-RKSJ-V", "/78-EUC-V", "/UniJIS-UCS2-V",
    "/UniJIS-UCS2-HW-V", "/UniJIS-UTF8-V", "/UniJIS-UTF16-V",
    "/UniJIS-UTF32-V", "/UniJIS2004-UTF8-V",
    "/UniJIS2004-UTF16-V", "/UniJIS2004-UTF32-V",
    "/UniJISX0213-UTF32-V", "/UniJISX02132004-UTF32-V",
    "/UniAKR-UTF8-V", "/UniAKR-UTF16-V", "/UniAKR-UTF32-V",
    "/KSC-V", "/KSC-EUC-V",
    "/KSCpv-EUC-V", "/KSCms-EUC-V", "/KSCms-EUC-HW-V",
    "/KSC-Johab-V", "/UniKS-UCS2-V",
    "/UniKS-UTF8-V", "/UniKS-UTF16-V",
    "/UniKS-UTF32-V", "/Hojo-V", "/Hojo-EUC-V",
    "/UniHojo-UCS2-V", "/UniHojo-UTF8-V", "/UniHojo-UTF16-V",
    "/UniHojo-UTF32-V")
}

/** /Differences override decoder (reference: diff_converter.cc). */
final class DiffConverter private (differenceMap: Map[Int, String], val isEmpty: Boolean) {

  // flat 0..255 view for the per-byte hot path; null = unmapped
  private val flat: Array[String] = {
    val a = new Array[String](256)
    differenceMap.foreach { case (k, v) => if (k >= 0 && k < 256) a(k) = v }
    a
  }

  /** diff_converter.cc:78-93 — only mapped, non-empty glyphs contribute. */
  def getString(s: String, fonts: Fonts): (String, Float) = {
    val sb = new java.lang.StringBuilder(s.length)
    var width = 0f
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i) & 0xff
      val v = flat(c)
      if (v != null && v.nonEmpty) {
        sb.append(v)
        width += fonts.getWidth(c)
      }
      i += 1
    }
    (sb.toString, width)
  }

  /** diff_converter.cc:95-100 — null = unmapped. */
  def getCharOrNull(c: Char): String = flat(c & 0xff)
}

object DiffConverter {
  def none(): DiffConverter = new DiffConverter(Map.empty, isEmpty = true)

  /** diff_converter.cc:37-76 */
  def getConverter(dictionary: Dict, differences: Obj, storage: ObjectStorage): DiffConverter = {
    val encoding = dictionary.get("/BaseEncoding") match {
      case None => Encodings.DEFAULT
      case Some(o) => o.raw match {
        case "/StandardEncoding" => Encodings.DEFAULT
        case "/MacRomanEncoding" => Encodings.MAC_ROMAN
        case "/MacExpertEncoding" => Encodings.MAC_EXPERT
        case "/WinAnsiEncoding" => Encodings.WIN
        case v => err(s"get_encoding: wrong /BaseEncoding value:$v")
      }
    }
    val arrayData = Storage.getArrayOrIndirectArray(differences, storage)
    val code2symbol = scala.collection.mutable.HashMap.empty[Int, String]
    Encodings.standardEncodings(encoding).foreach { case (k, v) => code2symbol.update(k, v) }
    val startIdx = arrayData.indexWhere(_.kind == Kind.VALUE)
    if (startIdx < 0) return new DiffConverter(code2symbol.toMap, isEmpty = false)
    var code = strictStoul(arrayData(startIdx).raw).toInt
    var i = startIdx
    while (i < arrayData.size) {
      val sym = if (arrayData(i).kind == Kind.INDIRECT_OBJECT)
        Storage.getIndirectObjectData(arrayData(i).raw, storage) else arrayData(i)
      sym.kind match {
        case Kind.VALUE => code = strictStoul(sym.raw).toInt
        case Kind.NAME_OBJECT =>
          Encodings.glyphList.get(sym.raw).foreach(u => code2symbol.update(code, u))
          code += 1
        case k => err(s"get_converter: wrong symbol type=$k val=${sym.raw}")
      }
      i += 1
    }
    new DiffConverter(code2symbol.toMap, isEmpty = false)
  }
}

/** ToUnicode / embedded-cmap decoder (reference: to_unicode_converter.cc). */
final class ToUnicodeConverter private (customEncoding: Option[CMap], val isEmpty: Boolean) {

  def isVertical: Boolean = !isEmpty && customEncoding.get.isVertical

  /** to_unicode_converter.cc:37-55 — multibyte longest-registered match with
    * lazy UTF-16BE→UTF-8 memoization. */
  def customDecodeSymbol(s: String, pos: Pos, fonts: Fonts): (String, Float) = {
    val cmap = customEncoding.get
    val sizes = cmap.sizes
    var k = 0
    while (k < sizes.length) {
      val n = sizes(k)
      val left = s.length - pos.i
      if (left < n) return ("", 0f)
      val symbol = s.substring(pos.i, pos.i + n)
      cmap.utfMap.get(symbol) match {
        case Some(entry) =>
          if (!entry.converted) {
            entry.value = Encodings.toUtf8ByteString(entry.value, Charset.forName("UTF-16BE"))
            entry.converted = true
          }
          pos.i += n
          return (entry.value, fonts.getWidth(string2num(symbol)))
        case None =>
      }
      k += 1
    }
    ("", 0f)
  }
}

object ToUnicodeConverter {
  def none(): ToUnicodeConverter = new ToUnicodeConverter(None, isEmpty = true)
  def apply(cmap: CMap): ToUnicodeConverter = new ToUnicodeConverter(Some(cmap), isEmpty = false)
}

/** 3-way decode dispatch per text string (reference: converter_engine.cc). */
final class ConverterEngine(
    val charsetConverter: CharsetConverter,
    val diffConverter: DiffConverter,
    val toUnicodeConverter: ToUnicodeConverter) {

  /** converter_engine.cc:23-28 */
  def isVertical: Boolean = {
    if (charsetConverter.isVertical) true
    else if (toUnicodeConverter.isEmpty) false
    else toUnicodeConverter.isVertical
  }

  /** converter_engine.cc:30-65 */
  def getString(s: String, coordinates: Coordinates, tj: Float, fonts: Fonts): TextChunk = {
    if (toUnicodeConverter.isEmpty) {
      val (text, width) =
        if (diffConverter.isEmpty) charsetConverter.getString(s, fonts)
        else diffConverter.getString(s, fonts)
      // identity fast path returned the input itself -> all-ASCII, so
      // utf8Length(text) == s.length and the rescan can be skipped
      val hint = if (text eq s) s.length else -1
      return coordinates.adjustCoordinates(text, s.length, width, tj, fonts, hint)
    }
    val decoded = new java.lang.StringBuilder(s.length)
    var decodedWidth = 0f
    var len = 0
    var exactUtf8 = 0 // utf8Length(decoded), accumulated per symbol
    val pos = new Pos(0)
    while (pos.i < s.length) {
      val (sym, w) = toUnicodeConverter.customDecodeSymbol(s, pos, fonts)
      if (sym.isEmpty) {
        // an empty-valued cmap hit leaves pos advanced; the reference then
        // reads s[i] which may be one past the end (C++ returns '\0' there)
        val c = if (pos.i < s.length) s.charAt(pos.i) else '\u0000'
        val r = if (diffConverter.isEmpty) charsetConverter.getCharOrNull(c) else diffConverter.getCharOrNull(c)
        if (r != null) {
          decoded.append(r)
          decodedWidth += fonts.getWidth(c & 0xff)
          len += 1
          exactUtf8 += utf8Length(r)
        }
        pos.i += 1
      } else {
        decodedWidth += w
        val ul = utf8Length(sym)
        len += ul
        exactUtf8 += ul
        decoded.append(sym)
      }
    }
    coordinates.adjustCoordinates(decoded.toString, len, decodedWidth, tj, fonts, exactUtf8)
  }

  /** converter_engine.cc:67-94 — TJ array with kern numbers. */
  def getStringsFromArray(array: String, coordinates: Coordinates, fonts: Fonts): scala.collection.mutable.ArrayBuffer[TextChunk] = {
    val result = scala.collection.mutable.ArrayBuffer.empty[TextChunk]
    var tj = 0f
    getArrayData(array, 0).foreach { p =>
      p.kind match {
        case Kind.VALUE => tj = stof(p.raw)
        case Kind.STRING =>
          val chunk = getString(decodeString(p.raw), coordinates, tj, fonts)
          if (!chunk.isEmpty) result += chunk
          tj = 0f
        case k => err(s"get_strings_from_array: wrong type $k val=${p.raw}")
      }
    }
    result
  }
}
