package graft.pdf

import Lex._

/** Embedded TrueType `cmap` table → glyph-id → Unicode map
  * (reference: font_file2.cc:21-210; subtable formats 0/2/4/6/12).
  * Faithful to the reference, including its quirks (e.g. format 0 keys are
  * 1-byte while the registered code size is 2; format 12 values are raw
  * big-endian code-point bytes, not UTF-8). */
object FontFile2 {

  private def getU16(s: String, off: Int): Int = {
    if (off + 2 > s.length) err("get_integer: wrong offset")
    ((s.charAt(off) & 0xff) << 8) | (s.charAt(off + 1) & 0xff)
  }

  private def getS16(s: String, off: Int): Int = getU16(s, off).toShort.toInt

  private def getU32(s: String, off: Int): Long = {
    if (off + 4 > s.length) err("get_integer: wrong offset")
    ((s.charAt(off) & 0xffL) << 24) | ((s.charAt(off + 1) & 0xffL) << 16) |
      ((s.charAt(off + 2) & 0xffL) << 8) | (s.charAt(off + 3) & 0xffL)
  }

  private def getU16Array(s: String, pos: Pos, num: Int): Array[Int] = {
    val out = new Array[Int](num)
    var i = 0
    while (i < num) { out(i) = getU16(s, pos.i); pos.i += 2; i += 1 }
    out
  }

  /** font_file2.cc:68-84 — raw nonzero big-endian bytes of the code point. */
  private def getUtf8(c: Long): String = {
    val sb = new java.lang.StringBuilder(4)
    var write = false
    var i = 3
    while (i >= 0) {
      val b = ((c >> (8 * i)) & 0xff).toInt
      if (b != 0) write = true
      if (write) sb.append(b.toChar)
      i -= 1
    }
    sb.toString
  }

  def getFontFile2(doc: String, storage: ObjectStorage, idGen: (Long, Long), decryptData: Dict): CMap = {
    val stream = Storage.getStream(doc, idGen, storage, decryptData)
    val tablesNum = getU16(stream, 4)
    var i = 0
    var found = -1
    while (found < 0 && i < tablesNum) {
      if (stream.length >= i * 16 + 12 + 4 &&
          stream.substring(i * 16 + 12, i * 16 + 12 + 4) == "cmap") found = i
      else i += 1
    }
    if (found < 0) return new CMap
    val tableOffset = getU32(stream, found * 16 + 20).toInt
    var offset = tableOffset + 2
    val subtablesNum = getU16(stream, offset)
    val mappingOffsets = new Array[Int](subtablesNum)
    offset += 2 * 3
    var k = 0
    while (k < subtablesNum) {
      mappingOffsets(k) = tableOffset + getU32(stream, offset).toInt
      offset += 2 * 2 + 4
      k += 1
    }
    val result = new CMap
    mappingOffsets.foreach { off =>
      getU16(stream, off) match {
        case 0 => format0(result, stream, off)
        case 2 => format2(result, stream, off)
        case 4 => format4(result, stream, off)
        case 6 => format6(result, stream, off)
        case 12 => format12(result, stream, off)
        case _ =>
      }
    }
    result
  }

  /** font_file2.cc:141-151 */
  private def format0(cmap: CMap, stream: String, off0: Int): Unit = {
    cmap.sizes(0) = 2
    val off = off0 + 6
    var i = 0
    while (i < 256) {
      val key = stream.charAt(off + i).toString
      if (!cmap.utfMap.contains(key)) cmap.utfMap.update(key, new CMap.Entry(false, num2string(i & 0xff)))
      i += 1
    }
  }

  /** font_file2.cc:153-194 — incl. the reference's nested re-scan quirk. */
  private def format2(cmap: CMap, stream: String, off0: Int): Unit = {
    val pos = new Pos(off0 + 6)
    val subheaderKeys = getU16Array(stream, pos, 256)
    if (subheaderKeys.isEmpty) return
    val firstBytes = new Array[Int](65535 / 8)
    var i = 0
    while (i < subheaderKeys.length) { firstBytes(subheaderKeys(i) / 8) = i; i += 1 }
    val ndhrs = subheaderKeys.max / 8 + 1
    final case class Sub(firstCode: Int, entryCount: Int, idDelta: Int, idRangeOffset: Int)
    val hdrs = new scala.collection.mutable.ArrayBuffer[Sub](ndhrs)
    var h = 0
    while (h < ndhrs) {
      val firstCode = getU16(stream, pos.i); pos.i += 2
      val entryCount = getU16(stream, pos.i); pos.i += 2
      val idDelta = getS16(stream, pos.i); pos.i += 2
      val idRangeOffset = getU16(stream, pos.i); pos.i += 2
      hdrs += Sub(firstCode, entryCount, idDelta, pos.i - 2 + idRangeOffset)
      var x = 0
      while (x < hdrs.size) {
        if (hdrs(x).entryCount != 0) {
          val first = hdrs(x).firstCode + (firstBytes(x) << 8)
          var j = 0
          while (j < hdrs(x).entryCount) {
            var gid = getU16(stream, hdrs(x).idRangeOffset)
            if (gid != 0) gid += hdrs(x).idDelta
            val key = num2string(gid & 0xffff)
            if (!cmap.utfMap.contains(key)) cmap.utfMap.update(key, new CMap.Entry(true, getUtf8(first + j)))
            j += 1
          }
        }
        x += 1
      }
      h += 1
    }
  }

  /** font_file2.cc:106-139 */
  private def format4(cmap: CMap, stream: String, off0: Int): Unit = {
    cmap.sizes(0) = 2
    val pos = new Pos(off0 + 6)
    val segCount = getU16(stream, pos.i) / 2
    pos.i += 2 * 4
    val ecs = getU16Array(stream, pos, segCount)
    pos.i += 2
    val scs = getU16Array(stream, pos, segCount)
    val idds = new Array[Int](segCount)
    var z = 0
    while (z < segCount) { idds(z) = getS16(stream, pos.i); pos.i += 2; z += 1 }
    val base = pos.i
    val idrs = getU16Array(stream, pos, segCount)
    var i = 0
    while (i < segCount) {
      if (ecs(i) != 0xffff) {
        if (idrs(i) != 0) {
          var off2 = base + idrs(i)
          var c = scs(i)
          while (c <= ecs(i)) {
            val key = num2string((getU16(stream, off2) + idds(i)) & 0xffff)
            if (!cmap.utfMap.contains(key)) cmap.utfMap.update(key, new CMap.Entry(true, getUtf8(c)))
            c += 1
            off2 += 2
          }
        } else {
          var c = scs(i)
          while (c <= ecs(i)) {
            val key = num2string((c + idds(i)) & 0xffff)
            if (!cmap.utfMap.contains(key)) cmap.utfMap.update(key, new CMap.Entry(true, getUtf8(c)))
            c += 1
          }
        }
      }
      i += 1
    }
  }

  /** font_file2.cc:196-210 */
  private def format6(cmap: CMap, stream: String, off0: Int): Unit = {
    cmap.sizes(0) = 2
    var off = off0 + 6
    val firstCode = getU16(stream, off); off += 2
    val entryCount = getU16(stream, off); off += 2
    var i = 0
    while (i < entryCount) {
      val key = num2string(getU16(stream, off))
      if (!cmap.utfMap.contains(key)) cmap.utfMap.update(key, new CMap.Entry(false, num2string(i + firstCode)))
      off += 2
      i += 1
    }
  }

  /** font_file2.cc:86-104 */
  private def format12(cmap: CMap, stream: String, off0: Int): Unit = {
    var off = off0 + 2 * 2 + 4 * 2
    val nGroups = getU32(stream, off)
    off += 4
    var i = 0L
    while (i < nGroups) {
      val startCharCode = getU32(stream, off); off += 4
      val endCharCode = getU32(stream, off); off += 4
      val startGlyphCode = getU32(stream, off); off += 4
      var c = startCharCode
      while (c <= endCharCode) {
        val key = num2string(((c + startGlyphCode) & 0xffffffffL).toInt)
        if (!cmap.utfMap.contains(key)) cmap.utfMap.update(key, new CMap.Entry(true, getUtf8(c)))
        c += 1
      }
      i += 1
    }
  }
}
