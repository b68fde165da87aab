package graft.pdf

import scala.collection.mutable
import Lex._

/** Object resolution incl. eager /ObjStm expansion (object_storage.cc) plus
  * the stream-slicing helpers from common.cc:646-695. */
final class ObjectStorage(val doc: String, val id2offsets: mutable.TreeMap[Long, Long], decryptData: Dict) {
  private val id2objStm = mutable.TreeMap.empty[Long, Obj]

  id2offsets.keysIterator.toArray.foreach(id => insertObjStream(id, decryptData))

  /** object_storage.cc:23-29 */
  def getObject(id: Long): Obj = id2offsets.get(id) match {
    case Some(_) => Storage.getObject(doc, id, id2offsets)
    case None => id2objStm.getOrElse(id, err(s"ObjectStorage: no object $id"))
  }

  def isObjectExists(id: Long): Boolean = id2objStm.contains(id) || id2offsets.contains(id)

  /** object_storage.cc:42-48 */
  private def getGenId(offset0: Long): Long = {
    var offset = efindFirst(doc, " \r\t\n", offset0.toInt)
    offset = efindNumber(doc, offset)
    val end = efindFirst(doc, " \r\t\n", offset)
    strictStoul(doc.substring(offset, end))
  }

  /** object_storage.cc:50-74 */
  private def insertObjStream(id: Long, decryptData: Dict): Unit = {
    var offset = id2offsets(id).toInt
    offset = skipComments(doc, offset)
    val genId = getGenId(offset)
    offset = skipComments(doc, offset)
    offset = efind(doc, "obj", offset) + 3
    val pos = new Pos(offset)
    if (getObjectType(doc, pos) != Kind.DICTIONARY) return
    val dictionary = getDictionaryData(getDictionary(doc, pos), 0)
    dictionary.get("/Type") match {
      case Some(o) if o.raw == "/ObjStm" =>
      case _ => return
    }
    val len = Storage.getLengthVia(doc, dictionary, lenId => Storage.getObject(doc, lenId, id2offsets))
    var content = Storage.getContent(doc, len, pos.i)
    content = Crypt.decrypt(id, genId, content, decryptData)
    content = Filters.decode(content, dictionary)
    val pairs = getId2OffsetsObjStm(content, dictionary)
    val first = strictStoul(dictionary("/First").raw)
    pairs.foreach { case (objId, objOff) =>
      val p = new Pos((first + objOff).toInt)
      val kind = getObjectType(content, p)
      if (!id2objStm.contains(objId)) id2objStm.update(objId, Obj(extract(kind, content, p), kind))
    }
  }

  /** object_storage.cc:76-94 */
  private def getId2OffsetsObjStm(content: String, dictionary: Dict): mutable.ArrayBuffer[(Long, Long)] = {
    val result = mutable.ArrayBuffer.empty[(Long, Long)]
    var offset = 0
    val n = strictStoul(dictionary("/N").raw)
    var i = 0L
    while (i < n) {
      offset = efindNumber(content, offset)
      var end = efindFirstNot(content, "0123456789", offset)
      val id = strictStoul(content.substring(offset, end))
      offset = efindNumber(content, end)
      end = efindFirstNot(content, "0123456789", offset)
      val objOff = strictStoul(content.substring(offset, end))
      result += ((id, objOff))
      offset = end
      i += 1
    }
    result
  }
}

object Storage {
  /** common.cc:646-655 */
  def getObject(buffer: String, id: Long, id2offsets: mutable.TreeMap[Long, Long]): Obj = {
    val base = id2offsets.getOrElse(id, err(s"get_object: no offset for $id")).toInt
    var offset = skipComments(buffer, base)
    offset = efind(buffer, "obj", base) + 3
    offset = skipComments(buffer, offset)
    val pos = new Pos(offset)
    val kind = getObjectType(buffer, pos)
    Obj(extract(kind, buffer, pos), kind)
  }

  /** common.h:104-122 — /Length may be a scalar or an indirect object. */
  def getLengthVia(buffer: String, props: Dict, resolve: Long => Obj): Long = {
    val r = props.getOrElse("/Length", err("get_length: no /Length"))
    r.kind match {
      case Kind.VALUE => strictStoul(r.raw)
      case Kind.INDIRECT_OBJECT =>
        val id = strictStoul(r.raw.substring(0, efindFirst(r.raw, " \r\n\t", 0)))
        val o = resolve(id)
        if (o.kind != Kind.VALUE) err("get_length: length indirect obj must be VALUE")
        strictStoul(o.raw)
      case _ => err("get_length: wrong type for /Length")
    }
  }

  /** common.cc:674-681 */
  def getContent(buffer: String, len: Long, offset0: Int): String = {
    var offset = efind(buffer, "stream", offset0) + "stream".length
    if (offset < buffer.length && buffer.charAt(offset) == '\r') offset += 1
    if (offset < buffer.length && buffer.charAt(offset) == '\n') offset += 1
    buffer.substring(offset, math.min(buffer.length, offset + len.toInt))
  }

  /** common.cc:657-672 — slice + decrypt + decode one stream object. */
  def getStream(doc: String, idGen: (Long, Long), storage: ObjectStorage, decryptData: Dict): String = {
    val streamPair = storage.getObject(idGen._1)
    if (streamPair.kind != Kind.DICTIONARY) err("get_stream: stream must be a dictionary")
    val props = getDictionaryData(streamPair.raw, 0)
    val offset = efind(doc, "<<", storage.id2offsets(idGen._1).toInt)
    val p = new Pos(offset)
    getDictionary(doc, p)
    val len = getLengthVia(doc, props, id => storage.getObject(id))
    var content = getContent(doc, len, p.i)
    content = Crypt.decrypt(idGen._1, idGen._2, content, decryptData)
    if (content.isEmpty) return ""
    Filters.decode(content, props)
  }

  /** common.cc:721-730 */
  def getIndirectObjectData(indirect: String, storage: ObjectStorage, wantKind: Int = -1): Obj = {
    val r = storage.getObject(strictStoul(indirect.substring(0, efindFirst(indirect, " \r\n\t", 0))))
    if (wantKind != -1 && r.kind != wantKind) err(s"get_indirect_object_data: wrong type=$wantKind val=${r.raw}")
    r
  }

  /** common.cc:767-778 */
  def getDictOrIndirectDict(data: Obj, storage: ObjectStorage): Dict = data.kind match {
    case Kind.DICTIONARY => getDictionaryData(data.raw, 0)
    case Kind.INDIRECT_OBJECT => getDictionaryData(getIndirectObjectData(data.raw, storage, Kind.DICTIONARY).raw, 0)
    case k => err(s"get_dict_or_indirect_dict: wrong object type $k")
  }

  /** common.cc:780-791 */
  def getArrayOrIndirectArray(data: Obj, storage: ObjectStorage): Arr = data.kind match {
    case Kind.ARRAY => getArrayData(data.raw, 0)
    case Kind.INDIRECT_OBJECT => getArrayData(getIndirectObjectData(data.raw, storage, Kind.ARRAY).raw, 0)
    case k => err(s"get_array_or_indirect_array: wrong object type $k")
  }
}
