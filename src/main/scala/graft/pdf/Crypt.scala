package graft.pdf

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{SecretKeySpec, IvParameterSpec}
import Lex._

/** Standard-security-handler decryption: RC4 (R2/R3), AESV2 (R4), Identity.
  * Semantics mirror the reference (decrypt.cc:142-364) via JCE. */
object Crypt {

  private val PAD: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80, 0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A
  ).map(_.toByte)

  private val NO_META: Array[Byte] = Array(0xff, 0xff, 0xff, 0xff).map(_.toByte)

  final val ALG_RC4V1 = 1
  final val ALG_RC4V2 = 2
  final val ALG_AESV2 = 4
  final val ALG_IDENTITY = 8

  private def md5(data: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    data.foreach(md.update)
    md.digest()
  }

  def rc4(key: Array[Byte], in: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("ARCFOUR")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "ARCFOUR"))
    c.doFinal(in)
  }

  private def getUserPad(password: String): Array[Byte] = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 32 && i < password.length) { out(i) = password.charAt(i).toByte; i += 1 }
    var j = 0
    while (i < 32) { out(i) = PAD(j); i += 1; j += 1 }
    out
  }

  private def isEncryptMetadata(opts: Dict): Boolean = opts.get("/EncryptMetadata") match {
    case None => true
    case Some(o) if o.raw == "false" => false
    case Some(o) if o.raw == "true" => true
    case Some(o) => err(s"is_encrypt_metadata: wrong bool value:${o.raw}")
  }

  private def getKeyLength(opts: Dict): Int =
    opts.get("/Length").map(o => (strictStoul(o.raw) / 8).toInt).getOrElse(40 / 8)

  private def getExt(opts: Dict): Array[Byte] = {
    val p = strictStol(opts("/P").raw)
    Array((p & 0xff).toByte, ((p >> 8) & 0xff).toByte, ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte)
  }

  /** decrypt.cc:142-202 — document decryption key (empty user password). */
  def getDecryptionKey(opts: Dict): Array[Byte] = {
    val keyLength = getKeyLength(opts)
    val md = MessageDigest.getInstance("MD5")
    md.update(PAD)
    val oVal = decodeString(opts("/O").raw)
    md.update(getUserPad(oVal))
    md.update(getExt(opts))
    val idArr = opts("/ID").raw
    val off = skipSpaces(idArr, 1)
    val documentId = decodeString(getString(idArr, new Pos(off)))
    if (documentId.nonEmpty) md.update(toBytes(documentId))
    if (!isEncryptMetadata(opts)) md.update(NO_META)
    var digest = md.digest()
    val revision = strictStoul(opts("/R").raw)
    if (revision == 3 || revision == 4) {
      var k = 0
      while (k < 50) { digest = md5(digest.take(keyLength)); k += 1 }
    }
    digest.take(keyLength)
  }

  /** decrypt.cc:204-239 */
  def getAlgorithm(opts: Dict): Int = {
    strictStoul(opts("/R").raw) match {
      case 2 => ALG_RC4V1
      case 3 => ALG_RC4V2
      case 4 =>
        if (!opts.contains("/CF")) return ALG_IDENTITY
        val cf = getDictionaryData(opts("/CF").raw, 0)
        if (!cf.contains("/StdCF")) return ALG_IDENTITY
        val stdCf = getDictionaryData(cf("/StdCF").raw, 0)
        stdCf.get("/CFM") match {
          case None => ALG_IDENTITY
          case Some(o) if o.raw == "/V2" => ALG_RC4V2
          case Some(o) if o.raw == "/AESV2" => ALG_AESV2
          case Some(o) => err(s"get_algorithm: wrong /CFM value:${o.raw}")
        }
      case v => err(s"get_algorithm: wrong /R value:$v")
    }
  }

  // The document key derivation is 50 MD5 rounds for R3/R4 and a pure
  // function of the encrypt dict, which is one Dict instance per document
  // — memoize the last (key, algorithm) per thread instead of re-deriving
  // per decrypted object (the reference re-derives each time,
  // decrypt.cc:248; values are identical, only the work is saved).
  private final class DocKeyMemo {
    var opts: AnyRef = null
    var key: Array[Byte] = null
    var alg: Int = 0
  }
  private val tlMemo = ThreadLocal.withInitial[DocKeyMemo](() => new DocKeyMemo)

  // Algorithm is memoized eagerly, the document key LAZILY — only when a
  // RC4/AES branch actually needs it. The reference (decrypt.cc:349)
  // dispatches on get_algorithm alone and derives the key only inside
  // create_obj_key: an Identity-algorithm document (e.g. R4 with no /CF)
  // whose encrypt dict lacks /O, /P or /ID must pass text through, not
  // throw from an eager key derivation.
  private def docAlg(opts: Dict): Int = {
    val m = tlMemo.get()
    if (m.opts ne opts) {
      m.alg = getAlgorithm(opts)
      m.key = null
      m.opts = opts
    }
    m.alg
  }

  private def docKeyAndAlg(opts: Dict): (Array[Byte], Int) = {
    val alg = docAlg(opts)
    val m = tlMemo.get()
    if (m.key == null) m.key = getDecryptionKey(opts)
    (m.key, alg)
  }

  /** decrypt.cc:241-271 — per-object key: docKey ∥ objnum ∥ gen (+`sAlT`). */
  private def createObjKey(n: Long, g: Long, opts: Dict): (Array[Byte], Int) = {
    val (dk, alg) = docKeyAndAlg(opts)
    val isAes = alg == ALG_AESV2
    val nkey = new Array[Byte](dk.length + 5 + (if (isAes) 4 else 0))
    System.arraycopy(dk, 0, nkey, 0, dk.length)
    nkey(dk.length) = (n & 0xff).toByte
    nkey(dk.length + 1) = ((n >> 8) & 0xff).toByte
    nkey(dk.length + 2) = ((n >> 16) & 0xff).toByte
    nkey(dk.length + 3) = (g & 0xff).toByte
    nkey(dk.length + 4) = ((g >> 8) & 0xff).toByte
    if (isAes) {
      nkey(dk.length + 5) = 0x73
      nkey(dk.length + 6) = 0x41
      nkey(dk.length + 7) = 0x6c
      nkey(dk.length + 8) = 0x54
    }
    val objKey = md5(nkey)
    val keyLen = if (dk.length <= 11) dk.length + 5 else 16
    (objKey, keyLen)
  }

  private def decryptRc4(n: Long, g: Long, in: String, opts: Dict): String = {
    val (objKey, keyLen) = createObjKey(n, g, opts)
    fromBytes(rc4(objKey.take(keyLen), toBytes(in)))
  }

  private def decryptAesV2(n: Long, g: Long, in: String, opts: Dict): String = {
    val (objKey, keyLen) = createObjKey(n, g, opts)
    val inB = toBytes(in)
    if (((inB.length - 16) % 16) != 0) err("aes: AES data length must be multiple of 16")
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(objKey.take(keyLen), "AES"),
      new IvParameterSpec(inB, 0, 16))
    val out = c.doFinal(inB, 16, inB.length - 16)
    // strip PKCS#5-ish padding the way the reference sizes its output:
    // out_buffer_len = in.size() - 2 - AES_IV_LENGTH (decrypt.cc:334)
    val outLen = in.length - 2 - 16
    fromBytes(out.take(outLen))
  }

  /** decrypt.cc:346-364 */
  def decrypt(n: Long, g: Long, in: String, opts: Dict): String = {
    if (opts.isEmpty) return in
    docAlg(opts) match {
      case ALG_RC4V1 | ALG_RC4V2 => decryptRc4(n, g, in, opts)
      case ALG_AESV2 => decryptAesV2(n, g, in, opts)
      case ALG_IDENTITY => in
      case a => err(s"decrypt: Unknown algorithm: $a")
    }
  }
}
