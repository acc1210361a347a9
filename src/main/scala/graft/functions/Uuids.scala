package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.concurrent.ThreadLocalRandom

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** UUID generation (ref `scripts/pipeline/16-add-track-uuids.py:72-84`
  * for v7, `scripts/pipeline/18-...py:73,142-173` for deterministic v5).
  *
  * `java.util.UUID.nameUUIDFromBytes` is v3 (MD5), so v5 (SHA-1) is
  * implemented manually per RFC 4122 §4.3.
  */
object Uuids {

  /** RFC 4122 predefined DNS namespace. */
  val NsDns = "6ba7b810-9dad-11d1-80b4-00c04fd430c8"
  /** RFC 4122 predefined URL namespace. */
  val NsUrl = "6ba7b811-9dad-11d1-80b4-00c04fd430c8"

  private def uuidBytes(uuid: String): Array[Byte] = {
    val hex = uuid.replace("-", "")
    require(hex.length == 32, s"bad uuid: $uuid")
    hex.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
  }

  private def format(b: Array[Byte]): String = {
    val hex = b.map(x => f"${x & 0xff}%02x").mkString
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
      s"${hex.substring(16, 20)}-${hex.substring(20, 32)}"
  }

  /** Deterministic UUIDv5: SHA-1(namespace bytes ++ name bytes), with
    * version nibble 5 and RFC 4122 variant bits. */
  def uuid5(namespace: String, name: String): String = {
    val md = MessageDigest.getInstance("SHA-1")
    md.update(uuidBytes(namespace))
    md.update(name.getBytes(UTF_8))
    val h = md.digest().take(16)
    h(6) = ((h(6) & 0x0f) | 0x50).toByte
    h(8) = ((h(8) & 0x3f) | 0x80).toByte
    format(h)
  }

  /** Time-ordered UUIDv7: 48-bit unix millis, version 7, 74 random bits
    * (RFC 9562 layout). Nondeterministic — register `.asNondeterministic`. */
  def uuid7(): String = {
    val now = System.currentTimeMillis()
    val rnd = ThreadLocalRandom.current()
    val b = new Array[Byte](16)
    rnd.nextBytes(b)
    b(0) = (now >>> 40).toByte
    b(1) = (now >>> 32).toByte
    b(2) = (now >>> 24).toByte
    b(3) = (now >>> 16).toByte
    b(4) = (now >>> 8).toByte
    b(5) = now.toByte
    b(6) = ((b(6) & 0x0f) | 0x70).toByte
    b(8) = ((b(8) & 0x3f) | 0x80).toByte
    format(b)
  }

  /** Validity predicate used by the reference on stored uuids:
    * version nibble check (`substr(uuid,15,1)='7'`, ref `16-...py:40-47`). */
  def isUuid7(s: String): Boolean =
    s != null && s.length == 36 && s.charAt(14) == '7'

  val uuid5Udf: UserDefinedFunction =
    udf((ns: String, name: String) =>
      if (ns == null || name == null) null else uuid5(ns, name))

  val uuid7Udf: UserDefinedFunction = udf(() => uuid7()).asNondeterministic()
}
