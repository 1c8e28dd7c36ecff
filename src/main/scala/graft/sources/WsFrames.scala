package graft.sources

import java.io.{InputStream, OutputStream}
import java.security.MessageDigest
import java.util.Base64

/** RFC 6455 WebSocket frame codec — the wire layer under [[WsClient]]
  * (and the test server): opcode constants, the upgrade accept-key
  * derivation, and read/write of single frames with optional masking.
  *
  * Kept protocol-only (no sockets, no threading) so both ends of a
  * connection and the unit tests share one implementation of the bit
  * format.
  */
object WsFrames {

  val OpContinuation = 0x0
  val OpText = 0x1
  val OpBinary = 0x2
  val OpClose = 0x8
  val OpPing = 0x9
  val OpPong = 0xA

  /** Fixed GUID from RFC 6455 §1.3 for the Sec-WebSocket-Accept hash. */
  private val AcceptGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  /** Server response key: base64(sha1(clientKey + GUID)). */
  def acceptKey(clientKey: String): String = {
    val sha1 = MessageDigest.getInstance("SHA-1")
    Base64.getEncoder.encodeToString(
      sha1.digest((clientKey + AcceptGuid).getBytes("UTF-8")))
  }

  /** One frame: FIN always set (fragmentation is handled on read, not
    * produced on write), payload masked iff `mask` is set (clients MUST
    * mask, servers MUST NOT — RFC 6455 §5.1).
    */
  def write(out: OutputStream, opcode: Int, payload: Array[Byte],
      mask: Option[Array[Byte]]): Unit = {
    out.write(0x80 | (opcode & 0x0F))
    val maskBit = if (mask.isDefined) 0x80 else 0x00
    val n = payload.length
    if (n < 126) out.write(maskBit | n)
    else if (n < 65536) {
      out.write(maskBit | 126)
      out.write((n >> 8) & 0xFF); out.write(n & 0xFF)
    } else {
      out.write(maskBit | 127)
      var i = 7
      while (i >= 0) { out.write(((n.toLong >> (8 * i)) & 0xFF).toInt); i -= 1 }
    }
    mask match {
      case Some(m) =>
        require(m.length == 4, "mask key must be 4 bytes")
        out.write(m)
        val masked = new Array[Byte](n)
        var i = 0
        while (i < n) { masked(i) = (payload(i) ^ m(i % 4)).toByte; i += 1 }
        out.write(masked)
      case None => out.write(payload)
    }
    out.flush()
  }

  /** One frame as (fin, opcode, payload), payload already unmasked;
    * None when the stream ended.
    *
    * `maxPayload` is enforced on the DECLARED length, before any
    * payload allocation — the reference's `conn.SetReadLimit(512)`
    * (server.go:162) aborts the read as soon as the header announces
    * an oversized frame, so a hostile peer cannot force the receiver
    * to buffer multi-GB payloads it will only discard.
    */
  def read(in: InputStream, maxPayload: Int = Int.MaxValue)
      : Option[(Boolean, Int, Array[Byte])] = {
    val b0 = in.read()
    if (b0 < 0) return None
    val b1 = in.read()
    if (b1 < 0) return None
    val fin = (b0 & 0x80) != 0
    val opcode = b0 & 0x0F
    val masked = (b1 & 0x80) != 0
    var len: Long = (b1 & 0x7F).toLong
    if (len == 126) {
      val e = readN(in, 2).getOrElse(return None)
      len = ((e(0) & 0xFF) << 8 | (e(1) & 0xFF)).toLong
    } else if (len == 127) {
      val e = readN(in, 8).getOrElse(return None)
      len = e.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xFF))
    }
    require(len <= Int.MaxValue, s"frame too large: $len")
    if (len > maxPayload)
      throw new java.io.IOException(
        s"frame payload $len exceeds read limit $maxPayload")
    val mask = if (masked) readN(in, 4).getOrElse(return None) else null
    val payload = readN(in, len.toInt).getOrElse(return None)
    if (masked) {
      var i = 0
      while (i < payload.length) {
        payload(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1
      }
    }
    Some((fin, opcode, payload))
  }

  private def readN(in: InputStream, n: Int): Option[Array[Byte]] = {
    val buf = in.readNBytes(n)
    if (buf.length == n) Some(buf) else None
  }
}
