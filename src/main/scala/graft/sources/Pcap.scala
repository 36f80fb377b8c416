package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** PCAP capture census — network captures are a data-engineering
  * staple (observability dumps, security corpora), and the triage
  * row is protocol mix + traffic volume + time span. Walks the
  * classic (non-ng) format:
  *
  *  - global header: magic 0xA1B2C3D4 (µs) / 0xA1B23C4D (ns) in
  *    EITHER byte order (the magic doubles as the endianness probe),
  *    version 2.x, snaplen, link type (Ethernet = 1 parsed further,
  *    others counted as opaque);
  *  - per packet: ts sec/frac, captured + original lengths
  *    (incl_len > snaplen or > remaining bytes rejects — the classic
  *    crafted-capture trap), then for Ethernet the ethertype
  *    (IPv4/IPv6/ARP) and the IPv4 protocol (TCP/UDP/other).
  *
  * Span is last-minus-first timestamp in milliseconds (frac scaled by
  * the magic's resolution).
  */
object Pcap {

  final case class PcapCensus(endian: String, resolution: String,
                              link_type: Int, n_packets: Int,
                              total_bytes: Long, n_ipv4: Int, n_tcp: Int,
                              n_udp: Int, n_arp: Int, n_other: Int,
                              span_ms: Long)

  def census(b: Array[Byte]): Option[PcapCensus] = {
    if (b == null || b.length < 24) return None
    def u8(i: Long): Int = b(i.toInt) & 0xff
    def raw32be(i: Long): Long = (u8(i).toLong << 24) |
      (u8(i + 1).toLong << 16) | (u8(i + 2).toLong << 8) | u8(i + 3)
    def raw32le(i: Long): Long = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    val magicBe = raw32be(0)
    val (little, nanos) = magicBe match {
      case 0xA1B2C3D4L => (false, false)
      case 0xA1B23C4DL => (false, true)
      case 0xD4C3B2A1L => (true, false)
      case 0x4D3CB2A1L => (true, true)
      case _ => return None
    }
    def u32(i: Long): Long = if (little) raw32le(i) else raw32be(i)
    def u16(i: Long): Int =
      if (little) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    if (u16(4) != 2) return None // major version
    val snaplen = u32(16)
    val linkType = u32(20).toInt
    var i = 24L
    var n = 0; var bytes = 0L
    var ipv4 = 0; var tcp = 0; var udp = 0; var arp = 0; var other = 0
    var firstTs = -1L; var lastTs = -1L
    val n1 = b.length.toLong
    while (i < n1) {
      if (i + 16 > n1) return None // torn packet header
      val sec = u32(i)
      val frac = u32(i + 4)
      val incl = u32(i + 8)
      val orig = u32(i + 12)
      if (incl > snaplen || incl > orig || i + 16 + incl > n1) return None
      val tsMs = sec * 1000L + (if (nanos) frac / 1000000L else frac / 1000L)
      if (firstTs < 0) firstTs = tsMs
      lastTs = tsMs
      n += 1
      bytes += orig
      val p = i + 16
      if (linkType == 1 && incl >= 14) {
        // Ethernet II ethertype is ALWAYS big-endian (network order)
        val ethertype = (u8(p + 12) << 8) | u8(p + 13)
        ethertype match {
          case 0x0800 if incl >= 14 + 20 =>
            ipv4 += 1
            u8(p + 14 + 9) match { // IPv4 protocol field
              case 6 => tcp += 1
              case 17 => udp += 1
              case _ => other += 1
            }
          case 0x0806 => arp += 1
          case _ => other += 1
        }
      } else other += 1
      i += 16 + incl
    }
    if (n == 0) return None
    Some(PcapCensus(if (little) "little" else "big",
      if (nanos) "ns" else "us", linkType, n, bytes, ipv4, tcp, udp,
      arp, other, lastTs - firstTs))
  }

  // ---- fixture ------------------------------------------------------ //

  /** Deterministic per-id capture: endianness by parity, ns magic
    * every 4th, id%10+5 Ethernet packets cycling TCP/UDP/ARP with
    * closed-form sizes and a fixed inter-packet step. */
  def synthPcap(id: Long): Array[Byte] = {
    val little = id % 2 == 0
    val nanos = id % 4 == 3
    def w32(v: Long): Array[Byte] =
      if (little) Array[Byte](v.toByte, (v >>> 8).toByte,
        (v >>> 16).toByte, (v >>> 24).toByte)
      else Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte)
    def w16(v: Int): Array[Byte] =
      if (little) Array[Byte](v.toByte, (v >>> 8).toByte)
      else Array[Byte]((v >>> 8).toByte, v.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(w32(if (nanos) 0xA1B23C4DL else 0xA1B2C3D4L))
    out.write(w16(2)); out.write(w16(4)) // version 2.4
    out.write(w32(0)); out.write(w32(0)) // thiszone, sigfigs
    out.write(w32(65535L)) // snaplen
    out.write(w32(1L)) // Ethernet
    val nPkts = (id % 10 + 5).toInt
    val stepMs = id % 5 + 1
    (0 until nPkts).foreach { k =>
      val payloadLen = ((id + k) % 20 + 6).toInt
      val kind = k % 3 // 0 tcp, 1 udp, 2 arp
      val ipLen = if (kind == 2) 0 else 20
      val incl = 14 + ipLen + payloadLen
      val tMs = 1700000000000L + k * stepMs
      out.write(w32(tMs / 1000L))
      out.write(w32(
        if (nanos) (tMs % 1000L) * 1000000L else (tMs % 1000L) * 1000L))
      out.write(w32(incl.toLong)); out.write(w32(incl.toLong))
      // Ethernet: dst/src MACs + ethertype (network order always)
      (0 until 12).foreach(j => out.write(((id + j) % 256).toInt))
      val ethertype = if (kind == 2) 0x0806 else 0x0800
      out.write(ethertype >>> 8); out.write(ethertype & 0xff)
      if (kind != 2) {
        // minimal IPv4 header: version/IHL, ..., protocol at +9
        out.write(0x45)
        (1 until 9).foreach(j => out.write(((id + j) % 256).toInt))
        out.write(if (kind == 0) 6 else 17)
        (10 until 20).foreach(j => out.write(((id + j) % 256).toInt))
      }
      (0 until payloadLen).foreach(j => out.write(((id * 3 + j) % 256).toInt))
    }
    out.toByteArray
  }

  def synthPcapCol(c: Column): Column =
    udf { id: Long => synthPcap(id) }.apply(c)
  def censusCol(c: Column): Column =
    udf { b: Array[Byte] => census(b) }.apply(c)
}
