package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Avro, Proto}
import graft.text.{Calendar => Cal}

/** Round-15 ingest formats: Avro OCF, iCalendar, protobuf census. */
class IngestFormatsSpec extends AnyFunSuite {

  test("avro: metadata, both codecs, record decode, sync gate") {
    for (id <- Seq(2L, 3L)) { // null and deflate codecs
      val (codec, nBlocks, recs) = Avro.parseAvro(Avro.synthAvro(id)).get
      assert(codec == (if (id % 2 == 1) "deflate" else "null"))
      assert(nBlocks == 2)
      assert(recs.length == 2 * (id % 3 + 1))
      val r0 = recs.head
      assert(r0("name") == s"item ${id % 10}-0")
      assert(r0("n") == (id * 10).toString)
      assert(r0("score") == ((id % 7) + 0.5).toString)
      assert(r0("ok") == ((id % 2) == 0).toString)
    }
    // a flipped byte in a block's SYNC marker rejects the file
    val f = Avro.synthAvro(4)
    val synced = f.clone()
    synced(f.length - 1) = (synced(f.length - 1) ^ 0x01).toByte
    assert(Avro.parseAvro(synced).isEmpty)
    // truncation anywhere rejects
    assert(Avro.parseAvro(f.take(f.length / 2)).isEmpty)
    assert(Avro.parseAvro("Obj".getBytes("UTF-8")).isEmpty)
    // nested schema types are out of scope: reject, don't misparse
    assert(Avro.schemaFields(
      """{"fields":[{"name":"a","type":{"type":"array"}}]}""").isEmpty)
    assert(Avro.schemaFields(
      """{"fields":[{"name":"a","type":"string"}]}""")
      .contains(Seq("a" -> "string")))
    // a field with EXTRA keys ("default") misses the exact-shape
    // regex — it must reject the whole schema, never silently drop
    // the column (a "null"-typed omission would still byte-align)
    assert(Avro.schemaFields(
      """{"fields":[{"name":"a","type":"string"},""" +
        """{"name":"b","type":"null","default":null}]}""").isEmpty)
    assert(Avro.schemaFields(
      """{"fields":[{"type":"long","name":"rev"}]}""").isEmpty)
    // two clean fields still parse (brace count == match count)
    assert(Avro.schemaFields(
      """{"fields":[{"name":"a","type":"string"},""" +
        """{"name":"b","type":"long"}]}""")
      .contains(Seq("a" -> "string", "b" -> "long")))
  }

  test("ics: unfolding, escapes, quoted-param colon, valarm excluded") {
    val evs = Cal.parseIcs(Cal.synthIcs(7)).get
    assert(evs.length == 2)
    assert(evs(0).summary == "Standup, team 7 and planning 7")
    assert(evs(0).location == "Room 7")
    assert(evs(0).start == "2024-03-01 07:00:00")
    assert(evs(0).duration_min == (7 % 4 + 1) * 10)
    assert(evs(1).summary == "Review 0")
    assert(evs(1).start == "2024-03-02 17:00:00")
    assert(evs(1).duration_min == 30)
    // the VALARM description never leaks
    assert(!evs.exists(_.summary.contains("decoy")))
    // non-calendar text rejects; empty calendar is zero events
    assert(Cal.parseIcs("hello world").isEmpty)
    assert(Cal.parseIcs("BEGIN:VCALENDAR\nEND:VCALENDAR").get.isEmpty)
    // leap-day and epoch-edge date math
    assert(Cal.parseUtc("19700101T000000Z").contains(0L))
    assert(Cal.parseUtc("20240229T120000Z").contains(1709208000000L))
    assert(Cal.parseUtc("20240230T120000Z").isDefined) // tolerated form
    assert(Cal.parseUtc("2024022T9120000Z").isEmpty)
  }

  test("sqlite: header fields, master-leaf walk, index rows filtered") {
    import graft.sources.Sqlite
    for (id <- 0L to 5L) {
      val m = Sqlite.parseSqlite(Sqlite.synthSqlite(id)).get
      val nt = (id % 3 + 1).toInt
      assert(m.page_size == 512 && m.n_pages == nt + 2)
      assert(m.encoding == "utf-8")
      assert(m.tables.length == nt) // the index row must NOT count
      m.tables.zipWithIndex.foreach { case (t, k) =>
        assert(t.name == s"t${k}_${id % 10}")
        assert(t.rootpage == k + 2)
        assert(t.sql.startsWith(s"CREATE TABLE t${k}_${id % 10}"))
      }
    }
    val f = Sqlite.synthSqlite(2)
    assert(Sqlite.parseSqlite(f.take(99)).isEmpty)
    // bad magic, non-power-of-two page size reject
    val badMagic = f.clone(); badMagic(0) = 'X'.toByte
    assert(Sqlite.parseSqlite(badMagic).isEmpty)
    val badPs = f.clone(); badPs(16) = 1; badPs(17) = 3 // 259
    assert(Sqlite.parseSqlite(badPs).isEmpty)
    // interior root page: out of scope, rejects
    val interior = f.clone(); interior(100) = 0x05
    assert(Sqlite.parseSqlite(interior).isEmpty)
    // a header claiming more cells than the buffer holds must reject
    // BEFORE indexing the cell-pointer array (no AIOOBE from a
    // truncated/corrupt db) — nCells lives at page offset 3..4
    val manyCells = f.take(112).toArray
    manyCells(103) = 0x20; manyCells(104) = 0x00 // nCells = 8192
    assert(Sqlite.parseSqlite(manyCells).isEmpty)
    val fewBytes = f.clone()
    fewBytes(103) = 0x27.toByte; fewBytes(104) = 0x0f.toByte // 9999
    assert(Sqlite.parseSqlite(fewBytes).isEmpty)
  }

  test("frames: zstd FCS widths, lz4 flags, xz check types") {
    import graft.sources.Frames
    // zstd single-segment (id 9: %3=0, %4=1): content == window
    val ss = Frames.parseFrame(Frames.synthFrame(9)).get
    assert(ss.format == "zstd" && ss.content_size == 9 &&
      ss.window_size == 9 && ss.checksum == "none")
    // zstd 2-byte FCS carries the +256 bias (id 6: %3=0, %4=2)
    val biased = Frames.parseFrame(Frames.synthFrame(6)).get
    assert(biased.content_size == 6 + 256 && biased.checksum == "xxh64")
    assert(biased.window_size == (1L << (6 % 8 + 10)))
    // lz4 with content size (id 7: %3=1, odd)
    val l4 = Frames.parseFrame(Frames.synthFrame(7)).get
    assert(l4.format == "lz4" && l4.content_size == 7 * 777 + 1)
    assert(l4.window_size == (1L << (2 * 3 + 16)))
    assert(l4.checksum == "xxh32" && !l4.block_independent)
    // xz check types cycle (id 2: %3=2, %4=2 -> crc64)
    val xz = Frames.parseFrame(Frames.synthFrame(2)).get
    assert(xz.format == "xz" && xz.checksum == "crc64")
    // rejections: reserved zstd bit, lz4 version, unknown magic
    assert(Frames.parseFrame(Array[Byte](0x28, 0xB5.toByte, 0x2F,
      0xFD.toByte, 0x08, 0x00)).isEmpty) // reserved bit set
    assert(Frames.parseFrame(Array[Byte](0x04, 0x22, 0x4D, 0x18,
      0x00, 0x40, 0x00)).isEmpty) // version 00
    assert(Frames.parseFrame("random text".getBytes("UTF-8")).isEmpty)
  }

  test("vcard: shared content-line machinery, escapes, first-wins") {
    val cards = Cal.parseVcards(Cal.synthVcf(13)).get
    assert(cards.length == 2)
    val c0 = cards(0)
    assert(c0.family == "Fam3" && c0.given == "Giv6")
    assert(c0.fn == "Giv6 Fam3") // folded
    assert(c0.email == "g3@corp.example") // first wins, param skipped
    assert(c0.tel == "+1-555-0103") // quoted-param ':' trap
    assert(c0.org == "Acme; Sons 3") // escaped semicolon
    assert(cards(1) == Cal.VCard("Solo3", "", "Solo3", "", "", ""))
    assert(Cal.parseVcards("not a card").isEmpty)
    assert(Cal.parseVcards("BEGIN:VCARD").get.isEmpty) // never ended
  }

  test("git: loose objects — blob/commit/tree, size gate, totality") {
    import graft.sources.Git
    val blob = Git.parseLoose(Git.synthLoose(3)).get // 3%3==0
    assert(blob.obj_type == "blob" && blob.n_lines == 4)
    val commit = Git.parseLoose(Git.synthLoose(4)).get // 4%3==1
    assert(commit.obj_type == "commit")
    assert(commit.tree_sha == Git.hex40(4, 1))
    assert(commit.n_parents == (4 % 5) % 3)
    assert(commit.author == "Dev 4 <d4@example.com>")
    assert(commit.author_epoch == 1700000000L + 4 * 60)
    assert(commit.message == "feat: change 4")
    val tree = Git.parseLoose(Git.synthLoose(5)).get // 5%3==2
    assert(tree.obj_type == "tree" && tree.n_entries == 2)
    assert(tree.listing == "100644 file0.txt\n40000 dir1")
    // size gate: declared size must match the payload exactly
    assert(Git.parseLoose(Array[Byte](1, 2, 3)).isEmpty)
    assert(Git.parseLoose(Git.synthLoose(6).dropRight(1)).isEmpty)
  }

  test("pcap: endianness probe, resolution, protocol mix, span") {
    import graft.sources.Pcap
    for (id <- 0L to 7L) {
      val c = Pcap.census(Pcap.synthPcap(id)).get
      val n = (id % 10 + 5).toInt
      assert(c.endian == (if (id % 2 == 0) "little" else "big"))
      assert(c.resolution == (if (id % 4 == 3) "ns" else "us"))
      assert(c.link_type == 1 && c.n_packets == n)
      val tcp = (0 until n).count(_ % 3 == 0)
      val udp = (0 until n).count(_ % 3 == 1)
      val arp = (0 until n).count(_ % 3 == 2)
      assert(c.n_tcp == tcp && c.n_udp == udp && c.n_arp == arp)
      assert(c.n_ipv4 == tcp + udp && c.n_other == 0)
      assert(c.span_ms == (n - 1) * (id % 5 + 1))
    }
    val f = Pcap.synthPcap(3)
    assert(Pcap.census(f.dropRight(1)).isEmpty) // torn packet
    assert(Pcap.census(f.take(23)).isEmpty)
    val badMagic = f.clone(); badMagic(0) = 0x11
    assert(Pcap.census(badMagic).isEmpty)
  }

  test("po: continuations, escapes, header/fuzzy/plural rules") {
    import graft.text.Gettext
    val s = Gettext.poStats(Gettext.synthPo(5)).get
    assert(s.n_entries == 3 + 5 % 3)
    assert(s.n_translated == 2 + 5 % 3) // fuzzy excluded
    assert(s.n_fuzzy == 1 && s.n_plural == 1)
    assert(s.first_id == "Hello world 5\n") // continuation + escape
    assert(s.first_str == "Hola mundo 5\n")
    val entries = Gettext.parsePo(Gettext.synthPo(5)).get
    assert(entries.exists(e => e.plural && e.msgstr == "Un archivo 5"))
    assert(entries.exists(e => e.fuzzy && e.msgid == "Draft 5"))
    assert(Gettext.parsePo("no po content here").isEmpty)
    assert(Gettext.parsePo("").isEmpty)
    // a '#, fuzzy' between UNSEPARATED entries flags the entry it
    // PRECEDES, never the one it follows (review regression)
    val dense = "msgid \"a\"\nmsgstr \"x\"\n#, fuzzy\n" +
      "msgid \"b\"\nmsgstr \"y\"\n"
    val es = Gettext.parsePo(dense).get
    assert(es == Seq(Gettext.PoEntry("a", "x", fuzzy = false,
      plural = false), Gettext.PoEntry("b", "y", fuzzy = true,
      plural = false)))
  }

  test("proto: census counts, nested probe, strict validation") {
    for (id <- 0L to 5L) {
      val c = Proto.census(Proto.synthProto(id)).get
      val nv = (id % 5 + 1).toInt
      assert(c.n_fields == nv + 4 && c.n_varint == nv)
      assert(c.n_fixed64 == 1 && c.n_fixed32 == 1 && c.n_len == 2)
      assert(c.n_nested == 1) // the string field must NOT probe nested
      assert(c.max_field == 12)
      assert(c.varint_sum == (1 to nv).map(id * 3 + _).sum)
      assert(c.len_bytes == 10)
    }
    // truncated fixed64, group wire types, field 0 all reject
    val m = Proto.synthProto(3)
    assert(Proto.census(m.dropRight(1)).isEmpty)
    assert(Proto.census(Array[Byte](0x0b)).isEmpty) // wt 3 = group
    assert(Proto.census(Array[Byte](0x00, 0x01)).isEmpty) // field 0
    assert(Proto.census(Array.empty[Byte]).isEmpty)
  }
}
