package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Archives

class ArchivesSpec extends AnyFunSuite {

  test("zip: build/parse round-trip, stored + deflated, CRC verified") {
    val zip = Archives.buildZip(Seq(
      ("a.txt", "hello zip", false),
      ("dir/b.py", "x = 1\n" * 40, true),
      ("empty.txt", "", false)))
    val es = Archives.parseZip(zip).get
    assert(es.map(_.name) == Seq("a.txt", "dir/b.py", "empty.txt"))
    assert(es(0).method == "stored" && es(0).text == "hello zip")
    assert(es(1).method == "deflate" && es(1).text == "x = 1\n" * 40)
    assert(es(1).usize == 240 && es(2).usize == 0)
    assert(es.forall(_.crc_ok))
    // synth fixture round-trips its closed forms
    val s = Archives.parseZip(Archives.synthZip(7)).get
    assert(s.map(_.name) == Seq("src/main.py", "README.md", "gen/auto.go"))
    assert(s(0).text == "# module 7\nx = 7\n")
    assert(s.forall(_.crc_ok))
  }

  test("zip: payload corruption flips crc_ok, framing corruption rejects") {
    val zip = Archives.buildZip(Seq(("a.txt", "payload data here", false)))
    // flip a payload byte (stored: data sits after the 30+5 byte header)
    val bad = zip.clone(); bad(35) = (bad(35) ^ 0x01).toByte
    val es = Archives.parseZip(bad).get
    assert(!es(0).crc_ok)
    // truncations reject
    assert(Archives.parseZip(zip.take(zip.length - 3).toArray).isEmpty)
    assert(Archives.parseZip(Array[Byte](1, 2, 3)).isEmpty)
    assert(Archives.parseZip(null).isEmpty)
    // EOCD found through a trailing comment
    val commented = zip ++ "trailing comment".getBytes("US-ASCII")
    // (comment length field says 0, so strict parse still finds EOCD by
    // scan; entries stay intact)
    assert(Archives.parseZip(commented).get.head.text
      == "payload data here")
    // clobber the central-directory signature
    val cds = zip.length - 22 - (46 + 5)
    val badCd = zip.clone(); badCd(cds) = 'X'
    assert(Archives.parseZip(badCd).isEmpty)
  }

  test("tar: build/parse round-trip with dirs, checksum enforced") {
    val tar = Archives.buildTar(Seq(
      ("src", None),
      ("src/a.rs", Some("fn main() {}\n")),
      ("big.txt", Some("z" * 1300))))
    val es = Archives.parseTar(tar).get
    assert(es.map(_.name) == Seq("src", "src/a.rs", "big.txt"))
    assert(es(0).type_flag == "dir" && es(0).size == 0)
    assert(es(1).text == "fn main() {}\n")
    assert(es(2).size == 1300 && es(2).text == "z" * 1300)
    // corrupt a header byte -> checksum mismatch -> reject
    val bad = tar.clone(); bad(0) = 'X'
    assert(Archives.parseTar(bad).isEmpty)
    // non-512-multiple rejects
    assert(Archives.parseTar(tar.take(tar.length - 1).toArray).isEmpty)
    // tar.gz round-trip
    val tgz = Archives.gzip(tar)
    assert(Archives.parseTarGz(tgz).get.map(_.name) == es.map(_.name))
    assert(Archives.parseTarGz(Array[Byte](1, 2)).isEmpty)
    // synth fixture
    val s = Archives.parseTarGz(Archives.synthTarGz(3)).get
    assert(s.map(_.name) == Seq("src", "src/lib.rs", "notes.txt"))
    assert(s(1).text == "// SPDX-License-Identifier: MIT\nfn f3() {}\n")
  }
}
