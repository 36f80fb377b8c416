package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Binary

class AvifSpec extends AnyFunSuite {

  test("avifHeader round-trips dims, depth, alpha, brand") {
    val m = Binary.parseAvifMeta(
      Binary.avifHeader(640, 480, 10, alpha = true)).get
    assert(m == Binary.AvifMeta("avif", 640, 480, 10, true))
    val m2 = Binary.parseAvifMeta(
      Binary.avifHeader(1, 1, 8, alpha = false, brand = "avis")).get
    assert(m2 == Binary.AvifMeta("avis", 1, 1, 8, false))
    // synth battery: every id round-trips its closed forms
    (0L until 64L).foreach { id =>
      val m = Binary.parseAvifMeta(Binary.synthAvif(id)).get
      assert(m.width == (id % 1920 + 1).toInt)
      assert(m.height == (id % 1080 + 1).toInt)
      assert(m.bit_depth == Array(8, 10, 12)((id % 3).toInt))
      assert(m.has_alpha == (id % 2 == 0))
      assert(m.brand == (if (id % 5 == 0) "avis" else "avif"))
    }
  }

  test("avif malformations reject") {
    val good = Binary.avifHeader(640, 480, 8, alpha = false)
    // truncation anywhere in the box chain
    assert(Binary.parseAvifMeta(good.take(20).toArray).isEmpty)
    assert(Binary.parseAvifMeta(Array[Byte](1, 2, 3)).isEmpty)
    assert(Binary.parseAvifMeta(null).isEmpty)
    // wrong major brand
    val mp4ish = good.clone()
    "isom".getBytes("US-ASCII").copyToArray(mp4ish, 8)
    assert(Binary.parseAvifMeta(mp4ish).isEmpty)
    // zero width: ispe carries w=0
    assert(Binary.parseAvifMeta(
      Binary.avifHeader(0, 480, 8, alpha = false)).isEmpty)
    // corrupted box size (oversized inner box walks off the end)
    val bad = good.clone()
    bad(good.length - 40) = 0x7f // clobber a size byte deep in meta
    // must not throw; None or a parse of surviving fields both fine
    Binary.parseAvifMeta(bad)
  }

  test("parseImageMeta dispatches avif") {
    val m = Binary.parseImageMeta(
      Binary.avifHeader(320, 200, 12, alpha = true)).get
    assert(m == Binary.ImageMeta("avif", 320, 200, 12))
  }
}
