package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Binary

class LegacyImageSpec extends AnyFunSuite {

  test("bmp: dims, bpp, top-down negative height") {
    assert(Binary.parseBmpMeta(Binary.bmpHeader(640, 480, 24)).get
      == Binary.ImageMeta("bmp", 640, 480, 24))
    // top-down rows store a negative height; magnitude surfaces
    assert(Binary.parseBmpMeta(
      Binary.bmpHeader(10, 20, 32, topDown = true)).get
      == Binary.ImageMeta("bmp", 10, 20, 32))
    assert(Binary.parseBmpMeta(Binary.bmpHeader(0, 20, 24)).isEmpty)
    assert(Binary.parseBmpMeta("BMtooshort".getBytes("US-ASCII")).isEmpty)
    assert(Binary.parseBmpMeta(null).isEmpty)
  }

  test("ico: first entry, 0-byte dim means 256") {
    assert(Binary.parseIcoMeta(Binary.icoHeader(16, 16, 32)).get
      == Binary.ImageMeta("ico", 16, 16, 32))
    assert(Binary.parseIcoMeta(Binary.icoHeader(256, 256, 8)).get
      == Binary.ImageMeta("ico", 256, 256, 8))
    // type must be 1 (icon), not 2 (cursor)
    val cur = Binary.icoHeader(16, 16, 32)
    cur(2) = 2
    assert(Binary.parseIcoMeta(cur).isEmpty)
  }

  test("tiff: both byte orders, IFD walk, malformations") {
    assert(Binary.parseTiffMeta(Binary.tiffHeader(800, 600, 8)).get
      == Binary.ImageMeta("tiff", 800, 600, 8))
    assert(Binary.parseTiffMeta(
      Binary.tiffHeader(800, 600, 16, bigEndian = true)).get
      == Binary.ImageMeta("tiff", 800, 600, 16))
    // bad magic number
    val bad = Binary.tiffHeader(1, 1, 8); bad(2) = 43
    assert(Binary.parseTiffMeta(bad).isEmpty)
    // IFD offset past EOF
    val trunc = Binary.tiffHeader(1, 1, 8).take(10).toArray
    assert(Binary.parseTiffMeta(trunc).isEmpty)
  }

  test("exif: orientation + datetime from APP1, dims still resolve") {
    val jp = Binary.jpegWithExif(640, 480, 6, "2026:08:16 12:34:56")
    assert(Binary.parseExifMeta(jp).get
      == Binary.ExifMeta(6, "2026:08:16 12:34:56"))
    // the marker walk past APP1 still reaches SOF
    assert(Binary.parseImageMeta(jp).get
      == Binary.ImageMeta("jpeg", 640, 480, 8))
    // plain JPEG without EXIF: None, not an error
    assert(Binary.parseExifMeta(Binary.jpegHeader(10, 10)).isEmpty)
    // truncated APP1 rejects
    assert(Binary.parseExifMeta(jp.take(20).toArray).isEmpty)
    // bad orientation code rejects
    val bad = Binary.jpegWithExif(10, 10, 9, "2026:01:01 00:00:00")
    assert(Binary.parseExifMeta(bad).isEmpty)
    // synth battery round-trips
    (0L until 40L).foreach { id =>
      val m = Binary.parseExifMeta(Binary.synthExifJpeg(id)).get
      assert(m.orientation == (id % 8 + 1).toInt)
      assert(m.datetime ==
        f"2026:08:${id % 28 + 1}%02d 12:${id % 60}%02d:00")
    }
  }

  test("parseImageMeta dispatches all legacy formats") {
    assert(Binary.parseImageMeta(Binary.bmpHeader(3, 4, 24)).get.format
      == "bmp")
    assert(Binary.parseImageMeta(Binary.icoHeader(5, 6, 32)).get.format
      == "ico")
    assert(Binary.parseImageMeta(Binary.tiffHeader(7, 8, 1)).get.format
      == "tiff")
    // synth battery round-trips its closed forms
    (0L until 60L).foreach { id =>
      val m = Binary.parseImageMeta(Binary.synthLegacyImage(id)).get
      val expFmt = Seq("bmp", "ico", "tiff")((id % 3).toInt)
      assert(m.format == expFmt)
      if (expFmt != "ico") {
        assert(m.width == (id % 1920 + 1).toInt)
        assert(m.height == (id % 1080 + 1).toInt)
      } else {
        assert(m.width == (id % 256 + 1).toInt)
        assert(m.bit_depth == (if (id % 2 == 0) 32 else 8))
      }
    }
  }
}
