package graft

import graft.functions.Renderer
import org.scalatest.funsuite.AnyFunSuite

/** Renderer kernels (#33): structural assertions — decode/resize
  * geometry and color fidelity for the image renderer, ink
  * presence/placement/color for the text renderer (glyph shapes are
  * JVM-font-dependent, exact pixels are not portable). */
class RendererSpec extends AnyFunSuite {

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("image renderer: decode + resize to rgb24 keeps solid color " +
      "(imagerenderer.py:47-48)") {
    val out = Renderer.renderImage(png(8, 6, 0x4080c0), w = 4, h = 3)
    assert(out.length == 4 * 3 * 3)
    // solid-color source stays solid through bilinear resize
    val px = out.grouped(3).toSeq
    assert(px.forall(p => (p(0) & 0xff) == 0x40 && (p(1) & 0xff) == 0x80
      && (p(2) & 0xff) == 0xc0))
  }

  test("image renderer rejects undecodable payloads") {
    intercept[IllegalArgumentException] {
      Renderer.renderImage(Array[Byte](1, 2, 3), 4, 4)
    }
  }

  test("text renderer: ink appears in the text box with the requested " +
      "color, empty text renders black (textrenderer.py:84-88)") {
    val w = 64; val h = 32
    val blank = Renderer.renderText("", w, h, 2, 2, 16, 0xff0000)
    assert(blank.forall(_ == 0)) // nothing drawn

    val out = Renderer.renderText("Hi", w, h, 2, 2, 16, 0xff0000)
    assert(out.length == w * h * 3)
    val inked = out.grouped(3).zipWithIndex
      .filter { case (p, _) => p.exists(_ != 0) }.toSeq
    assert(inked.nonEmpty, "text drew no pixels")
    // antialiasing off + pure red fill → ink is pure red
    assert(inked.forall { case (p, _) =>
      (p(0) & 0xff) == 0xff && p(1) == 0 && p(2) == 0 })
    // ink stays inside the glyph box right+below the (x, y) origin
    assert(inked.forall { case (_, i) =>
      val (px, py) = (i % w, i / w)
      px >= 2 && py >= 2 && py < 2 + 2 * 16 })
  }

  test("digit raster: exact 1-bit glyphs, placement, advance, rgb24 " +
      "packing, and edge clipping") {
    val w = 16; val h = 9
    val out = Renderer.renderDigits("42", w, h, 1, 1, 0xCC8833)
    assert(out.length == w * h * 3)
    // every lit pixel carries exactly the requested colour bytes
    val lit = out.grouped(3).zipWithIndex
      .filter { case (p, _) => p.exists(_ != 0) }.toSeq
    assert(lit.forall { case (p, _) => (p(0) & 0xff) == 0xCC &&
      (p(1) & 0xff) == 0x88 && (p(2) & 0xff) == 0x33 })
    // total ink = popcount of the two glyphs' row masks
    def pop(d: Int) = Renderer.digitFont(d).map(Integer.bitCount).sum
    assert(lit.size == pop(4) + pop(2))
    // pixel (px, py) is lit iff the font bit for its glyph cell is set
    for (((p, i)) <- out.grouped(3).zipWithIndex) {
      val (px, py) = (i % w, i / w)
      val expected = py >= 1 && py < 8 && px >= 1 && px < 13 && {
        val glyph = if (px < 7) 4 else 2
        val gx = if (px < 7) px - 1 else px - 7
        ((Renderer.digitFont(glyph)(py - 1) >> (4 - gx)) & 1) == 1
      }
      assert((p.exists(_ != 0)) == expected, s"pixel ($px,$py)")
    }
    // off-frame placement clips instead of throwing
    val clipped = Renderer.renderDigits("99", 8, 4, 5, -2, 0xffffff)
    assert(clipped.length == 8 * 4 * 3)
  }
}
