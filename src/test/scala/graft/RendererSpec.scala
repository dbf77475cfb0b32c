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
}
