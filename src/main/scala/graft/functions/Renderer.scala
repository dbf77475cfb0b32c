package graft.functions

import java.awt.{Color, Font, RenderingHints}
import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

/** Image / text renderers (SURVEY §2.2 #33) — the raw-frame producers
  * of /root/reference/streamtasks/system/tasks/media/imagerenderer.py:47-48
  * (decode → convert → resize → tobytes) and textrenderer.py:79-89
  * (blank frame → draw text at (x,y) with font/size/color → tobytes),
  * re-expressed on Java2D so executors need no native image stack.
  *
  * Output is packed rgb24 (3 bytes/pixel, row-major) — the reference's
  * default pixel format — as an opaque binary column payload for the
  * multimodal plumbing (m01-m03). Emission cadence (imagerenderer's
  * repeat_interval) is [[graft.sources.InputPacer.paced]] with a
  * constant-interval packet table; rendering itself is stateless and
  * runs one-kernel-per-row inside mapPartitions like the m03 decoder
  * mount.
  */
object Renderer {

  /** Decode any ImageIO-supported container (PNG/BMP/GIF/JPEG),
    * resize to w×h, return packed rgb24 (imagerenderer.py:47-48). */
  def renderImage(data: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val src = javax.imageio.ImageIO.read(new ByteArrayInputStream(data))
    require(src != null, "undecodable image payload")
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, w, h, null)
    } finally g.dispose()
    toRgb24(dst)
  }

  /** Render `text` at (x, y) on a black w×h frame
    * (textrenderer.py:84-88). `rgb` is 0xRRGGBB. Uses the JVM's
    * logical sans-serif font — deterministic per JVM, not per platform,
    * so tests assert structure (ink present/absent, placement), not
    * exact pixels. */
  def renderText(text: String, w: Int, h: Int, x: Int, y: Int,
      fontSize: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, fontSize))
      g.setColor(new Color(rgb))
      g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING,
        RenderingHints.VALUE_TEXT_ANTIALIAS_OFF)
      // PIL draws from the text's top-left at (x, y); Java2D's
      // drawString anchors at the baseline — shift by the ascent
      g.drawString(text, x, y + g.getFontMetrics.getAscent)
    } finally g.dispose()
    toRgb24(img)
  }

  /** 5×7 bitmap digit font (one 5-bit row mask per glyph row, bit 4 =
    * leftmost pixel) — the classic HD44780 character-generator digit
    * shapes. Shared as integer literals with the m12 oracle SQL (the
    * p05 quantized-twiddle trick): both engines rasterize from the
    * SAME table with pure integer math, so the raster is hash-exact
    * across engines — unlike [[renderText]]'s platform font. */
  val digitFont: Array[Array[Int]] = Array(
    Array(14, 17, 19, 21, 25, 17, 14), // 0
    Array(4, 12, 4, 4, 4, 4, 14), //      1
    Array(14, 17, 1, 2, 4, 8, 31), //     2
    Array(31, 2, 4, 2, 1, 17, 14), //     3
    Array(2, 6, 10, 18, 31, 2, 2), //     4
    Array(31, 16, 30, 1, 1, 17, 14), //   5
    Array(6, 8, 16, 30, 17, 17, 14), //   6
    Array(31, 1, 2, 4, 8, 8, 8), //       7
    Array(14, 17, 17, 14, 17, 17, 14), // 8
    Array(14, 17, 17, 15, 1, 2, 12)) //   9

  /** Deterministic integer rasterizer — textrenderer.py:79-89's
    * blank-frame → draw-text → tobytes path with the 1-bit
    * [[digitFont]] glyph grid instead of a platform font. Renders
    * `digits` at top-left (x, y) with a 6-px advance in colour `rgb`
    * (0xRRGGBB) onto a black w×h packed-rgb24 frame. Every output
    * byte is exact integer math over the shared font table, so m12
    * can hash-check the raster against a SQL re-derivation; the
    * Java2D [[renderText]] keeps the production font path. */
  def renderDigits(digits: String, w: Int, h: Int, x: Int, y: Int,
      rgb: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    val r = ((rgb >> 16) & 0xff).toByte
    val g = ((rgb >> 8) & 0xff).toByte
    val b = (rgb & 0xff).toByte
    var i = 0
    while (i < digits.length) {
      val glyph = digitFont(digits.charAt(i) - '0')
      var gy = 0
      while (gy < 7) {
        var gx = 0
        while (gx < 5) {
          if (((glyph(gy) >> (4 - gx)) & 1) == 1) {
            val px = x + i * 6 + gx
            val py = y + gy
            if (px >= 0 && px < w && py >= 0 && py < h) {
              val o = (py * w + px) * 3
              out(o) = r; out(o + 1) = g; out(o + 2) = b
            }
          }
          gx += 1
        }
        gy += 1
      }
      i += 1
    }
    out
  }

  private def toRgb24(img: BufferedImage): Array[Byte] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Byte](w * h * 3)
    var i = 0
    var yy = 0
    while (yy < h) {
      var xx = 0
      while (xx < w) {
        val p = img.getRGB(xx, yy)
        out(i) = ((p >> 16) & 0xff).toByte
        out(i + 1) = ((p >> 8) & 0xff).toByte
        out(i + 2) = (p & 0xff).toByte
        i += 3
        xx += 1
      }
      yy += 1
    }
    out
  }
}
