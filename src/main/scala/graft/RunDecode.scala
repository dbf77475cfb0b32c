package graft

import graft.functions.{Vp8, Vp8ProfileJson}
import graft.sources.Ivf
import java.nio.file.{Files, Paths}

/** User-facing VP8 decode CLI — the reachable end of the Profile seam
  * ([[graft.functions.Vp8ProfileJson]]): someone holding RFC 6386's
  * appendix constants decodes a libvpx-encoded IVF file without
  * recompiling.
  *
  * {{{
  * runMain graft.RunDecode <profile.json|standin> <input.ivf> <outDir>
  * runMain graft.RunDecode dump-standin <out.json>
  * }}}
  *
  * Decodes the stream (keyframes re-anchor; inter frames ride the
  * LAST/GOLDEN/ALTREF buffers and the §9.7 entropy state through one
  * [[Vp8.Ctx]]) and writes:
  *  - `frames.jsonl` — one line per frame: index, keyframe flag,
  *    dimensions, Σluma, Σchroma;
  *  - `frame0.pgm` — the first frame's Y plane as binary PGM (a
  *    pixel-level artifact any image viewer opens).
  * `dump-standin` writes the stand-in profile as JSON — the editable
  * template for dropping in the real appendix tables. */
object RunDecode {
  def main(args: Array[String]): Unit = args.toSeq match {
    case Seq("dump-standin", out) =>
      Files.write(Paths.get(out),
        Vp8ProfileJson.render(Vp8.Profile.StandIn).getBytes("UTF-8"))
      println(s"""{"dumped":"$out"}""")
    case Seq(profileArg, input, outDir) =>
      val profile =
        if (profileArg == "standin") Vp8.Profile.StandIn
        else Vp8ProfileJson.parse(new String(
          Files.readAllBytes(Paths.get(profileArg)), "UTF-8"))
      val bytes = Files.readAllBytes(Paths.get(input))
      val (hdr, frames) = Ivf.demux(bytes)
      require(hdr.fourcc == "VP80",
        s"RunDecode: ${hdr.fourcc} is not a VP8 IVF stream")
      val cx = new Vp8.Ctx(profile)
      val decoded = Vp8.decodeStream(frames.map(_._2.payload), ctx = cx)
      Files.createDirectories(Paths.get(outDir))
      val lines = decoded.zipWithIndex.map { case (f, i) =>
        val luma = f.y.iterator.map(_.toLong).sum
        val chroma = f.u.iterator.map(_.toLong).sum +
          f.v.iterator.map(_.toLong).sum
        s"""{"frame":$i,"keyframe":${f.keyframe},"width":${f.width},""" +
          s""""height":${f.height},"luma_sum":$luma,""" +
          s""""chroma_sum":$chroma}"""
      }
      Files.write(Paths.get(outDir, "frames.jsonl"),
        (lines.mkString("\n") + "\n").getBytes("UTF-8"))
      val f0 = decoded.head
      val pgm = new java.io.ByteArrayOutputStream()
      pgm.write(s"P5\n${f0.width} ${f0.height}\n255\n".getBytes("US-ASCII"))
      f0.y.foreach(p => pgm.write(p))
      Files.write(Paths.get(outDir, "frame0.pgm"), pgm.toByteArray)
      println(s"""{"frames":${decoded.length},""" +
        s""""width":${f0.width},"height":${f0.height},""" +
        s""""out":"$outDir"}""")
    case other =>
      System.err.println(
        "usage: RunDecode <profile.json|standin> <input.ivf> <outDir>" +
          "\n   or: RunDecode dump-standin <out.json>")
      sys.exit(2)
  }
}
