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
  * runMain graft.RunDecode <profile.json|standin> <input.ivf|.webm> <outDir>
  * runMain graft.RunDecode dump-standin <out.json>
  * }}}
  *
  * Inputs: IVF (fourcc VP80), or WebM/Matroska with a V_VP8 video
  * track (the reference's daily artifact — SimpleBlock payloads, the
  * container keyframe flag cross-checked against each payload's
  * frame_type bit).
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
      val payloads: Seq[Array[Byte]] =
        if (input.endsWith(".webm") || input.endsWith(".mkv")) {
          val (tracks, blocks) = graft.sources.Mkv.demux(bytes)
          val video = tracks.find(_.codecId == "V_VP8").getOrElse(
            sys.error("RunDecode: no V_VP8 track in the container"))
          val vBlocks = blocks.filter(_.track == video.number)
          vBlocks.foreach { b =>
            require(Ivf.parseVp8Tag(b.payload).keyframe == b.keyframe,
              "RunDecode: container keyframe flag disagrees with the " +
                "payload's frame_type bit")
          }
          vBlocks.map(_.payload)
        } else {
          val (hdr, frames) = Ivf.demux(bytes)
          require(hdr.fourcc == "VP80",
            s"RunDecode: ${hdr.fourcc} is not a VP8 IVF stream")
          frames.map(_._2.payload)
        }
      val cx = new Vp8.Ctx(profile)
      val decoded = Vp8.decodeStream(payloads, ctx = cx)
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
