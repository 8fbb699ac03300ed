package graft

import java.nio.file.{Files, Paths}
import graft.operators.Multimodal

/** One-shot generator for the committed JPEG fixture set under
  * `fixtures/jpeg/` (r13): 16 real JPEG files encoded at quality 0.95 from
  * the [[Multimodal.jpegRaster]] formula, plus one adversarially truncated
  * file (`img_corrupt.jpg` — valid SOI marker, body cut mid-stream) for the
  * dirty-corpus arm. The files are committed; `q_jpeg_decode`'s oracle
  * restates their decoded (dims, channels, dHash) as literals — JPEG is
  * lossy, so the raster formula itself is not SQL-restatable, but the
  * decode invariants are (see [[Multimodal.imageMeta]]).
  *
  * Rerun (`sbt "runMain graft.JpegFixtureGen"`) only to regenerate the set;
  * the gate reads the committed bytes, not this generator.
  */
object JpegFixtureGen {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get(args.headOption.getOrElse("fixtures/jpeg"))
    Files.createDirectories(dir)
    (0L until 16L).foreach { id =>
      Files.write(dir.resolve(f"img_$id%02d.jpg"),
        Multimodal.encodeJpeg(Multimodal.jpegRaster(id)))
    }
    Files.write(dir.resolve("img_corrupt.jpg"),
      Multimodal.encodeJpeg(Multimodal.jpegRaster(0L)).take(24))
    println(s"[jpeg-fixtures] wrote 17 files to $dir")
  }
}

/** GIF twin of [[JpegFixtureGen]] (r14): same 16 rasters, committed under
  * `fixtures/gif/` — GIF's palette makes the encode LOSSLESS for the
  * 9-gray formula, so `q_gif_decode`'s oracle restates the raster formula
  * exactly (see [[Multimodal.encodeGif]]). The corrupt file carries a valid
  * `GIF89a` signature with the body truncated mid-header.
  */
object GifFixtureGen {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get(args.headOption.getOrElse("fixtures/gif"))
    Files.createDirectories(dir)
    (0L until 16L).foreach { id =>
      Files.write(dir.resolve(f"img_$id%02d.gif"),
        Multimodal.encodeGif(Multimodal.jpegRaster(id)))
    }
    Files.write(dir.resolve("img_corrupt.gif"),
      Multimodal.encodeGif(Multimodal.jpegRaster(0L)).take(10))
    println(s"[gif-fixtures] wrote 17 files to $dir")
  }
}
