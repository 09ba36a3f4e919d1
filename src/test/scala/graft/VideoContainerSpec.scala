package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import graft.operators.{Multimodal, VideoContainers}
import graft.operators.Multimodal.{MediaMeta, MediaRecord}

/** The pluggable video-container seam: the SAME frames packaged in two
  * genuinely different containers (GFV1 PNG frames vs standard RIFF/AVI
  * Motion-JPEG) route through one `demux` call and produce consistent
  * temporal features and sampled frames.
  */
class VideoContainerSpec extends SparkSpec {
  import spark.implicits._

  private val W = 64
  private val H = 48
  private val FrameMs = 500
  private val NFrames = 4

  private def frameImage(f: Int): BufferedImage = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < H) {
      var x = 0
      while (x < W) {
        img.setRGB(x, y, (((x * 7 + f * 11) % 256) << 16) |
          (((y * 5 + f * 3) % 256) << 8) | ((x ^ y) + f * 17) % 256)
        x += 1
      }
      y += 1
    }
    img
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream(); ImageIO.write(img, "png", bos); bos.toByteArray
  }

  private def gfv1(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeByte('G'); dos.writeByte('F'); dos.writeByte('V'); dos.writeByte('1')
    dos.writeInt(frames.length); dos.writeInt(FrameMs)
    frames.foreach { f => dos.writeInt(f.length); dos.write(f) }
    dos.flush(); bos.toByteArray
  }

  private val images = (0 until NFrames).map(frameImage)
  private val gfvPayload = gfv1(images.map(png))
  private val aviPayload = VideoContainers.encodeAviMjpeg(
    images.map(Multimodal.encodeJpeg), FrameMs, W, H)

  private def rec(id: Long, payload: Array[Byte], mime: String) = MediaRecord(id,
    MediaMeta("video", mime, W, H, NFrames.toLong * FrameMs, 0), payload)

  test("AVI/MJPEG round-trip: encode → detect → demux recovers frame interval and decodable frames") {
    assert(VideoContainers.AviMjpeg.detect(aviPayload) && !VideoContainers.Gfv1.detect(aviPayload))
    val Some((ms, frames)) = VideoContainers.demux(aviPayload): @unchecked
    assert(ms === FrameMs && frames.length === NFrames)
    frames.zipWithIndex.foreach { case (f, i) =>
      val img = ImageIO.read(new ByteArrayInputStream(f))
      assert(img != null, s"frame $i must decode (JPEG via imageio)")
      assert(img.getWidth === W && img.getHeight === H)
    }
  }

  test("seam: identical content in both containers yields consistent temporal features") {
    val ds = Seq(rec(1L, gfvPayload, "video/x-gfv1"), rec(2L, aviPayload, "video/avi")).toDS()
    val by = Multimodal.extractFeatures(ds).collect().map(f => f.media_id -> f.feature).toMap
    val (g, a) = (by(1L), by(2L))
    // container-independent structure: dims, frame count, fps, duration
    (0 to 4).foreach { i => assert(g(i) === a(i), s"feature $i diverged: ${g(i)} vs ${a(i)}") }
    assert(g(2) === NFrames.toFloat && g(3) === 2.0f && g(4) === (NFrames * FrameMs).toFloat)
    // content features survive the lossy JPEG leg: luma/motion close, not hash-fallback garbage
    assert(math.abs(g(5) - a(5)) < 3.0f, s"mean luma diverged: ${g(5)} vs ${a(5)}")
    assert(a(6) > 0f, "AVI frames must show the planted motion")
  }

  test("frameSample is container-agnostic and emits each container's real frame bytes") {
    val ds = Seq(rec(1L, gfvPayload, "video/x-gfv1"), rec(2L, aviPayload, "video/avi")).toDS()
    val rows = Multimodal.frameSample(ds, everyMs = FrameMs)
      .select("media_id", "frame_idx", "frame_bytes").collect()
    assert(rows.count(_.getLong(0) == 1L) === NFrames)
    assert(rows.count(_.getLong(0) == 2L) === NFrames)
    rows.foreach { r =>
      val img = ImageIO.read(new ByteArrayInputStream(r.getAs[Array[Byte]]("frame_bytes")))
      assert(img != null && img.getWidth === W && img.getHeight === H)
    }
    // the two containers carry the same pixels modulo JPEG loss — frame 0
    // of each decodes to similar mean luminance
    def luma(bytes: Array[Byte]): Double = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      val px = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
      px.map(p => (((p >> 16) & 255) * 299 + ((p >> 8) & 255) * 587 + (p & 255) * 114) / 1000).sum
        .toDouble / px.length
    }
    val f0 = rows.filter(r => r.getLong(1) == 0L).map(r =>
      r.getLong(0) -> luma(r.getAs[Array[Byte]]("frame_bytes"))).toMap
    assert(math.abs(f0(1L) - f0(2L)) < 3.0)
  }

  test("malformed containers are data, not errors: truncated AVI falls back, samples no frames") {
    val truncated = aviPayload.take(40)
    val corrupt = rec(9L, truncated, "video/avi")
    val feats = Multimodal.extractFeatures(Seq(corrupt).toDS()).collect()
    assert(feats.length === 1, "corrupt payload must not fail the batch")
    assert(feats.head.feature(2) !== NFrames.toFloat, "must not claim decoded frames")
    assert(Multimodal.frameSample(Seq(corrupt).toDS(), FrameMs).count() === 0)
  }
}
