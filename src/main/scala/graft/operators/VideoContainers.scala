package graft.operators

import java.io.ByteArrayOutputStream

/** Pluggable video CONTAINER seam — the codec boundary
  * [[Multimodal]]'s scaladoc promises: demuxing is behind one
  * interface, detected from the payload's magic bytes, and everything
  * downstream (feature extraction, frame sampling, frame→image
  * composition) is container-agnostic. Two REAL demuxers prove the
  * seam:
  *
  *   - [[Gfv1]] — the documented minimal container (magic + frame
  *     interval + length-prefixed PNG frames).
  *   - [[AviMjpeg]] — Motion-JPEG in a standard RIFF/AVI container:
  *     a real-world format, parsed with a genuine RIFF chunk walk
  *     (`avih` main header for the frame interval, `00dc`/`00db`
  *     stream chunks for the JPEG frames), pure JVM. [[encodeAviMjpeg]]
  *     writes a spec-conformant file (RIFF/hdrl/strl/movi/idx1), so
  *     the round-trip is through honest bytes, not a private mirror
  *     format.
  *
  * A demuxer returns `(frameMs, frames)` where each frame is an
  * encoded image decodable by `javax.imageio` — containers disagree
  * about packaging, not about what a frame is. Adding MP4/H.264 when a
  * native codec is available means adding one object here; nothing
  * else changes (the seam [[graft.OperatorsSpec]] pins).
  */
object VideoContainers {

  trait VideoDemuxer {
    def name: String
    /** Cheap magic-byte sniff — false means "not mine", try the next. */
    def detect(payload: Array[Byte]): Boolean
    /** Full parse; None on malformed payloads (data, not an error). */
    def demux(payload: Array[Byte]): Option[(Int, Array[Array[Byte]])]
  }

  object Gfv1 extends VideoDemuxer {
    val name = "gfv1"
    def detect(p: Array[Byte]): Boolean =
      p.length >= 12 && p(0) == 'G' && p(1) == 'F' && p(2) == 'V' && p(3) == '1'
    def demux(p: Array[Byte]): Option[(Int, Array[Array[Byte]])] = Multimodal.parseGfv(p)
  }

  /** RIFF/AVI with MJPG video chunks. The demux is a standards-shaped
    * chunk walk: RIFF lists are (fourcc, size, type, children…), data
    * chunks are (fourcc, size, bytes, even-padding). Frame interval
    * comes from `avih`'s dwMicroSecPerFrame; frames are the payloads of
    * `##dc`/`##db` chunks inside the `movi` list (any stream number —
    * we carry one video stream).
    */
  object AviMjpeg extends VideoDemuxer {
    val name = "avi-mjpeg"

    def detect(p: Array[Byte]): Boolean =
      p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'A' && p(9) == 'V' && p(10) == 'I' && p(11) == ' '

    def demux(p: Array[Byte]): Option[(Int, Array[Array[Byte]])] = {
      if (!detect(p)) return None
      val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var usPerFrame = 0
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def fourcc(): String = {
        val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
      }
      // walk chunks in [start, end); LISTs recurse, data chunks are read
      // or skipped; any structural violation aborts the whole parse
      def walk(end: Int): Boolean = {
        while (bb.position() < end) {
          if (end - bb.position() < 8) return false
          val cc = fourcc()
          val size = bb.getInt
          if (size < 0 || bb.position() + size > end) return false
          val next = bb.position() + size + (size & 1) // chunks pad to even
          if (cc == "LIST") {
            if (size < 4) return false
            fourcc() // list type (hdrl/strl/movi/…) — children self-describe
            if (!walk(bb.position() + size - 4)) return false
          } else if (cc == "avih") {
            if (size < 4) return false
            usPerFrame = bb.getInt
          } else if (cc.length == 4 && cc.charAt(2) == 'd' &&
            (cc.charAt(3) == 'c' || cc.charAt(3) == 'b')) {
            val a = new Array[Byte](size)
            bb.get(a)
            frames += a
          }
          bb.position(next)
        }
        true
      }
      bb.position(4)
      val riffSize = bb.getInt
      bb.position(12) // past "AVI "
      val end = math.min(p.length, 8 + riffSize)
      if (!walk(end) || usPerFrame <= 0 || frames.isEmpty) None
      else Some((usPerFrame / 1000, frames.toArray))
    }
  }

  /** Detection order: cheap magic sniffs, first match wins. */
  val demuxers: Seq[VideoDemuxer] = Seq(Gfv1, AviMjpeg)

  /** THE seam: route a payload to whichever container claims it. */
  def demux(payload: Array[Byte]): Option[(Int, Array[Array[Byte]])] =
    demuxers.find(_.detect(payload)).flatMap(_.demux(payload))

  /** Encode JPEG frames as a minimal spec-conformant MJPEG AVI
    * (RIFF → hdrl(avih, strl(strh, strf)) → movi(00dc…) → idx1).
    * Frames must already be JPEG bytes (`Multimodal.encodeJpeg`).
    */
  def encodeAviMjpeg(frames: Seq[Array[Byte]], frameMs: Int, w: Int, h: Int): Array[Byte] = {
    require(frames.nonEmpty && frameMs > 0)
    val bos = new ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] = {
      val a = new Array[Byte](4)
      a(0) = (v & 0xff).toByte; a(1) = ((v >> 8) & 0xff).toByte
      a(2) = ((v >> 16) & 0xff).toByte; a(3) = ((v >> 24) & 0xff).toByte
      a
    }
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(fourcc: String, body: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(cc(fourcc)); out.write(le32(body.length)); out.write(body)
      if ((body.length & 1) == 1) out.write(0) // even padding
      out.toByteArray
    }
    def list(listType: String, children: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(cc("LIST")); out.write(le32(children.length + 4))
      out.write(cc(listType)); out.write(children)
      out.toByteArray
    }
    val avih = {
      val b = new ByteArrayOutputStream()
      b.write(le32(frameMs * 1000)) // dwMicroSecPerFrame
      b.write(le32(0)); b.write(le32(0)); b.write(le32(0)) // maxBytesPerSec, padding, flags
      b.write(le32(frames.length)) // dwTotalFrames
      b.write(le32(0)); b.write(le32(1)); b.write(le32(0)) // initialFrames, streams, bufSize
      b.write(le32(w)); b.write(le32(h))
      (0 until 4).foreach(_ => b.write(le32(0))) // reserved
      b.toByteArray
    }
    val strh = {
      val b = new ByteArrayOutputStream()
      b.write(cc("vids")); b.write(cc("MJPG"))
      b.write(le32(0)); b.write(le32(0)); b.write(le32(0)) // flags, prio+lang, initialFrames
      b.write(le32(frameMs)); b.write(le32(1000)) // scale/rate = frames per 1000/frameMs s
      b.write(le32(0)); b.write(le32(frames.length)) // start, length
      b.write(le32(0)); b.write(le32(-1)); b.write(le32(0)) // bufSize, quality, sampleSize
      // rcFrame: 4 × int16 (left, top, right, bottom)
      b.write(le32(0)); b.write(le32((w & 0xffff) | ((h & 0xffff) << 16)))
      b.toByteArray
    }
    val strf = {
      val b = new ByteArrayOutputStream()
      b.write(le32(40)); b.write(le32(w)); b.write(le32(h)) // BITMAPINFOHEADER
      b.write(le32((24 << 16) | 1)) // planes=1, bitcount=24
      b.write(cc("MJPG")) // biCompression
      b.write(le32(w * h * 3))
      (0 until 4).foreach(_ => b.write(le32(0)))
      b.toByteArray
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val moviChildren = frames.flatMap(f => chunk("00dc", f)).toArray
    val movi = list("movi", moviChildren)
    // idx1: one entry per frame — offset is relative to the movi list's
    // 'movi' fourcc position, per the spec players actually agree on
    val idx1 = {
      val b = new ByteArrayOutputStream()
      var off = 4
      frames.foreach { f =>
        b.write(cc("00dc")); b.write(le32(0x10)) // AVIIF_KEYFRAME
        b.write(le32(off)); b.write(le32(f.length))
        off += 8 + f.length + (f.length & 1)
      }
      b.toByteArray
    }
    val riffBody = cc("AVI ") ++ hdrl ++ movi ++ chunk("idx1", idx1)
    bos.write(cc("RIFF")); bos.write(le32(riffBody.length)); bos.write(riffBody)
    bos.toByteArray
  }
}
