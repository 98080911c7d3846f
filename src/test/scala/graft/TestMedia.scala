package graft

import java.io.ByteArrayOutputStream

/** Test-fixture builders for real media payloads: a minimal valid
  * ISO-BMFF (MP4) box tree assembled by hand from the public spec —
  * moov → trak → [tkhd, mdia → minf → stbl → stts]. */
object TestMedia {

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(be32(8 + payload.length))
    bos.write(tpe.getBytes("US-ASCII"))
    bos.write(payload)
    bos.toByteArray
  }

  /** Minimal MP4 with one video track: tkhd v0 carrying 16.16 fixed-point
    * dimensions, stts carrying the sample (frame) counts. */
  def mp4(width: Int, height: Int, frameCounts: Seq[Int]): Array[Byte] = {
    val tkhd = {
      val bos = new ByteArrayOutputStream()
      bos.write(be32(0))                   // version 0 + flags
      (1 to 5).foreach(_ => bos.write(be32(0))) // ctime mtime trackid rsvd duration
      bos.write(new Array[Byte](8))        // reserved
      bos.write(new Array[Byte](2 + 2 + 2 + 2)) // layer altgroup volume rsvd
      bos.write(new Array[Byte](36))       // matrix
      bos.write(be32(width << 16))         // 16.16 width
      bos.write(be32(height << 16))        // 16.16 height
      box("tkhd", bos.toByteArray)
    }
    val stts = {
      val bos = new ByteArrayOutputStream()
      bos.write(be32(0))                   // version + flags
      bos.write(be32(frameCounts.size))    // entry_count
      frameCounts.foreach { c => bos.write(be32(c)); bos.write(be32(1000)) }
      box("stts", bos.toByteArray)
    }
    val stbl = box("stbl", stts)
    val minf = box("minf", stbl)
    val mdia = box("mdia", minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", trak)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    ftyp ++ moov
  }
}
