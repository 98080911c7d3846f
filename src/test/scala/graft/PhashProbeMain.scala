package graft.operators

/** r9 dev probe: pin the deterministic pHash fixture values the
  * multimodal_phash gate and MultimodalSpec use. */
object PhashProbeMain {
  def main(args: Array[String]): Unit = {
    def ph(b: Array[Byte]): Long = Multimodal.phash64(b).get
    def gray(l: Double): Int = {
      val v = math.max(0, math.min(255, l.toInt)); (v << 16) | (v << 8) | v
    }
    val g1 = (x: Int, y: Int) => gray(128 + 60 * math.sin(x / 3.0) *
      math.cos(y / 5.0) + 30 * math.sin((x + 2 * y) / 7.0))
    val g1n = (x: Int, y: Int) => {
      val base = g1(x, y) & 0xFF
      gray(base + (if (x < 20) 35 else 0) + (if (y > 44) -25 else 0))
    }
    val g2 = (x: Int, y: Int) => gray(128 + 60 * math.sin(y / 4.0) *
      math.cos(x / 6.0) + 30 * math.cos((2 * x + y) / 5.0))
    val g3 = (x: Int, y: Int) =>
      if (((x / 8) + (y / 8)) % 2 == 0) 0xFFFFFF else 0
    val a = ph(graft.TestMedia.image(64, 64, "png", g1))
    val ab = ph(graft.TestMedia.image(64, 64, "bmp", g1))
    val an = ph(graft.TestMedia.image(64, 64, "png", g1n))
    val b = ph(graft.TestMedia.image(64, 64, "png", g2))
    val c = ph(graft.TestMedia.image(64, 64, "png", g3))
    val aj = ph(graft.TestMedia.image(64, 64, "jpg", g1))
    def hd(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    println(s"PH a=$a ab=$ab an=$an b=$b c=$c")
    println(s"PH d(a,ab)=${hd(a, ab)} d(a,an)=${hd(a, an)} " +
      s"d(a,b)=${hd(a, b)} d(a,c)=${hd(a, c)} d(b,c)=${hd(b, c)} " +
      s"d(an,b)=${hd(an, b)} d(an,c)=${hd(an, c)} d(ab,an)=${hd(ab, an)} " +
      s"d(a,aj)=${hd(a, aj)} d(aj,b)=${hd(aj, b)} d(aj,c)=${hd(aj, c)}")
    println("PH undecodable=" + Multimodal.phash64("junk".getBytes))
  }
}
