package graft.tools

import graft.ops.Multimodal

/** Dev probe: aligned mean bit-hamming between audio fingerprint twins
  * (volume-scaled / resampled copies) vs different material — pins the
  * audioFingerprintPairs thresholds; keep for fixture re-tuning. */
object AudioFpProbe {
  def main(args: Array[String]): Unit = {
    def fp(b: Array[Byte]) = Multimodal.audioFingerprint(b).get
    def meanBits(a: Array[Int], b: Array[Int]): Double = {
      require(a.length == b.length, s"len ${a.length} vs ${b.length}")
      a.zip(b).map { case (x, y) => java.lang.Integer.bitCount(x ^ y) }.sum
        .toDouble / a.length
    }
    val chords = Seq(
      Seq(440.0 -> 1.0, 554.4 -> 0.7, 659.3 -> 0.5),
      Seq(523.3 -> 1.0, 659.3 -> 0.6, 784.0 -> 0.8),
      Seq(349.2 -> 0.9, 440.0 -> 0.4, 880.0 -> 0.7),
      Seq(392.0 -> 1.0, 493.9 -> 0.9, 587.3 -> 0.3))
    val base = chords.map(c => fp(Multimodal.syntheticChordWav(c, 3.0, 8000)))
    val volTwin = chords.map(c => fp(Multimodal.syntheticChordWav(
      c.map { case (f, a) => (f, a * 0.55) }, 3.0, 8000)))
    val rsTwin = chords.map(c => fp(Multimodal.syntheticChordWav(c, 3.0, 16000)))
    println("lens base=" + base.map(_.length).mkString(",") +
      " rs=" + rsTwin.map(_.length).mkString(","))
    println("twin-volume meanBits: " +
      base.zip(volTwin).map { case (a, b) => f"${meanBits(a, b)}%.2f" }.mkString(","))
    if (base.map(_.length) == rsTwin.map(_.length))
      println("twin-resample meanBits: " +
        base.zip(rsTwin).map { case (a, b) => f"${meanBits(a, b)}%.2f" }.mkString(","))
    val cross = for (i <- base.indices; j <- base.indices if i < j)
      yield meanBits(base(i), base(j))
    println("cross-chord meanBits: " + cross.map(x => f"$x%.2f").mkString(","))
  }
}
