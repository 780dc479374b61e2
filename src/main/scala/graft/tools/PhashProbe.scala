package graft.tools

import graft.ops.Multimodal

/** Dev probe: hamming distances between sinusoid fixture candidates —
  * twins (same field, different raster/brightness) vs cross-family. Used
  * to pin the mm_phash_pairs thresholds; keep for fixture re-tuning. */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    def hash(b: Array[Byte]): Long = Multimodal.dHash64(b).get
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val fams = (0 until 8).map { k =>
      val fx = 1.0 + (k % 4)
      val fy = 0.5 + (k / 4) * 1.5
      val ph = k * 0.9
      (k, fx, fy, ph)
    }
    val base = fams.map { case (k, fx, fy, ph) =>
      k -> hash(Multimodal.sinusoidPng(64, 48, fx, fy, ph))
    }.toMap
    val twinR = fams.map { case (k, fx, fy, ph) =>
      k -> hash(Multimodal.sinusoidPng(32, 24, fx, fy, ph))
    }.toMap
    val twinB = fams.map { case (k, fx, fy, ph) =>
      k -> hash(Multimodal.sinusoidPng(64, 48, fx, fy, ph, brightness = 12))
    }.toMap
    println("twin-resize hammings: " +
      fams.map { case (k, _, _, _) => ham(base(k), twinR(k)) }.mkString(","))
    println("twin-bright hammings: " +
      fams.map { case (k, _, _, _) => ham(base(k), twinB(k)) }.mkString(","))
    val cross = for {
      i <- fams.indices; j <- fams.indices if i < j
    } yield ham(base(i), base(j))
    println(s"cross-family min=${cross.min} " +
      s"all=${cross.sorted.mkString(",")}")
    // noise images vs everything
    val noise = (0 until 4).map(i =>
      hash(Multimodal.syntheticPng(24, 18, 77L + i)))
    val nmin = (for (n <- noise; b <- base.values) yield ham(n, b)).min
    println(s"noise-vs-base min=$nmin")
  }
}
