package graft.tools

import java.nio.file.{Files, Paths}

import graft.ops.Multimodal

/** Writes the checked-in binary test fixtures under src/test/resources so
  * their provenance is reproducible from source (dev tool, run manually):
  *
  *  - `tone_440hz_8k.wav` — 0.5 s, 440 Hz mono sine at 8 kHz, amplitude
  *    0.5, via the real javax.sound.sampled encoder (OpsSpec pins its
  *    waveform physics: RMS = A/√2, ZCR = 2f/sr).
  *  - `clip_640x360_2500ms.mp4` — minimal valid ISO-BMFF container
  *    (ftyp + moov/mvhd timescale 90000 + one trak/tkhd 640×360 + mdat
  *    noise), via [[Multimodal.syntheticMp4]] (OpsSpec pins the parsed
  *    duration/dimensions/track count/brand).
  */
object MakeFixtures {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get(args.headOption.getOrElse("src/test/resources"))
    Files.createDirectories(dir)
    val wav = dir.resolve("tone_440hz_8k.wav")
    if (!Files.exists(wav)) { // keep the committed original byte-stable
      Files.write(wav, Multimodal.syntheticWav(440.0, 0.5))
      println(s"wrote $wav")
    } else println(s"kept existing $wav")
    val mp4 = dir.resolve("clip_640x360_2500ms.mp4")
    Files.write(mp4,
      Multimodal.syntheticMp4(640, 360, 2500L, timescale = 90000,
        mdatLen = 128, seed = 7))
    println(s"wrote $mp4")
    // Perceptual-hash near-dup fixtures: a smooth sinusoid field, its
    // resized twin (MUST pair under dHash), and a different field (must
    // NOT pair). PhashProbe prints the measured hamming separations.
    for ((name, bytes) <- Seq(
        "sin_64x48.png" -> Multimodal.sinusoidPng(64, 48, 2.0, 1.0, 0.7),
        "sin_32x24.png" -> Multimodal.sinusoidPng(32, 24, 2.0, 1.0, 0.7),
        "sin_alt_64x48.png" -> Multimodal.sinusoidPng(64, 48, 3.0, 2.0, 2.1),
        // MJPEG-AVI: real JPEG frames in a RIFF container (OpsSpec pins
        // the parsed header, frame count, and DECODED frame pixels)
        "clip_mjpeg_48x36_6f.avi" ->
          Multimodal.syntheticMjpegAvi(48, 36, nFrames = 6, fps = 10, seed = 3))) {
      val p = dir.resolve(name)
      Files.write(p, bytes)
      println(s"wrote $p")
    }
  }
}
