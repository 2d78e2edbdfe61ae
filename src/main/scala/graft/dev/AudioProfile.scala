package graft.dev

import graft.operators.Multimodal.WavCodec

/**
 * Dev micro-profile of the [[WavCodec]] per-blob cost split:
 * encode vs header-parse (audioMeta) vs full decode (decodeFeatures).
 * The multimodal_audio catalog entry does all three per row, so its
 * scaling story is per-blob-cost × rows; this isolates which stage
 * owns the milliseconds (r9: AudioSystem registry scans were the
 * suspect — r10 caches the SPI provider lists once per JVM).
 *
 *   sbt "runMain graft.dev.AudioProfile"
 */
object AudioProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val wavs = Array.tabulate(64) { i =>
      WavCodec.encodeWav(Array.fill(((i % 100) + 2) * 8)(((i % 9) + 1) / 10.0f), 8000)
    }
    def time(name: String)(f: Int => Unit): Unit = {
      var i = 0
      while (i < n / 4) { f(i); i += 1 } // warm
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { f(i); i += 1 }
      val us = (System.nanoTime() - t0) / 1e3 / n
      println(f"[audio-profile] $name%-16s $us%8.2f us/blob")
    }
    time("encodeWav")(i => WavCodec.encodeWav(
      Array.fill(((i % 100) + 2) * 8)(((i % 9) + 1) / 10.0f), 8000))
    time("audioMeta")(i => WavCodec.audioMeta(wavs(i % 64)))
    time("decodeFeatures")(i => WavCodec.decodeFeatures(wavs(i % 64), 4))
  }
}
