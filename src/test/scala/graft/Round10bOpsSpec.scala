package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 second wave: dHash perceptual hashing (brightness
  * invariance, bounded bit flips, sentinel on corrupt payloads) and
  * integer-factor audio decimation through the real codec both ways.
  */
class Round10bOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def png(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] =
    Multimodal.encodeGrayPng(w, h, pix)

  test("dHash63 is non-negative and deterministic") {
    val p = png(20, 15, (x, y) => (x * 31 + y * 7) % 200)
    val h1 = Multimodal.dHash63(p)
    val h2 = Multimodal.dHash63(p)
    assert(h1.isDefined && h1 == h2)
    assert(h1.get._1 >= 0L, "63-bit hash must never set the sign bit")
    assert(h1.get._2 == 20 && h1.get._3 == 15, "dims ride the decode")
  }

  test("dHash63 is invariant under a uniform brightness shift") {
    // +40 with no mod-256 wrap: every comparison is preserved
    val base = png(16, 14, (x, y) => (x * 13 + y * 29) % 200)
    val brighter = png(16, 14, (x, y) => (x * 13 + y * 29) % 200 + 40)
    assert(Multimodal.dHash63(base) == Multimodal.dHash63(brighter))
  }

  test("single-pixel change flips at most 2 bits") {
    def pix(x: Int, y: Int) = (x * 13 + y * 29) % 200
    val w = 16; val h = 18
    val a = Multimodal.dHash63(png(w, h, pix)).get._1
    // perturb the source pixel grid cell (3, 4) samples
    val px = 3 * w / 8; val py = 4 * h / 9
    val b = Multimodal.dHash63(png(w, h,
      (x, y) => pix(x, y) + (if (x == px && y == py) 50 else 0))).get._1
    assert(java.lang.Long.bitCount(a ^ b) <= 2)
  }

  test("dHash63 distinguishes unrelated non-linear patterns") {
    val a = Multimodal.dHash63(png(16, 16,
      (x, y) => ((x * 7 + y * 13 + 5) * (x + y + 3)) % 181)).get._1
    val b = Multimodal.dHash63(png(16, 16,
      (x, y) => ((x * 7 + y * 13 + 99991) * (x + y + 3)) % 181)).get._1
    assert(java.lang.Long.bitCount(a ^ b) > 8,
      s"unrelated patterns too close: ${java.lang.Long.bitCount(a ^ b)}")
  }

  test("dHash63 sentinels on corrupt payloads") {
    assert(Multimodal.dHash63("not an image".getBytes).isEmpty)
    assert(Multimodal.dHash63(Array.emptyByteArray).isEmpty)
  }

  test("dHashImages: distributed hashing keeps one row per asset") {
    val rows = (0L until 12L).map { id =>
      val payload =
        if (id % 4 == 0) s"junk$id".getBytes
        else png(12, 12, (x, y) => (x + 3 * y + id.toInt * 17) % 200)
      (id, payload)
    }
    val out = Multimodal.dHashImages(
      rows.toDF("asset_id", "payload").repartition(3)).collect()
    assert(out.length == 12)
    assert(out.count(!_.ok) == 3)
    assert(out.filter(_.ok).forall(_.phash >= 0L))
  }

  test("phashBandMasks: planted near-dups at threshold always collide") {
    val rnd = new scala.util.Random(42)
    for {
      n <- Seq(10L, 6000L, 1000000L, 1000000000L, 1000000000000L)
      t <- 0 to 3
    } {
      val masks = graft.dedup.Dedup.phashBandMasks(n, t)
      // the layout covers every signature bit (no blind spot a flipped
      // bit could hide in forever) and stays inside the 63-bit range
      assert(masks.reduce(_ | _) == (1L << 63) - 1L,
        s"n=$n t=$t masks do not cover all 63 bits")
      assert(masks.forall(m => m > 0L),
        s"n=$n t=$t produced an empty or sign-bit band")
      // pigeonhole recall, property-tested: flip EXACTLY t random bits
      // and the pair must still share at least one full band
      (0 until 200).foreach { _ =>
        val a = rnd.nextLong() & ((1L << 63) - 1L)
        val flips = rnd.shuffle((0 until 63).toList).take(t)
        val b = flips.foldLeft(a)((h, i) => h ^ (1L << i))
        assert(masks.exists(m => (a & m) == (b & m)),
          s"n=$n t=$t: pair at Hamming $t missed every band")
      }
    }
  }

  test("phashBandMasks widens with the corpus, legacy layout at test SF") {
    // at verify scale (documents ≲ 10⁴) the derivation must land on the
    // legacy 3 × 21-bit layout, so committed oracles are bit-identical
    val small = graft.dedup.Dedup.phashBandMasks(6000L, 2)
    assert(small.toSet == Set(0x1FFFFFL, 0x1FFFFFL << 21, 0x1FFFFFL << 42))
    // a web-scale corpus gets strictly wider bands (and more of them):
    // n²/2^bits collision control converted from scale note to code
    val big = graft.dedup.Dedup.phashBandMasks(1000000000000L, 2)
    def minBits(ms: Seq[Long]) = ms.map(java.lang.Long.bitCount).min
    assert(minBits(big) > minBits(small) && big.size > small.size)
    assert(minBits(big) >= 48,
      "10^12-asset layout must hold n^2 collisions: >=48-bit bands")
    // monotone: more corpus never narrows the bands
    val mid = graft.dedup.Dedup.phashBandMasks(1000000L, 2)
    assert(minBits(mid) >= minBits(small) && minBits(big) >= minBits(mid))
  }

  test("decimatePcm16Mono keeps every 4th sample through the real codec") {
    val samples = Array.tabulate(23)(i => ((i * 997) % 2001 - 1000).toShort)
    val wav = Multimodal.encodePcm16Wav(8000, samples)
    val out = Multimodal.decimatePcm16Mono(wav, factor = 4, outRate = 2000)
    assert(out.isDefined)
    val m = Multimodal.decodeAudioMeta(1L, out.get)
    assert(m.ok && m.sample_rate == 2000L && m.channels == 1L)
    val expect = samples.indices.filter(_ % 4 == 0).map(samples(_).toLong)
    assert(m.n_samples == expect.length.toLong) // ceil(23/4) = 6
    assert(m.sum_sample == expect.sum)
    assert(m.peak_abs == expect.map(math.abs).max)
  }

  test("decimatePcm16Mono rejects corrupt and non-mono payloads") {
    assert(Multimodal.decimatePcm16Mono("junk".getBytes, 4, 2000).isEmpty)
    // stereo 16-bit PCM: featured path is mono-only by contract
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val raw = new Array[Byte](64)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, 16L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    assert(Multimodal.decimatePcm16Mono(bos.toByteArray, 4, 2000).isEmpty)
  }

  test("scene structure survives the real AVI mux+demux round-trip") {
    // 4 frames, 2 scenes: pixels constant within a scene, jump at f=2
    val avi = Multimodal.encodeAviRawGray(8, 6, 4,
      (f, x, y) => (x + y + 90 * (f / 2)) % 200)
    val frames = Multimodal.decodeVideoFrames(
        Seq((5L, avi)).toDF("asset_id", "payload"))
      .collect().sortBy(_.frame_idx)
    assert(frames.length == 4 && frames.forall(_.ok))
    assert(frames(0).luma_sum == frames(1).luma_sum)
    assert(frames(2).luma_sum == frames(3).luma_sum)
    assert(frames(1).luma_sum != frames(2).luma_sum,
      "scene boundary must change the frame luma sum")
  }

  test("token surprisal: corpus tf join on a hand-checked tiny corpus") {
    val docs = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    // corpus tf: a=3, b=1, c=1
    val tok = docs.as[(Long, String)]
      .flatMap { case (id, t) => t.split(" ", -1).map(w => (id, w)) }
      .toDF("doc_id", "tk")
    val tf = tok.groupBy($"tk").agg(count(lit(1)).as("ctf"))
    val out = tok.join(tf, "tk").groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct($"tk").as("n_types"),
        sum($"ctf").as("sum_ctf"), min($"ctf").as("min_ctf"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((3L, 2L, 7L, 1L))) // a+b+a = 3+1+3
    assert(out(2L) == ((2L, 2L, 4L, 1L))) // a+c = 3+1
  }

  test("canonicalizeUrl: hand-checked rules") {
    val cases = Seq(
      "HTTPS://WWW.Ex.COM:443/A//b/?utm_source=x&b=2&a=1#frag" ->
        "https://www.ex.com/A/b?a=1&b=2",
      "http://H.io:8080//x/" -> "http://h.io:8080/x",
      "http://H.io:80/x" -> "http://h.io/x",
      "https://h.io" -> "https://h.io/",
      "https://h.io/p?utm_a=1&fbclid=z&gclid=q" -> "https://h.io/p")
    val got = cases.map(_._1).toDF("url")
      .select(graft.text.TextOps.canonicalizeUrl($"url").as("c"))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("canonicalizeUrl is idempotent on messy and random URLs") {
    val rnd = new scala.util.Random(7)
    val urls = (1 to 200).map { i =>
      val scheme = if (rnd.nextBoolean()) "HTTPS" else "http"
      val port = Seq("", ":443", ":80", ":9090")(rnd.nextInt(4))
      val slashes = Seq("/", "//", "///")(rnd.nextInt(3))
      val trail = if (rnd.nextBoolean()) "/" else ""
      val params = rnd.shuffle(Seq(s"a=$i", "utm_x=1", "z=9", "fbclid=f")
        .take(1 + rnd.nextInt(4))).mkString("&")
      val frag = if (rnd.nextBoolean()) s"#s$i" else ""
      s"$scheme://HoSt$i.Example.COM$port${slashes}P$i$trail?$params$frag"
    }
    val df = urls.toDF("url")
      .select(graft.text.TextOps.canonicalizeUrl($"url").as("c1"))
      .select($"c1",
        graft.text.TextOps.canonicalizeUrl($"c1").as("c2"))
    assert(df.filter($"c1" =!= $"c2").count() == 0L,
      "re-canonicalizing a canonical URL must be a no-op")
  }

  test("audioEnergyWindows: exact window sums incl. partial last window") {
    // 10 samples, window 4 → windows of 4/4/2
    val samples = Array[Short](100, -200, 300, -400, 5, -5, 5, -5, 7, -7)
    val wav = Multimodal.encodePcm16Wav(8000, samples)
    val out = Multimodal.audioEnergyWindows(
        Seq((3L, wav)).toDF("asset_id", "payload"), 4)
      .collect().sortBy(_.w)
    assert(out.map(_.w).toSeq == Seq(0L, 1L, 2L))
    assert(out.forall(_.ok))
    assert(out.map(_.sum_abs).toSeq == Seq(1000L, 20L, 14L))
    // corrupt payload → one sentinel row
    val bad = Multimodal.audioEnergyWindows(
      Seq((4L, "junk".getBytes)).toDF("asset_id", "payload"), 4).collect()
    assert(bad.length == 1 && !bad(0).ok && bad(0).w == -1L)
  }

  test("resampleAudio: corrupt inputs flow through as sentinel rows") {
    val rows = Seq(
      (1L, Multimodal.encodePcm16Wav(8000,
        Array.tabulate(9)(i => (i * 100).toShort))),
      (2L, "not audio".getBytes))
    val out = Multimodal.resampleAudio(
        rows.toDF("asset_id", "payload"), 4, 2000)
      .collect().sortBy(_.asset_id)
    assert(out(0).ok && out(0).payload.nonEmpty)
    assert(!out(1).ok && out(1).payload.isEmpty)
    // the resampled payload decodes to ceil(9/4) = 3 samples
    assert(Multimodal.decodeAudioMeta(1L, out(0).payload).n_samples == 3L)
  }
}
