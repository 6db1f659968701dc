package graft

import graft.multimodal.{AudioDedup, Media}

/** Multimodal plumbing: batch iteration, schema, frame sampling. The
  * codec is a deterministic stub; these tests pin the Spark-side shape a
  * real decoder would inherit. */
class MediaSpec extends SparkSpec {

  private def mediaDs = {
    import spark.implicits._
    spark.createDataset(Seq(
      Media.MediaRow(1L, "image", Array.fill[Byte](130)(7), "a.png", "image/png"),
      Media.MediaRow(2L, "image", Array.fill[Byte](64)(1), "b.png", "image/png"),
      Media.MediaRow(3L, "video", Array.fill[Byte](1024)(2), "c.mp4", "video/mp4")))
  }

  it("decodeFeatures batches per partition and emits typed features") {
    val feats = Media.decodeFeatures(mediaDs, batchSize = 2)
      .collect().sortBy(_.mediaId)
    feats.map(f => (f.mediaId, f.nBytes, f.width, f.height, f.channels)) shouldBe
      Seq((1L, 130L, 3L, 3L, 3L), (2L, 64L, 1L, 2L, 3L), (3L, 1024L, 1L, 17L, 3L))
    all(feats.map(_.signature)) should fullyMatch regex "[0-9a-f]{32}"
  }

  it("decoder sees batches of the configured size") {
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    val counting = new Media.Decoder {
      override def decodeBatch(b: Seq[Media.MediaRow]): Seq[Media.MediaFeatures] = {
        Media.StubDecoder.decodeBatch(b)
      }
    }
    // batch sizing is partition-local; with 1 partition and batch 2 → 2,1
    val one = mediaDs.repartition(1)
    val n = Media.decodeFeatures(one, counting, batchSize = 2).count()
    n shouldBe 3
  }

  it("ImageIoDecoder decodes real PNGs to true geometry through the " +
      "batched path") {
    import spark.implicits._
    def png(w: Int, h: Int, imgType: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, imgType)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val rgb = png(7, 5, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val rgba = png(4, 9, java.awt.image.BufferedImage.TYPE_4BYTE_ABGR)
    val rows = spark.createDataset(Seq(
      Media.MediaRow(1L, "image", rgb, "rgb.png", "image/png"),
      Media.MediaRow(2L, "image", rgba, "rgba.png", "image/png"),
      Media.MediaRow(3L, "image", Array.fill[Byte](40)(9), "bad.png",
        "image/png"))) // not an image: must yield a 0-geometry marker row
    val feats = Media.decodeFeatures(rows, Media.ImageIoDecoder, batchSize = 2)
      .collect().sortBy(_.mediaId)
    feats.map(f => (f.mediaId, f.width, f.height, f.channels)) shouldBe Seq(
      (1L, 7L, 5L, 3L), (2L, 4L, 9L, 4L), (3L, 0L, 0L, 0L))
    feats.map(_.nBytes) shouldBe Seq(rgb.length.toLong, rgba.length.toLong, 40L)
    all(feats.map(_.signature)) should fullyMatch regex "[0-9a-f]{32}"
  }

  it("WavPcmDecoder decodes a real in-memory WAV to true rate/frames/" +
      "energy through the batched path; garbage yields marker rows") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    import spark.implicits._
    // 16-bit mono PCM, 8 kHz, 800 frames of a known square wave
    val nFrames = 800
    val amp = 1000
    val pcm = new Array[Byte](nFrames * 2)
    (0 until nFrames).foreach { i =>
      val s = if (i % 2 == 0) amp else -amp
      pcm(2 * i) = (s & 0xff).toByte          // little-endian lo
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt,
        nFrames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wavBytes = bos.toByteArray
    val rows = Seq(
      Media.MediaRow(1L, "audio", wavBytes, "a.wav", "audio/wav"),
      Media.MediaRow(2L, "audio", Array[Byte](1, 2, 3), "junk.wav",
        "audio/wav"))
    val got = Media.decodeAudioFeatures(rows.toDS(), batchSize = 1)
      .collect().sortBy(_.mediaId)
    got(0).sampleRate shouldBe 8000L
    got(0).channels shouldBe 1L
    got(0).nFrames shouldBe nFrames.toLong
    got(0).durationMs shouldBe 100L // 800 frames / 8 kHz
    got(0).sumSquares shouldBe nFrames.toLong * amp * amp
    got(1).sampleRate shouldBe 0L // undecodable → marker, not a crash
  }

  it("resizeImages rescales every decodable payload to the target " +
      "geometry as PNG; junk passes through with the marker mime") {
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val rows = spark.createDataset(Seq(
      Media.MediaRow(1L, "image", png(7, 5), "a.png", "image/png"),
      Media.MediaRow(2L, "image", png(64, 64), "b.png", "image/png"),
      Media.MediaRow(3L, "image", Array.fill[Byte](40)(9), "bad.png",
        "image/png")))(
      org.apache.spark.sql.Encoders.product[Media.MediaRow])
    val out = Media.resizeImages(rows, 16, 16).collect().sortBy(_.mediaId)
    out.map(_.mimeType) shouldBe Seq("image/png", "image/png",
      "application/octet-stream")
    // resized payloads decode to EXACTLY the target geometry
    out.take(2).foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.content))
      (img.getWidth, img.getHeight) shouldBe ((16, 16))
    }
    // junk passes through byte-identical (marker mime is the signal)
    out(2).content shouldBe Array.fill[Byte](40)(9)
    // PNG re-encode is deterministic: resizing twice is bit-identical
    val again = Media.resizeImages(rows, 16, 16).collect().sortBy(_.mediaId)
    out.map(_.content.toSeq) shouldBe again.map(_.content.toSeq)
  }

  it("sampleFrames chunks video bytes deterministically") {
    import spark.implicits._
    val frames = Media.sampleFrames(
      mediaDs.filter(_.mediaType == "video"), stride = 2)
    // 1024 bytes → 4 chunks of 256; stride 2 keeps idx 0 and 2
    frames.select("frame_idx").as[Long].collect().sorted shouldBe Array(0L, 2L)
  }

  describe("ImageDedup (perceptual-hash near-dup clustering)") {
    import graft.multimodal.ImageDedup

    /** 64×64 PNG from a pixel function (row-major luma 0-255). */
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 64).foreach(x => (0 until 64).foreach { y =>
        val v = f(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      })
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }

    it("aHash/dHash: identical inputs hash identically; inverted " +
        "gradients differ maximally") {
      val ramp = Array.tabulate(64)(i => (i % 8) * 30)
      ImageDedup.aHash64(ramp) shouldBe ImageDedup.aHash64(ramp.clone())
      val ramp9 = Array.tabulate(72)(i => (i % 9) * 25)
      val inv9 = ramp9.map(255 - _)
      val d1 = ImageDedup.dHash64(ramp9)
      val d2 = ImageDedup.dHash64(inv9)
      java.lang.Long.bitCount(d1 ^ d2) shouldBe 64
    }

    it("planted near-identical PNGs cluster together; a distinct image " +
        "stays apart (real ImageIO decode path)") {
      import spark.implicits._
      val base = png((x, _) => x * 4)              // horizontal ramp
      val near = png((x, y) =>                      // same + sparse noise
        x * 4 + (if ((x * 64 + y) % 97 == 0) 6 else 0))
      val far = png((x, _) => 255 - x * 4)          // inverted ramp
      val rows = spark.createDataset(Seq(
        Media.MediaRow(1L, "image", base, "a.png", "image/png"),
        Media.MediaRow(2L, "image", near, "b.png", "image/png"),
        Media.MediaRow(3L, "image", far, "c.png", "image/png"),
        Media.MediaRow(4L, "image", Array.fill[Byte](32)(7), "bad.png",
          "image/png"))) // undecodable: absent from the output
      val got = ImageDedup.nearDupClusters(rows)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      got.keySet shouldBe Set(1L, 2L, 3L)
      got(1L) shouldBe 1L
      got(2L) shouldBe 1L   // near-dup of 1 → min-id label
      got(3L) shouldBe 3L   // own singleton cluster
    }

    it("stubImageHashesSql is bit-identical to the batched StubGrayDecoder " +
        "path and drops null texts (q124 oracle parity)") {
      import spark.implicits._
      val docs = Seq(
        (1L, "hello world"),
        (2L, "hello world"),            // exact dup → identical hashes
        (3L, ""),                       // empty text still fingerprints
        (4L, "héllo wörld ✓"), // multi-byte UTF-8
        (5L, "x" * 500))
        .toDF("doc_id", "text")
      val viaSql = ImageDedup.stubImageHashesSql(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      val viaDecoder = ImageDedup
        .imageHashes(Media.fromDocuments(docs), ImageDedup.StubGrayDecoder)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      viaSql shouldBe viaDecoder
      viaSql(0)._2 shouldBe viaSql(1)._2
      viaSql(0)._3 shouldBe viaSql(1)._3
      // null text = undecodable payload: dropped, not crashed on
      val withNull = docs.unionByName(
        Seq((6L, null: String)).toDF("doc_id", "text"))
      ImageDedup.stubImageHashesSql(withNull).count() shouldBe 5L
      // fused codegen expression ≡ the md5-hex column chain (the form
      // the oracle states), bit for bit
      val viaChain = ImageDedup.stubImageHashesChained(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      viaSql shouldBe viaChain
    }

    it("stub decoder keeps the whole stack deterministic without codecs") {
      import spark.implicits._
      val payload = Array.tabulate[Byte](100)(_.toByte)
      val rows = spark.createDataset(Seq(
        Media.MediaRow(10L, "image", payload, "x.bin", "image/png"),
        Media.MediaRow(11L, "image", payload.clone(), "y.bin", "image/png")))
      val hashes = ImageDedup
        .imageHashes(rows, ImageDedup.StubGrayDecoder)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      // identical bytes → identical perceptual hashes, any decoder
      hashes(0)._2 shouldBe hashes(1)._2
      hashes(0)._3 shouldBe hashes(1)._3
      val clusters = ImageDedup
        .nearDupClusters(rows, ImageDedup.StubGrayDecoder)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      clusters shouldBe Map(10L -> 10L, 11L -> 10L)
    }
  }

  describe("AudioDedup (energy-delta near-dup fingerprints)") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

    def wavOf(samples: Array[Int]): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      samples.indices.foreach { i =>
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt,
          samples.length.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    it("real WAV path: gain-doubled audio fingerprints identically, a " +
        "different envelope diverges; junk and too-short drop") {
      import spark.implicits._
      val n = 6500
      // envelope A: amplitude ramps up across the first 33 windows and
      // back down — a hill-shaped energy profile
      val a = Array.tabulate(n) { i =>
        val w = (i.toLong * 65 / n).toInt
        val amp = 100 + 20 * (if (w < 33) w else 65 - w)
        if (i % 2 == 0) amp else -amp
      }
      // uniform gain x2: every energy scales by exactly 4, all delta
      // signs preserved → identical fingerprint
      val a2 = a.map(_ * 2)
      // envelope B: amplitude alternates high/low per window — deltas
      // flip sign every window, far from A's one-peak profile
      val b = Array.tabulate(n) { i =>
        val w = (i.toLong * 65 / n).toInt
        val amp = if (w % 2 == 0) 2000 else 100
        if (i % 2 == 0) amp else -amp
      }
      val rows = spark.createDataset(Seq(
        Media.MediaRow(1L, "audio", wavOf(a), "a.wav", "audio/wav"),
        Media.MediaRow(2L, "audio", wavOf(a2), "a2.wav", "audio/wav"),
        Media.MediaRow(3L, "audio", wavOf(b), "b.wav", "audio/wav"),
        Media.MediaRow(4L, "audio", Array[Byte](9, 9, 9), "junk.wav",
          "audio/wav"),
        Media.MediaRow(5L, "audio", wavOf(Array.fill(50)(100)), "short.wav",
          "audio/wav")))
      val hashes = AudioDedup.audioHashes(rows)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      hashes.keySet shouldBe Set(1L, 2L, 3L) // junk + short dropped
      hashes(1L) shouldBe hashes(2L)
      java.lang.Long.bitCount(hashes(1L) ^ hashes(3L)) should be > 7
      val (_, clusters) = AudioDedup.nearDupClustersAndHashes(
        AudioDedup.audioHashes(rows))
      val cl = clusters.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      cl(1L) shouldBe cl(2L)
      cl(3L) should not be cl(1L)
    }

    it("stubAudioHashesSql is bit-identical to the Scala stub twin and " +
        "drops null texts (q130 oracle parity)") {
      import spark.implicits._
      val docs = Seq(
        (1L, "hello world"),
        (2L, "hello world"),
        (3L, ""),
        (4L, "héllo wörld ✓"),
        (5L, "x" * 500))
        .toDF("doc_id", "text")
      val viaSql = AudioDedup.stubAudioHashesSql(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val viaScala = docs.collect().map(r => (r.getLong(0),
        AudioDedup.stubHashOf(
          r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))))
        .sortBy(_._1)
      viaSql shouldBe viaScala
      viaSql(0)._2 shouldBe viaSql(1)._2 // exact dup texts
      val withNull = docs.unionByName(
        Seq((6L, null: String)).toDF("doc_id", "text"))
      AudioDedup.stubAudioHashesSql(withNull).count() shouldBe 5L
      // fused codegen expression ≡ the md5-hex column chain (the form
      // the oracle states), bit for bit
      val viaChain = AudioDedup.stubAudioHashesChained(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      viaSql shouldBe viaChain
    }
  }

  describe("VideoDedup (shared-frame near-dup clustering)") {
    import graft.multimodal.VideoDedup

    def videoRow(id: Long, chunks: Seq[Byte]): Media.MediaRow =
      Media.MediaRow(id, "video",
        chunks.toArray.flatMap(b => Array.fill[Byte](256)(b)),
        s"v$id.mp4", "video/mp4")

    it("real byte path: a one-chunk edit and a trimmed copy stay near-" +
        "dups, an unrelated video does not; clusters label by min id") {
      import spark.implicits._
      val a = videoRow(10L, (0 until 8).map(_.toByte))
      val b = videoRow(11L, (0 until 7).map(_.toByte) :+ 99.toByte)
      val c = videoRow(12L, (0 until 8).map(i => (50 + i).toByte))
      val d = videoRow(13L, (0 until 4).map(_.toByte)) // trimmed copy of a
      val media = spark.createDataset(Seq(a, b, c, d))
      val frames = VideoDedup.frameHashes(media, stride = 1)
      val pairs = VideoDedup.nearDupPairs(frames)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      // a~b share 7/8 (87 % ≥ 80); d ⊂ a and d ⊂ b (4/min = 100 %) —
      // c matches nothing
      pairs shouldBe Seq((10L, 11L), (10L, 13L), (11L, 13L))
      val clusters = VideoDedup.nearDupClusters(media, stride = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      clusters shouldBe Seq((10L, 10L), (11L, 10L), (12L, 12L), (13L, 10L))
    }

    it("hot-frame cap drops saturated frame hashes from the candidate " +
        "join (they assert nothing about a pair)") {
      import spark.implicits._
      // three videos share ONE hot chunk; each also has a private chunk
      val media = spark.createDataset(Seq(
        videoRow(1L, Seq[Byte](7, 10)),
        videoRow(2L, Seq[Byte](7, 20)),
        videoRow(3L, Seq[Byte](7, 30))))
      val frames = VideoDedup.frameHashes(media, stride = 1)
      // uncapped: the shared chunk is 1 of min(2,2) = 50 % < 80 → no
      // pairs anyway; at 50 % it WOULD pair — the cap kills it first
      VideoDedup.nearDupPairs(frames, minSharedPct = 50, maxOcc = 2)
        .count() shouldBe 0L
      VideoDedup.nearDupPairs(frames, minSharedPct = 50, maxOcc = 3)
        .count() shouldBe 3L
    }

    it("stubFrameHashesSql is bit-identical to the driver-local twin " +
        "and drops null/empty texts (q131 oracle parity)") {
      import spark.implicits._
      val docs = Seq(
        (1L, "hello world"),
        (2L, "hello world"),
        (3L, ""),
        (4L, "héllo wörld ✓ — мир" * 9),
        (5L, "x" * 500))
        .toDF("doc_id", "text")
      val viaSql = VideoDedup.stubFrameHashesSql(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sortBy(t => (t._1, t._2))
      val viaLocal = docs.collect()
        .filter(r => r.getString(1) != null && r.getString(1).nonEmpty)
        .flatMap(r => VideoDedup.stubFrameHashesLocal(r.getString(1))
          .map { case (i, h) => (r.getLong(0), i, h) })
        .sortBy(t => (t._1, t._2))
      viaSql shouldBe viaLocal
      viaSql.count(_._1 == 3L) shouldBe 0 // empty text → no frames
      // exact-dup texts frame identically
      viaSql.filter(_._1 == 1L).map(t => (t._2, t._3)) shouldBe
        viaSql.filter(_._1 == 2L).map(t => (t._2, t._3))
      val withNull = docs.unionByName(
        Seq((6L, null: String)).toDF("doc_id", "text"))
      VideoDedup.stubFrameHashesSql(withNull)
        .filter($"media_id" === 6L).count() shouldBe 0L
      // stride/width: 500 chars at width 32 → chunks 0..15, stride 2
      viaSql.filter(_._1 == 5L).map(_._2) shouldBe
        Seq(0L, 2L, 4L, 6L, 8L, 10L, 12L, 14L)
    }
  }
}
