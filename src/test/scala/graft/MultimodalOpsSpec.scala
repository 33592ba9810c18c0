package graft

import graft.operators.MultimodalOps
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class MultimodalOpsSpec extends AnyFunSpec with Matchers with SparkTestBase {

  private lazy val media = MultimodalOps.syntheticMedia(Tables.documents(spark, sfDir))

  describe("syntheticMedia") {
    it("produces the typed media schema with binary payloads") {
      media.schema.fieldNames.toSeq shouldBe Seq("media_id", "media_type", "payload", "source")
      val row = media.orderBy("media_id").head()
      row.getAs[Array[Byte]]("payload").length should be > 0
      Set("image", "audio", "video") should contain(row.getAs[String]("media_type"))
    }
  }

  describe("decodeFeatures") {
    it("emits one feature row per media item, payload dropped") {
      val feats = MultimodalOps.decodeFeatures(media)
      feats.count() shouldBe media.count()
      feats.schema.fieldNames should not contain "payload"
      val r = feats.orderBy("media_id").head()
      r.getAs[Long]("n_bytes") should be > 0L
      r.getAs[Double]("byte_entropy") should be > 0.0
    }
    it("is deterministic (stub decode is hash-driven, not random)") {
      val a = MultimodalOps.decodeFeatures(media).orderBy("media_id").collect()
      val b = MultimodalOps.decodeFeatures(media).orderBy("media_id").collect()
      a.toSeq shouldBe b.toSeq
    }
    it("decodes a real planted PNG to its true dimensions, not the stub's") {
      import spark.implicits._
      val png = MultimodalOps.renderPng(37, 23, 0x406080)
      val df = Seq((9L, "image", png, "spec")).toDF("media_id", "media_type", "payload", "source")
      val r = MultimodalOps.decodeFeatures(df).head()
      (r.getAs[Int]("width"), r.getAs[Int]("height")) shouldBe (37, 23)
    }
  }

  describe("decodeMediaFeatures over the mixed real-codec corpus") {
    it("type-dispatches to the real codec and recovers every closed form") {
      val mixed = MultimodalOps.syntheticMixedMedia(
        Tables.documents(spark, sfDir).filter(col("doc_id") < 30))
      val feats = MultimodalOps.decodeMediaFeatures(mixed)
        .orderBy("media_id").collect()
      feats.length shouldBe 30 // strict decode drops nothing: every payload is real
      feats.foreach { r =>
        val id = r.getAs[Long]("media_id")
        (id % 3) match {
          case 0 =>
            r.getAs[String]("media_type") shouldBe "image"
            r.getAs[Long]("width") shouldBe 16 + id % 32
            r.getAs[Long]("height") shouldBe 16 + (id * 7) % 32
            r.getAs[Long]("n_units") shouldBe (16 + id % 32) * (16 + (id * 7) % 32)
          case 1 =>
            r.getAs[String]("media_type") shouldBe "audio"
            val n = 4000 + id % 1000
            r.getAs[Long]("n_units") shouldBe n
            r.getAs[Long]("duration_ms") shouldBe n * 1000 / 16000
          case _ =>
            r.getAs[String]("media_type") shouldBe "video"
            val n = 8 + id % 5
            (r.getAs[Long]("width"), r.getAs[Long]("height")) shouldBe ((16L, 16L))
            r.getAs[Long]("n_units") shouldBe n
            r.getAs[Long]("duration_ms") shouldBe n * 1000 / 25
        }
      }
    }
    it("drops undecodable payloads instead of inventing stub features") {
      import spark.implicits._
      val junk = Seq((1L, "image", Array[Byte](1, 2, 3), "spec"),
        (2L, "audio", Array[Byte](4, 5), "spec"))
        .toDF("media_id", "media_type", "payload", "source")
      MultimodalOps.decodeMediaFeatures(junk).count() shouldBe 0L
    }
  }

  describe("real ImageIO codec (java.desktop, headless)") {
    it("round-trips every planted synthetic PNG to its arithmetic geometry and color") {
      val docs = Tables.documents(spark, sfDir)
      val stats = MultimodalOps.decodeImageStats(MultimodalOps.syntheticImages(docs))
        .collect()
      stats.length shouldBe docs.count()
      stats.foreach { r =>
        val id = r.getAs[Long]("media_id")
        r.getAs[Long]("width") shouldBe 16 + id % 32
        r.getAs[Long]("height") shouldBe 16 + (id * 7) % 32
        r.getAs[Long]("r") shouldBe id % 256
        r.getAs[Long]("g") shouldBe (id * 3) % 256
        r.getAs[Long]("b") shouldBe (id * 7) % 256
      }
    }
    it("returns None for undecodable bytes instead of throwing") {
      MultimodalOps.decodeImage("not a png".getBytes) shouldBe None
      MultimodalOps.decodeImage(Array.empty[Byte]) shouldBe None
    }
  }

  describe("sampleFrames") {
    it("samples a bounded number of frames per video with uniform stride") {
      val frames = MultimodalOps.sampleFrames(media, nFrames = 4, frameBytes = 16)
      val perItem = frames.groupBy("media_id").count().collect()
      perItem.foreach(_.getAs[Long]("count") should be <= 4L)
      perItem.length shouldBe media.filter(col("media_type") === "video").count()
      frames.select(max(org.apache.spark.sql.functions.length(col("frame"))).as("m"))
        .head().getAs[Int]("m") should be <= 16
    }
  }

  describe("resizeImages") {
    it("fits image dimensions preserving aspect ratio and shrinks payload by the area ratio") {
      val resized = MultimodalOps.resizeImages(media, maxW = 128, maxH = 128)
      val images = resized.filter(col("media_type") === "image").collect()
      images should not be empty
      images.foreach { r =>
        val (ow, oh) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
        ow should be <= 128
        oh should be <= 128
        // sources are 512..1535 px (stub decode), so the fit must hit
        // the bound on the LARGER dim and scale the other by the same
        // factor — squashing to 128x128 would break this for any
        // non-square source
        math.max(ow, oh) should (be >= 127 and be <= 128)
        r.getAs[Array[Byte]]("payload").length should be >= 1
      }
      // stub decode reports >=512px sources, so payloads must shrink
      val before = media.filter(col("media_type") === "image")
        .select(sum(org.apache.spark.sql.functions.length(col("payload")))).head().getLong(0)
      val after = resized.filter(col("media_type") === "image")
        .select(sum(org.apache.spark.sql.functions.length(col("payload")))).head().getLong(0)
      after should be < before
    }

    it("really resamples decodable PNGs: output re-decodes to the computed fit dims") {
      import spark.implicits._
      // plant a real 200x100 solid-red PNG; fit into 64x64 must give
      // 64x32 (aspect preserved), and the output must itself be a
      // decodable PNG of exactly those dims with the planted color
      val png = MultimodalOps.renderPng(200, 100, 0xcc2010)
      val df = Seq((1L, "image", png, "spec")).toDF("media_id", "media_type", "payload", "source")
      val out = MultimodalOps.resizeImages(df, 64, 64).head()
      out.getAs[Int]("width") shouldBe 64
      out.getAs[Int]("height") shouldBe 32
      val img = MultimodalOps.decodeImage(out.getAs[Array[Byte]]("payload")).get
      (img.getWidth, img.getHeight) shouldBe (64, 32)
      // solid fill survives a real bilinear resample exactly
      img.getRGB(10, 10) & 0xffffff shouldBe 0xcc2010
    }

    it("passes non-image rows through untouched") {
      val audioBefore = media.filter(col("media_type") === "audio")
        .select("media_id", "payload").collect()
        .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      val audioAfter = MultimodalOps.resizeImages(media, 128, 128)
        .filter(col("media_type") === "audio")
        .select("media_id", "payload").collect()
        .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      audioAfter shouldBe audioBefore
    }
  }

  describe("real WAV codec (hand-rolled RIFF/PCM16)") {
    it("round-trips samples exactly and rejects non-WAV bytes") {
      val samples = Array.tabulate(333)(i => ((i * 7919) % 65536 - 32768).toShort)
      val wav = MultimodalOps.renderWav(16000, samples)
      wav.length shouldBe 44 + 666
      val clip = MultimodalOps.decodeWav(wav).get
      clip.sampleRate shouldBe 16000
      clip.samples.toSeq shouldBe samples.toSeq
      // PNG bytes, truncated WAV, and a corrupted magic must all refuse
      MultimodalOps.decodeWav(MultimodalOps.renderPng(8, 8, 0x112233)) shouldBe None
      MultimodalOps.decodeWav(wav.take(40)) shouldBe None
      val bad = wav.clone(); bad(8) = 'X'.toByte
      MultimodalOps.decodeWav(bad) shouldBe None
    }

    it("emits WAVs an independent reader (javax.sound) accepts with matching geometry") {
      val samples = Array.tabulate(1600)(i => (i % 3000 - 1500).toShort)
      val wav = MultimodalOps.renderWav(16000, samples)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      in.getFormat.getSampleRate shouldBe 16000.0f
      in.getFormat.getChannels shouldBe 1
      in.getFormat.getSampleSizeInBits shouldBe 16
      in.getFrameLength shouldBe 1600L
    }

    it("decodeAudioStats matches a hand computation on the synthetic generator") {
      val s = spark
      import s.implicits._
      val one = MultimodalOps.decodeAudioStats(
        MultimodalOps.syntheticAudio(Seq(7L).toDF("doc_id")))
        .collect().head
      val n = 4000 + 7 % 1000
      val vals = (0 until n).map(i => (7L * 31 + i * 7919L) % 65536 - 32768)
      one.getAs[Long]("n_samples") shouldBe n.toLong
      one.getAs[Long]("duration_ms") shouldBe n * 1000L / 16000
      one.getAs[Long]("sum_sq") shouldBe vals.map(v => v * v).sum
      one.getAs[Long]("peak") shouldBe vals.map(math.abs).max
    }
  }

  describe("real Y4M codec (hand-rolled YUV4MPEG2, C420)") {
    it("round-trips frames byte-for-byte") {
      val frames = Array.tabulate(3)(f =>
        Array.tabulate(16 * 16 * 3 / 2)(i => ((f * 91 + i * 5) % 256).toByte))
      val clip = MultimodalOps.decodeY4m(MultimodalOps.renderY4m(16, 16, frames)).get
      clip.width shouldBe 16
      clip.height shouldBe 16
      clip.frames.length shouldBe 3
      clip.frames.zip(frames).foreach { case (a, b) => a shouldBe b }
    }

    it("emits the canonical stream header") {
      val bytes = MultimodalOps.renderY4m(32, 16,
        Array(new Array[Byte](32 * 16 * 3 / 2)))
      val header = new String(bytes.takeWhile(_ != '\n'.toByte), "US-ASCII")
      header shouldBe "YUV4MPEG2 W32 H16 F25:1 Ip A1:1 C420jpeg"
    }

    it("rejects malformed payloads rather than fabricating clips") {
      MultimodalOps.decodeY4m("not a video".getBytes("US-ASCII")) shouldBe None
      MultimodalOps.decodeY4m(Array.emptyByteArray) shouldBe None
      // truncated mid-frame
      val good = MultimodalOps.renderY4m(16, 16,
        Array(new Array[Byte](16 * 16 * 3 / 2)))
      MultimodalOps.decodeY4m(good.dropRight(10)) shouldBe None
      // odd geometry in the header
      MultimodalOps.decodeY4m(
        "YUV4MPEG2 W15 H16 F25:1\nFRAME\n".getBytes("US-ASCII")) shouldBe None
      // non-numeric geometry token must reject, not throw
      MultimodalOps.decodeY4m(
        "YUV4MPEG2 Wabc H16 F25:1\nFRAME\n".getBytes("US-ASCII")) shouldBe None
    }

    it("parses FRAME marker lines carrying parameters") {
      val frameLen = 16 * 16 * 3 / 2
      val out = new java.io.ByteArrayOutputStream()
      out.write("YUV4MPEG2 W16 H16 F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII"))
      out.write("FRAME Xcustom\n".getBytes("US-ASCII"))
      out.write(Array.tabulate(frameLen)(i => (i % 256).toByte))
      val clip = MultimodalOps.decodeY4m(out.toByteArray).get
      clip.frames.length shouldBe 1
      clip.frames.head shouldBe Array.tabulate(frameLen)(i => (i % 256).toByte)
    }

    it("decodeVideoStats matches a hand computation on the synthetic generator") {
      val s = spark
      import s.implicits._
      val one = MultimodalOps.decodeVideoStats(
        MultimodalOps.syntheticVideo(Seq(9L).toDF("doc_id")))
        .collect().head
      val n = (8 + 9 % 5).toInt
      val sampled = (0 until n).filter(_ % 2 == 0)
      val ys = for (f <- sampled; i <- 0 until 256)
        yield (9L * 13 + f * 101 + i * 7L) % 256
      one.getAs[Long]("n_frames") shouldBe n.toLong
      one.getAs[Long]("duration_ms") shouldBe n * 1000L / 25
      one.getAs[Long]("n_sampled") shouldBe sampled.length.toLong
      one.getAs[Long]("y_sum") shouldBe ys.sum
      one.getAs[Long]("y_peak") shouldBe ys.max
    }
  }

  describe("renderPatternPng + dHash") {
    import spark.implicits._

    it("brightness variants share the dHash but not the bytes") {
      val a = MultimodalOps.renderPatternPng(42L, 0)
      val b = MultimodalOps.renderPatternPng(42L, 5)
      a should not equal b
      val df = Seq((1L, a), (2L, b)).toDF("media_id", "payload")
      val hs = MultimodalOps.dHash(df).select("dhash").as[String].collect()
      hs(0) shouldBe hs(1)
    }

    it("same (seed mod 199, brightness) renders byte-identical files") {
      MultimodalOps.renderPatternPng(7L, 2) shouldBe
        MultimodalOps.renderPatternPng(7L + 199L, 2)
    }

    it("a flat image hashes to zero and wrong dimensions are dropped") {
      val flat = MultimodalOps.renderPng(9, 8, 0x777777)
      val off = MultimodalOps.renderPng(8, 8, 0x777777)
      val df = Seq((1L, flat), (2L, off)).toDF("media_id", "payload")
      val rows = MultimodalOps.dHash(df).as[(Long, String)].collect()
      rows.toSeq shouldBe Seq((1L, "0"))
    }

    it("dHash matches the generator closed form") {
      val seed = 123L
      val df = Seq((1L, MultimodalOps.renderPatternPng(seed, 3)))
        .toDF("media_id", "payload")
      val got = MultimodalOps.dHash(df).select("dhash").as[String].head()
      def g(x: Int, y: Int): Long = {
        val k = (seed * 31 + x * 17 + y * 29) % 199
        k * k % 199 % 128
      }
      var acc = BigInt(0)
      for (y <- 0 until 8; x <- 0 until 8)
        if (g(x + 1, y) > g(x, y)) acc = acc.setBit(y * 8 + x)
      got shouldBe acc.toString
    }
  }

  describe("vadStats") {
    import spark.implicits._

    it("segments a hand-built silence/speech/silence clip") {
      // 3 frames silence, 2 loud, 1 silence, 3 loud, partial tail dropped
      val frame = 4
      val quiet = Array.fill(frame)(10.toShort)
      val loud = Array.fill(frame)(20000.toShort)
      val samples =
        quiet ++ quiet ++ quiet ++ loud ++ loud ++ quiet ++ loud ++ loud ++ loud ++
          Array.fill(frame - 1)(20000.toShort) // partial frame: dropped
      val wav = MultimodalOps.renderWav(16000, samples)
      val df = Seq((7L, wav)).toDF("media_id", "payload")
      // threshold between 4*10^2=400 and 4*20000^2=1.6e9
      val row = MultimodalOps.vadStats(df, frame, 1000000L).head()
      row.getAs[Long]("n_frames") shouldBe 9L
      row.getAs[Long]("active_frames") shouldBe 5L
      row.getAs[Long]("n_segments") shouldBe 2L
      row.getAs[Long]("longest_run") shouldBe 3L
      row.getAs[Long]("active_ppm") shouldBe 5L * 1000000 / 9
    }

    it("drops undecodable payloads and handles all-silent clips") {
      val silent = MultimodalOps.renderWav(16000, Array.fill(320)(0.toShort))
      val df = Seq((1L, silent), (2L, Array[Byte](1, 2, 3)))
        .toDF("media_id", "payload")
      val rows = MultimodalOps.vadStats(df, 160, 1L).collect()
      rows.length shouldBe 1
      rows.head.getAs[Long]("media_id") shouldBe 1L
      rows.head.getAs[Long]("active_frames") shouldBe 0L
      rows.head.getAs[Long]("n_segments") shouldBe 0L
    }
  }
}
