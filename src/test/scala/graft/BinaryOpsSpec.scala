package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.Corpus
import graft.media.BinaryOps

/** Multimodal binary-column plumbing: schema, pooled-codec batching,
  * per-frame explosion, determinism. The decode itself is a documented
  * deterministic stub (no media libs in this container); everything
  * Spark-side is real.
  */
class BinaryOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val docs = Corpus.generate(spark, 120).cache()
  lazy val assets = BinaryOps.assetsFor(docs).cache()

  test("assets are deterministic and one per media span") {
    val nMedia = docs.select(explode(col("spans")).as("s"))
      .filter($"s.kind" === "media").count()
    assert(assets.count() == nMedia && nMedia > 0)
    val a = assets.orderBy("media_ref").collect().map(x => (x.media_ref, x.content.toSeq))
    val b = BinaryOps.assetsFor(docs.repartition(7)).orderBy("media_ref")
      .collect().map(x => (x.media_ref, x.content.toSeq))
    assert(a.toSeq == b.toSeq)
  }

  test("decode emits typed metadata for every asset") {
    val meta = BinaryOps.decodeAll(assets).cache()
    assert(meta.count() == assets.count())
    assert(meta.filter($"ok" && $"width" >= 320 && $"height" >= 240).count() == meta.count())
    // videos get multi-frame counts, stills exactly 1
    assert(meta.filter(!$"mime".startsWith("video/") && $"n_frames" =!= 1).count() == 0)
  }

  test("frame sampling explodes videos into bounded per-frame feature rows") {
    val frames = BinaryOps.sampleFrames(assets, maxFrames = 4, dim = 16).cache()
    val perRef = frames.groupBy("media_ref").count()
    assert(perRef.filter($"count" > 4).count() == 0)
    assert(frames.filter(size($"feature") =!= 16).count() == 0)
    // deterministic features
    val f1 = frames.orderBy("media_ref", "frame_idx").collect().map(f => f.feature.toSeq)
    val f2 = BinaryOps.sampleFrames(assets.repartition(5), 4, 16)
      .orderBy("media_ref", "frame_idx").collect().map(f => f.feature.toSeq)
    assert(f1.toSeq == f2.toSeq)
  }

  test("multimodal near-dup: copied payloads caught frame-for-frame with certainty") {
    // plant copies: same payload bytes under a new ref — identical
    // features per frame, so every (orig#idx, copy#idx) pair must appear
    val copies = assets.map(a => a.copy(media_ref = a.media_ref + "~copy"))
    val pairs = BinaryOps.frameDupPairs(assets.union(copies), minCos = 0.999)
      .as[(String, String, Double)].collect().toSeq
    val nFrames = BinaryOps.sampleFrames(assets).count()
    val found = pairs.map(p => (p._1, p._2)).toSet
    assert(found.size == nFrames,
      s"expected exactly $nFrames copy pairs, got ${found.size}")
    pairs.foreach { case (a, b, cos) =>
      // pair ids differ only by the ~copy marker, same frame index
      assert(a.replace("~copy", "") == b.replace("~copy", ""), s"($a, $b)")
      assert(cos > 0.999)
    }
  }

  test("dHash dedup catches resized and re-encoded copies frame-for-frame") {
    import graft.media.DHash64
    // images at >= 72 bytes: the snapped stub resample is exactly
    // hash-preserving there (below 72 is a sub-perceptual thumbnail)
    val images = assets.filter(a =>
      a.mime.startsWith("image/") && a.content.length >= 72).cache()
    val resized = BinaryOps.resizeImages(images, maxSide = 192)
      .map(a => a.copy(media_ref = a.media_ref + "~r"))
    // "re-encode": low-bit noise on every byte — what lossy
    // re-encoding does to pixels; gradient signs mostly survive
    val noisy = images.map(a => a.copy(media_ref = a.media_ref + "~n",
      content = a.content.map(b => (b ^ 1).toByte)))
    val pairs = BinaryOps.dhashDupPairs(images.union(resized).union(noisy))
      .as[(String, String, Int)].collect().toSeq
    val found = pairs.map(p => (p._1, p._2)).toSet
    def base(id: String) = id.replace("~r", "").replace("~n", "")
    // nothing unrelated pairs up (random 64-bit hashes don't land
    // within Hamming 7; deterministic corpus, so this is stable)
    pairs.foreach { case (a, b, _) => assert(base(a) == base(b), s"($a, $b)") }
    // every image pairs with BOTH copies, and the copies with each other
    val n = images.count()
    assert(n > 10, "vacuous: no image assets")
    images.collect().foreach { a =>
      val trio = Seq(a.media_ref + "#0", a.media_ref + "~r#0", a.media_ref + "~n#0")
      for (x <- trio; y <- trio if x < y)
        assert(found.contains((x, y)), s"missed copy pair ($x, $y)")
    }
    // snapped resizes are EXACTLY hash-preserving: hamming 0
    pairs.filter { case (a, b, _) => !a.contains("~n") && !b.contains("~n") }
      .foreach { case (a, b, h) => assert(h == 0, s"($a, $b) hamming $h") }
    // the fused expression agrees with a hand-rolled reference
    val g = BinaryOps.sampleGrayFrames(images).limit(50).collect()
    val exprHash = BinaryOps.sampleGrayFrames(images).limit(50).toDF()
      .select(DHash64.of(col("gray"))).as[Long].collect()
    g.zip(exprHash).foreach { case (gf, eh) =>
      var want = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (gf.gray(y * 9 + x + 1) > gf.gray(y * 9 + x)) want |= 1L << (y * 8 + x)
      assert(want == eh, s"${gf.media_ref}")
    }
  }

  test("resize keeps non-images untouched and shrinks image payload bound") {
    val resized = BinaryOps.resizeImages(assets, maxSide = 64).cache()
    val joined = assets.as("a").join(resized.as("r"), "media_ref")
      .select($"a.mime", $"a.content".as("before"), $"r.content".as("after"))
      .collect()
    joined.foreach { row =>
      val mime = row.getString(0)
      val before = row.getAs[Array[Byte]](1)
      val after = row.getAs[Array[Byte]](2)
      if (mime.startsWith("image/")) assert(after.length <= math.max(8, before.length))
      else assert(after.toSeq == before.toSeq, mime)
    }
  }
}
