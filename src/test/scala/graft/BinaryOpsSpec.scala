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
