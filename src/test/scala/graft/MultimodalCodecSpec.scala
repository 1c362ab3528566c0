package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.DeterministicFakeCodec

/** Content properties of the multimodal decode boundary: the default
  * codec is a stub (no codec libs in the container) but its pixel
  * MODEL is fully specified, so decode/resize/frame-sample are
  * verifiable transforms, not just schema plumbing. */
class MultimodalCodecSpec extends AnyFunSuite {
  import SparkTest._

  private def payload(seed: Int, n: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val p = new Array[Byte](n)
    rnd.nextBytes(p)
    p
  }

  test("pixel plane tiles the byte stream and preserves the payload") {
    for ((seed, n) <- Seq((1, 17), (2, 513), (3, 4096), (4, 1))) {
      val p = payload(seed, n)
      val (w, h, px) = DeterministicFakeCodec.decodePixels(p)
      assert(w == 64 + n % 512 && h == 64 + (n * 7) % 512)
      assert(px.length == w * h * 3)
      // cyclic tiling: channel i = payload(i mod n) — checked everywhere
      var i = 0
      while (i < px.length) { assert(px(i) == p(i % n)); i += 1 }
      // content preservation: the first n plane bytes ARE the payload
      assert(px.take(n).sameElements(p))
    }
  }

  test("closed-form summary decode equals the materialized plane mean") {
    for ((seed, n) <- Seq((5, 100), (6, 12288), (7, 777), (8, 0))) {
      val p = payload(seed, n)
      val (w1, h1, mean1) = DeterministicFakeCodec.decode(p)
      val (w2, h2, px) = DeterministicFakeCodec.decodePixels(p)
      var sum = 0L
      px.foreach(b => sum += (b & 0xff))
      val mean2 = if (px.isEmpty) 0.0 else sum.toDouble / px.length
      assert(w1 == w2.toLong && h1 == h2.toLong)
      assert(mean1 == mean2) // exact: same integer sum, same division
    }
  }

  test("resize: identity at equal dims, constant-preserving, composable") {
    val p = payload(9, 300)
    val (w, h, px) = DeterministicFakeCodec.decodePixels(p)
    // identity
    assert(DeterministicFakeCodec.resize(px, w, h, w, h).sameElements(px))
    // constant image stays constant at any dims
    val const = Array.fill[Byte](w * h * 3)(42)
    val down = DeterministicFakeCodec.resize(const, w, h, 10, 7)
    assert(down.length == 10 * 7 * 3 && down.forall(_ == 42))
    // one-step /4 == two-step /2 then /2 when dims divide evenly
    val (w4, h4) = (w - w % 4, h - h % 4)
    val crop = DeterministicFakeCodec.resize(px, w, h, w4, h4)
    val one = DeterministicFakeCodec.resize(crop, w4, h4, w4 / 4, h4 / 4)
    val two = DeterministicFakeCodec.resize(
      DeterministicFakeCodec.resize(crop, w4, h4, w4 / 2, h4 / 2),
      w4 / 2, h4 / 2, w4 / 4, h4 / 4)
    assert(one.sameElements(two))
    // every output pixel is a verbatim copy of its floor-mapped source
    val (w2, h2) = (w / 3, h / 3)
    val out = DeterministicFakeCodec.resize(px, w, h, w2, h2)
    for (y <- 0 until h2; x <- 0 until w2; c <- 0 until 3) {
      val (sy, sx) = ((y.toLong * h / h2).toInt, (x.toLong * w / w2).toInt)
      assert(out(3 * (y * w2 + x) + c) == px(3 * (sy * w + sx) + c))
    }
  }

  test("q61 decode features match a driver-side recompute from raw bytes") {
    // operator output (binary cast → mapPartitions decode → agg) vs
    // an independent recompute of the SAME pixel-model means from the
    // text bytes — content parity for the whole decode pipeline
    val out = Multimodal.decodeFeatures(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val docs = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).getBytes("UTF-8")))
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      val means = rows.map { case (_, b) =>
        val (_, _, m) = DeterministicFakeCodec.decode(b)
        math.rint(m * 10000) / 10000
      }
      src -> (rows.length.toLong,
        math.rint(means.sum / means.length * 10000) / 10000)
    }
    assert(out.keySet == expected.keySet)
    expected.foreach { case (src, (n, feat)) =>
      assert(out(src)._1 == n, s"$src n_assets")
      // tolerance = one rounding step at scale 4 (Spark round is
      // HALF_UP and distributed avg order differs from the driver
      // fold); means live in 0..255 so this is still a content check
      assert(math.abs(out(src)._2 - feat) < 2e-4, s"$src avg_feat: ${out(src)._2} vs $feat")
    }
  }

  test("q62 frame luma values match per-frame byte means recomputed driver-side") {
    val out = Multimodal.frameSample(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    var checked = 0
    docs.foreach { case (id, b) =>
      val lumas = (0 until b.length / 32 by 4).map { f =>
        var s = 0L
        (f * 32 until f * 32 + 32).foreach(i => s += (b(i) & 0xff))
        math.rint(s.toDouble / 32 * 100) / 100
      }
      if (lumas.nonEmpty) {
        val expected = math.rint(lumas.sum / lumas.length * 100) / 100
        // one rounding step at scale 2 (HALF_UP vs rint + avg order)
        assert(math.abs(out(id) - expected) < 2e-2, s"doc $id avg_luma")
        checked += 1
      }
    }
    assert(checked > 0)
  }

  /** Plane positions the 8×8 aHash resize samples, mod payload
    * length — a perturbation OUTSIDE this set cannot change the hash
    * (the perceptual property, exactly). */
  private def sampledIndices(n: Int): Set[Int] = {
    val w = 64 + n % 512
    val h = 64 + (n * 7) % 512
    (for {
      y <- 0 until 8; x <- 0 until 8; c <- 0 until 3
      sy = (y.toLong * h / 8).toInt
      sx = (x.toLong * w / 8).toInt
    } yield (3 * (sy * w + sx) + c) % n).toSet
  }

  test("q126 aHash closed form equals the full-plane trait derivation") {
    // a codec with NO aHash override: the trait materializes the
    // plane and resizes — the reference derivation
    object DerivedOnly extends Multimodal.AssetCodec {
      override def decodePixels(p: Array[Byte]) =
        DeterministicFakeCodec.decodePixels(p)
      override def sampleFrames(p: Array[Byte], every: Int, frameSize: Int) =
        DeterministicFakeCodec.sampleFrames(p, every, frameSize)
    }
    for ((seed, n) <- Seq((11, 1), (12, 17), (13, 513), (14, 4096), (15, 100000)))
      assert(DeterministicFakeCodec.aHash(payload(seed, n)) ==
        DerivedOnly.aHash(payload(seed, n)), s"n=$n")
    assert(DeterministicFakeCodec.aHash(Array.empty[Byte]) ==
      DerivedOnly.aHash(Array.empty[Byte]))
  }

  test("q126 aHash: near-dup payloads keep the hash, exact fingerprint changes") {
    val c = DeterministicFakeCodec
    val a = payload(42, 1000)
    // perturb a byte the 8×8 resize never samples: perceptual twin
    val unsampled = (0 until 1000).find(i => !sampledIndices(1000)(i)).get
    val twin = a.clone()
    twin(unsampled) = (twin(unsampled) + 97).toByte
    assert(!(twin sameElements a))
    assert(c.aHash(twin) == c.aHash(a), "near-dup must keep the perceptual hash")
    assert(c.frameFingerprint(twin, 0, 1000) != c.frameFingerprint(a, 0, 1000),
      "exact fingerprint must see the byte change")
    // exact duplicate: equal bytes => equal hash AND equal fingerprint
    assert(c.aHash(a.clone()) == c.aHash(a))
    // an unrelated payload lands elsewhere (deterministic seed)
    val b = payload(7, 1000)
    assert(c.aHash(b) != c.aHash(a))
  }

  test("q126 perceptual dedup: planted twins cluster, perceptual ⊇ exact") {
    import spark.implicits._
    val c = DeterministicFakeCodec
    val a = payload(42, 1000)
    val unsampled = (0 until 1000).find(i => !sampledIndices(1000)(i)).get
    val twin = a.clone()
    twin(unsampled) = (twin(unsampled) + 97).toByte
    val planted = Seq(
      (1L, "s0", a),           // original
      (2L, "s0", twin),        // perceptual (not exact) dup of 1
      (3L, "s0", a.clone()),   // exact dup of 1
      (4L, "s0", payload(7, 997))) // unrelated
      .toDF("doc_id", "source", "payload")
    val h = Multimodal.perceptualHashes(spark, planted, c)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(h(1)._1 == h(2)._1 && h(1)._1 == h(3)._1, "1,2,3 share the aHash")
    assert(h(1)._2 == h(3)._2, "1,3 share the exact fingerprint")
    assert(h(1)._2 != h(2)._2, "twin differs on the exact fingerprint")
    assert(h(4)._1 != h(1)._1, "unrelated asset is outside the cluster")
  }

  test("q126 rollup on testdata: perceptual dup count dominates exact, totals conserved") {
    val rows = Multimodal.perceptualDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    var total = 0L
    rows.foreach { r =>
      val (n, hv, pd, ed) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(hv <= n, s"${r.getString(0)}: distinct hashes bounded by assets")
      assert(pd >= ed, s"${r.getString(0)}: perceptual dups must cover exact dups")
      assert(pd <= n && ed >= 0)
      total += n
    }
    assert(total == Tables.documents(spark, sf).count())
  }

  test("byte cdc: boundaries re-synchronize within one window of an insertion") {
    // the Rabin-window property: an inserted byte can move anchors
    // only where the w-byte window spans the edit, so every chunk
    // starting > editPos + w keeps its fingerprint verbatim
    import graft.operators.Multimodal.{CdcWindow, CdcByteMod, CdcByteRem}
    def chunksOf(p: Array[Byte]): Seq[(Long, Long)] = {
      val arr = graft.plans.CdcChunks
        .bytesCompute(p, CdcWindow, CdcByteMod, CdcByteRem)
      (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 3)
        (r.getLong(1), r.getLong(2)) // (n_bytes, fp)
      }
    }
    val base = payload(7, 2000)
    val b = chunksOf(base)
    assert(b.map(_._1).sum == 2000L)
    assert(b.length > 5, s"anchor rate too low for the spec: ${b.length} chunks")
    for (editPos <- Seq(100, 700, 1500)) {
      val edited = (base.take(editPos) :+ 0x5a.toByte) ++ base.drop(editPos)
      val e = chunksOf(edited)
      assert(e.map(_._1).sum == 2001L)
      // chunks of the BASE starting strictly after editPos + window
      // must survive as the common suffix of the edited chunking
      val starts = b.scanLeft(0L)(_ + _._1).init
      val survivors = b.zip(starts).collect {
        case ((_, fp), st) if st > editPos + CdcWindow => fp
      }
      assert(survivors.nonEmpty, s"editPos $editPos leaves no tail to check")
      assert(e.takeRight(survivors.length).map(_._2) == survivors,
        s"tail failed to re-sync after insert at $editPos")
    }
  }
}
