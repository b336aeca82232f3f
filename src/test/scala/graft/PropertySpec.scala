package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.dedup.SimHash
import graft.spatial.{Delaunay, KdTree}
import graft.text.Winnow

/** Property-based invariants for the custom JVM kernels — coverage the
  * reference's test suite lacks (SURVEY.md §5 implication). Pure-JVM
  * kernels only (no SparkSession): the Spark-level behavior is covered by
  * the golden specs and the DuckDB oracle gate.
  */
object KernelProperties extends Properties("graft.kernels") {

  private val wordGen = Gen.listOfN(5, Gen.alphaLowerChar).map(_.mkString)
  private val docGen = Gen.chooseNum(5, 40).flatMap(n =>
    Gen.listOfN(n, wordGen).map(_.mkString(" ")))

  property("winnow: nonempty and stable under append") = forAll(docGen) { doc =>
    val fp = Winnow.fingerprint(doc)
    val fp2 = Winnow.fingerprint(doc + " appended tail words here")
    fp.nonEmpty && (fp.toSet & fp2.toSet).nonEmpty
  }

  property("winnow: deterministic") = forAll(docGen) { doc =>
    Winnow.fingerprint(doc).toSeq == Winnow.fingerprint(doc).toSeq
  }

  property("simhash: deterministic, small edits move few bits") =
    forAll(Gen.nonEmptyListOf(wordGen)) { toks =>
      val h1 = SimHash.simhash64(toks.iterator)
      val h2 = SimHash.simhash64(toks.iterator)
      val mutated = "zzzzz" :: toks.tail
      h1 == h2 && SimHash.hamming(h1, SimHash.simhash64(mutated.iterator)) <= 48
    }

  property("kdtree: nearest matches brute force distance") = forAll(
    Gen.listOfN(64, Gen.zip(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(-100.0, 100.0))),
    Gen.zip(Gen.chooseNum(-120.0, 120.0), Gen.chooseNum(-120.0, 120.0))) {
    (pts, probe) =>
      val px = pts.map(_._1).toArray
      val py = pts.map(_._2).toArray
      val kd = KdTree(px, py)
      val (qx, qy) = probe
      val got = kd.nearest(qx, qy)
      val best = pts.indices.map(i =>
        (px(i) - qx) * (px(i) - qx) + (py(i) - qy) * (py(i) - qy)).min
      (px(got) - qx) * (px(got) - qx) + (py(got) - qy) * (py(got) - qy) == best
  }

  // one triangulation reused across probe samples (forAll over probes only)
  private val triRnd = new scala.util.Random(1234)
  private val tpx = Array.fill(100)(triRnd.nextDouble() * 50)
  private val tpy = Array.fill(100)(triRnd.nextDouble() * 50)
  private val tri = Delaunay.triangulate(tpx, tpy)

  property("delaunay: located weights are convex and reconstruct the point") =
    forAll(Gen.zip(Gen.chooseNum(5.0, 45.0), Gen.chooseNum(5.0, 45.0))) {
      case (x, y) =>
        tri.locate(x, y).forall { case (t, (w1, w2, w3)) =>
          val convex = w1 >= -1e-9 && w2 >= -1e-9 && w3 >= -1e-9 &&
            math.abs(w1 + w2 + w3 - 1.0) < 1e-6
          val rx = w1 * tpx(t.a) + w2 * tpx(t.b) + w3 * tpx(t.c)
          val ry = w1 * tpy(t.a) + w2 * tpy(t.b) + w3 * tpy(t.c)
          convex && math.abs(rx - x) < 1e-6 && math.abs(ry - y) < 1e-6
        }
    }

  property("delaunay: empty circumcircles AND full hull coverage") =
    forAll(Gen.chooseNum(0L, Long.MaxValue - 1)) { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 40 + rnd.nextInt(40)
      val px = Array.fill(n)(rnd.nextDouble() * 100)
      val py = Array.fill(n)(rnd.nextDouble() * 100)
      val tri = Delaunay.triangulate(px, py)
      // definitional: no point strictly inside any triangle's circumcircle
      val emptyCircles = tri.triangles.forall { t =>
        (0 until n).forall { i =>
          i == t.a || i == t.b || i == t.c || {
            val dx = px(i) - t.cx; val dy = py(i) - t.cy
            dx * dx + dy * dy >= t.r2 * (1 - 1e-9)
          }
        }
      }
      // coverage: a convex combination of input points is inside the hull
      // and must locate (guards against dropped boundary triangles — the
      // empty-circle check alone is vacuously satisfied by missing
      // triangles)
      val covered = (1 to 50).forall { _ =>
        val i = rnd.nextInt(n); val j = rnd.nextInt(n); val k = rnd.nextInt(n)
        var w1 = rnd.nextDouble(); var w2 = rnd.nextDouble(); var w3 = rnd.nextDouble()
        val s = w1 + w2 + w3
        w1 /= s; w2 /= s; w3 /= s
        val x = w1 * px(i) + w2 * px(j) + w3 * px(k)
        val y = w1 * py(i) + w2 * py(j) + w3 * py(k)
        tri.locate(x, y).isDefined
      }
      emptyCircles && covered
    }

  property("minhash kernel: entry i is the min of per-shingle hash i") =
    forAll(Gen.nonEmptyListOf(wordGen)) { shingles =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      import org.apache.spark.unsafe.types.UTF8String
      val arr = new GenericArrayData(
        shingles.map(s => UTF8String.fromString(s): AnyRef).toArray)
      val sig = graft.functions.expressions.MinHashKernel.signature(arr, 16)
      // round-13 kernel: h_i(s) = hashLong(hashUnsafeBytes(s, 0), i) —
      // one byte pass, per-function avalanche mixes (see MinHashKernel)
      (0 until 16).forall { i =>
        sig(i) == shingles.map { s =>
          val u = UTF8String.fromString(s)
          val base = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 0)
          org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(base, i)
        }.min
      }
    }

  property("shingle kernel: count and distinctness") = forAll(docGen) { doc =>
    val got = graft.functions.expressions.ShingleKernel.shingles(doc, 3)
      .map(_.toString)
    val toks = doc.trim.split("\\s+")
    val expect = toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
    got.toSeq == expect
  }

  private val vocabGen = Gen.nonEmptyListOf(
    Gen.zip(wordGen, Gen.chooseNum(1L, 50L)))

  property("bpe: training is deterministic") = forAll(vocabGen) { vocab =>
    graft.text.Bpe.train(vocab, 20) == graft.text.Bpe.train(vocab, 20)
  }

  property("bpe: encoding is lossless — subwords rebuild the word") =
    forAll(vocabGen, wordGen) { (vocab, w) =>
      val ranks = graft.text.Bpe.train(vocab, 20).zipWithIndex.toMap
      graft.text.Bpe.encodeWord(w, ranks).mkString == w
    }

  property("bpe: a trained word never expands past its char count") =
    forAll(vocabGen) { vocab =>
      val ranks = graft.text.Bpe.train(vocab, 30).zipWithIndex.toMap
      vocab.forall { case (w, _) =>
        val n = graft.text.Bpe.encodeWord(w, ranks).length
        n >= 1 && n <= w.length
      }
    }

  // ----- netCDF-4 writer ↔ HDF5 reader codec pair (both from-spec;
  // fuzzing the pair catches any layout where they agree on the wrong
  // bytes as well as crashes)

  private val dsetGen: Gen[(Seq[Int], Option[Seq[Int]], Int, Long)] = for {
    rank <- Gen.chooseNum(1, 3)
    dims <- Gen.listOfN(rank, Gen.chooseNum(1, 7))
    chunked <- Gen.oneOf(true, false)
    chunks <- Gen.sequence[Seq[Int], Int](dims.map(d => Gen.chooseNum(1, d)))
    deflate <- Gen.chooseNum(0, 6)
    seed <- Gen.chooseNum(0L, Long.MaxValue - 1)
  } yield (dims, if (chunked) Some(chunks) else None, deflate, seed)

  property("netcdf4→hdf5: random shapes/chunks/deflate round-trip exactly") =
    forAll(dsetGen) { case (dims, chunks, deflate, seed) =>
      import graft.raster.NetCdf4
      val rnd = new scala.util.Random(seed)
      val n = dims.product
      val f64 = Array.fill(n)(rnd.nextDouble() * 100 - 50)
      val i32 = Array.fill(n)(rnd.nextInt())
      val root = NetCdf4.Group("/", dsets = Seq(
        NetCdf4.Dset("d", dims, Nil, NetCdf4.F64(f64),
          chunks = chunks, deflate = if (chunks.isDefined) deflate else 0),
        NetCdf4.Dset("i", dims, Nil, NetCdf4.I32(i32))))
      val f = graft.ingest.Hdf5.read(NetCdf4.writeBytes(root))
      val kids = f.children(f.rootAddr).toMap
      f.dataset("d", kids("d")).doubles.sameElements(f64) &&
        f.dataset("i", kids("i")).doubles.sameElements(i32.map(_.toDouble))
    }

  property("netcdf4→hdf5: random compound records round-trip per member") =
    forAll(Gen.chooseNum(1, 40), Gen.chooseNum(0L, Long.MaxValue - 1)) {
      (n, seed) =>
        import graft.raster.NetCdf4
        val rnd = new scala.util.Random(seed)
        val a = Array.fill(n)(rnd.nextInt())
        val b = Array.fill(n)(rnd.nextDouble())
        val c = Array.fill(n)(rnd.nextFloat())
        val root = NetCdf4.Group("/", dsets = Seq(
          NetCdf4.Dset("rec", Seq(n), Nil, NetCdf4.Compound(Seq(
            "a" -> NetCdf4.I32(a), "bb" -> NetCdf4.F64(b),
            "ccc" -> NetCdf4.F32(c))))))
        val f = graft.ingest.Hdf5.read(NetCdf4.writeBytes(root))
        val ds = f.dataset("rec", f.children(f.rootAddr).toMap.apply("rec"))
        ds.memberDoubles("a").sameElements(a.map(_.toDouble)) &&
          ds.memberDoubles("bb").sameElements(b) &&
          ds.memberDoubles("ccc").sameElements(c.map(_.toDouble))
    }

  property("shapefile writer↔reader: random polygons round-trip vertices and ids") =
    forAll(Gen.chooseNum(1, 12), Gen.chooseNum(0L, Long.MaxValue - 1)) {
      (nPolys, seed) =>
        import graft.ingest.{ShapefileGrid, ShapefileWriter}
        val rnd = new scala.util.Random(seed)
        val polys = (1 to nPolys).map { _ =>
          val nv = 3 + rnd.nextInt(5)
          val ring = new Array[Double]((nv + 1) * 2)
          for (i <- 0 until nv) {
            ring(2 * i) = rnd.nextDouble() * 360 - 180
            ring(2 * i + 1) = rnd.nextDouble() * 180 - 90
          }
          ring(2 * nv) = ring(0); ring(2 * nv + 1) = ring(1) // close
          ring
        }
        val ids = (1 to nPolys).map(i => (i * 1000 + rnd.nextInt(999)).toLong)
        val dir = java.nio.file.Files.createTempDirectory("graft-shp-fuzz")
        ShapefileWriter.write(dir, "grid", polys, ids, "GEOGCS[\"WGS 84\"]")
        val got = ShapefileGrid.readShp(dir.resolve("grid.shp"))
        val gotIds = ShapefileGrid.readDbf(dir.resolve("grid.dbf"))
          .map(_("grid_id").trim.toLong)
        got.size == nPolys && gotIds == ids &&
          got.zip(polys).forall { case (p, ring) =>
            p.rings.size == 1 && p.rings.head.sameElements(ring)
          }
    }

  property("mp4 writer↔parser: random dimensions and durations round-trip") =
    forAll(Gen.chooseNum(1, 8192), Gen.chooseNum(1, 8192),
      Gen.chooseNum(1L, 1000000L), Gen.chooseNum(0L, 2000000000L)) {
      (w, h, timescale, duration) =>
        val m = graft.multimodal.Mp4.parseMeta(
          graft.multimodal.Mp4.write(w, h, timescale, duration))
        m.widthPx == w && m.heightPx == h &&
          m.timescale == timescale && m.durationTicks == duration &&
          m.nTracks == 1 && m.nSamples == 0L
    }

  property("mp4 writer↔parser: sample tables and v1 64-bit durations") =
    forAll(Gen.chooseNum(1, 4096), Gen.chooseNum(1, 4096),
      Gen.chooseNum(1L, 0xffffffffL),
      // spans the u32 boundary: half the cases force version-1 boxes
      Gen.chooseNum(0L, 2L * 0xffffffffL),
      Gen.oneOf("avc1", "hev1", "av01", "vp09"),
      Gen.listOfN(10, Gen.chooseNum(0, 1000000)).map(_.take(8))) {
      (w, h, timescale, duration, codec, sizes) =>
        val m = graft.multimodal.Mp4.parseMeta(
          graft.multimodal.Mp4.write(w, h, timescale, duration, codec, sizes))
        m.widthPx == w && m.heightPx == h &&
          m.timescale == timescale && m.durationTicks == duration &&
          m.nTracks == 1 && m.codec == codec &&
          m.nSamples == sizes.length.toLong &&
          m.sampleBytes == sizes.map(_.toLong).sum
    }

  property("mp4 sample walk: random payloads round-trip byte-exact") =
    forAll(Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 64).flatMap(len =>
        Gen.listOfN(len, Gen.chooseNum(-128, 127).map(_.toByte))
          .map(_.toArray))))) { frames =>
      val mp4 = graft.multimodal.Mp4.writeWithSamples(
        64, 64, 1000L, 40L * frames.length, "jpeg", frames)
      val ranges = graft.multimodal.Mp4.sampleRanges(mp4)
      ranges.length == frames.length &&
        ranges.zip(frames).forall { case ((off, sz), f) =>
          sz == f.length &&
            mp4.slice(off.toInt, off.toInt + sz).sameElements(f)
        }
    }

  property("mp4 sample walk: truncation anywhere inside mdat aborts precisely") =
    forAll(Gen.chooseNum(1, 5), Gen.chooseNum(1, 200)) { (n, cut) =>
      val frames = (0 until n).map(i => Array.fill[Byte](40 + i)(7))
      val mp4 = graft.multimodal.Mp4.writeWithSamples(
        64, 64, 1000L, 40L * n, "jpeg", frames)
      val cutLen = math.min(cut, frames.map(_.length).sum - 1)
      val truncated = mp4.take(mp4.length - cutLen)
      Prop.throws(classOf[IllegalArgumentException]) {
        graft.multimodal.Mp4.sampleRanges(truncated)
      }
    }

  property("audio envelope fingerprint: gain-invariant and frame-replication-exact") =
    forAll(Gen.listOfN(65, Gen.chooseNum(1, 7)),
      Gen.chooseNum(2, 5)) { (amps, kRep) =>
      def fp(frames: Array[Int]) =
        graft.multimodal.AudioHash.energyFingerprint64(frames)
      val base = amps.flatMap(a => Seq(a * 1000, -a * 1000)).toArray
      val gained = base.map(_ * 3)
      // k× frame replication keeps every box-window energy ratio
      val replicated = base.flatMap(v => Array.fill(kRep)(v))
      fp(base) == fp(gained) && fp(base) == fp(replicated)
    }

  property("mp4 parser rejects corrupt box sizes with a precise error") =
    forAll(Gen.chooseNum(8, 200), Gen.chooseNum(9L, 0xfffffff0L)) {
      (corruptAt, badSize) =>
        val bytes = graft.multimodal.Mp4.write(640, 480, 1000L, 5000L,
          "avc1", Seq(10, 20, 30))
        val at = corruptAt % (bytes.length - 8)
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.BIG_ENDIAN)
        // overwrite some 4-byte window with a size-like huge value — the
        // parser must fail with its own message, never a raw
        // IndexOutOfBounds from walking past the buffer
        bb.putInt(at, (badSize & 0xffffffffL).toInt)
        try { graft.multimodal.Mp4.parseMeta(bb.array()); true }
        catch {
          case e: IllegalArgumentException =>
            e.getMessage.contains("bad box size") ||
              e.getMessage.contains("exceeds box extent") ||
              e.getMessage.contains("box too small") ||
              e.getMessage.contains("no mvhd box") ||
              e.getMessage.contains("not an ISO-BMFF container")
          case _: Throwable => false
        }
    }

  /** Random CHUNKED layouts — multi-run stsc (RLE over stretches of
    * equal chunk sizes), stco vs 64-bit co64 addressing, the
    * constant-sample-size stsz form, and non-contiguous chunks (junk
    * gaps inside mdat). The general §8.7 walk must recover every
    * sample byte-exact no matter which layout the muxer favored —
    * round 12's fuzz covered only the single-chunk shape this repo's
    * writer emits by default.
    */
  property("mp4 sample walk: chunked/co64/fixed-stsz layouts round-trip byte-exact") = {
    val genChunks = for {
      nChunks <- Gen.chooseNum(1, 6)
      perChunk <- Gen.listOfN(nChunks, Gen.chooseNum(1, 4))
    } yield perChunk
    forAll(genChunks, Gen.oneOf(true, false), Gen.oneOf(true, false),
      Gen.chooseNum(0, 32), Gen.chooseNum(1, 48)) {
      (perChunk, useCo64, fixed, gap, fixedLen) =>
        val n = perChunk.sum
        val frames =
          if (fixed) (0 until n).map(i =>
            Array.tabulate[Byte](fixedLen)(j => (i * 31 + j).toByte))
          else (0 until n).map(i =>
            Array.tabulate[Byte](8 + (i * 13) % 40)(j => (i * 17 + j).toByte))
        val mp4 = graft.multimodal.Mp4.writeWithSamples(
          64, 64, 1000L, 40L * n, "jpeg", frames,
          samplesPerChunk = perChunk, useCo64 = useCo64,
          fixedStsz = fixed, chunkGap = gap)
        val ranges = graft.multimodal.Mp4.sampleRanges(mp4)
        ranges.length == n &&
          ranges.zip(frames).forall { case ((off, sz), f) =>
            sz == f.length &&
              mp4.slice(off.toInt, off.toInt + sz).sameElements(f)
          }
    }
  }

  /** Truncation must still abort precisely under every chunked
    * layout — the per-sample extent check, not a decoder, owns the
    * failure.
    */
  property("mp4 sample walk: chunked-layout truncation aborts precisely") =
    forAll(Gen.chooseNum(2, 5), Gen.oneOf(true, false),
      Gen.chooseNum(1, 60)) { (nChunks, useCo64, cut) =>
      val perChunk = List.fill(nChunks)(2)
      val frames = (0 until perChunk.sum).map(i => Array.fill[Byte](30 + i)(7))
      val mp4 = graft.multimodal.Mp4.writeWithSamples(
        64, 64, 1000L, 40L * frames.length, "jpeg", frames,
        samplesPerChunk = perChunk, useCo64 = useCo64)
      val cutLen = math.min(cut, frames.last.length - 1)
      val truncated = mp4.take(mp4.length - cutLen)
      Prop.throws(classOf[IllegalArgumentException]) {
        graft.multimodal.Mp4.sampleRanges(truncated)
      }
    }

  /** The sample-table header guards: an 8–19-byte stsz (or 8–15-byte
    * stsc/stco/co64) must fail as "box too small", never read the
    * following box's bytes as its own header fields.
    */
  property("mp4 sample walk: undersized sample-table boxes fail loud") =
    forAll(Gen.oneOf("stsz", "stsc", "stco", "co64"),
      Gen.chooseNum(8, 15)) { (typ, sz) =>
      val good = graft.multimodal.Mp4.writeWithSamples(
        64, 64, 1000L, 120L, "jpeg", Seq(Array.fill[Byte](16)(3)))
      // locate the real box of this type (co64 absent → synthesize by
      // renaming stco) and shrink its declared size into the header
      val name = if (typ == "co64") "stco" else typ
      val pat = name.getBytes("US-ASCII")
      val at = good.indices.find(i => i + 4 <= good.length - 4 &&
        good(i + 4) == pat(0) && good(i + 5) == pat(1) &&
        good(i + 6) == pat(2) && good(i + 7) == pat(3))
      at.exists { i =>
        val bb = java.nio.ByteBuffer.wrap(good.clone())
          .order(java.nio.ByteOrder.BIG_ENDIAN)
        bb.putInt(i, sz)
        if (typ == "co64") {
          bb.put(i + 4, 'c'.toByte); bb.put(i + 5, 'o'.toByte)
          bb.put(i + 6, '6'.toByte); bb.put(i + 7, '4'.toByte)
        }
        try { graft.multimodal.Mp4.sampleRanges(bb.array()); false }
        catch {
          case e: IllegalArgumentException =>
            e.getMessage.contains("box too small") ||
              e.getMessage.contains("bad box size")
          case _: Throwable => false
        }
      }
    }
}
