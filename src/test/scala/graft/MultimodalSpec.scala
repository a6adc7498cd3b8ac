package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSuite {

  test("decodeStub: typed plumbing, deterministic fake, sane metadata") {
    val out = Multimodal.decodeStub(spark, sfDir)
    val rows = out.collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length.toLong === nDocs)
    assert(rows.forall(m => m.n_bytes > 0 && m.codec == "stub"))
    assert(rows.forall(m => m.width >= 16 && m.width <= 1024 &&
      m.height >= 16 && m.height <= 1024))
    // Deterministic: a second run yields byte-identical metadata.
    val again = Multimodal.decodeStub(spark, sfDir).collect()
    assert(rows.sortBy(_.doc_id).toSeq === again.sortBy(_.doc_id).toSeq)
  }

  test("chunking reassembles: chunk sizes sum to payload size") {
    val meta = Multimodal.multimodalMeta(spark, sfDir)
      .select(col("doc_id"), col("n_bytes"))
    val chunks = Multimodal.multimodalChunk(spark, sfDir)
      .groupBy(col("doc_id"))
      .agg(sum(col("chunk_bytes")).as("total"), count(lit(1)).as("n_chunks"))
    val joined = meta.join(chunks, Seq("doc_id"))
      .where(col("n_bytes") =!= col("total"))
    assert(joined.count() === 0, "chunk bytes must reassemble exactly")
    // Every chunk except possibly the last is full-size.
    val bad = Multimodal.multimodalChunk(spark, sfDir)
      .withColumn("max_idx",
        max(col("chunk_idx")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .where(col("chunk_idx") < col("max_idx") &&
        col("chunk_bytes") =!= Multimodal.ChunkBytes)
    assert(bad.count() === 0)
  }

  test("resize: exact stride arithmetic and driver-side decimation " +
      "cross-check") {
    val rows = Multimodal.multimodalResize(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, bin, bout, _) =>
      assert(bout === (bin + Multimodal.ResizeStride - 1) /
        Multimodal.ResizeStride, s"doc $id: $bin -> $bout")
    }
    // Recompute one doc's resized hash from the raw text driver-side.
    val (id0, _, _, md) = rows.head
    val text = Tables.documents(spark, sfDir)
      .where(col("doc_id") === id0).collect()(0).getAs[String]("text")
    val bytes = text.getBytes("UTF-8")
    val resized = bytes.indices.collect {
      case i if i % Multimodal.ResizeStride == 0 => bytes(i)
    }
    val hx = resized.map(b => f"${b & 0xff}%02X").mkString
    val mdRef = java.security.MessageDigest.getInstance("MD5")
      .digest(hx.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(md === mdRef, s"doc $id0 resized hash mismatch")
  }

  test("pipeline: compose-consistency with its stage operators") {
    // The composed resize→re-chunk→re-hash row must agree with the
    // standalone resize stage byte for byte, and its fingerprint must
    // reduce to the resize hash where the resized payload fits one
    // chunk (md5(join([md5(res_hx)])) = md5(res_md5)).
    val pipe = Multimodal.multimodalPipeline(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("bytes_in"), r.getAs[Long]("bytes_out"),
          r.getAs[Long]("n_chunks"), r.getAs[String]("pipe_fp"))).toMap
    val res = Multimodal.multimodalResize(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("bytes_in"), r.getAs[Long]("bytes_out"),
          r.getAs[String]("res_md5"))).toMap
    assert(pipe.keySet === res.keySet)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    pipe.foreach { case (id, (bin, bout, nc, fp)) =>
      val (rbin, rbout, rmd) = res(id)
      assert(bin === rbin && bout === rbout, s"doc $id byte accounting")
      assert(nc === (bout + Multimodal.ChunkBytes - 1) /
        Multimodal.ChunkBytes, s"doc $id chunk count")
      if (nc == 1) assert(fp === md5hex(rmd), s"doc $id fingerprint")
    }
    assert(pipe.values.exists(_._3 == 1),
      "expected at least one single-chunk doc to pin the fp reduction")
  }

  test("media dedup: the resized tier collides a detail-perturbed " +
      "payload the exact tier keeps distinct") {
    // aHash's defining property, in the codec-free stand-in: a byte
    // changed at a DROPPED stride position (stride 4 keeps bytes
    // 0, 4, 8, …; byte 1 is dropped) survives the downsample, so the
    // perceptual fingerprint collides while the exact one differs.
    import spark.implicits._
    val base = "ABCDEFGHIJKLMNOP"
    val perturbed = "AXCDEFGHIJKLMNOP" // byte 1 changed (dropped)
    val df = Seq((1L, base, "en", "s", base.length),
        (2L, perturbed, "en", "s", base.length),
        (3L, base, "en", "s", base.length)) // exact dup of 1
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Multimodal.multimodalDedupOver(
        graft.multimodal.Multimodal.payloadsOver(df))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // exact: {1,3} collide, 2 distinct → 2 groups, 1 dup, max 2.
    assert(rows("exact") === ((3L, 2L, 1L, 2L)))
    // resized: all three collide → 1 group, 2 dups, max 3.
    assert(rows("resized") === ((3L, 1L, 2L, 3L)))
    // On the real corpus the tiers nest: every exact group is inside
    // a resized group, so resized can only have fewer-or-equal groups.
    val real = Multimodal.multimodalDedup(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(real("resized") <= real("exact"))
  }

  test("media dedup scales: 1M synthetic payloads, zero storage") {
    // The census is one map-only fingerprint pass + bounded-key aggs
    // — shuffle ∝ distinct fingerprints, never pairwise. A quadratic
    // or payload-carrying-shuffle regression blows the runtime, not
    // the asserts (the synth payloads are id-salted and mostly
    // unique — the checks here are structural: conservation and
    // tier nesting at volume).
    val docs = spark.read.format("graft-synth")
      .option("rows", 1000000).option("parts", 32).option("seed", 13)
      .load()
    val rows = Multimodal.multimodalDedupOver(
        graft.multimodal.Multimodal.payloadsOver(docs))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (nE, gE, dE, mE) = rows("exact")
    val (nR, gR, dR, mR) = rows("resized")
    assert(nE === 1000000L && nR === 1000000L)
    assert(gE === nE - dE && gR === nR - dR)
    assert(gR <= gE, "tier nesting: resized groups <= exact groups")
    assert(mR >= mE && mE >= 1L)
  }
}
