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
}
