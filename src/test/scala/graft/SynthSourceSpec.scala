package graft

import org.apache.spark.sql.functions._

/** The graft-synth DSv2 connector must actually deliver the two
  * scale behaviors it advertises — column pruning into the reader
  * and doc_id filter pushdown that prunes input partitions — plus
  * determinism and correct residual filtering. */
class SynthSourceSpec extends SparkSuite {

  private def synth(rows: Long, parts: Int, seed: Long = 0L) =
    spark.read.format("graft-synth")
      .option("rows", rows).option("parts", parts).option("seed", seed)
      .load()

  test("generates the declared row count with the documents schema") {
    val df = synth(1000, 8)
    assert(df.count() === 1000L)
    assert(df.columns.toSeq ===
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    val r = df.where(col("doc_id") === 123).head()
    assert(r.getAs[Long]("n_chars") === r.getAs[String]("text").length.toLong)
  }

  test("deterministic: same seed same corpus, different seed different") {
    val a = synth(200, 4, seed = 7).orderBy("doc_id").collect().toSeq
    val b = synth(200, 4, seed = 7).orderBy("doc_id").collect().toSeq
    val c = synth(200, 4, seed = 8).orderBy("doc_id").collect().toSeq
    assert(a === b)
    assert(a !== c)
  }

  test("column pruning reaches the scan (narrowed ReadSchema)") {
    val q = synth(100, 4).select(col("doc_id"), col("source"))
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("graft-synth"), plan)
    assert(plan.contains("cols=doc_id,source"),
      s"scan must carry only required columns:\n$plan")
    assert(!plan.contains("cols=doc_id,text"), plan)
  }

  test("doc_id filters prune input partitions and rows exactly") {
    // 1000 ids over 10 partitions of 100; doc_id < 150 must plan 2.
    val df = synth(1000, 10).where(col("doc_id") < 150)
    assert(df.rdd.getNumPartitions === 2,
      "range filter must prune partitions at planning time")
    assert(df.count() === 150L)
    // Residual filtering inside the surviving partition: exact window.
    val win = synth(1000, 10)
      .where(col("doc_id") >= 42 && col("doc_id") <= 57)
    assert(win.rdd.getNumPartitions === 1)
    assert(win.agg(min("doc_id"), max("doc_id"), count(lit(1)))
      .head().toSeq === Seq(42L, 57L, 16L))
    // Point lookup plans a single partition, returns one row.
    val pt = synth(1000, 10).where(col("doc_id") === 901)
    assert(pt.rdd.getNumPartitions === 1)
    assert(pt.count() === 1L)
    // Contradictory window plans zero partitions, zero rows.
    val empty = synth(1000, 10)
      .where(col("doc_id") > 800 && col("doc_id") < 700)
    assert(empty.rdd.getNumPartitions === 0)
    assert(empty.count() === 0L)
  }

  test("non-doc_id filters stay with Spark and still apply") {
    val df = synth(500, 4).where(col("lang") === "en")
    val n = df.count()
    assert(n > 0 && n < 500)
    assert(df.select("lang").distinct().collect().map(_.getString(0)).toSeq
      === Seq("en"))
  }

  test("scale smoke: 200k synthetic docs through dedup-shape + audit sink") {
    // End-to-end zero-storage scale exercise: generate 200k docs,
    // run the exact-dedup shape (md5 groupBy — the 100 TB workhorse),
    // account results in the audit sink. Verifies the engine path at
    // 40x the sf0.001 corpus with no files anywhere.
    graft.sources.AuditSink.reset("scale")
    val docs = synth(200000, 32)
    val winners = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep"), count(lit(1)).as("n_dups"))
    winners.write.format("graft-audit").option("name", "scale")
      .mode("append").save()
    val st = graft.sources.AuditSink.stats("scale").get
    assert(st.rows > 100000L && st.rows <= 200000L,
      s"dedup winners out of range: ${st.rows}")
  }

  test("embeddings shape: schema, pushdown on vec_id, vector ops work") {
    val e = spark.read.format("graft-synth")
      .option("shape", "embeddings").option("rows", 20000)
      .option("parts", 10).load()
    assert(e.columns.toSeq === Seq("vec_id", "label", "embedding"))
    assert(e.where(col("vec_id") < 2000).rdd.getNumPartitions === 1)
    // a real vector operator over synthetic load: brute cosine top-5
    val q = e.where(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))
    val top = e.where(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
        graft.functions.VectorFunctions.cosineSim(col("embedding"),
          col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(5).collect()
    assert(top.length === 5)
    assert(top.forall(r => math.abs(r.getDouble(1)) <= 1.000001))
  }

  test("scale smoke: 500k synthetic vectors through the LSH ANN path") {
    // The ANN index shape at 25x the sf0.1 corpus, zero storage:
    // bucket 500k vectors map-only, probe one query's bucket ± all
    // 1-bit neighbors, exact-rank only the candidates. Asserts the
    // scan-fraction contract that makes the path viable at 100 TB —
    // candidates are a few percent of the corpus, never a full scan.
    import graft.functions.{Lsh, VectorFunctions}
    val planes = Lsh.planes(8, 64)
    val e = spark.read.format("graft-synth")
      .option("shape", "embeddings").option("rows", 500000)
      .option("parts", 32).load()
    val corpus = e.where(col("vec_id") =!= 0L)
      .select(col("vec_id"), col("embedding"),
        Lsh.bucketCode(col("embedding"), planes).as("bucket"))
    val probes = e.where(col("vec_id") === 0L)
      .select(col("embedding").as("qvec"),
        Lsh.bucketCode(col("embedding"), planes).as("qb"))
      .select(col("qvec"), explode(array((lit(0) +: (0 until 8)
        .map(p => lit(1 << p))).map(m => col("qb").bitwiseXOR(m)): _*))
        .as("bucket"))
    val cand = corpus.join(broadcast(probes), Seq("bucket"))
    val nCand = cand.count()
    assert(nCand > 0L)
    assert(nCand.toDouble / 500000 < 0.10,
      s"probe scanned $nCand of 500k — bucketing isn't pruning")
    val top = cand
      .select(col("vec_id"),
        VectorFunctions.cosineSim(col("embedding"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(10).collect()
    assert(top.length === 10)
  }

  test("events shape: schema, time-bucket aggregation, JSON props") {
    val ev = spark.read.format("graft-synth")
      .option("shape", "events").option("rows", 10000)
      .option("parts", 8).load()
    assert(ev.columns.toSeq ===
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    val buckets = ev.groupBy(date_trunc("day", col("ts")), col("event_type"))
      .count()
    assert(buckets.count() > 30) // ~30 days × 5 types
    assert(ev.where(get_json_object(col("props"), "$.k").cast("long")
      .between(0, 99)).count() === 10000L)
  }

  test("micro-batch stream: multi-batch replay equals the batch read") {
    // Zero-storage streaming harness: the same deterministic id space
    // delivered as 5 micro-batches (ids in order, event TIMES heavily
    // disordered across batches), windowed-aggregated with state, and
    // compared against the one-shot batch read of the identical
    // generator — stream == batch with no files anywhere.
    import org.apache.spark.sql.streaming.Trigger
    val opts = Map("shape" -> "events", "rows" -> "20000",
      "parts" -> "4", "seed" -> "3", "rowsPerBatch" -> "4000")
    val stream = opts.foldLeft(spark.readStream.format("graft-synth")) {
      case (r, (k, v)) => r.option(k, v) }.load()
    val agg = stream
      .withWatermark("ts", "100 days") // keep every window open: exactness
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 1e6).cast("long")).as("sv"))
    val q = agg.writeStream.format("memory").queryName("synth_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("synth_stream")
      .select(col("window.start").as("b"), col("event_type"), col("n"),
        col("sv")).orderBy("b", "event_type").collect().toSeq
    val want = opts.foldLeft(spark.read.format("graft-synth")) {
      case (r, (k, v)) => r.option(k, v) }.load()
      .groupBy(date_trunc("day", col("ts")).as("b"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 1e6).cast("long")).as("sv"))
      .orderBy("b", "event_type").collect().toSeq
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("the synthetic corpus drives real text operators") {
    // The vocabulary matches the testdata generator's, so shingle /
    // quality operators behave realistically on synthetic load.
    val toks = synth(200, 4)
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count()
    assert(toks.count() > 10)
  }
}
