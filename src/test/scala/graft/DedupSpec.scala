package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.functions.TextFunctions._

/** Direct evidence for the dedup scale claims: star candidates stay
  * LINEAR in corpus size even though this corpus contains large
  * duplicate clusters (all-pairs would be quadratic), and the
  * SimHash pair stage respects its Hamming bound. */
class DedupSpec extends SparkSuite {

  test("LSH star candidates are bounded by docs × bands (never quadratic)") {
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val feats = docs.select(col("doc_id"),
      explode(tokenSet(col("text"))).as("f"))
    val nCand = Dedup.bandCandidates(Dedup.signature(feats)).count()
    // Star generation: each doc contributes at most one pair per
    // band. All-pairs within this corpus's duplicate clusters would
    // exceed this bound by orders of magnitude.
    assert(nCand <= nDocs * Dedup.NumBands,
      s"$nCand candidates for $nDocs docs × ${Dedup.NumBands} bands")
    assert(nCand > 0, "corpus has near-dups; candidates must exist")
  }

  test("simhash pairs respect the Hamming radius") {
    val rows = Dedup.simhashPairs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(3) <= 10))
  }

  test("containment >= jaccard on any shared candidate pair") {
    // |A∩B|/min(|A|,|B|) >= |A∩B|/|A∪B| always.
    val cont = Dedup.containment(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val jac = Dedup.minhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val shared = cont.keySet intersect jac.keySet
    assert(shared.nonEmpty)
    shared.foreach(k => assert(cont(k) >= jac(k) - 1e-9, s"$k"))
  }
}
