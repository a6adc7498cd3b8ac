package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join utilities — the explicit tools SURVEY §4
  * reaches for when AQE's runtime skew-join split isn't available
  * (stateful ops, or a key so hot one task would still spill).
  *
  * `saltedJoin` implements the standard replicate-and-salt scheme
  * for an inner equi-join whose LEFT side has hot keys:
  *
  *  - every left row gets a deterministic salt in [0, salts) derived
  *    by hashing its whole row (xxhash64 — cheap, uniform, and
  *    rand()-free so the plan stays reproducible);
  *  - the right side is replicated `salts`× via a posexplode, so
  *    each (key, salt) bucket finds its match;
  *  - the join key becomes (key, salt): a hot key's rows now spread
  *    over `salts` reducer tasks instead of one.
  *
  * Cost model: right side is replicated salts× (choose the SMALLER
  * side as "right"), left side is not amplified at all. Result
  * equals the plain inner equi-join row-for-row (proved in
  * SkewSpec).
  */
object Skew {

  /** Inner equi-join `left ⋈ right ON key`, salted against hot left
    * keys. `hashCols` picks the left columns whose values spread the
    * salt (default: the key plus all non-key columns would work, but
    * any high-entropy column set does). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, hashCols: Seq[Column]): DataFrame = {
    require(salts >= 1, "salts >= 1")
    val l = left.withColumn("__salt",
      pmod(xxhash64(hashCols: _*), lit(salts.toLong)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
