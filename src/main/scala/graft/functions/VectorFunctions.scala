package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.plans.CosineSimilarity

/** Vector math as `Column` expressions (codegen'd; no UDFs).
  *
  * The reference's vector surface is pgvector's cosine operator over
  * vector(768) columns (reference: db/init.sql:50-53,
  * db/search_strategies.py:160-168). Here vectors are
  * `array<double>` columns and all math is either the fused native
  * expression [[graft.plans.CosineSimilarity]] (hot path) or
  * `functions.aggregate`/`zip_with` compositions (reference
  * implementations, used in tests to cross-check the native
  * expression).
  *
  * Accumulation is strictly left-to-right in index order, matching a
  * sequential double fold — the property the DuckDB oracle relies on
  * for hash-exact comparisons.
  */
object VectorFunctions {

  /** Fused native cosine similarity (WholeStageCodegen). */
  def cosineSim(a: Column, b: Column): Column = CosineSimilarity(a, b)

  /** Sequential-fold dot product via built-ins; reference
    * implementation for tests. */
  def dotBuiltin(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /** L2 norm via built-ins. */
  def normBuiltin(a: Column): Column = sqrt(dotBuiltin(a, a))

  /** Cosine similarity via built-ins; reference implementation for
    * tests (must agree bitwise with [[cosineSim]]). */
  def cosineBuiltin(a: Column, b: Column): Column =
    dotBuiltin(a, b) / (normBuiltin(a) * normBuiltin(b))

  /** Squared euclidean distance via built-ins (sequential fold —
    * DuckDB-parity order). */
  def dist2Builtin(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, v) => acc + v)

  /** Fixed-point micro-unit encoding of a double vector (exact,
    * order-independent accumulation; |x| must stay < 2147 to fit
    * int). The shared half of every elementwise-mean pipeline —
    * pair with [[microMean]] and [[graft.plans.ElementwiseSum]]. */
  def microInts(v: Column): Column =
    transform(v, x => round(x * 1e6).cast("int"))

  /** Decode summed micro-units back to the elementwise mean:
    * m / n / 1e6 in that exact operation order (the DuckDB oracle
    * divides the same way). */
  def microMean(sums: Column, n: Column): Column =
    transform(sums, m => m.cast("double") / n / lit(1e6))

  /** L2-normalize a vector (unit length); zero vector passes through. */
  def l2Normalize(a: Column): Column = {
    val n = normBuiltin(a)
    when(n === 0.0d, a).otherwise(transform(a, x => x / n))
  }
}
