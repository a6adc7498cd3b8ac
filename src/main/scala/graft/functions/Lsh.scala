package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic random-hyperplane LSH for cosine similarity — the
  * scale path that replaces the reference's HNSW index intent
  * (reference: db/init.sql:50-52 `USING hnsw (embedding
  * vector_cosine_ops)`) with a shuffle-friendly, partition-prunable
  * bucket scheme.
  *
  * Hyperplanes are Rademacher (±1) vectors derived from md5 at
  * PLAN-BUILD time on the driver: w(p)(i) = sign of the parity of the
  * first hex char of md5("p:i"). Because the planes are data- and
  * engine-independent constants, the exact same ±1 literals are
  * embedded in the Spark plan (as array literals, fully codegen'd)
  * and in the DuckDB oracle SQL — so the LSH-bounded queries stay
  * hash-exactly oracle-checkable, unlike an RNG-seeded model.
  *
  * Scale design (100 TB): the bucket code is a map-only projection
  * (64×P multiply-adds per row, no shuffle, no state). Writing the
  * corpus partitioned/bucketed by this code turns every ANN probe
  * into a partition-pruned read of a handful of buckets instead of a
  * full 100 TB scan.
  */
object Lsh {

  private[functions] def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** ±1 weight for (plane p, dimension i) — matches the SQL
    * expression `(ascii(substr(md5(p||':'||i),1,1)) % 2) * 2 - 1`. */
  private def weight(p: Int, i: Int): Int =
    (md5hex(s"$p:$i").charAt(0).toInt % 2) * 2 - 1

  /** The full plane matrix for nPlanes × dim. */
  def planes(nPlanes: Int, dim: Int): Seq[Seq[Int]] =
    (0 until nPlanes).map(p => (0 until dim).map(i => weight(p, i)))

  private def dotLit(v: Column, w: Seq[Int]): Column =
    aggregate(
      zip_with(v, typedLit(w.map(_.toDouble)), (x, y) => x * y),
      lit(0.0d), (acc, x) => acc + x)

  /** Long bucket code: bit p = [dot(v, plane_p) >= 0]. Long so codes
    * up to 63 planes fit (pair-banding wants 32-bit codes). Native
    * fused-loop expression ([[graft.plans.HyperplaneCode]],
    * whole-stage codegen); bit-identical to [[bucketCodeBuiltin]]. */
  def bucketCode(v: Column, ps: Seq[Seq[Int]]): Column =
    graft.plans.HyperplaneCode(v, ps)

  /** Composed-HOF reference formulation of [[bucketCode]] — kept for
    * the bitwise cross-check in LshSpec (HOFs are interpreted; the
    * native expression exists because this form pays per-element
    * closure dispatch × nPlanes). */
  def bucketCodeBuiltin(v: Column, ps: Seq[Seq[Int]]): Column =
    ps.zipWithIndex.map { case (w, p) =>
      when(dotLit(v, w) >= 0.0d, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** DuckDB expression computing the same bucket code over a
    * DOUBLE[] column expression `vExpr`. */
  def bucketCodeSql(vExpr: String, ps: Seq[Seq[Int]]): String =
    ps.zipWithIndex.map { case (w, p) =>
      val wLit = w.map(x => s"$x.0").mkString("[", ",", "]")
      s"(CASE WHEN list_inner_product($vExpr, $wLit) >= 0 THEN CAST(${1L << p} AS BIGINT) ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
