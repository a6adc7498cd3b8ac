package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Single-hash xor-trick MinHash primitives.
  *
  * Instead of hashing every feature NumHashes times (round 1 spent 16
  * md5 calls per token — flagged as ~16× the necessary hash work),
  * each feature is md5'd ONCE into a 60-bit base value; hash family
  * member i is `base XOR seed_i` for a fixed 60-bit seed. XOR with a
  * constant is a bijection of the hash space, the standard cheap
  * min-wise family. Seeds are md5-derived constants computed on the
  * driver, so the DuckDB oracle embeds the identical values.
  *
  * 60 bits (15 hex chars) keeps the value inside a signed BIGINT on
  * both engines: Spark `conv(_, 16, 10) cast long`, DuckDB
  * `CAST('0x…' AS BIGINT)`.
  */
object MinHash {

  val NumHashes = 16

  /** 60-bit base hash of a string column (native digest-byte
    * expression; bit-identical to [[hash60Builtin]]). */
  def hash60(c: Column): Column = graft.plans.Md5Prefix60Expr(c)

  /** Composed-builtin reference formulation (hex render + conv parse)
    * — kept for the bitwise cross-check in LshSpec. */
  def hash60Builtin(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB twin of [[hash60]] over expression `e`. */
  def hash60Sql(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  /** Driver-side twin of [[hash60]] for strings known at plan time —
    * used to turn literal query terms into index-bucket ids so a
    * bucketed-index probe can partition-prune before any read. */
  def hash60Local(s: String): Long =
    java.lang.Long.parseLong(Lsh.md5hex(s).take(15), 16)

  /** Fixed 60-bit seeds, seed_i = first 15 hex chars of md5("seed:i"). */
  val seeds: Seq[Long] = (0 until NumHashes).map(i =>
    java.lang.Long.parseLong(Lsh.md5hex(s"seed:$i").take(15), 16))
}
