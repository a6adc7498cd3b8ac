package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.plans.{NearestCellUtil, TopKRowsBuffer, TrigramSimUtil}

/** Property-based checks of the native kernels against independent
  * plain-Scala reference implementations — adversarial inputs
  * (tiny alphabets force trigram collisions, coarse doubles force
  * rank ties, arbitrary insertion orders stress the bounded
  * buffers). */
object KernelProperties extends Properties("graft.kernels") {

  // ---- TrigramSimUtil ----

  private val smallString: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'A', ' ', 'z')).map(_.mkString))

  private def refTrigrams(s: String): Set[String] =
    s.toLowerCase.sliding(3).filter(_.length == 3).toSet

  private def refSim(a: String, b: String): Double = {
    val (ta, tb) = (refTrigrams(a), refTrigrams(b))
    val union = (ta ++ tb).size
    if (union == 0) 0.0 else (ta & tb).size.toDouble / union
  }

  property("trigramSim == set-based reference") =
    forAll(smallString, smallString) { (a, b) =>
      val got = TrigramSimUtil.sim(
        UTF8String.fromString(a), UTF8String.fromString(b))
      got == refSim(a, b)
    }

  property("trigramSim symmetric and in [0,1]") =
    forAll(smallString, smallString) { (a, b) =>
      val ab = TrigramSimUtil.sim(
        UTF8String.fromString(a), UTF8String.fromString(b))
      val ba = TrigramSimUtil.sim(
        UTF8String.fromString(b), UTF8String.fromString(a))
      ab == ba && ab >= 0.0 && ab <= 1.0
    }

  // ---- WordShinglesUtil ----

  private val spaceyString: Gen[String] =
    Gen.chooseNum(0, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', ' ', ' ', 'z')).map(_.mkString))

  private def refShingles(s: String, n: Int): Seq[String] = {
    val t = s.split(" ", -1).toSeq
    if (t.length < n) Seq.empty
    else t.sliding(n).map(_.mkString(" ")).toSeq.distinct
  }

  property("wordShingles kernel == sliding-window reference") =
    forAll(spaceyString, Gen.chooseNum(2, 4)) { (s, n) =>
      val got = graft.plans.WordShinglesUtil
        .shingles(UTF8String.fromString(s), n)
        .toArray[UTF8String](
          org.apache.spark.sql.types.StringType).toSeq.map(_.toString)
      got == refShingles(s, n)
    }

  // ---- NearestCellUtil ----

  private val vec: Gen[Array[Double]] =
    Gen.listOfN(4, Gen.oneOf(-1.0, -0.5, 0.0, 0.5, 1.0)).map(_.toArray)

  private val cents: Gen[List[(Long, Array[Double])]] =
    Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 5L), vec)))

  private def centsArray(cs: List[(Long, Array[Double])]): GenericArrayData =
    new GenericArrayData(cs.map { case (cid, cv) =>
      new GenericInternalRow(Array[Any](cid, new GenericArrayData(cv)))
    }.toArray[Any])

  private def refNearest(v: Array[Double],
      cs: List[(Long, Array[Double])]): Long =
    cs.map { case (cid, cv) =>
      (v.zip(cv).map { case (x, y) => (x - y) * (x - y) }.sum, cid)
    }.min._2

  property("nearestCell == linear argmin with (dist, cid) tiebreak") =
    forAll(vec, cents) { (v, cs) =>
      NearestCellUtil.nearest(
        new GenericArrayData(v), centsArray(cs)) == refNearest(v, cs)
    }

  // ---- TopKRowsBuffer ----

  private val scoredRows: Gen[List[(Double, Long)]] =
    Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf(1.0, 2.0, 3.0), Gen.chooseNum(0L, 20L))))

  private def cmpDescAsc(a: InternalRow, b: InternalRow): Int = {
    val c = java.lang.Double.compare(b.getDouble(0), a.getDouble(0)) // desc
    if (c != 0) c else java.lang.Long.compare(a.getLong(1), b.getLong(1)) // asc
  }

  property("TopKRowsBuffer == sort-take-k under any insertion order") =
    forAll(scoredRows, Gen.chooseNum(1, 7)) { (rows, k) =>
      val buf = new TopKRowsBuffer(k, cmpDescAsc)
      rows.foreach { case (s, i) =>
        buf.add(new GenericInternalRow(Array[Any](s, i)))
      }
      buf.compact()
      val got = (0 until buf.n)
        .map(j => (buf.rows(j).getDouble(0), buf.rows(j).getLong(1)))
      val expect = rows.sortBy { case (s, i) => (-s, i) }.take(k)
      Prop(got == expect) :| s"got=$got expect=$expect"
    }

  property("merged partial TopKRowsBuffers == global sort-take-k") =
    forAll(scoredRows, scoredRows, Gen.chooseNum(1, 5)) { (r1, r2, k) =>
      val b1 = new TopKRowsBuffer(k, cmpDescAsc)
      val b2 = new TopKRowsBuffer(k, cmpDescAsc)
      r1.foreach { case (s, i) =>
        b1.add(new GenericInternalRow(Array[Any](s, i))) }
      r2.foreach { case (s, i) =>
        b2.add(new GenericInternalRow(Array[Any](s, i))) }
      b1.merge(b2)
      b1.compact()
      val got = (0 until b1.n)
        .map(j => (b1.rows(j).getDouble(0), b1.rows(j).getLong(1)))
      val expect = (r1 ++ r2).sortBy { case (s, i) => (-s, i) }.take(k)
      Prop(got == expect) :| s"got=$got expect=$expect"
    }
}
