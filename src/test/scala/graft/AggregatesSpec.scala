package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{ElementwiseSum, TopKByScore}

/** The custom bounded aggregates must agree with their unbounded
  * window/explode reference formulations. */
class AggregatesSpec extends SparkSuite {
  import spark.implicits._

  test("TopKByScore == window row_number ranking, incl. score ties") {
    val rnd = new scala.util.Random(7)
    // Coarse scores force ties so the (score desc, id asc) tiebreak
    // is actually exercised.
    val rows = Seq.tabulate(5000)(i =>
      (i % 7, rnd.nextInt(50).toDouble / 10.0, i.toLong))
    val df = rows.toDF("g", "score", "id").repartition(8)

    val viaAgg = df.groupBy($"g")
      .agg(TopKByScore($"score", $"id", 5).as("tk"))
      .select($"g", posexplode($"tk"))
      .select($"g", $"col.id".as("id"), $"col.score".as("score"),
        ($"pos" + 1).as("rnk"))

    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id".asc)
    val viaWindow = df
      .withColumn("rnk", row_number().over(w)).where($"rnk" <= 5)
      .select($"g", $"id", $"score", $"rnk".cast("long"))

    val a = viaAgg.orderBy($"g", $"rnk").collect().toSeq
    val b = viaWindow.orderBy($"g", $"rnk").collect().toSeq
    assert(a === b)
  }

  test("ElementwiseSum == explode + groupBy sum") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(2000)(i =>
      (i % 13, Array.fill(8)(rnd.nextInt(9) - 4)))
    val df = rows.toDF("g", "arr").repartition(8)

    val viaAgg = df.groupBy($"g").agg(ElementwiseSum($"arr", 8).as("s"))
      .select($"g", $"s").as[(Int, Seq[Long])].collect().toMap

    val viaExplode = df.select($"g", posexplode($"arr"))
      .groupBy($"g", $"pos").agg(sum($"col").as("s"))
      .select($"g", $"pos", $"s").as[(Int, Int, Long)].collect()
      .groupBy(_._1).map { case (g, xs) =>
        g -> xs.sortBy(_._2).map(_._3).toSeq
      }

    assert(viaAgg === viaExplode)
  }
}
