package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // a hot key: 10k rows of key 1, a handful of others
  private def fact = spark.range(10100).select(
    when($"id" < 10000, 1L).otherwise($"id" % 7 + 2).as("k"),
    $"id".as("uid"), lit(1.0).as("x"))
  private def dim = (1L to 8L).map(k => (k, s"name$k")).toDF("k", "name")

  test("saltedJoin equals the plain join result") {
    val plain = fact.join(dim, "k").agg(count(lit(1)), sum($"x")).head()
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8, saltSource = $"uid")
      .agg(count(lit(1)), sum($"x")).head()
    assert(plain == salted)
    // and the hot key is actually spread across salt values
    val spread = fact.withColumn("_salt", pmod(hash($"uid"), lit(8)))
      .filter($"k" === 1).groupBy("_salt").count().count()
    assert(spread == 8)
  }

  test("saltedAgg equals the plain aggregation") {
    val plain = fact.groupBy("k")
      .agg(count(lit(1)).as("n"), max($"uid").as("mx"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedAgg(fact, "k", salts = 8, saltSource = $"uid",
      agg1 = Seq(count(lit(1)).as("n"), max($"uid").as("mx")),
      agg2 = Seq(sum($"n").as("n"), max($"mx").as("mx")))
      .orderBy("k").collect().toSeq
    assert(plain.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ==
      salted.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
  }
}
