package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`):
  * brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path (pairs
  * only form inside a bucket — the plan that survives 100 TB).
  *
  * Dot products fold left-to-right over the array (higher-order
  * `aggregate`), with elements cast to double first — deterministic,
  * engine-reproducible summation order, no UDFs.
  *
  * Hyperplanes are derived from a fixed integer LCG of (plane, dim) —
  * no RNG state, same buckets on every engine and run.
  */
object Similarity {

  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  def cosineCol(a: Column, b: Column): Column =
    dotCol(a, b) / (normCol(a) * normCol(b))

  /** Exact brute-force top-k cosine neighbors of one query vector.
    * O(N) scan + top-k — correct at any scale, linear cost; the
    * baseline the bucketed variant is measured against.
    */
  def bruteTopK(emb: DataFrame, queryId: Long, k: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qvec"))
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cosine", cosineCol(col(vecCol), col("qvec")))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic hyperplane weight for (plane j, dim i): an integer
    * LCG mapped to [−1000, 1000].
    */
  private def planeWeight(j: Int, i: Column): Column =
    ((lit(j.toLong * 2654435761L) + i * 40503L) % 2001L - 1000L).cast("double")

  /** LSH bucket id: `planes` sign bits of hyperplane projections. */
  def bucketCol(vec: Column, planes: Int): Column =
    (0 until planes).map { j =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(63)),
          (x, i) => x.cast("double") * planeWeight(j, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN top-k: candidates restricted to the query's hyperplane
    * bucket, then exact cosine rank. At scale the bucket column is a
    * partition/cluster key, so a query touches 1/2^planes of the data;
    * recall is tunable via `planes` (fewer planes → bigger buckets).
    */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int, planes: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = emb.withColumn("bucket", bucketCol(col(vecCol), planes))
    val q = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qvec"), col("bucket").as("qbucket"))
    bucketed.join(broadcast(q), col("bucket") === col("qbucket"))
      .filter(col(idCol) =!= queryId)
      .withColumn("cosine", cosineCol(col(vecCol), col("qvec")))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** All-bucket histogram — diagnostics for bucket balance (skew in
    * the bucket key is the scale risk of LSH partitioning).
    */
  def bucketHistogram(emb: DataFrame, planes: Int = 8,
                      vecCol: String = "embedding"): DataFrame =
    emb.groupBy(bucketCol(col(vecCol), planes).as("bucket"))
      .agg(count(lit(1)).as("n"))
}
