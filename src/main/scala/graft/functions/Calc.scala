package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** I1: the `gdal_calc` A..Z expression surface
  * (`calc/gdal_calc.py:3` re-export; invocation shape
  * `viewshed_calc.py:513-525`): N aligned rasters named A..Z combined
  * by a user expression string.
  *
  * Spark-first translation: align the inputs with an N-way equi-join
  * on the pixel key (C1), expose each input's value column under its
  * letter, and hand the expression string to Catalyst via `expr()` —
  * the user surface is SQL scalar syntax (`expr("greatest(A, B) * 2")`),
  * which is strictly richer than the numpy eval the reference wraps,
  * and codegen-compiles instead of eval'ing Python per block.
  */
object Calc {

  /** Combine aligned pixel frames by expression. `inputs` maps letter →
    * frame (standard pixel schema); `expression` refers to the letters
    * as columns. Returns (band,px,py,v).
    */
  /** `user_namespace` analogue (`gdal_calc.Calc(..., user_namespace=
    * {'f': f})`, use at `viewshed_calc.py:513-525`): register a scalar
    * function under a name usable inside calc expressions —
    * `calc(inputs, "f(A) + B")`.
    */
  def registerUserFunction(spark: org.apache.spark.sql.SparkSession,
                           name: String, f: Double => Double): Unit =
    spark.udf.register(name, f)

  def calc(inputs: Map[String, DataFrame], expression: String): DataFrame = {
    require(inputs.nonEmpty, "need at least one input")
    require(inputs.keys.forall(k => k.length == 1 && k.head.isLetter && k.head.isUpper),
      "input names must be single letters A..Z (gdal_calc convention)")
    val renamed = inputs.map { case (letter, df) =>
      df.select(col("band"), col("px"), col("py"), col("v").as(letter))
    }
    val joined = renamed.reduce(_.join(_, Seq("band", "px", "py")))
    joined.select(col("band"), col("px"), col("py"), expr(expression).as("v"))
  }
}
