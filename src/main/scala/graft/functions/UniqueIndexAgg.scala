package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** I2: `vs_unique` as a typed `Aggregator` (the custom-UDAF surface;
  * reference combiner `calc/gdalos_combine.py:58-69`). The built-in
  * composition in [[graft.raster.Combine.vsUnique]] is the production
  * path — this Aggregator exists for the cases built-ins can't
  * express, and its constant-size buffer (two ints) is the pattern
  * that keeps custom aggregates scale-safe (contrast: Spark's
  * `median()` buffers whole groups).
  *
  * Input: (rid, v); output: the unique covering rid, 254 if several,
  * 255 if none — "covering" = v > threshold.
  */
final case class UniqueIn(rid: Int, v: Double)
final case class UniqueBuf(nz: Int, uniq: Int)

class UniqueIndexAgg(threshold: Double = 4.0,
                     multiVal: Double = 254.0, allZero: Double = 255.0)
  extends Aggregator[UniqueIn, UniqueBuf, Double] {

  def zero: UniqueBuf = UniqueBuf(0, -1)

  def reduce(b: UniqueBuf, in: UniqueIn): UniqueBuf =
    if (in.v > threshold) UniqueBuf(b.nz + 1, math.max(b.uniq, in.rid)) else b

  def merge(a: UniqueBuf, b: UniqueBuf): UniqueBuf =
    UniqueBuf(a.nz + b.nz, math.max(a.uniq, b.uniq))

  def finish(b: UniqueBuf): Double =
    if (b.nz == 0) allZero
    else if (b.nz > 1) multiVal
    else b.uniq.toDouble

  def bufferEncoder: Encoder[UniqueBuf] = Encoders.product[UniqueBuf]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
