package graft.core

/** Extent partition grids (reference `partitions.py:9-24`): split a job
  * extent into p ≈ a×b grid cells, factorizing p into its two greatest
  * divisors. In Spark the parallel plan itself is native partitioning;
  * this survives for output sharding (R5, `gdalos_trans.py:560-563`).
  */
object Partitions {

  /** `find_two_greatest_devisors` (`partitions.py:9-14`): (a,b) with
    * a*b == x, b the largest divisor ≤ √x, a ≥ b.
    */
  def findTwoGreatestDivisors(x: Int): (Int, Int) = {
    val sqrtX = math.sqrt(x.toDouble).toInt
    (sqrtX to 2 by -1).find(x % _ == 0) match {
      case Some(y) => (x / y, y)
      case None    => (x, 1)
    }
  }

  /** `make_partitions` (`partitions.py:17-24`): the (i,j) grid cells of
    * an nx×ny split; if only a cell count is given, factorize it.
    */
  def makePartitions(extent: GeoRectangle, parts: Int): Seq[GeoRectangle] = {
    val (nx, ny) = findTwoGreatestDivisors(parts)
    makePartitions(extent, nx, ny)
  }

  def makePartitions(extent: GeoRectangle, nx: Int, ny: Int): Seq[GeoRectangle] =
    for { i <- 0 until nx; j <- 0 until ny } yield extent.partition(i, j, nx, ny)
}
