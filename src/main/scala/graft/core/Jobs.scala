package graft.core

/** I3/F3/F5: job fan-out and ordering — the reference's
  * sequence-valued-argument recursion (`gdalos_trans.py:62-70,263-281`:
  * one logical call expands to the cross product of its
  * sequence-typed args) and the planned job model (`WHATDO.md:9-16`).
  * Driver-side planning: each job row becomes an independent Spark
  * job sharing the plan builder.
  */
object Jobs {

  /** Expand a parameter map: every Seq-valued key multiplies the job
    * list (cross product, `gdalos_trans_sequence_keys` semantics).
    * Deterministic order: keys sorted, values in given order.
    */
  def expand(params: Map[String, Any]): Seq[Map[String, Any]] = {
    val (seqKeys, scalarKeys) = params.partition(_._2.isInstanceOf[Seq[_]])
    seqKeys.toSeq.sortBy(_._1).foldLeft(Seq(scalarKeys)) {
      case (jobs, (k, vs: Seq[_])) =>
        for { j <- jobs; v <- vs } yield j + (k -> v)
      case (jobs, _) => jobs
    }
  }

  /** F3 job ordering: "sort jobs by expected size then dependency"
    * (`WHATDO.md:15`) — largest first so stragglers start early.
    */
  def orderBySize[T](jobs: Seq[T])(size: T => Double): Seq[T] =
    jobs.sortBy(j => -size(j))

  /** F5 `vp_slice` / input cap (`make_slice` `viewshed_calc.py:105-110`,
    * cap `:245-247`): slice a parameter vector, then enforce the
    * backend's input cap.
    */
  def slice[T](xs: Seq[T], from: Option[Int], to: Option[Int],
               step: Option[Int] = None): Seq[T] = {
    val s = xs.slice(from.getOrElse(0), to.getOrElse(xs.length))
    step.filter(_ > 1).map(st => s.grouped(st).map(_.head).toSeq).getOrElse(s)
  }

  def capInputs[T](xs: Seq[T], cap: Int): Seq[T] = {
    require(cap > 0, "cap must be positive")
    if (xs.length <= cap) xs else xs.take(cap)
  }
}
