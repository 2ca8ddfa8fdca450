package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property-check harness over ScalaCheck `Gen`
  * (the scalatest↔scalacheck bridge artifact is not in the offline
  * cache). Fixed seed → reproducible failures.
  */
trait PropCheck {
  def forAllN[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    for (_ <- 0 until n) {
      f(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  def forAllN2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 100)(f: (A, B) => Unit): Unit =
    forAllN(org.scalacheck.Gen.zip(ga, gb), n) { case (a, b) => f(a, b) }

  def forAllN3[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C], n: Int = 100)(f: (A, B, C) => Unit): Unit =
    forAllN(org.scalacheck.Gen.zip(ga, gb, gc), n) { case (a, b, c) => f(a, b, c) }
}
