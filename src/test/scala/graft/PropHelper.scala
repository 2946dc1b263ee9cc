package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.Assertions

/** Minimal scalacheck-on-scalatest bridge (scalatestplus isn't in the
  * offline cache). Runs a Prop with a fixed seed count and asserts it
  * passed, printing the first failing args. */
trait PropHelper extends Assertions {
  def checkProp(prop: Prop, minTests: Int = 200): Unit = {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(minTests)
    val res = SCTest.check(params, prop)
    assert(res.passed, s"property failed: ${res.status}")
  }
  def forAllP[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Boolean): Unit =
    checkProp(Prop.forAll(ga, gb)(f))
  def forAllP[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Boolean): Unit =
    checkProp(Prop.forAll(ga, gb, gc)(f))
}
