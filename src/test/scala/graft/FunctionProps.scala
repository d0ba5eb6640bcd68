package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.functions.{DotProductExpr, EqCountExpr}

/** Property coverage for the native kernel expressions, pure (no
  * SparkSession): the static entry points the generated code calls are
  * checked against plain Scala left-folds — the same semantics the
  * interpreted HOF formulas and the DuckDB oracle reduce with — across
  * the full double range (mixed magnitudes, signs, infinities, zeros;
  * NaN excluded — NaN payload bits are not preserved through boxing).
  */
object FunctionProps extends Properties("functions") {

  private val finiteD: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-1e9, 1e9),
    Gen.oneOf(0.0, -0.0, 1e-300, -1e-300, 1e300,
      Double.PositiveInfinity, Double.NegativeInfinity))

  private val vecPair: Gen[(Array[Double], Array[Double])] = for {
    n <- Gen.chooseNum(0, 128)
    a <- Gen.listOfN(n, finiteD)
    b <- Gen.listOfN(n, finiteD)
  } yield (a.toArray, b.toArray)

  property("graft_dot == left-to-right fold, bit for bit") =
    forAll(vecPair) { case (a, b) =>
      val fast = DotProductExpr.dot(
        new GenericArrayData(a.map(Double.box)),
        new GenericArrayData(b.map(Double.box)))
      val ref = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      java.lang.Double.doubleToLongBits(fast) ==
        java.lang.Double.doubleToLongBits(ref)
    }

  private val longPair: Gen[(Array[Long], Array[Long])] = for {
    n <- Gen.chooseNum(0, 64)
    a <- Gen.listOfN(n, Gen.chooseNum(0L, 8L)) // small range forces collisions
    b <- Gen.listOfN(n, Gen.chooseNum(0L, 8L))
  } yield (a.toArray, b.toArray)

  property("graft_eq_count == positionwise equality count") =
    forAll(longPair) { case (a, b) =>
      val fast = EqCountExpr.eqCount(
        new GenericArrayData(a.map(Long.box)),
        new GenericArrayData(b.map(Long.box)))
      fast == a.zip(b).count { case (x, y) => x == y }
    }

  property("dimension mismatch is rejected loudly") =
    forAll(Gen.chooseNum(1, 32)) { n =>
      val a = new GenericArrayData(Array.fill(n)(Double.box(1.0)))
      val b = new GenericArrayData(Array.fill(n + 1)(Double.box(1.0)))
      scala.util.Try(DotProductExpr.dot(a, b)).isFailure &&
        scala.util.Try(EqCountExpr.eqCount(
          new GenericArrayData(Array.fill(n)(Long.box(1L))),
          new GenericArrayData(Array.fill(n + 1)(Long.box(1L))))).isFailure
    }
}
