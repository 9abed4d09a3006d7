package graft

import graft.ts.TaKernels
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the recursive kernels (SURVEY.md §5) —
  * randomized generation on top of the fixed-seed cases in
  * [[TaKernelsSpec]].
  */
object TaKernelsProps extends Properties("TaKernels") {

  private val series: Gen[Array[Double]] =
    for {
      len <- Gen.choose(1, 120)
      xs <- Gen.listOfN(len, Gen.choose(0.01, 10000.0))
    } yield xs.toArray

  property("ema warm-up boundary at n-1") = Prop.forAll(series) { c =>
    val e = TaKernels.ema(c, 10)
    e.zipWithIndex.forall { case (v, i) =>
      if (i < 9 || c.length < 10) v.isNaN else !v.isNaN
    }
  }

  property("ema within [min, max] of the series") = Prop.forAll(series) { c =>
    val e = TaKernels.ema(c, 5)
    e.filterNot(_.isNaN).forall(v =>
      v >= c.min - 1e-9 && v <= c.max + 1e-9)
  }

  property("rsi in [0, 100]") = Prop.forAll(series) { c =>
    TaKernels.rsi(c, 14).filterNot(_.isNaN).forall(v => v >= 0 && v <= 100)
  }

  property("macd = ema12 - ema26; hist = macd - signal") =
    Prop.forAll(series) { c =>
      val (m, s, h) = TaKernels.macd(c)
      val f = TaKernels.ema(c, 12)
      val sl = TaKernels.ema(c, 26)
      m.indices.forall { i =>
        (m(i).isNaN || math.abs(m(i) - (f(i) - sl(i))) < 1e-9) &&
        (h(i).isNaN || math.abs(h(i) - (m(i) - s(i))) < 1e-9)
      }
    }

  property("scaling covariance: ema(k*x) = k*ema(x)") =
    Prop.forAll(series, Gen.choose(0.5, 1000.0)) { (c, k) =>
      val a = TaKernels.ema(c, 5)
      val b = TaKernels.ema(c.map(_ * k), 5)
      a.indices.forall { i =>
        (a(i).isNaN && b(i).isNaN) ||
          math.abs(b(i) - k * a(i)) <= 1e-6 * math.max(1.0, math.abs(b(i)))
      }
    }

  property("rsi is scale-invariant") =
    Prop.forAll(series, Gen.choose(0.5, 1000.0)) { (c, k) =>
      val a = TaKernels.rsi(c, 14)
      val b = TaKernels.rsi(c.map(_ * k), 14)
      a.indices.forall { i =>
        (a(i).isNaN && b(i).isNaN) || math.abs(a(i) - b(i)) < 1e-6
      }
    }
}
