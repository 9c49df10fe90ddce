package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.SparkSpec

/** CentroidBuffer's overflow posture (round-10 verdict item 6 / advice):
  * `.toLong` on a double SATURATES silently at Long.MaxValue while the
  * DuckDB twin's CAST(floor(v * 2^20) AS BIGINT) raises — so a garbage
  * embedding component must fail LOUDLY in the engine too, per element
  * (require on the quantized magnitude) and across rows (Math.addExact,
  * because DuckDB's SUM(BIGINT) raises on wrap as well).
  */
class CentroidSumSpec extends SparkSpec {

  private def arr(vs: Double*) = new GenericArrayData(vs.toArray)

  test("quantization matches floor(v·2^20) exactly in the safe range (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // full safe magnitude range, log-uniform-ish: tiny, unit-scale, and
    // near-bound components all quantize as the oracle's floor
    val gen = Gen.chooseNum(-4.0e12, 4.0e12)
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500),
      Prop.forAll(gen) { v =>
        val buf = new CentroidBuffer(1)
        buf.add(0, arr(v))
        buf.sums(0) == math.floor(v * 1048576.0).toLong &&
          buf.counts(0) == 1L
      })
    assert(r.passed, r.status.toString)
  }

  test("a component past the 2^-20 quantization bound fails loudly (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // |v| ≥ ~4.4e12 quantizes past 2^62: the exact region where toLong
    // would saturate silently while CAST raises — both directions, any
    // magnitude up to where the double itself overflows
    val gen = for {
      mag <- Gen.chooseNum(4.5e12, 1.0e300)
      sign <- Gen.oneOf(-1.0, 1.0)
    } yield mag * sign
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500),
      Prop.forAll(gen) { v =>
        val buf = new CentroidBuffer(1)
        Prop.throws(classOf[IllegalArgumentException]) {
          buf.add(0, arr(v))
        }
      })
    assert(r.passed, r.status.toString)
  }

  test("NaN and infinite components fail loudly, not as saturated longs") {
    Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
      .foreach { v =>
        val buf = new CentroidBuffer(1)
        intercept[IllegalArgumentException] { buf.add(0, arr(v)) }
      }
  }

  test("cross-row accumulation wraps loudly via addExact, like SUM(BIGINT)") {
    // every element passes the per-element bound, but three ~4e12
    // contributions to one cluster exceed 2^63 — the oracle's SUM(BIGINT)
    // raises there, so the engine must too (addExact, not silent wrap)
    val buf = new CentroidBuffer(1)
    buf.add(0, arr(4.0e12))
    buf.add(0, arr(4.0e12))
    intercept[ArithmeticException] { buf.add(0, arr(4.0e12)) }
  }

  test("merge accumulation is addExact-guarded too") {
    val a = new CentroidBuffer(1)
    val b = new CentroidBuffer(1)
    a.add(0, arr(4.0e12)); a.add(0, arr(4.0e12))
    b.add(0, arr(4.0e12))
    intercept[ArithmeticException] { a.merge(b) }
  }
}
