package graft.pipeline

import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.KmvBuffer

/** The admission-hash FLATNESS property (round-10 verdict item 9).
  *
  * p07/p09 admit a document iff `hash(prefix || doc_id) % 10^6 <
  * floor(rate·10^6)` — correct only when the hash's low 6 decimal digits
  * are uniform. The round-10 lesson: the raw 31-poly fold over a SHORT key
  * ('mix|123' never wraps mod P) has STRUCTURED low bits, and the realized
  * admission ran 16-100% against a 48% request. The fix is poly-of-MD5
  * (MD5 supplies the avalanche, the fold condenses it portably). This spec
  * pins the fix as a property — realized/requested within binomial bounds
  * across prefixes and rates — so the next short-key admission path cannot
  * reintroduce the bias, and keeps the broken form's failure measured so
  * the property is known to have teeth.
  */
class AdmissionHashSpec extends SparkSpec {

  private def md5Poly(s: String): Long =
    KmvBuffer.md5PolyHash(UTF8String.fromString(s))

  /** Realized admission count over ids [0, n) at `rate` under `hash`. */
  private def admitted(prefix: String, n: Int, rate: Double,
      hash: String => Long): Int = {
    val cut = math.floor(rate * 1000000.0).toLong
    (0 until n).count(id => hash(prefix + id) % 1000000L < cut)
  }

  test("md5-poly admission is binomially flat across prefixes and rates (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val n = 5000
    val gen = for {
      // short structured prefixes — exactly the key shapes that broke the
      // raw fold (source names, pipeline stage tags)
      prefix <- Gen.oneOf("mix|", "adm|", "p07|", "a|", "", "src_web|",
        "q68|", "doc|")
      rate <- Gen.chooseNum(0.02, 0.98)
    } yield (prefix, rate)
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60),
      Prop.forAll(gen) { case (prefix, rate) =>
        val x = admitted(prefix, n, rate, md5Poly)
        val mean = n * rate
        val sigma = math.sqrt(n * rate * (1 - rate))
        // 5σ: false-alarm odds ~3e-7 per sample; a structured-bit bias of
        // the kind measured (16-100% vs 48%) sits hundreds of σ out
        math.abs(x - mean) <= 5 * sigma + 1
      })
    assert(r.passed, r.status.toString)
  }

  test("the property has teeth: the raw poly fold fails it on short ids") {
    // the EXACT broken form p09 originally shipped: 31-poly over the short
    // key directly. 'mix|<id>' for id < 10^5 never wraps mod P, so hash %
    // 10^6 is structured, not uniform — the deviation must be enormous.
    def rawPoly(s: String): Long = {
      var acc = 0L
      s.foreach(c => acc = (acc * 31 + c.toLong) % graft.functions.TextHash.P)
      acc
    }
    val n = 5000
    val rate = 0.48
    val x = admitted("mix|", n, rate, rawPoly)
    val sigma = math.sqrt(n * rate * (1 - rate))
    assert(math.abs(x - n * rate) > 20 * sigma,
      s"raw poly admission unexpectedly flat: $x of $n at rate $rate")
  }

  test("the spec's Scala model IS the engine expression (one Spark pin)") {
    // md5Poly above must equal graft_poly_hash(md5(concat(...))) — the
    // expression p07/p09 evaluate — or the property pins the wrong hash
    graft.functions.GraftFunctions.register(spark)
    val rows = spark.range(200)
      .selectExpr("id",
        "graft_poly_hash(md5(concat('mix|', CAST(id AS STRING)))) AS h")
      .collect()
    rows.foreach(r =>
      assert(r.getLong(1) == md5Poly("mix|" + r.getLong(0)), s"id ${r.get(0)}"))
  }
}
