package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ops.Digest

/** G1 digest: FIXTURES.md §2.3 hand vectors + scalacheck properties
  * (permutation invariance — the defining property of the reference's
  * `sorted()` at /root/reference/utils.py:9 — and Aggregator ≡ expression).
  */
class DigestSpec extends SparkSpec {
  import spark.implicits._

  private def exprDigest(xs: Seq[String]): String =
    xs.toDF("x").agg(Digest.hashListExpr(col("x"))).as[String].head()

  private def aggDigest(xs: Seq[String]): String =
    xs.toDF("x").agg(Digest.hashListUdaf(col("x"))).as[String].head()

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), p)
    assert(res.passed, res.status.toString)
  }

  private val smallLists: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.listOfN(6, Gen.alphaNumChar).map(_.mkString))
      .map(_.take(6))

  test("hand vectors (FIXTURES §2.3)") {
    assert(exprDigest(Seq("b", "a", "c")) === "900150983cd24fb0d6963f7d28e17f72")
    assert(exprDigest(Seq("a", "b", "c")) === "900150983cd24fb0d6963f7d28e17f72")
    // lexicographic: "10" < "9" → md5("109")
    assert(exprDigest(Seq("10", "9")) === exprDigest(Seq("9", "10")))
  }

  test("Aggregator twin matches expression form on hand vectors") {
    for (xs <- Seq(Seq("b", "a", "c"), Seq("10", "9"), Seq("z")))
      assert(aggDigest(xs) === exprDigest(xs))
  }

  test("property: permutation invariance") {
    check(Prop.forAll(smallLists) { xs =>
      exprDigest(xs) == exprDigest(scala.util.Random.shuffle(xs))
    })
  }

  test("property: Aggregator ≡ expression composition") {
    check(Prop.forAll(smallLists) { xs => aggDigest(xs) == exprDigest(xs) })
  }

  test("extractDate: valid date or 'unknown' (utils.py:17-21)") {
    val got = Seq("error/postgresql.log.2019-04-01-10", "no-date", "x2020-12-31x")
      .toDF("f").select(Digest.extractDate(col("f"))).as[String].collect()
    assert(got === Seq("2019-04-01", "unknown", "2020-12-31"))
  }
}
