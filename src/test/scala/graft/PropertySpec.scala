package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks (SURVEY §5.2): operator algebra that must hold for
  * ALL inputs, not just the fixtures. Kept small (few cases, tiny data) —
  * each case runs real Spark jobs. */
class PropertySpec extends SparkSpec {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(5)
  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val texts: Gen[List[String]] =
    Gen.listOfN(20, Gen.oneOf("a", "b", "c", "a b", "b c", "a b c"))

  test("dedup is idempotent: f(f(x)) == f(x)") {
    import spark.implicits._
    check(Prop.forAll(texts) { xs =>
      val df = xs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def f(d: org.apache.spark.sql.DataFrame) =
        d.groupBy("text").agg(min("doc_id").as("doc_id"))
          .select("doc_id", "text")
      val once = f(df).collect().toSet
      val twice = f(f(df)).collect().toSet
      once == twice
    })
  }

  test("left join preserves left cardinality for unique right keys") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(15, Gen.chooseNum(0L, 5L)),
                      Gen.someOf(0L to 5L)) { (lks, rks) =>
      val l = lks.toDF("k")
      val r = rks.toList.distinct.map(k => (k, s"v$k")).toDF("k", "v")
      l.join(r, Seq("k"), "left").count() == lks.length
    })
  }

  test("graft_srp_sign: interpreted eval == codegen == Scala reference") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    import graft.expressions.SrpSign
    val vecs: Gen[List[Double]] =
      Gen.listOfN(8, Gen.chooseNum(-4.0, 4.0).map(x => math.rint(x * 64) / 64))
    check(Prop.forAll(vecs) { v =>
      // Scala reference: bit r = sign of the plane-row dot product
      var ref = 0L
      for (r <- 0 until 64) {
        var dot = 0.0
        for (k <- v.indices) dot += SrpSign.planes(r * SrpSign.MaxDim + k) * v(k)
        if (dot >= 0.0) ref |= (1L << r)
      }
      // interpreted path (nullSafeEval — the codegen-fallback mode)
      val interp = SrpSign(Literal(ArrayData.toArrayData(v.toArray),
        ArrayType(DoubleType))).eval().asInstanceOf[Long]
      // codegen path through a real plan
      import spark.implicits._
      val viaPlan = Seq(v.toArray).toDF("emb")
        .selectExpr("graft_srp_sign(emb)").head().getLong(0)
      interp == ref && viaPlan == ref
    })
  }

  test("set algebra: (A except B) disjoint from B, subset of A") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(12, Gen.chooseNum(0L, 8L)),
                      Gen.listOfN(12, Gen.chooseNum(0L, 8L))) { (as, bs) =>
      val a = as.toDF("k")
      val b = bs.toDF("k")
      val ex = a.except(b).collect().map(_.getLong(0)).toSet
      ex.intersect(bs.toSet).isEmpty && ex.subsetOf(as.toSet)
    })
  }
}
