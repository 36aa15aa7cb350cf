package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.Tables.dec

/** Property layer (SURVEY.md §5.3): algebraic laws that must hold on any
  * data — few cases each, since every case runs Spark jobs. */
object GraftProperties extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.session
  import org.apache.spark.sql.{DataFrame, Dataset}

  private def df(xs: List[Double]): DataFrame = {
    val sess = spark
    import sess.implicits._
    xs.toDF("x")
  }

  // money-like doubles with 2 fractional digits
  private val moneyGen: Gen[List[Double]] =
    Gen.listOfN(40, Gen.chooseNum(-99999L, 99999L).map(_ / 100.0))

  property("decimal sum is invariant under repartitioning") =
    Prop.forAll(moneyGen) { xs =>
      val base = df(xs)
      val a = base.repartition(1).agg(sum(dec(col("x")))).head().getDecimal(0)
      val b = base.repartition(7).agg(sum(dec(col("x")))).head().getDecimal(0)
      (xs.isEmpty && a == null && b == null) || a.compareTo(b) == 0
    }

  property("filter partitions the row count") =
    Prop.forAll(moneyGen) { xs =>
      val base = df(xs)
      val p = col("x") > 0.0
      base.count() == base.filter(p).count() + base.filter(!p).count()
    }

  property("dropDuplicates is idempotent") =
    Prop.forAll(Gen.listOfN(30, Gen.chooseNum(0, 5))) { xs =>
      val sess = spark
      import sess.implicits._
      val base = xs.toDF("k")
      base.dropDuplicates("k").dropDuplicates("k").count() ==
        base.dropDuplicates("k").count()
    }

  property("unionAll counts add") =
    Prop.forAll(moneyGen, moneyGen) { (a, b) =>
      df(a).unionAll(df(b)).count() == a.size + b.size
    }
}
