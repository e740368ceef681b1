package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Calibration, Profile, TimeSeries}

/** Fleiss' kappa, functional-dependency audit, and moving-average
  * trend decomposition — hand-computable cases. */
class AuditOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fleissKappa reproduces Fleiss 1971 hand algebra on a 4-item case") {
    // 4 items, 2 raters; agreement on items 1,2 (cat a), disagreement
    // on 3,4. n=2: P_i = (sum n_ij^2 - 2)/2 -> 1,1,0,0; P-bar = 0.5.
    // totals: a: 2+2+1+1 = 6? ratings: i1:(a,a) i2:(a,a) i3:(a,b) i4:(b,a)
    // c_a = 6, c_b = 2, N*n = 8 -> p_e = (36+4)/64 = 0.625
    // kappa = (0.5 - 0.625)/(1 - 0.625) = -0.333333
    val r = Seq((1, "a"), (1, "a"), (2, "a"), (2, "a"),
      (3, "a"), (3, "b"), (4, "b"), (4, "a")).toDF("item", "cat")
    val row = Calibration.fleissKappa(r, "item", "cat", nRaters = 2).head()
    assert(row.getLong(0) == 4 && row.getLong(1) == 2)
    assert(math.abs(row.getDouble(2) - 0.5) < 1e-9)
    assert(math.abs(row.getDouble(3) - 0.625) < 1e-9)
    assert(math.abs(row.getDouble(4) - (-0.333333)) < 1e-6)
  }

  test("fleissKappa rejects ragged rating counts instead of biasing P-bar") {
    val r = Seq((1, "a"), (1, "a"), (2, "a")).toDF("item", "cat")
    val e = intercept[Exception] {
      Calibration.fleissKappa(r, "item", "cat", nRaters = 2).collect()
    }
    assert(e.getMessage != null)
  }

  test("functionalDeps: holding FD has zero violations, broken FD counts g3") {
    // det=1 -> dep x,x,y (2 distinct, keep 2 of 3 -> g3 1);
    // det=2 -> dep z,z (holds)
    val df = Seq((1, "x"), (1, "x"), (1, "y"), (2, "z"), (2, "z"))
      .toDF("det", "dep")
    val out = Profile.functionalDeps(df, "t", Seq(("det", "dep")))
      .head()
    assert(out.getString(0) == "t")
    assert(out.getLong(3) == 2)      // n_groups
    assert(out.getLong(4) == 1)      // violating_groups
    assert(out.getLong(5) == 1)      // g3_rows
    assert(out.getLong(6) == 0)      // holds
    val key = Profile.functionalDeps(
      df.withColumn("id", monotonically_increasing_id()), "t",
      Seq(("id", "dep"))).head()
    assert(key.getLong(4) == 0 && key.getLong(6) == 1)
  }

  test("trendDecompose: constant series has flat trend, zero seasonal/residual") {
    // one event per day for 14 days -> counts all 1
    val ts = (0 until 14).map(dday => dday * 86400000000000L + 1L)
    val df = ts.toDF("ts")
    val out = TimeSeries.trendDecompose(df, "ts",
      bucketWidth = 86400000000000L, period = 7, halfWindow = 3).collect()
    assert(out.length == 14)
    out.foreach { r =>
      assert(r.getLong(1) == 1L)
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)   // trend
      assert(math.abs(r.getDouble(4)) < 1e-9)          // seasonal
      assert(math.abs(r.getDouble(5)) < 1e-9)          // residual
    }
  }

  test("trendDecompose densifies gaps with zero counts and guards span") {
    val df = Seq(0L, 5 * 86400000000000L).toDF("ts")
    val out = TimeSeries.trendDecompose(df, "ts", 86400000000000L,
      period = 7, halfWindow = 1).collect()
    assert(out.length == 6)
    assert(out.map(_.getLong(1)).sum == 2)
    intercept[IllegalArgumentException] {
      TimeSeries.trendDecompose(
        Seq(0L, 105000L * 86400000000000L).toDF("ts"),
        "ts", 86400000000000L, period = 7)
    }
  }

  test("trendDecompose seasonal indices sum the detrended mass per phase") {
    // weekly sawtooth: weekend spike over 4 weeks
    val ts = for (w <- 0 until 4; dow <- 0 until 7;
                  k <- 0 until (if (dow == 6) 5 else 1))
      yield (w * 7 + dow) * 86400000000000L + k.toLong
    val out = TimeSeries.trendDecompose(ts.toDF("ts"), "ts",
      86400000000000L, period = 7, halfWindow = 3)
    val spike = out.filter(col("phase") === 6)
      .select("seasonal").head().getDouble(0)
    val flat = out.filter(col("phase") === 2)
      .select("seasonal").head().getDouble(0)
    assert(spike > 2.0, s"weekend seasonal index $spike should spike")
    assert(flat < 0, s"weekday seasonal index $flat should dip")
  }
}
