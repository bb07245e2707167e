package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** AsOfJoin: window-formulation results verified against the brute-force
  * definition (cross join + filter + best-match pick) on seeded random
  * data, plus the edge cases that decide semantics: equal timestamps,
  * strictness, tolerance, unmatched rows, duplicate right timestamps.
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def mkLeft(rows: Seq[(Long, Long, String)]): DataFrame =
    rows.toDF("k", "lts", "lval")
  private def mkRight(rows: Seq[(Long, Long, String)]): DataFrame =
    rows.toDF("k", "rts", "rval")

  /** Brute-force asof: per left row, best right row by the rule. */
  private def brute(left: Seq[(Long, Long, String)], right: Seq[(Long, Long, String)],
      forward: Boolean, strict: Boolean): Map[(Long, Long, String), Option[(Long, String)]] =
    left.map { case (k, lts, lv) =>
      val cands = right.filter { case (rk, rts, _) =>
        rk == k && (
          if (forward && strict) rts > lts
          else if (forward) rts >= lts
          else if (strict) rts < lts
          else rts <= lts)
      }
      val best = if (cands.isEmpty) None else {
        val bestTs = if (forward) cands.map(_._2).min else cands.map(_._2).max
        // tie-break: greatest payload struct == greatest (rts, rval)
        val atTs = cands.filter(_._2 == bestTs)
        Some((bestTs, atTs.map(_._3).max))
      }
      ((k, lts, lv), best)
    }.toMap

  private def runOp(left: Seq[(Long, Long, String)], right: Seq[(Long, Long, String)],
      forward: Boolean, strict: Boolean): Map[(Long, Long, String), Option[(Long, String)]] =
    AsOfJoin.asof(mkLeft(left), mkRight(right), Seq("k"), "lts", "rts",
        forward = forward, strict = strict)
      .collect()
      .map { r =>
        val m = if (r.isNullAt(3)) None
          else Some((r.getLong(3), r.getString(4)))
        ((r.getLong(0), r.getLong(1), r.getString(2)), m)
      }.toMap

  test("hand-crafted: backward picks latest at-or-before, unmatched is null") {
    val left = Seq((1L, 10L, "a"), (1L, 5L, "b"), (1L, 2L, "c"), (2L, 7L, "d"))
    val right = Seq((1L, 3L, "r3"), (1L, 8L, "r8"), (3L, 1L, "zz"))
    val got = runOp(left, right, forward = false, strict = false)
    assert(got((1L, 10L, "a")) == Some((8L, "r8")))
    assert(got((1L, 5L, "b")) == Some((3L, "r3")))
    assert(got((1L, 2L, "c")) == None)
    assert(got((2L, 7L, "d")) == None)
  }

  test("equal timestamps: inclusive by default, excluded when strict") {
    val left = Seq((1L, 5L, "a"))
    val right = Seq((1L, 5L, "r5"), (1L, 1L, "r1"))
    assert(runOp(left, right, forward = false, strict = false)((1L, 5L, "a"))
      == Some((5L, "r5")))
    assert(runOp(left, right, forward = false, strict = true)((1L, 5L, "a"))
      == Some((1L, "r1")))
    assert(runOp(left, right, forward = true, strict = false)((1L, 5L, "a"))
      == Some((5L, "r5")))
    assert(runOp(left, right, forward = true, strict = true)((1L, 5L, "a")) == None)
  }

  test("duplicate right timestamps resolve to the greatest payload") {
    val left = Seq((1L, 9L, "a"))
    val right = Seq((1L, 4L, "x"), (1L, 4L, "y"))
    assert(runOp(left, right, forward = false, strict = false)((1L, 9L, "a"))
      == Some((4L, "y")))
  }

  test("tolerance null-outs matches beyond the bound") {
    // ts are seconds-scale longs; tolerance compares |lts - rts| directly
    val left = mkLeft(Seq((1L, 100L, "a"), (1L, 10L, "b")))
    val right = mkRight(Seq((1L, 4L, "r4")))
    val got = AsOfJoin.asof(left, right, Seq("k"), "lts", "rts",
        toleranceSeconds = Some(50L))
      .collect().map(r => (r.getString(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(got("a") == None)     // gap 96 > 50
    assert(got("b") == Some(4L)) // gap 6 <= 50
  }

  test("tolerance on TIMESTAMP_NTZ axes (no direct double cast exists)") {
    import org.apache.spark.sql.functions.{col, expr}
    // q111's shape: both time axes are TIMESTAMP_NTZ — the gap must route
    // through unix_micros, not a (rejected) NTZ->DOUBLE cast
    val left = Seq((1L, "2024-01-10 00:00:00", "a"), (1L, "2024-01-01 01:00:00", "b"))
      .toDF("k", "lts", "lval")
      .withColumn("lts", expr("CAST(lts AS TIMESTAMP_NTZ)"))
    val right = Seq((1L, "2024-01-01 00:00:00", "r"))
      .toDF("k", "rts", "rval")
      .withColumn("rts", expr("CAST(rts AS TIMESTAMP_NTZ)"))
    val got = AsOfJoin.asof(left, right, Seq("k"), "lts", "rts",
        toleranceSeconds = Some(86400L)) // 1 day
      .select(col("lval"), col("rval"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("a") == None)        // 9 days back > 1 day tolerance
    assert(got("b") == Some("r"))   // 1 hour back
  }

  test("seeded random: all four direction/strictness modes match brute force") {
    val rnd = new scala.util.Random(42)
    val left = Seq.fill(300)((rnd.nextInt(8).toLong, rnd.nextInt(50).toLong,
      "l" + rnd.nextInt(1000)))
    val right = Seq.fill(200)((rnd.nextInt(8).toLong, rnd.nextInt(50).toLong,
      "r" + rnd.nextInt(1000)))
    for (forward <- Seq(false, true); strict <- Seq(false, true)) {
      val got = runOp(left, right, forward, strict)
      val exp = brute(left, right, forward, strict)
      // left rows may repeat (k, lts, lval); dedup map keys align both sides
      assert(got == exp, s"forward=$forward strict=$strict")
    }
  }

  test("multi-key join and null keys never matching") {
    val left = Seq((1L, 10L, 100L, "a"), (1L, 20L, 100L, "b"), (2L, 10L, 50L, "c"))
      .toDF("k1", "k2", "lts", "lval")
    val right = Seq((1L, 10L, 90L, "r1"), (1L, 20L, 95L, "r2"))
      .toDF("k1", "k2", "rts", "rval")
    val got = AsOfJoin.asof(left, right, Seq("k1", "k2"), "lts", "rts")
      .collect().map(r => (r.getString(3), if (r.isNullAt(5)) None else Some(r.getString(5))))
      .toMap
    assert(got == Map("a" -> Some("r1"), "b" -> Some("r2"), "c" -> None))

    val leftN = Seq((Some(1L), 10L, "a"), (None, 10L, "n"))
      .toDF("k", "lts", "lval")
    val rightN = Seq((Some(1L), 5L, "r"), (None, 5L, "rn"))
      .toDF("k", "rts", "rval")
    val gotN = AsOfJoin.asof(leftN, rightN, Seq("k"), "lts", "rts")
      .collect().map(r => (r.getString(2), if (r.isNullAt(3)) None else Some(r.getString(4))))
      .toMap
    assert(gotN == Map("a" -> Some("r"), "n" -> None),
      "null keys must not asof-match")
  }

  test("null timestamps never match, on either side") {
    // null-ts right rows must be invisible (not carried by NULLS FIRST
    // ordering to unmatched left rows); null-ts left rows must get no match
    val leftN = Seq((1L, Some(10L), "a"), (1L, None, "nl"), (2L, Some(10L), "c"))
      .toDF("k", "lts", "lval")
    val rightN = Seq((1L, Some(5L), "r"), (1L, None, "nr"), (2L, None, "nr2"))
      .toDF("k", "rts", "rval")
    for (forward <- Seq(false, true); strict <- Seq(false, true)) {
      val got = AsOfJoin.asof(
          leftN, rightN.filter(lit(true)), Seq("k"), "lts", "rts",
          forward = forward, strict = strict)
        .collect().map(r => (r.getString(2), if (r.isNullAt(4)) None else Some(r.getString(4))))
        .toMap
      val expA = if (forward) None else Some("r") // r at ts 5 <= 10 only backward
      assert(got == Map("a" -> expA, "nl" -> None, "c" -> None),
        s"forward=$forward strict=$strict")
    }
  }

  test("plan: one shuffle per side, no cartesian") {
    val p = AsOfJoin.asof(mkLeft(Seq((1L, 1L, "a"))), mkRight(Seq((1L, 1L, "r"))),
      Seq("k"), "lts", "rts").queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }
}
