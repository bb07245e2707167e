package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.mv.{CountMetric, StateTable, SumMetric}

/** Model-based fuzz of the partition-lifecycle surface (OPTIMIZE
  * [PARTITION] FINAL, DETACH/ATTACH/DROP [DETACHED] PARTITION, TRUNCATE,
  * TTL-free appends, reopen): random op sequences run against a real
  * [[StateTable]] while a trivial in-memory model tracks what must be
  * visible — after every op the table's finalized sums must equal the
  * model exactly, refusals must fire exactly when the model says the op
  * is illegal, and a REOPEN (fresh instance over the same path, i.e. the
  * constructor's recovery pass) must never change either.
  *
  * The value pool deliberately includes hive-escaping values (space,
  * colon, percent) so every directory move runs through escVal, and the
  * same sequence is replayed deterministically from the seed on failure.
  */
class PartitionOpsFuzzSpec extends SparkSpec {

  // partition values: plain, numeric-looking, and hive-escaped shapes
  private val values = Seq("a", "2024-01-01", "v 1:2", "x%y", "id_7")

  test("random partition-lifecycle sequences match the in-memory model " +
      "at every step, across reopens") {
    import spark.implicits._
    for (seed <- 1 to 20) {
      val rnd = new Random(seed * 7919L + 13L)
      val dir = tmpDir(s"popsfz$seed") + "/t"
      def fresh() = new StateTable(spark, dir, keys = Seq("slot", "k"),
        partitionCol = "slot",
        metrics = Seq(SumMetric("v", col("v_src")), CountMetric("cnt")))
      var st = fresh()

      // model: per-partition (liveSum, liveCnt); detached copies carry the
      // same pair. appendBatch appends PARTS, so sums accumulate.
      val live = scala.collection.mutable.Map.empty[String, (Long, Long)]
      val det = scala.collection.mutable.Map.empty[String, (Long, Long)]

      def batch(slot: String, base: Long) =
        (1 to 3).map(i => (slot, i.toLong, base + i)).toDF("slot", "k", "v_src")

      def check(opName: String): Unit = {
        val got =
          if (live.isEmpty)
            try st.finalized().count() match {
              case 0L => Map.empty[String, (Long, Long)]
              case n => sys.error(s"expected empty, got $n rows")
            } catch {
              // a table that never saw an append has no schema to read —
              // the model allows that only when nothing was ever written
              case e: org.apache.spark.sql.AnalysisException
                if live.isEmpty => Map.empty[String, (Long, Long)]
            }
          else
            st.finalized().groupBy("slot")
              .agg(sum(col("v")).as("s"), sum(col("cnt")).as("c"))
              .collect()
              // partition-type inference may read a date-like slot back as
              // DATE — compare on the rendered value, which round-trips
              .map(r => String.valueOf(r.get(0)) -> (r.getLong(1), r.getLong(2)))
              .toMap
        assert(got == live.toMap,
          s"seed $seed after $opName: table=$got model=$live detached=$det")
      }

      var wrote = false
      for (step <- 0 until 14) {
        val v = values(rnd.nextInt(values.length))
        val op = rnd.nextInt(8)
        val opName = s"step$step op$op($v)"
        op match {
          case 0 => // append a batch into one partition
            val base = rnd.nextInt(100).toLong
            st.appendBatch(batch(v, base))
            val add = (3 * base + 6, 3L)
            val cur = live.getOrElse(v, (0L, 0L))
            live(v) = (cur._1 + add._1, cur._2 + add._2)
            wrote = true
          case 1 => // OPTIMIZE FINAL — never visible (needs live data: a
            // truncated-and-reopened table has no schema to merge)
            if (live.nonEmpty) st.compact()
          case 2 => // OPTIMIZE PARTITION v FINAL — never visible
            st.compactPartition(v)
          case 3 => // DETACH
            if (live.contains(v) && det.contains(v))
              intercept[RuntimeException](st.detachPartition(v))
            else {
              val r = st.detachPartition(v)
              assert(r == live.contains(v), s"$opName detach returned $r")
              live.remove(v).foreach(det(v) = _)
            }
          case 4 => // ATTACH
            if (det.contains(v) && live.contains(v))
              intercept[RuntimeException](st.attachPartition(v))
            else {
              val r = st.attachPartition(v)
              assert(r == det.contains(v), s"$opName attach returned $r")
              det.remove(v).foreach(live(v) = _)
            }
          case 5 => // DROP PARTITION
            val r = st.dropPartition(v)
            assert(r == live.contains(v), s"$opName drop returned $r")
            live.remove(v): Unit
          case 6 => // DROP DETACHED / TRUNCATE (rarer)
            if (rnd.nextBoolean()) {
              val r = st.dropDetachedPartition(v)
              assert(r == det.contains(v), s"$opName dropDetached returned $r")
              det.remove(v): Unit
            } else if (wrote) { st.truncate(); live.clear() }
          case _ => // REOPEN: recovery must be a no-op on a healthy table
            st = fresh()
        }
        check(opName)
      }
      // end state: attach everything back and verify nothing was lost
      for (v <- det.keys.toSeq.sorted) {
        if (live.contains(v)) { st.dropPartition(v); live.remove(v): Unit }
        st.attachPartition(v)
        live(v) = det(v)
        det.remove(v): Unit
      }
      check("final-reattach")
    }
  }
}
