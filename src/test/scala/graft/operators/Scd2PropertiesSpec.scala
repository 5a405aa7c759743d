package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite

/** Multi-batch SCD2/CDC equivalence property (round-4 advice): two
  * independent implementations of "latest version per key" — the
  * changelog aggregate fold ([[Cdc.applyChangelog]]) and the
  * dimension-history fold ([[Scd2.applyBatch]]) — must agree after ANY
  * sequence of full snapshots, including key DELETIONS (a key absent from
  * a snapshot is a CDC `D` event and an SCD2 `closeMissing` close). The
  * single-stream seeded version of this check lives in CdcSpec; here the
  * snapshot streams are ScalaCheck-generated (sampled with fixed seeds —
  * no scalatestplus bridge in the offline cache), which is what catches
  * the silent-column-drop / resurrection bug classes.
  *
  * Also pinned per stream: SCD2's own invariants — exactly one open row
  * per live key, version timelines contiguous (each close equals the next
  * version's open), and no zero-length versions.
  */
class Scd2PropertiesSpec extends SparkSuite {
  import spark.implicits._

  // a snapshot epoch: the complete live state, key -> (tier, score);
  // nulls included so the null-safe change predicate is exercised
  private val stateGen: Gen[Map[Long, (String, Double)]] = for {
    keys <- Gen.someOf(1L to 12L)
    vals <- Gen.listOfN(keys.size, for {
      t <- Gen.oneOf("a", "b", null)
      v <- Gen.oneOf(1.0, 2.0, 3.0)
    } yield (t, v))
  } yield keys.zip(vals).toMap

  private val Epochs = 6

  private def snapshots(seed: Long): Seq[Map[Long, (String, Double)]] =
    (0 until Epochs).map(e =>
      stateGen.pureApply(Gen.Parameters.default, Seed(seed * 1000 + e)))

  private val Trials = 6

  private def stamp(e: Int) = f"2024-${e + 1}%02d-01 00:00:00"

  test("property: CDC final state == SCD2 current slice over snapshot streams with deletes") {
    for (trial <- 0 until Trials) {
      val snaps = snapshots(trial.toLong)
      // SCD2 side: apply each snapshot with closeMissing = true
      var hist = Scd2.emptyHistory(Seq((0L, "x", 0.0)).toDF("k", "tier", "score"), "k")
      snaps.zipWithIndex.foreach { case (s, e) =>
        val batch = s.toSeq.map { case (k, (t, v)) => (k, t, v) }
        if (batch.nonEmpty)
          hist = Scd2.applyBatch(hist, batch.toDF("k", "tier", "score"), "k",
            stamp(e), closeMissing = true)
        else // an empty snapshot deletes everything
          hist = Scd2.applyBatch(hist,
            Seq((-999L, "x", 0.0)).toDF("k", "tier", "score"), "k",
            stamp(e), closeMissing = true)
      }
      // CDC side: diff consecutive snapshots into I/U/D events
      val log = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, String, Double)]
      var prev = Map.empty[Long, (String, Double)]
      snaps.zipWithIndex.foreach { case (s, e) =>
        val seq = e.toLong + 1
        s.foreach { case (k, (t, v)) =>
          if (!prev.contains(k)) log += ((k, seq, "I", t, v))
          else if (prev(k) != ((t, v))) log += ((k, seq, "U", t, v))
        }
        prev.keys.filterNot(s.contains).foreach(k => log += ((k, seq, "D", null, 0.0)))
        prev = s
      }
      val scd2 = Scd2.currentOf(hist)
        .select($"k", $"tier", $"score")
        .as[(Long, String, Double)].collect().toSet
        .filterNot(_._1 == -999L)
      val cdc =
        if (log.isEmpty) Set.empty[(Long, String, Double)]
        else Cdc.applyChangelog(
            log.toSeq.toDF("k", "seq", "op", "tier", "score"), "k", "seq", "op")
          .as[(Long, String, Double)].collect().toSet
      assert(cdc == scd2, s"trial $trial: folds diverged\n log=$log")
      // ground truth: the last snapshot itself
      val want = snaps.last.map { case (k, (t, v)) => (k, t, v) }.toSet
      assert(scd2 == want, s"trial $trial: SCD2 current != last snapshot")
    }
  }

  test("property: SCD2 history invariants hold at every epoch") {
    for (trial <- 0 until Trials) {
      val snaps = snapshots(100L + trial)
      var hist = Scd2.emptyHistory(Seq((0L, "x", 0.0)).toDF("k", "tier", "score"), "k")
      snaps.zipWithIndex.foreach { case (s, e) =>
        val batch = s.toSeq.map { case (k, (t, v)) => (k, t, v) }
        if (batch.nonEmpty) {
          hist = Scd2.applyBatch(hist, batch.toDF("k", "tier", "score"), "k",
            stamp(e), closeMissing = true)
          val rows = hist.select($"k", $"valid_from", $"valid_to")
            .as[(Long, java.sql.Timestamp, Option[java.sql.Timestamp])]
            .collect()
          // exactly one open row per live key, none for deleted keys
          val open = rows.filter(_._3.isEmpty).groupBy(_._1)
          assert(open.keySet == s.keySet, s"trial $trial epoch $e: open-row keys")
          assert(open.values.forall(_.length == 1),
            s"trial $trial epoch $e: multiple open rows for a key")
          // timelines: versions of a key never overlap, closes are ordered,
          // and no version closes at or before it opened
          rows.groupBy(_._1).foreach { case (k, vs) =>
            val sorted = vs.sortBy(_._2.getTime)
            sorted.foreach { case (_, from, to) =>
              to.foreach(t => assert(t.after(from),
                s"trial $trial epoch $e key $k: zero/negative-length version"))
            }
            sorted.sliding(2).foreach {
              case Array((_, _, Some(close)), (_, from2, _)) =>
                assert(!close.after(from2),
                  s"trial $trial epoch $e key $k: overlapping versions")
              case _ => ()
            }
          }
        }
      }
    }
  }
}
