package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSuite

class EntityResolutionSpec extends SparkSuite {
  import spark.implicits._

  private val prefix4: Seq[Column => Column] = Seq(s => substring(s, 1, 4))

  test("fuzzyPairs: typo pairs found within a block, distance exact, no cross-block pairs") {
    val people = Seq(
      (1L, "smith john"), (2L, "smith jahn"),   // 1 substitution
      (3L, "smith jean"),                        // 2 subs from #1, 2 from #2
      (4L, "jones mary"), (5L, "jones mary")     // exact duplicate
    ).toDF("id", "name")
    val got = EntityResolution.fuzzyPairs(people, "id", "name",
        prefix4, maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L), (4L, 5L, 0L)), s"got $got")
  }

  test("fuzzyPairs: a pair missed by one mask is recovered by another pass") {
    // names differ in char 1: same-prefix blocking misses them; a
    // suffix-key pass co-blocks them
    val recs = Seq((1L, "axyz"), (2L, "bxyz"), (3L, "qqqq")).toDF("id", "name")
    val prefixOnly: Seq[Column => Column] = Seq(s => substring(s, 1, 2))
    val both: Seq[Column => Column] =
      Seq(s => substring(s, 1, 2), s => substring(s, -3, 3))
    val miss = EntityResolution.fuzzyPairs(recs, "id", "name", prefixOnly, maxDist = 1)
      .as[(Long, Long, Long)].collect()
    assert(miss.isEmpty, s"prefix-only should miss: ${miss.toSeq}")
    val hit = EntityResolution.fuzzyPairs(recs, "id", "name", both, maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(hit == Set((1L, 2L, 1L)), s"got $hit")
  }

  test("fuzzyPairs: candidates proposed by BOTH passes dedupe to one row") {
    val recs = Seq((1L, "abcd"), (2L, "abcd")).toDF("id", "name")
    val both: Seq[Column => Column] =
      Seq(s => substring(s, 1, 2), s => substring(s, -2, 2))
    val got = EntityResolution.fuzzyPairs(recs, "id", "name", both, maxDist = 0)
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L, 0L)), s"got ${got.toSeq}")
  }

  test("plan shape: the block-size cap is a partial-agg gate, never a window sort") {
    // the gate must come from a counts-only aggregation + semi-join — a
    // count-per-key window would shuffle AND sort the full candidate rows
    // a second time just to read a size
    val recs = (1L to 50L).map(i => (i, s"name_$i")).toDF("id", "name")
    val plan = EntityResolution.fuzzyPairs(recs, "id", "name",
      prefix4, maxDist = 1).queryExecution.executedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, s"cap regressed to a window:\n$plan")
  }

  test("fuzzyPairs: oversized blocks are dropped whole (degenerate-key guard)") {
    // 20 rows share one degenerate key; cap 10 drops the block entirely
    val recs = (1L to 20L).map(i => (i, "same")).toDF("id", "name")
    val got = EntityResolution.fuzzyPairs(recs, "id", "name",
      prefix4, maxDist = 2, maxBlockSize = 10)
    assert(got.count() == 0, "capped block must contribute no pairs")
    val uncapped = EntityResolution.fuzzyPairs(recs, "id", "name",
      prefix4, maxDist = 2, maxBlockSize = 1000)
    assert(uncapped.count() == 190L, "20 choose 2 when the cap is lifted")
  }
}
