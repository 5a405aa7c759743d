package graft

import java.nio.file.Files
import scala.io.Source

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Audit, Dedup, Merge, SchemaDrift}
import graft.pipeline.Pipeline
import graft.sources.Paginated

/** The reference DAG, end to end, from file fixtures (FIXTURES.md §A):
  * extract (paginated fixture feed, 400-terminated) -> transform (native
  * genre_ids; audit stamp) -> load (dedup + drift-evolve + MERGE into a
  * parquet destination), fanned out over endpoints, re-run idempotently.
  * Mirrors themovies.py:16-114 + etl.py:27-183.
  */
/** Fixture-backed fetcher: resources/movies/movies_page_N.json, ending
  * with the canned HTTP-400 payload — the reference's terminal-page
  * semantics (themovies.py:34-35). Top-level so executor tasks serialize it
  * without capturing the test suite.
  */
final class FixtureFetcher(pageFiles: Map[Int, String]) extends Paginated.PageFetcher {
  override def fetch(endpoint: String, page: Int): Paginated.FetchResult =
    pageFiles.get(page) match {
      case Some(res) => Paginated.FetchResult(200, FixtureFetcher.read(res))
      case None => Paginated.FetchResult(400, FixtureFetcher.read("movies_page_400.json"))
    }
}
object FixtureFetcher {
  def read(name: String): String = {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream(s"/movies/$name"), "UTF-8")
    try src.mkString finally src.close()
  }
}

class EndToEndPipelineSpec extends SparkSuite {
  import spark.implicits._

  private def ingest(fetcher: Paginated.PageFetcher): DataFrame =
    Paginated.ingest(spark, fetcher, "popular")

  private def loadBatch(dest: Option[DataFrame], batch: DataFrame): DataFrame = {
    val stamped = Audit.stampAt(Dedup.fullRow(batch), lit("2024-03-01 00:00:00"))
    dest match {
      case None => stamped
      case Some(d) =>
        val (da, sa) = SchemaDrift.align(d, stamped)
        Merge.merge(da, sa, pk = Seq("id"))
    }
  }

  test("full pipeline: ingest -> dedup -> merge, idempotent re-run") {
    val feed = new FixtureFetcher(Map(1 -> "movies_page_1.json", 2 -> "movies_page_2.json"))
    val batch = ingest(feed)
    assert(batch.count() == 40)

    val first = loadBatch(None, batch).cache()
    assert(first.count() == 40)
    assert(first.where($"record_loaded_at".isNull).count() == 0)

    // re-run the same batch: MERGE must be a no-op (idempotence = the
    // reference's retry safety)
    val second = loadBatch(Some(first), batch)
    assert(second.count() == 40)
    assert(second.exceptAll(first).count() == 0)
  }

  test("dupes fixture: exact duplicate rows collapse before load (etl.py:50)") {
    val batch = ingest(new FixtureFetcher(Map(1 -> "movies_dupes.json")))
    assert(batch.count() == 3)
    assert(Dedup.fullRow(batch).count() == 2)
  }

  test("drift add-col fixture: revenue column evolves into the destination") {
    val dest = loadBatch(None, ingest(new FixtureFetcher(Map(1 -> "movies_page_1.json"))))
    val drifted = ingest(new FixtureFetcher(Map(1 -> "movies_drift_addcol.json")),
      schemaWithRevenue = true)
    val merged = loadBatch(Some(dest), drifted)
    assert(merged.columns.contains("revenue"))
    // old rows read NULL, drifted rows carry values
    assert(merged.where($"id" < 100 && $"revenue".isNotNull).count() == 0)
    assert(merged.where($"id" >= 200 && $"revenue".isNull).count() == 0)
  }

  test("drift type-change fixture: double vote_count lands in sidecar column") {
    val dest = loadBatch(None, ingest(new FixtureFetcher(Map(1 -> "movies_page_1.json"))))
    val schema = org.apache.spark.sql.types.StructType(
      Paginated.movieSchema.fields.map {
        case f if f.name == "vote_count" => f.copy(dataType = org.apache.spark.sql.types.DoubleType)
        case f => f
      })
    val drifted = Paginated.ingest(spark,
      new FixtureFetcher(Map(1 -> "movies_drift_typechange.json")), "popular", schema)
    val merged = loadBatch(Some(dest), drifted)
    assert(merged.columns.contains("vote_count_double"),
      s"sidecar expected in ${merged.columns.mkString(",")}")
    assert(merged.where($"id" >= 300 && $"vote_count_double".isNull).count() == 0)
    assert(merged.where($"id" >= 300 && $"vote_count".isNotNull).count() == 0)
  }

  test("fan-out over 4 endpoints mirrors dynamic task mapping (O1)") {
    val perEndpoint = Pipeline.fanOut(
      List("popular", "top_rated", "now_playing", "upcoming"), maxConcurrent = 2) { ep =>
      val batch = ingest(new FixtureFetcher(Map(1 -> "movies_page_1.json")))
      loadBatch(None, batch).withColumn("endpoint", lit(ep)).count()
    }
    assert(perEndpoint == Seq(20L, 20L, 20L, 20L))
  }

  private def ingest(fetcher: Paginated.PageFetcher, schemaWithRevenue: Boolean): DataFrame = {
    val schema =
      if (schemaWithRevenue)
        org.apache.spark.sql.types.StructType(
          Paginated.movieSchema.fields :+
            org.apache.spark.sql.types.StructField("revenue",
              org.apache.spark.sql.types.LongType))
      else Paginated.movieSchema
    Paginated.ingest(spark, fetcher, "popular", schema)
  }
}
