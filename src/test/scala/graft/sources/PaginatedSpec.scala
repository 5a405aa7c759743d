package graft.sources

import graft.SparkSuite

class PaginatedSpec extends SparkSuite {
  import spark.implicits._

  test("ingest fetches all pages and normalizes results") {
    val out = Paginated.ingest(spark,
      Paginated.SyntheticMovieFetcher(pages = 3, perPage = 10), "popular")
    assert(out.count() == 30)
    assert(out.columns.contains("page") && out.columns.contains("id"))
    assert(out.select($"id").as[Long].collect().toSet == (0L until 30L).toSet)
  }

  test("single-page endpoint works without executor fan-out") {
    val out = Paginated.ingest(spark,
      Paginated.SyntheticMovieFetcher(pages = 1, perPage = 7), "now_playing")
    assert(out.count() == 7)
  }

  test("non-200/non-400 page 1 fails fast (reference error semantics)") {
    val failing = new Paginated.PageFetcher {
      override def fetch(endpoint: String, page: Int) = Paginated.FetchResult(503, "oops")
    }
    val e = intercept[IllegalStateException] {
      Paginated.ingest(spark, failing, "popular")
    }
    assert(e.getMessage.contains("503"))
  }

  test("executor-side non-200 fails the job (task retry semantics)") {
    val flaky = new Paginated.PageFetcher {
      override def fetch(endpoint: String, page: Int) =
        if (page == 1) Paginated.SyntheticMovieFetcher(3, 5).fetch(endpoint, page)
        else Paginated.FetchResult(500, "boom")
    }
    val e = intercept[org.apache.spark.SparkException] {
      Paginated.ingest(spark, flaky, "popular").count()
    }
    assert(e.getMessage.contains("500") || e.getCause != null)
  }

  test("genre_ids arrive as native array<int> (no JSON stringification)") {
    val out = Paginated.ingest(spark,
      Paginated.SyntheticMovieFetcher(pages = 1, perPage = 3), "popular")
    assert(out.schema("genre_ids").dataType.typeName == "array")
  }
}
