package graft

import graft.sources.JsonlLoader

class JsonlLoaderSpec extends SparkSpec {

  test("JSONL read quarantines corrupt lines instead of failing the job") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl")
    val f = dir.resolve("docs.jsonl")
    java.nio.file.Files.writeString(f,
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}
        |{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web"}
        |{this is not json at all
        |{"doc_id": "notanumber", "text": "x", "lang": "en", "source": "web"}
        |""".stripMargin)
    val df = JsonlLoader.read(spark, f.toString)
    val ok = JsonlLoader.good(df)
    val bad = JsonlLoader.quarantine(df)
    // the junk line and the type-violating line (text: 42) both quarantine
    ok.count() shouldBe 2
    rows(ok.select("doc_id").orderBy("doc_id")).map(_.getLong(0)) shouldBe Seq(1L, 2L)
    ok.columns.toSeq shouldBe Seq("doc_id", "text", "lang", "source")
    bad.count() shouldBe 2
    rows(bad.select("raw_line")).map(_.getString(0)).exists(_.contains("not json")) shouldBe true
  }
}
