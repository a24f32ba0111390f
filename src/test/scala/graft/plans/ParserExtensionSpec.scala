package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** c13's parser-injection pins: the custom DEDUP statement equals its
  * desugared standard SQL on the SAME session, and ordinary SQL parses
  * bit-identically through the wrapped parser (passthrough — the
  * extension owns only its own grammar). */
class ParserExtensionSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def ext = graft.GraftSession.extensionSession(spark)

  test("DEDUP statement equals its hand-written desugared SQL") {
    val s = ext
    // plant duplicates: the raw fixture texts are all distinct at this SF
    graft.Tables(s, d, "documents")
      .select(col("doc_id"), col("source"),
        concat(col("source"), lit("-"), (col("doc_id") % 50).cast("string"))
          .as("text"))
      .createOrReplaceTempView("pe_docs")
    val custom = s.sql("DEDUP pe_docs BY md5(text) KEEP MIN doc_id")
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val manual = s.sql(
      """SELECT doc_id FROM pe_docs WHERE doc_id IN
        |  (SELECT min(doc_id) FROM pe_docs GROUP BY md5(text))
        |ORDER BY doc_id""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(custom == manual && custom.nonEmpty)
    // and it genuinely deduplicates: strictly fewer rows than the corpus
    // (the fixture plants identical texts)
    val total = s.table("pe_docs").count()
    assert(custom.size < total,
      s"dedup must drop something: kept ${custom.size} of $total")
  }

  test("passthrough: ordinary SQL parses identically through the wrapped parser") {
    val s = ext
    graft.Tables(s, d, "lineitem").createOrReplaceTempView("pe_li")
    graft.Tables(spark, d, "lineitem").createOrReplaceTempView("pe_li")
    val q = """SELECT l_returnflag, count(1) AS n FROM pe_li
              |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    val a = s.sql(q).collect().map(_.toSeq).toSeq
    val b = spark.sql(q).collect().map(_.toSeq).toSeq
    assert(a == b, "the wrapped parser must be transparent to stock SQL")
    // parse-tree identity, not just value identity: same analyzed plan text
    // modulo exprIds is overkill; pin the parsed (unresolved) plan string
    // strip exprIds (fresh per parse) before comparing the parse trees
    def norm(p: String) = p.replaceAll("#\\d+", "#")
    val pExt = norm(s.sessionState.sqlParser.parsePlan(q).toString)
    val pStock = norm(spark.sessionState.sqlParser.parsePlan(q).toString)
    assert(pExt == pStock,
      s"parsed plans must match:\n$pExt\nvs\n$pStock")
  }

  test("the extension session carries the engine functions and the matview rule") {
    val s = ext
    // functions injected at construction (not registerAll): usable in SQL
    assert(s.sql("SELECT graft_normalize('Éclair') AS x")
      .collect()(0).getString(0) == "eclair")
    // base session untouched: DEDUP must NOT parse there
    graft.Tables(spark, d, "documents").createOrReplaceTempView("pe_docs2")
    val thrown = intercept[Exception] {
      spark.sql("DEDUP pe_docs2 BY md5(text) KEEP MIN doc_id").collect()
    }
    assert(thrown.getMessage.contains("DEDUP"),
      "the stock session must reject the extension grammar")
  }
}
