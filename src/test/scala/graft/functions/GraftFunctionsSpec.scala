package graft.functions

import graft.SparkSpec

/** SQL-surface tests: the native expressions resolve and evaluate through
  * plain spark.sql once registered (registerAll; GraftExtensions injects
  * the same descriptions at session build on a cluster). */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft functions usable from SQL") {
    GraftFunctions.registerAll(spark)
    val cos = spark.sql(
      "SELECT graft_cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .as[Double].head()
    assert(math.abs(cos - 1.0) < 1e-12)
    val sigLen = spark.sql(
      "SELECT size(graft_minhash64(array(1L, 2L, 3L))) AS n").as[Int].head()
    assert(sigLen === 64)
    val sh = spark.sql(
      "SELECT graft_simhash64(array(1L, 2L, 3L)) AS s").as[Long].head()
    assert(sh === SimHash64.eval(Array(1L, 2L, 3L)))
    // SQL surface matches the Column surface bit-for-bit (same tree)
    val sqlKm = spark.sql(
      "SELECT graft_haversine_km(39.7392D, -104.9903D, 40.0150D, -105.2705D) AS km")
      .as[Double].head()
    val colKm = spark.range(1).select(
      GeoFunctions.haversineKm(
        org.apache.spark.sql.functions.lit(39.7392),
        org.apache.spark.sql.functions.lit(-104.9903),
        org.apache.spark.sql.functions.lit(40.0150),
        org.apache.spark.sql.functions.lit(-105.2705)).as("km"))
      .as[Double].head()
    assert(sqlKm === colKm, s"$sqlKm vs $colKm")
    assert(math.abs(sqlKm - 38.4) < 1.0, s"Denver->Boulder ~38km, got $sqlKm")
  }

  test("GraftSession front door registers functions and tuned conf") {
    // getOrCreate on an existing session applies the front door's RUNTIME
    // confs to it (Spark's documented Builder behavior) — restore the
    // shared test session's tuning afterwards so suite order can't leak
    // host-sized shuffle partitions into later measurements
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val s = graft.GraftSession.getOrCreate() // returns the active session
      assert(s.sql("SELECT size(graft_minhash64(array(7L))) AS n")
        .as[Int].head() === 64)
      assert(s.conf.get("spark.sql.shuffle.partitions") ===
        Runtime.getRuntime.availableProcessors().toString,
        "front door should have retuned the runtime conf")
      val b = graft.GraftSession.builder()
      assert(b.getClass.getSimpleName === "Builder") // constructible for cluster use
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("GraftExtensions exposes the same function set") {
    assert(GraftFunctions.descriptions.map(_._1.funcName).sorted ===
      Seq("graft_bloom_agg", "graft_bloom_probe", "graft_cosine_sim",
        "graft_gopher_quality",
        "graft_haversine_km", "graft_hist", "graft_md5_minhash",
        "graft_might_contain", "graft_minhash64", "graft_ngrams",
        "graft_normalize",
        "graft_shingle_hashes", "graft_simhash64", "graft_tokenize",
        "graft_topk", "graft_winnow"))
    new graft.GraftExtensions() // constructible for spark.sql.extensions
  }

  private def docsView(name: String): Unit = {
    val rows = Seq(
      (1L, ("the quick brown fox jumps over the lazy dog and then " * 12).trim),
      (2L, ("the quick brown fox jumps over the lazy dog and then " * 12).trim
        + " with a different tail to make it a near duplicate of one"),
      (3L, "to be or not to be that is the question with # symbols ... and 12345"),
      (4L, "short"),
      (5L, "")).toDF("doc_id", "text")
    rows.createOrReplaceTempView(name)
  }

  test("graft_md5_minhash SQL path equals the DataFrame signature path") {
    GraftFunctions.registerAll(spark)
    docsView("mh_docs")
    val sql = spark.sql(
      "SELECT doc_id, graft_md5_minhash(text) AS sig FROM mh_docs ORDER BY doc_id")
      .as[(Long, Seq[Long])].collect()
    val dfPath = graft.ops.DedupOps
      .shingleHashFrame(spark.table("mh_docs"))
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.array((0 until 8).map(i =>
          org.apache.spark.sql.functions.array_min(
            org.apache.spark.sql.functions.transform(
              org.apache.spark.sql.functions.col("hv"),
              h => TextFunctions.minhashAffine(i)(h)))): _*).as("sig"))
      .orderBy("doc_id").as[(Long, Seq[Long])].collect()
    assert(sql.toSeq === dfPath.toSeq)
    assert(sql.forall(_._2.length === 8))
  }

  test("graft_gopher_quality SQL path equals the t14 metric expressions") {
    GraftFunctions.registerAll(spark)
    docsView("gq_docs")
    val sql = spark.sql(
      """SELECT doc_id, g.n_words, g.mean_word_len, g.symbol_word_ratio,
        |       g.alpha_word_ratio, g.n_required_stopwords, g.passes_gopher
        |FROM (SELECT doc_id, graft_gopher_quality(text) AS g FROM gq_docs)
        |ORDER BY doc_id""".stripMargin).collect()
    val dfPath = spark.table("gq_docs")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        TextFunctions.gopherQuality(org.apache.spark.sql.functions.col("text")).as("g"))
      .select("doc_id", "g.n_words", "g.mean_word_len", "g.symbol_word_ratio",
        "g.alpha_word_ratio", "g.n_required_stopwords", "g.passes_gopher")
      .orderBy("doc_id").collect()
    assert(sql.toSeq === dfPath.toSeq)
    // spot-check semantics: doc 1 repeats "the ... the" 12x -> word count
    // 120 in [50, 100k], all-alpha, no symbols, >= 2 required stopwords
    val d1 = sql.find(_.getLong(0) == 1L).get
    assert(d1.getAs[Boolean]("passes_gopher"))
    val d5 = sql.find(_.getLong(0) == 5L).get
    assert(d5.getLong(1) === 0L && !d5.getAs[Boolean]("passes_gopher"))
  }

  test("graft_winnow SQL path equals the distributed winnowing operator") {
    GraftFunctions.registerAll(spark)
    docsView("wn_docs")
    val sql = spark.sql(
      """SELECT doc_id, fp FROM
        |  (SELECT doc_id, explode(graft_winnow(text)) AS fp FROM wn_docs)
        |ORDER BY doc_id, fp""".stripMargin)
      .as[(Long, Long)].collect().toSeq
    val dfPath = graft.ops.TextOps
      .winnowFingerprints(spark.table("wn_docs"))
      .orderBy("doc_id", "fp").as[(Long, Long)].collect().toSeq
    assert(sql === dfPath)
    assert(sql.nonEmpty, "fixture docs must produce fingerprints")
    // sub-(k+w-1) docs produce no fingerprints on either path
    assert(!sql.exists(_._1 == 4L) || spark.sql(
      "SELECT size(graft_winnow(text)) FROM wn_docs WHERE doc_id = 4")
      .as[Int].head() === 0)
  }

  test("graft_tokenize: mode selection, SQL parity, unicode whitespace") {
    GraftFunctions.registerAll(spark)
    // NBSP-joined pair, double space, tab, ideographic space (U+3000)
    val text = "a\u00A0b  c\td \u3000e"
    val df = Seq((1L, text)).toDF("doc_id", "text")
    df.createOrReplaceTempView("tok_docs")
    // default (ws): ASCII whitespace runs only — the NBSP and U+3000
    // tokens stay fused, exactly like every existing t-series oracle
    val sqlWs = spark.sql("SELECT graft_tokenize(text) AS t FROM tok_docs")
      .as[Seq[String]].head()
    val colWs = df.select(TextFunctions.tokenize(
      org.apache.spark.sql.functions.col("text")).as("t")).as[Seq[String]].head()
    assert(sqlWs === colWs)
    assert(sqlWs === Seq("a\u00A0b", "c", "d", "\u3000e"))
    // unicode: \p{Z} separators split too — the multilingual-corpus mode
    val sqlUni = spark.sql(
      "SELECT graft_tokenize(text, 'unicode') AS t FROM tok_docs")
      .as[Seq[String]].head()
    assert(sqlUni === Seq("a", "b", "c", "d", "e"))
    assert(sqlUni === df.select(TextFunctions.tokenize(
      org.apache.spark.sql.functions.col("text"), "unicode").as("t"))
      .as[Seq[String]].head())
    // space-raw keeps the empty token the double space produces (the
    // string_split(' ') count semantics); space drops it; neither splits
    // the tab
    assert(df.select(org.apache.spark.sql.functions.size(
      TextFunctions.tokenize(org.apache.spark.sql.functions.col("text"),
        "space-raw"))).as[Int].head() === 4)
    assert(spark.sql("SELECT size(graft_tokenize(text, 'space')) FROM tok_docs")
      .as[Int].head() === 3)
    // the mode is a plan-time policy: non-literal modes are rejected
    intercept[Exception] {
      spark.sql("SELECT graft_tokenize(text, text) FROM tok_docs").collect()
    }
    intercept[Exception] { TextFunctions.tokenize(
      org.apache.spark.sql.functions.col("text"), "bogus") }
  }

  test("graft_bloom_agg + graft_might_contain compose in plain SQL") {
    GraftFunctions.registerAll(spark)
    spark.range(0, 100).createOrReplaceTempView("bloom_keys")
    val hits = spark.sql(
      """SELECT count(*) AS n FROM (SELECT id FROM range(0, 200)) probe
        |WHERE graft_might_contain(
        |  (SELECT graft_bloom_agg(xxhash64(CAST(id AS STRING)), 100L, 2000L)
        |   FROM bloom_keys),
        |  xxhash64(CAST(probe.id AS STRING)))""".stripMargin)
      .as[Long].head()
    // no false negatives: all 100 members hit; fpp may add a few extras
    assert(hits >= 100L && hits <= 120L, s"got $hits")
  }
}
