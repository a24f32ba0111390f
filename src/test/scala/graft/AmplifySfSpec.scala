package graft

import graft.ops.ExportOps
import org.apache.spark.sql.functions._

/** Pins the properties that make [[AmplifySf]] a usable larger-SF bench
  * fixture: row counts scale ×X, keys stay unique, foreign keys resolve
  * inside each replica, and — the part that keeps every gate's work
  * LINEAR in X — replicas are decorrelated (disjoint shingle sets for
  * text, shifted `% k` residue classes for synthesized block keys,
  * rotated dims for embeddings) instead of X verbatim copies that would
  * square the near-dup candidate space. */
class AmplifySfSpec extends SparkSpec {

  private val X = 3
  private val src = "/root/testdata/sf0.001"

  private lazy val dir: String = {
    val out = ExportOps.scratchDir("graft_amp_spec", "spec")
    out.mkdirs()
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => ExportOps.deleteRecursively(out)))
    AmplifySf.amplify(spark, src, out.getAbsolutePath, X)
    out.getAbsolutePath
  }

  private def t(name: String) = spark.read.parquet(s"$dir/$name.parquet")
  private def base(name: String) = spark.read.parquet(s"$src/$name.parquet")

  test("row counts scale xX on scaling tables; region/nation stay fixed") {
    Seq("customer", "supplier", "part", "orders", "lineitem", "events",
      "documents", "embeddings").foreach { n =>
      assert(t(n).count() === base(n).count() * X, s"table $n")
    }
    Seq("region", "nation").foreach { n =>
      assert(t(n).count() === base(n).count(), s"table $n")
    }
  }

  test("keys stay unique and foreign keys resolve within each replica") {
    Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
      "documents" -> "doc_id", "embeddings" -> "vec_id",
      "events" -> "event_id").foreach { case (n, k) =>
      val df = t(n)
      assert(df.select(k).distinct().count() === df.count(), s"$n.$k")
    }
    val orphans = t("orders").join(t("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(orphans === 0L, "orders must resolve to an amplified customer")
    // and the FK lands in the SAME replica: key*X+rep keeps rep = key % X
    val crossRep = t("orders")
      .filter(col("o_orderkey") % X =!= col("o_custkey") % X).count()
    assert(crossRep === 0L, "FK remap must stay replica-local")
  }

  test("replica text is shingle-disjoint (near-dup work scales xX, not xX²)") {
    // every replica of one base doc: token sets must be pairwise disjoint
    // (rep>0 tokens carry the x<letter> salt), so MinHash bands can't merge
    // replicas into shared candidate buckets
    val reps = t("documents")
      .withColumn("baseId", (col("doc_id") / X).cast("long"))
      .withColumn("rep", col("doc_id") % X)
      .filter(col("baseId") === 7L)
      .select(col("rep"), explode(split(col("text"), " ")).as("tok"))
    val shared = reps.groupBy(col("tok"))
      .agg(countDistinct(col("rep")).as("nrep"))
      .filter(col("nrep") > 1).count()
    assert(shared === 0L, "replicas must not share tokens")
    // and rep 0 keeps the original corpus verbatim
    val orig = base("documents").filter(col("doc_id") === 7L)
      .select("text").head().getString(0)
    val rep0 = t("documents").filter(col("doc_id") === 7L * X)
      .select("text").head().getString(0)
    assert(rep0 === orig, "rep 0 must preserve the base text")
  }

  test("key residue classes shift per replica (synthesized block keys split)") {
    // d23/d26 build titles from doc_id % 50: verbatim-offset replicas
    // would collide into identical residues; multiplication must spread
    // one base doc's replicas over DISTINCT residues (gcd(X,50)=1 for X=3)
    val res = t("documents")
      .withColumn("baseId", (col("doc_id") / X).cast("long"))
      .groupBy("baseId")
      .agg(countDistinct(col("doc_id") % 50).as("nres"))
      .agg(min("nres")).head().getLong(0)
    assert(res === X.toLong, s"each base doc must land $X distinct residues")
  }

  test("embeddings rotate per replica: norms equal, cross-replica vectors differ") {
    val pairs = t("embeddings")
      .withColumn("rep", col("vec_id") % X)
      .withColumn("baseId", (col("vec_id") / X).cast("long"))
      .filter(col("baseId") === 5L)
      .select(col("rep"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(pairs.size === X)
    val norm0 = math.sqrt(pairs(0L).map(x => x * x.toDouble).sum)
    pairs.foreach { case (_, v) =>
      assert(math.abs(math.sqrt(v.map(x => x * x.toDouble).sum) - norm0) < 1e-4,
        "rotation must preserve the norm")
    }
    assert(pairs(0L) !== pairs(1L), "replica vectors must differ")
    assert(pairs(1L) !== pairs(2L), "replica vectors must differ")
  }
}
