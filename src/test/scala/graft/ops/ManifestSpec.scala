package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** e14 property spec: the manifest must actually SKIP files — the pruned
  * plan's input is a strict subset of the layout — while losing no
  * qualifying row. */
class ManifestSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("e14: manifest prunes files strictly, result equals full-table filter") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_manspec").toFile
    try {
      val dataDir = new java.io.File(dir, "data").getAbsolutePath
      ExportOps.sortedExport(s, d, dataDir)
      val manifest = ExportOps.statsManifest(s, dataDir)
      val total = manifest.count()
      assert(total >= 8, s"layout produced only $total files")

      val thr = s.read.parquet(dataDir)
        .agg(max(col("score"))).head().getLong(0) * 3 / 4
      val keep = manifest.filter(col("score_max") >= thr)
        .select(col("file")).collect().map(_.getString(0))
      // the range layout concentrates high scores in few files: the
      // manifest must rule most files out without opening them
      assert(keep.nonEmpty && keep.length * 2 <= total,
        s"manifest skipped too little: ${keep.length}/$total files")

      val pruned = s.read.parquet(keep.toIndexedSeq: _*)
        .filter(col("score") >= thr)
        .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
      val full = s.read.parquet(dataDir)
        .filter(col("score") >= thr)
        .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
      assert(pruned == full && full.nonEmpty)
    } finally ExportOps.deleteRecursively(dir)
  }
}
