package graft.multimodal

import graft.SparkSpec

/** Multimodal plumbing tests: binary transport schema, per-partition decoder
  * batching, deterministic stub decode. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("media table carries opaque binary + typed metadata") {
    val m = Multimodal.mediaTable(spark, d)
    val f = m.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(f("media") === "binary")
    assert(f("nBytes") === "bigint")
    val row = m.head()
    assert(row.getAs[Array[Byte]]("media").length === row.getAs[Long]("nBytes"))
  }

  test("stub decode is deterministic and partition-local") {
    val out1 = Multimodal.decodeAll(Multimodal.mediaTable(spark, d))
      .collect().sortBy(_.doc_id)
    val out2 = Multimodal.decodeAll(
      Multimodal.mediaTable(spark, d).repartition(7)) // different partitioning
      .collect().sortBy(_.doc_id)
    assert(out1.toSeq === out2.toSeq, "decode must not depend on partitioning")
    assert(out1.forall(r => r.width >= 160 && r.height >= 120 && r.nFrames >= 1))
  }

  test("frame sampling fans out exactly n_frames rows per media row") {
    val media = Multimodal.mediaTable(spark, d)
    val decoded = Multimodal.decodeAll(media).collect().map(r => r.doc_id -> r.nFrames).toMap
    val frames = Multimodal.sampleFrames(media).collect()
    val perDoc = frames.groupBy(_.doc_id)
    assert(perDoc.keySet === decoded.keySet)
    perDoc.foreach { case (id, fs) =>
      assert(fs.length === decoded(id), s"doc $id frame count")
      assert(fs.map(_.frame_idx).sorted.toSeq === (0 until decoded(id)),
        s"doc $id frame indices must be 0..n-1")
    }
    assert(frames.map(_.frame_phash).distinct.length > 1, "phashes must vary")
  }

  test("custom decoder plugs in per partition") {
    val fixed = new Multimodal.MediaDecoder {
      override def decode(media: Array[Byte]) = (1, 2, 3, 4L)
    }
    val out = Multimodal.decodeAll(Multimodal.mediaTable(spark, d), fixed).head()
    assert((out.width, out.height, out.nFrames, out.phash) === ((1, 2, 3, 4L)))
  }
}
