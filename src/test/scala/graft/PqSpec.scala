package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnOps, PqIndex}
import graft.sources.Tables

/** Product-quantization ANN (PqIndex): code layout and compression,
  * ADC ≡ reconstruction-dot equivalence, approximation quality,
  * recall vs exact top-k, and the zero-shuffle query plan.
  */
class PqSpec extends SparkTestBase {

  private def vecs = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("emb"))

  private lazy val path: String = PqIndex.ensure(spark, sf).get

  private lazy val codebook: Seq[Seq[Seq[Double]]] =
    spark.read.parquet(s"$path/cbook").collect().head
      .getSeq[Any](0).map(_.asInstanceOf[scala.collection.Seq[Any]]
        .map(_.asInstanceOf[scala.collection.Seq[Double]].toSeq).toSeq).toSeq

  test("codes: M tinyint codes in [0, K), one row per corpus vector, norms exact") {
    val codes = spark.read.parquet(s"$path/codes")
    assert(codes.count() == vecs.filter(col("vec_id") =!= 0).count())
    assert(codes.schema("codes").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == org.apache.spark.sql.types.ByteType)
    val bad = codes.filter(size(col("codes")) =!= PqIndex.M ||
      exists(col("codes"), c => c < 0 || c >= PqIndex.K)).count()
    assert(bad == 0, s"$bad rows with out-of-range codes")
    // stored norm matches the raw embedding's
    val normErr = codes.join(vecs, "vec_id")
      .select(max(abs(col("norm") - sqrt(AnnOps.dot(col("emb"), col("emb"))))))
      .collect().head.getDouble(0)
    assert(normErr < 1e-9)
  }

  test("a corpus smaller than K still trains K centroids and encodes in-range") {
    // Regression (round-4 advisor): 1..K-1 vectors used to seed
    // codebooks shorter than K while encode's argmin iterates k in
    // 0..K-1 — out-of-bounds element_at under ANSI. Seeds now cycle.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val tiny = (1 to 5).map(i =>
      (i.toLong, s"v$i", Seq.fill(64)(rnd.nextGaussian())))
      .toDF("vec_id", "label", "emb")
    val cb = PqIndex.trainCodebooks(tiny)
    assert(cb.length == PqIndex.M)
    assert(cb.forall(_.length == PqIndex.K),
      s"per-subspace codebook sizes: ${cb.map(_.length)}")
    val encoded = tiny.select(PqIndex.encode(col("emb"), cb).as("codes"))
      .filter(exists(col("codes"), c => c < 0 || c >= PqIndex.K)).count()
    assert(encoded == 0, "out-of-range codes on a tiny corpus")
  }

  test("rebuild determinism: ensure() twice reuses the index; re-encoding is identical") {
    assert(PqIndex.ensure(spark, sf).get == path)
    val stored = spark.read.parquet(s"$path/codes").select("vec_id", "codes")
    val again = vecs.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), PqIndex.encode(col("emb"), codebook).as("codes"))
    assert(stored.exceptAll(again).count() == 0 && again.exceptAll(stored).count() == 0)
  }

  test("ADC lookup-table sum == reconstruction dot (algebraic identity, numerically)") {
    val q = vecs.filter(col("vec_id") === 0)
      .select("emb").collect().head.getSeq[Double](0).toSeq
    val lut = PqIndex.lutFor(q, codebook)
    val cbook = spark.read.parquet(s"$path/cbook")
    val maxDiff = spark.read.parquet(s"$path/codes")
      .crossJoin(broadcast(cbook))
      .select(max(abs(
        PqIndex.adcDot(col("codes"), lut) -
          AnnOps.dot(typedlit(q), PqIndex.reconstruct(col("codes"), col("cbook"))))))
      .collect().head.getDouble(0)
    assert(maxDiff < 1e-9, s"ADC vs reconstruction dot diverge by $maxDiff")
  }

  test("approximate cosine tracks exact cosine (quantization error bound)") {
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("emb").as("q_emb"), sqrt(AnnOps.dot(col("emb"), col("emb"))).as("q_norm"))
    val cbook = spark.read.parquet(s"$path/cbook")
    val approx = spark.read.parquet(s"$path/codes")
      .crossJoin(broadcast(cbook)).crossJoin(broadcast(q))
      .select(col("vec_id"),
        (AnnOps.dot(col("q_emb"), PqIndex.reconstruct(col("codes"), col("cbook")))
          / (col("norm") * col("q_norm"))).as("approx_cos"))
    val exact = vecs.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
        (AnnOps.dot(col("emb"), col("q_emb"))
          / (sqrt(AnnOps.dot(col("emb"), col("emb"))) * col("q_norm"))).as("exact_cos"))
    val (mae, maxErr) = approx.join(exact, "vec_id")
      .select(avg(abs(col("approx_cos") - col("exact_cos"))),
        max(abs(col("approx_cos") - col("exact_cos"))))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).head
    info(f"PQ cosine MAE $mae%.4f, max $maxErr%.4f (isotropic corpus — PQ's worst case)")
    assert(mae < 0.12, s"mean |approx-exact| = $mae")
    assert(maxErr < 0.5, s"max |approx-exact| = $maxErr")
  }

  test("pq_topk: exact-cosine output, recall vs exact top-10, ordered") {
    val got = PqIndex.pqTopkQuery(spark, sf).collect()
    assert(got.length == 10)
    // output cosines are EXACT (re-ranked), so they must match the
    // brute-force values for those ids...
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("emb").as("q_emb"), sqrt(AnnOps.dot(col("emb"), col("emb"))).as("q_norm"))
    val exactAll = vecs.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
        (AnnOps.dot(col("emb"), col("q_emb"))
          / (sqrt(AnnOps.dot(col("emb"), col("emb"))) * col("q_norm"))).as("cos"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exactById = exactAll.toMap
    got.foreach { r =>
      assert(math.abs(r.getDouble(2) - exactById(r.getLong(0))) < 1e-4,
        s"vec ${r.getLong(0)}: re-ranked cos ${r.getDouble(2)} != exact")
    }
    // ...ordered descending...
    val cs = got.map(_.getDouble(2))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    // ...and the shortlist catches most of the true top-10 even on
    // this isotropic corpus (shortlist 80/499 — measured 0.80; the
    // shortlist/corpus ratio is THE recall knob and the pipeline is
    // deterministic, so the pin is the measured value)
    val trueTop = exactAll.sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
    val recall = got.map(_.getLong(0)).count(trueTop) / 10.0
    info(f"pq_topk recall@10 = $recall%.2f")
    assert(recall >= 0.8, s"recall@10 $recall below floor")
  }

  test("query plan: no shuffle exchange anywhere in the pq_topk plan") {
    val plan = PqIndex.pqTopkQuery(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "pq_topk should be scan + broadcasts + TakeOrdered only")
    assert(plan.contains("TakeOrderedAndProject"))
  }
}

/** r5 verdict #8 — the vector lanes' OTHER axis: dimensionality.
  * The PQ plane derives dims-per-subspace from the data (dim / M),
  * so the same code quantizes 64-dim and 512-dim corpora; this pins
  * the derivation on a non-default dim (m=8 × subDim=2 = 16) —
  * train, encode, reconstruct, and the ADC ≡ reconstruction-dot
  * identity all at d=16.
  */
class PqDimSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import graft.operators.{AnnOps, PqIndex}

  test("PQ plane is dimension-agnostic: d=16 trains, encodes, and keeps ADC == dot(reconstruct)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val d16 = (1 to 40).map(i =>
      (i.toLong, s"v$i", Seq.fill(16)(rnd.nextGaussian()))).toDF("vec_id", "label", "emb")
    val cb = PqIndex.trainCodebooks(d16)
    assert(cb.length == PqIndex.M && cb.forall(_.length == PqIndex.K))
    assert(cb.forall(_.forall(_.length == 2)), "subDim must be dim/M = 2")
    val q = Seq.fill(16)(rnd.nextGaussian())
    val lut = PqIndex.lutFor(q, cb)
    assert(lut.length == PqIndex.M * PqIndex.K)
    val cbook = typedlit(cb)
    val out = d16
      .select(PqIndex.encode(col("emb"), cb).as("codes"))
      .select(col("codes"),
        PqIndex.reconstruct(col("codes"), cbook).as("rec"))
      .select(size(col("rec")).as("len"),
        abs(PqIndex.adcDot(col("codes"), lut) -
          AnnOps.dot(typedlit(q), col("rec"))).as("err"))
      .agg(max("len"), min("len"), max("err")).collect()(0)
    assert(out.getInt(0) == 16 && out.getInt(1) == 16,
      s"reconstructed length ${out.getInt(0)}/${out.getInt(1)} != 16")
    assert(out.getDouble(2) < 1e-9, s"ADC != dot(reconstruct): ${out.getDouble(2)}")
  }
}
