package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.KMeans
import graft.ops.KMeans.Centroid

class KMeansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def df(rows: Seq[(Long, Array[Long])]) = {
    val s2 = spark
    import s2.implicits._
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")
  }

  // Two well-separated blobs in 4-d integer space; ids 1 and 101 are
  // one point from each blob (the seeds).
  private val blobA = (1L to 20L).map(i => i -> Array(0L + i % 3, 1L, 2L, 0L))
  private val blobB = (101L to 120L).map(i => i -> Array(100L + i % 3, 99L, 98L, 100L))
  private val blobs = blobA ++ blobB

  test("converges on separable blobs and groups them correctly") {
    val vecs = df(blobs)
    val seeds = KMeans.seedsFromIds(vecs, "id", "v", Seq(1L, 101L))
    val model = KMeans.train(vecs, "id", "v", dim = 4, seeds, maxIter = 10)

    val assigned = KMeans.assign(vecs, "id", "v", model).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    blobA.foreach { case (id, _) => assert(assigned(id) === 1L, s"id $id") }
    blobB.foreach { case (id, _) => assert(assigned(id) === 101L, s"id $id") }

    // Fixed point: one more round must not move the exact state.
    val again = KMeans.train(vecs, "id", "v", dim = 4, model, maxIter = 1)
    assert(again.zip(model).forall { case (a, b) => a.sameAs(b) })
    // The converged centroid IS the exact blob aggregate.
    val a = model.find(_.cid == 1L).get
    assert(a.count === blobA.length)
    assert(a.sums === blobA.map(_._2).transpose.map(_.sum).toArray)
  }

  test("training state is bit-identical under different partitionings") {
    val vecs = df(blobs)
    val seeds = KMeans.seedsFromIds(vecs, "id", "v", Seq(1L, 101L))
    val m3 = KMeans.train(vecs.repartition(3), "id", "v", 4, seeds, maxIter = 5)
    val m13 = KMeans.train(vecs.repartition(13), "id", "v", 4, seeds, maxIter = 5)
    assert(m3.zip(m13).forall { case (a, b) => a.sameAs(b) },
      "integer state must be partition-order independent")
  }

  test("assignment matches a driver-side exact recomputation") {
    val vecs = df(blobs)
    val seeds = KMeans.seedsFromIds(vecs, "id", "v", Seq(1L, 101L))
    val model = KMeans.train(vecs, "id", "v", 4, seeds, maxIter = 3)

    val got = KMeans.assign(vecs, "id", "v", model).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    blobs.foreach { case (id, x) =>
      val want = model.map { st =>
        val xx = x.map(v => v * v).sum
        val xs = x.zip(st.sums).map { case (a, b) => a * b }.sum
        val ss = st.sums.map(s => s * s).sum
        val num = st.count * st.count * xx - 2 * st.count * xs + ss
        (num.toDouble / (st.count * st.count).toDouble, st.cid)
      }.min._2
      assert(got(id) === want, s"id $id")
    }
  }

  test("a cluster that receives no vectors keeps its previous state") {
    // Both points are IDENTICAL and both are seeds: every assignment
    // round ties and the lower cid wins, so cluster 2 is empty at
    // EVERY iteration and must carry its seed state to convergence.
    val rows = Seq(1L -> Array(5L, 5L), 2L -> Array(5L, 5L))
    val vecs = df(rows)
    val seeds = KMeans.seedsFromIds(vecs, "id", "v", Seq(1L, 2L))
    val model = KMeans.train(vecs, "id", "v", 2, seeds, maxIter = 4)
    val c2 = model.find(_.cid == 2L).get
    assert(c2.count === 1L && c2.sums === Array(5L, 5L),
      "empty cluster must carry its previous exact state forward")
    val c1 = model.find(_.cid == 1L).get
    assert(c1.count === 2L, "tie-break must send every vector to the lower cid")
  }

  test("fused subspace training is bit-identical to separate per-subspace runs") {
    import org.apache.spark.sql.functions.{col, expr}
    val sf = "/root/testdata/sf0.001"
    val qemb = Tables.embeddings(spark, sf)
      .filter(!org.apache.spark.sql.functions.exists(col("embedding"), _.isNull))
      .select(col("vec_id"), Functions.vec_quant8(col("embedding")).as("q8"))
    val fullSeeds = KMeans.seedsFromIds(qemb, "vec_id", "q8", (1L to 8L))
    val fused = KMeans.trainSubspaces(qemb, "q8", 16,
      KMeans.sliceSeeds(fullSeeds, 16, 4), maxIter = 2)
    val separate = (0 until 4).map { m =>
      val sv = qemb.select(col("vec_id"), expr(s"slice(q8, ${m * 16 + 1}, 16)").as("q8"))
      KMeans.train(sv, "vec_id", "q8", 16,
        KMeans.sliceSeeds(fullSeeds, 16, 4)(m), maxIter = 2)
    }
    fused.zip(separate).zipWithIndex.foreach { case ((f, s), m) =>
      assert(f.zip(s).forall { case (a, b) => a.sameAs(b) },
        s"subspace $m diverged between fused and separate training")
    }
  }

  test("assignExpr stays whole-stage-codegen'd on a parquet scan, no HOF kernels") {
    val sf = "/root/testdata/sf0.001"
    val qemb = Tables.embeddings(spark, sf)
      .filter(!exists(col("embedding"), _.isNull))
      .select(col("vec_id"), Functions.vec_quant8(col("embedding")).as("q8"))
    val seeds = KMeans.seedsFromIds(qemb, "vec_id", "q8", Seq(1L, 2L, 3L, 4L))
    val plan = KMeans.assign(qemb, "vec_id", "q8", seeds)
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix is the simple-string rendering of a
    // WholeStageCodegen stage wrapping the assignment Project
    assert(plan.contains("*(") && plan.contains("Project [vec_id"), s"plan:\n$plan")
    assert(plan.contains("kmeans_assign"),
      s"assignment must rank via the native argmin kernel:\n$plan")
    assert(!plan.contains("zip_with"),
      s"no interpreted HOFs in the assignment hot path:\n$plan")
  }

  test("native kmeans_assign equals the least(struct(d, cid)) tower, bit for bit") {
    val sf = "/root/testdata/sf0.01"
    val qemb = Tables.embeddings(spark, sf)
      .filter(!exists(col("embedding"), _.isNull))
      .select(col("vec_id"), Functions.vec_quant8(col("embedding")).as("q8"))
    val seeds = KMeans.seedsFromIds(qemb, "vec_id", "q8", (1L to 8L))
    val model = KMeans.train(qemb, "vec_id", "q8", 64, seeds, maxIter = 2)
    // the pre-r15 Column formulation, reconstructed verbatim
    val xx = Functions.vec_dot_int(col("q8"), col("q8"))
    val ranked = model.sortBy(_.cid).map { st =>
      val cc = st.count * st.count
      val ss = st.sums.map(s => s * s).sum
      val xs = Functions.vec_dot_int(col("q8"), typedLit(st.sums.toSeq))
      val num = lit(cc) * xx - lit(2L * st.count) * xs + lit(ss)
      struct((num.cast("double") / lit(cc.toDouble)).as("d"), lit(st.cid).as("cid"))
    }
    val both = qemb.select(col("vec_id"),
      KMeans.assignExpr(col("q8"), model).as("native"),
      least(ranked: _*).getField("cid").as("tower"))
    assert(both.filter(not(col("native") <=> col("tower"))).count() === 0)
    assert(both.count() > 0)
  }

  test("q130 inertia matches the driver-side distance sum over the model") {
    val sf = "/root/testdata/sf0.001"
    val qemb = Tables.embeddings(spark, sf)
      .filter(!exists(col("embedding"), _.isNull))
      .select(col("vec_id"), Functions.vec_quant8(col("embedding")).as("q8"))
    val seeds = KMeans.seedsFromIds(qemb, "vec_id", "q8", (1L to 8L))
    val model = KMeans.train(qemb, "vec_id", "q8", 64, seeds, maxIter = 2)
    val byCid = model.map(st => st.cid -> st).toMap
    val vecs = qemb.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val got = SparkEntry.queries("q130_inertia")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val wantByCid = vecs.groupBy { case (_, v) =>
      model.map(st => (KMeans.distanceTo(v, st), st.cid)).min._2
    }.map { case (cid, vs) =>
      val st = byCid(cid)
      cid -> (vs.length.toLong,
        vs.map { case (_, x) =>
          x.indices.map { j => val t = st.count * x(j) - st.sums(j); t * t }.sum
        }.sum)
    }
    assert(got == wantByCid)
  }

  test("model save/load round-trips bit-for-bit and assigns identically") {
    val sf = "/root/testdata/sf0.001"
    val qemb = Tables.embeddings(spark, sf)
      .filter(!exists(col("embedding"), _.isNull))
      .select(col("vec_id"), Functions.vec_quant8(col("embedding")).as("q8"))
    val seeds = KMeans.seedsFromIds(qemb, "vec_id", "q8", (1L to 8L))
    val model = KMeans.train(qemb, "vec_id", "q8", 64, seeds, maxIter = 2)
    val dir = java.nio.file.Files.createTempDirectory("km-model").toString + "/m"
    KMeans.saveModel(spark, model, dir)
    val loaded = KMeans.loadModel(spark, dir)
    assert(loaded.zip(model).forall { case (a, b) => a.sameAs(b) })
    val a1 = KMeans.assign(qemb, "vec_id", "q8", model).collect().map(_.toSeq)
    val a2 = KMeans.assign(qemb, "vec_id", "q8", loaded).collect().map(_.toSeq)
    assert(a1.sameElements(a2))
  }

  test("q132 subspace populations each cover the corpus; SSE keys by code") {
    val sf = "/root/testdata/sf0.001"
    val total = Tables.embeddings(spark, sf)
      .filter(!exists(col("embedding"), _.isNull)).count()
    val rows = SparkEntry.queries("q132_pq_distortion")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (m, rs) =>
      assert(rs.map(_._3).sum == total, s"subspace $m populations don't cover")
      assert(rs.forall(_._4 >= 0L), s"subspace $m has a negative SSE")
    }
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("kForBudget: oracle-pinned floor, corpus-scaled middle, literal-codebook cap") {
    // every shipped oracle/bench corpus resolves to the historical 8
    assert(KMeans.kForBudget(500) == 8)   // sf0.01 embeddings
    assert(KMeans.kForBudget(2000) == 8)  // sf0.1 embeddings
    // past the floor, k tracks ceil(n / targetCell)
    assert(KMeans.kForBudget(10000) == 40)
    assert(KMeans.kForBudget(10001) == 40)
    assert(KMeans.kForBudget(10241) == 41)
    // capped so the plan-time literal codebook stays broadcast-sized
    assert(KMeans.kForBudget(20000) == 64)
    assert(KMeans.kForBudget(100000000L) == 64)
    // monotone non-decreasing in n
    val ks = Seq(1L, 100L, 1000L, 5000L, 30000L, 1000000L).map(KMeans.kForBudget(_))
    assert(ks == ks.sorted)
  }
}
