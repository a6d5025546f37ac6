package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Distributed Lloyd's k-means over INTEGER vectors (int8-quantized
  * embeddings, the `vec_quant8` output) with exact, order-independent
  * arithmetic — the trained-codebook path for the IVF/PQ ANN stack.
  *
  * Why integer state instead of float centroids: float summation is
  * not associative, so a float `avg` shuffle produces partition-order-
  * dependent centroids — retraining on a repartitioned corpus (or
  * comparing against any other engine) would flip argmin assignments
  * on near-ties. Here a centroid is the exact rational S/c, carried as
  * (S: ARRAY<BIGINT> element sums, c: BIGINT count). Every training
  * step is integer-exact and therefore bit-identical under ANY
  * partitioning (KMeansSpec pins this), and the DuckDB oracle can
  * replay training exactly (q71_kmeans).
  *
  * Per-iteration plan shape (the 100 TB contract):
  *  - ASSIGN is map-only: the k centroids are driver-side literals
  *    (the codebook is k·d longs — broadcast-sized by construction);
  *    the per-row cost is k native codegen'd `vec_dot_int` calls.
  *    d(x, S/c)² is ranked via the exact integer polynomial
  *    c²·(x·x) − 2c·(x·S) + (S·S) divided ONCE by c² in double — a
  *    single IEEE rounding of exact integers, deterministic in any
  *    engine. (x·x) is computed once per row, (S·S) and c² fold to
  *    literals at plan time.
  *  - UPDATE is one groupBy(cid) with d column-wise `sum(element_at)`
  *    aggregates: map-side partial aggregation, k·(d+1) longs on the
  *    wire, NO posexplode row blow-up. The k-row result is collected
  *    to the driver (the ConnectedComponents convergence pattern).
  *  - CONVERGENCE is exact integer state equality — no epsilon.
  *
  * Overflow bound: |x_j| ≤ 127 (int8 codes), so S_j ≤ 127·c and
  * every per-element term of the polynomial — including the worst
  * case (c·x_j − S_j)² ≤ (2·127·c)² when x_j is anti-aligned with
  * S_j, and the −2c·(x·S) intermediate — is ≤ 4·(127·c)²·d; with
  * d = 64 this stays inside Long for c up to ~1.5·10^6 vectors per
  * cluster and inside double-exact (2^53) for the division input up
  * to c ≈ 10^5. Past that, train on
  * a deterministic hash-sample per cluster (k-means centroids are
  * means — a 10^5 sample estimates them to ±1%%), which is how a
  * 100 TB corpus trains its codebook anyway: sample → train → one
  * map-only assign pass over the full corpus.
  */
object KMeans {

  /** Exact centroid state: the centroid is the rational sums/count. */
  final case class Centroid(cid: Long, sums: Array[Long], count: Long) {
    def mean: Array[Double] = sums.map(_.toDouble / count.toDouble)
    def sameAs(o: Centroid): Boolean =
      cid == o.cid && count == o.count && sums.sameElements(o.sums)
  }

  /** argmin-by-(distance, cid) assignment column for one centroid set.
    * Map-only: centroids are plan-time literals; ties break on the
    * LOWER cid (least() on (d, cid) structs — exact, engine-portable). */
  def assignExpr(vec: Column, state: Seq[Centroid]): Column = {
    require(state.nonEmpty, "kmeans: empty centroid state")
    // Exactness bound (see the scaladoc overflow note): every
    // intermediate of c²·(x·x) − 2c·(x·S) + (S·S) must stay inside
    // Long. The worst per-element term is (c·x_j − S_j)² ≤ (254c)²
    // (x_j anti-aligned with S_j), so the bound is 4·127²·c²·d ≤
    // Long.Max ⇒ c ≤ √(Long.Max / (4·127²·d)) — ~1.5M vectors per
    // cluster at d = 64. Past that, train on a deterministic
    // hash-sample; this fails loudly instead of wrapping silently.
    state.foreach { st =>
      val dim = st.sums.length.max(1)
      val maxCount = math.sqrt(Long.MaxValue.toDouble / (4 * 16129.0 * dim)).toLong
      require(st.count <= maxCount,
        s"kmeans: cluster ${st.cid} count ${st.count} exceeds the exact-integer " +
          s"bound $maxCount for dim $dim — train on a hash-sample instead")
    }
    // k = 1 keeps the historical constant-fold (a plain cid literal,
    // insensitive to vector nullity, matching the old struct form)
    if (state.size == 1) return lit(state.head.cid)
    // native argmin (graft.functions.KmeansAssign): identical
    // arithmetic to the former least(struct(num/cc as d, cid)…) tower
    // — same wrapping-Long polynomial, one IEEE division, (d, cid)
    // order over cid-sorted centroids — but one tight k×d loop per
    // row instead of k struct allocations + k generated dot calls
    // (measured 7.9 → ~1.5 s per 200k-row pass at k = 64).
    val sorted = state.sortBy(_.cid)
    org.apache.spark.sql.graftshim.Shims.column(graft.functions.KmeansAssign(
      org.apache.spark.sql.graftshim.Shims.expression(vec),
      sorted.map(_.cid), sorted.map(_.sums.toSeq), sorted.map(_.count)))
  }

  /** Codebook size for a corpus of `n` vectors under a target cell
    * population: k = clamp(ceil(n / targetCell), 8, 64). This is the
    * "k grows with the corpus so E[cell size] stays bounded" dial the
    * SemDeDup/hubness family documents — cluster-local pair work is
    * ~n·cellSize/2, so a FIXED k is quadratic at scale while
    * k ∝ n keeps it linear (BoundedPair.refined backstops whatever
    * skew remains past the cap).
    *
    * The floor of 8 pins the oracle: every sf ≤ 0.1 corpus (≤ 2000
    * vectors at targetCell = 256) resolves to exactly the historical
    * 8 seeds, so sf0.01 oracle results and sf0.1 bench results are
    * unchanged. The cap of 64 bounds the assignExpr literal codebook
    * (k·d longs in the plan) and the per-row assignment cost (k
    * integer dots); past the cap, cell budgets are BoundedPair's job.
    *
    * Driver-side: callers pass a corpus count they already hold (or
    * one cheap count() on a barriered frame — parquet metadata at
    * scan scale). */
  def kForBudget(n: Long, targetCell: Long = 256L): Int = {
    require(targetCell >= 1, s"targetCell must be positive, got $targetCell")
    math.min(64L, math.max(8L, (n + targetCell - 1L) / targetCell)).toInt
  }

  /** Seed state from the vectors whose id is in `seedIds` (count = 1,
    * sums = the vector itself, cid = the id): deterministic and
    * replayable in an oracle. A tiny driver-side collect (k rows). */
  def seedsFromIds(vecs: DataFrame, idCol: String, vecCol: String,
                   seedIds: Seq[Long]): Seq[Centroid] = {
    val rows = vecs.filter(col(idCol).isin(seedIds: _*))
      .select(col(idCol), col(vecCol)).collect()
    require(rows.length == seedIds.length,
      s"kmeans: ${seedIds.length} seeds requested, ${rows.length} found")
    rows.map(r => Centroid(r.getLong(0), r.getSeq[Long](1).toArray, 1L))
      .sortBy(_.cid).toSeq
  }

  /** One frozen-model aggregation step: assign every vector under
    * `state` and return the EXACT per-cluster (sums, count) — absent
    * cids received nothing. This is the unit of both batch training
    * (one Lloyd round) and streaming codebook maintenance: integer
    * sums are associative, so micro-batch steps merged with
    * [[mergeSteps]] equal the one-shot step over the union,
    * bit-for-bit, under the same frozen model. */
  def aggregateStep(vecs: DataFrame, vecCol: String, dim: Int,
                    state: Seq[Centroid]): Map[Long, Centroid] = {
    val sumCols = (0 until dim).map(j =>
      sum(element_at(col(vecCol), j + 1)).as(s"_s$j"))
    vecs
      .select(col(vecCol), assignExpr(col(vecCol), state).as("_cid"))
      .groupBy("_cid")
      .agg(count(lit(1)).as("_c"), sumCols: _*)
      .collect()
      .map { r =>
        val sums = Array.tabulate(dim)(j => r.getLong(r.fieldIndex(s"_s$j")))
        r.getLong(0) -> Centroid(r.getLong(0), sums, r.getLong(r.fieldIndex("_c")))
      }.toMap
  }

  /** Merge two partial aggregation steps (element-wise sum + count
    * add) — the streaming accumulator. Exact and order-independent. */
  def mergeSteps(a: Map[Long, Centroid], b: Map[Long, Centroid]): Map[Long, Centroid] =
    (a.keySet ++ b.keySet).map { cid =>
      (a.get(cid), b.get(cid)) match {
        case (Some(x), Some(y)) =>
          cid -> Centroid(cid,
            x.sums.zip(y.sums).map { case (p, q) => p + q },
            x.count + y.count)
        case (Some(x), None) => cid -> x
        case (None, Some(y)) => cid -> y
        case _ => throw new IllegalStateException("unreachable")
      }
    }.toMap

  /** Fold an aggregation step into the previous state: a cluster that
    * received no vectors KEEPS its previous state (deterministic and
    * oracle-replayable). */
  def applyStep(state: Seq[Centroid], step: Map[Long, Centroid]): Seq[Centroid] =
    state.map(old => step.getOrElse(old.cid, old))

  /** Exact retrain trigger for the streaming decision loop: does the
    * candidate model move any centroid mean by more than
    * tauNum/tauDen in ANY coordinate? Decided entirely in integers by
    * cross-multiplication — |So_j·cn − Sn_j·co| · tauDen >
    * tauNum · co · cn — over BigInt (driver-side on k·d values, so
    * arbitrary precision is free). No float epsilon: the same stream
    * always swaps at the same micro-batch, on any cluster layout. */
  def driftExceeds(old: Seq[Centroid], candidate: Seq[Centroid],
      tauNum: Long, tauDen: Long): Boolean = {
    require(tauNum >= 0 && tauDen > 0, s"kmeans: bad tau $tauNum/$tauDen")
    require(old.map(_.cid) == candidate.map(_.cid),
      "kmeans: drift test requires aligned centroid ids")
    old.zip(candidate).exists { case (o, n) =>
      o.sums.indices.exists { j =>
        (BigInt(o.sums(j)) * n.count - BigInt(n.sums(j)) * o.count).abs * tauDen >
          BigInt(tauNum) * o.count * n.count
      }
    }
  }

  /** All-subspace variant of [[aggregateStep]] for PQ training: ONE
    * scan computes every (subspace, cluster) sum+count. Each row
    * assigns all M subspaces map-side, then fans out M (m, cid)
    * pairs — the shuffle key becomes (m, cid) and the aggregate is
    * an ordinary subDim+1-column groupBy with map-side combine (a
    * giant conditional-aggregate formulation blew past the codegen
    * method limits and ran SLOWER; this shape stays small). Exact
    * integers ⇒ bit-identical to M separate [[aggregateStep]] passes
    * (KMeansSpec pins this); at 100 TB this is 1 scan per training
    * round instead of M.
    *
    * Shape note (the r15 7× fix): the assignments are computed in a
    * PROJECTION and only the M already-computed cid longs feed the
    * posexplode. The previous form inlined the M assignExprs into the
    * generator input itself (explode(array(struct(m, assignExpr…)))),
    * which pushed GenerateExec past the whole-stage-codegen limits and
    * dropped the entire argmin subtree to interpreted eval per row —
    * measured 25.3 s vs 3.6 s per round on 200k×64 int8 at sf10 for
    * bit-identical output. Generate is not a Project, so CollapseProject
    * cannot re-inline the assignment columns (the q186 trap). */
  def aggregateStepMulti(vecs: DataFrame, vecCol: String, subDim: Int,
                         states: Seq[Seq[Centroid]]): Seq[Map[Long, Centroid]] = {
    val withCids = vecs.select(col(vecCol) +: states.zipWithIndex.map { case (st, m) =>
      assignExpr(expr(s"slice($vecCol, ${m * subDim + 1}, $subDim)"), st).as(s"_cid$m")
    }: _*)
    val sumCols = (0 until subDim).map(j =>
      sum(expr(s"element_at($vecCol, _m * $subDim + ${j + 1})")).as(s"_s$j"))
    val rows = withCids
      .select(col(vecCol),
        posexplode(array(states.indices.map(m => col(s"_cid$m")): _*))
          .as(Seq("_m", "_cid")))
      .groupBy("_m", "_cid")
      .agg(count(lit(1)).as("_c"), sumCols: _*)
      .collect()
    val byM = rows.groupBy(_.getInt(0))
    states.indices.map { m =>
      byM.getOrElse(m, Array.empty).map { r =>
        val sums = Array.tabulate(subDim)(j => r.getLong(r.fieldIndex(s"_s$j")))
        r.getLong(1) -> Centroid(r.getLong(1), sums, r.getLong(r.fieldIndex("_c")))
      }.toMap
    }
  }

  /** Train every PQ subspace simultaneously — one scan per Lloyd
    * round instead of M. Bit-identical to training each subspace
    * separately (exact integer state). */
  def trainSubspaces(vecs: DataFrame, vecCol: String, subDim: Int,
                     seeds: Seq[Seq[Centroid]], maxIter: Int): Seq[Seq[Centroid]] = {
    var states = seeds.map(_.sortBy(_.cid))
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val steps = aggregateStepMulti(vecs, vecCol, subDim, states)
      val next = states.zip(steps).map { case (st, step) => applyStep(st, step) }
      converged = next.zip(states).forall { case (a, b) =>
        a.zip(b).forall { case (x, y) => x.sameAs(y) } }
      states = next
      it += 1
    }
    states
  }

  /** Slice full-vector seed centroids into per-subspace seeds (one
    * driver-side collect serves every subspace). */
  def sliceSeeds(seeds: Seq[Centroid], subDim: Int, subspaces: Int): Seq[Seq[Centroid]] =
    (0 until subspaces).map(m =>
      seeds.map(c => Centroid(c.cid,
        c.sums.slice(m * subDim, m * subDim + subDim), c.count)))

  /** Lloyd's loop: assign → exact integer update → converge-or-iterate.
    * Returns the final state after at most `maxIter` update rounds
    * (fewer if the integer state reaches a fixed point). */
  def train(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
            seeds: Seq[Centroid], maxIter: Int): Seq[Centroid] = {
    var state = seeds.sortBy(_.cid)
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val next = applyStep(state, aggregateStep(vecs, vecCol, dim, state))
      converged = next.zip(state).forall { case (a, b) => a.sameAs(b) }
      state = next
      it += 1
    }
    state
  }

  /** Driver-side mirror of [[assignExpr]]'s distance — the SAME exact
    * integer polynomial and single IEEE division, for query-planning
    * steps (e.g. picking the nprobe nearest centroids for ONE query
    * vector) that don't warrant a Spark job. */
  def distanceTo(x: Array[Long], st: Centroid): Double = {
    var xx = 0L; var xs = 0L; var ss = 0L
    var j = 0
    while (j < x.length) {
      xx += x(j) * x(j); xs += x(j) * st.sums(j); ss += st.sums(j) * st.sums(j)
      j += 1
    }
    val cc = st.count * st.count
    (cc * xx - 2L * st.count * xs + ss).toDouble / cc.toDouble
  }

  /** One map-only assignment pass under a trained model. */
  def assign(vecs: DataFrame, idCol: String, vecCol: String,
             state: Seq[Centroid]): DataFrame =
    vecs.select(col(idCol), assignExpr(col(vecCol), state).as("cid"))

  /** Persist a trained model as a (cid, sums, c) parquet table — the
    * deploy artifact a 100 TB pipeline trains once (on a hash-sample)
    * and ships to every map-only assignment job. Exact integer state
    * round-trips bit-for-bit (KMeansSpec pins save→load→assign ≡ the
    * in-memory model). */
  def saveModel(spark: org.apache.spark.sql.SparkSession,
                state: Seq[Centroid], path: String): Unit = {
    import spark.implicits._
    state.map(st => (st.cid, st.sums.toSeq, st.count))
      .toDF("cid", "sums", "c")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load a persisted model; k rows, driver-side by design. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): Seq[Centroid] =
    spark.read.parquet(path).collect()
      .map(r => Centroid(r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
      .sortBy(_.cid).toSeq
}
