package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` table (64-d float vectors).
  *
  * Numeric parity with the DuckDB oracle is engineered, not hoped for:
  * every float is cast to DOUBLE before multiplication and every sum is
  * a sequential left-to-right fold (Spark `aggregate` HOF ≡ DuckDB
  * `list_sum` over `list_transform`), so the IEEE operation sequence is
  * bit-identical in both engines and the output doubles hash-match.
  *
  *  - q16_topk: exact brute-force top-k cosine vs a fixed query vector
  *    (vec_id 0), the correctness baseline. The query vector is a
  *    1-row broadcast; ranking compiles to TakeOrderedAndProject
  *    (distributed partial top-k, no global sort) — this shape scales
  *    to any corpus size, cost O(n·d) scan.
  *  - q22_ann: the scale path — LSH random-hyperplane sketch (4
  *    deterministic md5-derived hyperplanes → 16 buckets), search only
  *    the query's bucket: an IVF-style candidate cut. At 100 TB the
  *    bucket id becomes a partition column and the scan partition-
  *    prunes to 1/16th (more planes + multiprobe in a real deploy).
  *  - q23_embdup: embedding-cosine near-dup pairs — bucket-equality
  *    self-join (never all-pairs) + cosine threshold on candidates.
  */
object SimilarityQueries {

  /** Sequential-fold dot product — the native codegen'd expression
    * (bit-identical to the zip_with/aggregate HOF chain, which
    * Catalyst interprets one lambda call per element: ~6× slower on
    * the per-pair hot path). */
  private def dot(a: Column, b: Column): Column = graft.Functions.vec_dot(a, b)

  /** cosine(a,b) = dot/(sqrt(na)*sqrt(nb)) with the exact same op
    * sequence as the oracle SQL. */
  private def cosine(a: String, b: String): Column =
    dot(col(a), col(b)) / (sqrt(dot(col(a), col(a))) * sqrt(dot(col(b), col(b))))

  /** Random-hyperplane sketch, `nBits` planes. Hyperplane j component
    * i is md5-derived uniform in [-0.5, 0.5): deterministic and
    * exactly reproducible in the oracle.
    *
    * The plane values are row-INDEPENDENT, so they are computed once
    * driver-side (same md5 formula, bit-identical doubles) and
    * inlined as array literals — the HOF formulation re-derived 256
    * md5 hashes per row. Per-element op order matches the oracle:
    * (plane · emb) products summed left-to-right.
    *
    * THE PAIR-BUDGET INVARIANT (the 100 TB contract): a near-dup
    * self-join on bucket equality generates ~n²/2^nBits candidate
    * pairs under uniform hashing — a CONSTANT bucket count is
    * quadratic at scale. nBits must grow with the corpus so that
    * E[bucket population] = n/2^nBits stays bounded: 16-24 bits for
    * web-scale corpora (bucket then doubles as a partition column and
    * the join shuffle is bucket-local). The declared oracle queries
    * pin nBits=4 ONLY because 2k test vectors at 16+ bits would leave
    * every bucket a singleton; [[annBucket]]/[[multiprobe]] are the
    * scale-facing surface, asserted in SimilarityQueriesSpec and
    * oracle-gated end to end by q44_multiprobe. */
  private def planes(nBits: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h6(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 6), 16)
    }
    (0 until nBits).map(j => (1 to 64).map(i => h6(s"$j,$i") / 16777216.0d - 0.5d))
  }

  /** ±1 sign matrix for the q123/q124 Johnson-Lindenstrauss
    * projection (16 output dims × 64 input dims): sign(i,j) = +1 iff
    * the first hex digit of md5("rp,i,j") is even — the planes()
    * discipline, so the oracle re-derives the exact matrix. */
  private val rpSigns: Seq[Seq[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 16).map { j =>
      (0 until 64).map { i =>
        val hex = md.digest(s"rp,$i,$j".getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString
        if (Integer.parseInt(hex.substring(0, 1), 16) % 2 == 0) 1L else -1L
      }
    }
  }

  /** The nBits-plane bucket id of an embedding column. Public: this is
    * the production bucketing surface; pick nBits by corpus size (see
    * the pair-budget invariant above). */
  def annBucket(emb: Column, nBits: Int): Column =
    planes(nBits).zipWithIndex.map { case (plane, j) =>
      when(graft.Functions.vec_dot(typedLit(plane), emb) > 0, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Query-time multiprobe set: the bucket itself plus every 1-bit
    * neighbor — recovers most of the recall lost to more planes while
    * scanning (nBits+1)/2^nBits of the corpus. Probe with
    * `array_contains(multiprobe(qb, n), bucket)` or an exploded
    * equi-join on the probe list. */
  def multiprobe(bucket: Column, nBits: Int): Column =
    array((bucket +: (0 until nBits).map(j => bucket.bitwiseXOR(lit(1L << j)))): _*)

  private def bucketCol: Column = annBucket(col("embedding"), 4)

  /** Refinement bits for k-means CELL pair guards (q100/q251): the 16
    * ±1 JL sign rows reused as integer random hyperplanes over the
    * int8 vector — exact integer dots, deterministic, and the same
    * locality family as the cell itself (exact dupes share every
    * sign), so BoundedPair sub-banding keeps LSH-grade recall inside
    * an oversize cell. */
  /** The 16-row JL sign projection of an int8 vector as an
    * ARRAY<BIGINT> column — one codegen'd [[graft.Functions.vec_dot_int]]
    * per sign row instead of the transform∘aggregate∘zip_with HOF
    * tower (Catalyst runs lambdas interpreted, one call per element
    * per row: 16×64 per vector — measured ~7 s of q124/q125's ~10 s
    * at sf10). Integer addition is associative, so the dot kernel's
    * sum equals the HOF's left fold exactly, at any order. */
  private def rpProject(q8: Column): Column =
    array(rpSigns.map(row =>
      graft.Functions.vec_dot_int(q8, typedLit(row))): _*)

  private def q8RefBits(q8: Column): Column =
    rpSigns.zipWithIndex.map { case (row, j) =>
      when(graft.Functions.vec_dot_int(typedLit(row), q8) > 0, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Refinement bits for the pair-budget guard on the 4-bit bucket:
    * hyperplane signs 4..19 — the annBucket ladder CONTINUED past the
    * oracle-pinned 4 planes, so refining an oversize bucket by e of
    * these bits is exactly annBucket at (4+e) planes restricted to
    * that bucket. Same locality family as the bucket itself: exact
    * dupes share every sign, near-dupes most — LSH-grade recall
    * inside the refined key (see graft.ops.BoundedPair). */
  private def bucketRefBits: Column =
    planes(4 + graft.ops.BoundedPair.MaxBits).drop(4).zipWithIndex
      .map { case (plane, j) =>
        when(graft.Functions.vec_dot(typedLit(plane), col("embedding")) > 0,
          lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)

  // Oracle validity domain (rounds 13-14 history): the q23/q216/q100/
  // q251 oracles once replayed the RAW bucket/cid joins with a
  // hardcoded k = 8, valid only where the BoundedPair guard was
  // provably quiet, so Verify carried a quiescence gate
  // (oracleDomainViolations) that REFUSED them past sf0.1. Round 15
  // rendered the guard itself into those oracles (census →
  // depthSqlDuck ladder → refinement-bit sub key, kForBudgetSql for
  // the k dial), making them valid at every sf — where the guard is
  // quiet they reduce algebraically to the historical raw oracles —
  // and the gate was removed.

  /** q23's scored candidate pairs — bucket-equality self-join with
    * per-VECTOR norms computed before the join (n rows, not n²/buckets)
    * and a single dot product per pair. The join key is the
    * BoundedPair-refined bucket: identical to the raw bucket wherever
    * membership fits the 256-row budget (all of sf ≤ 0.1, so the
    * oracle and the driver bench see the historical results), sub-
    * banded by extra hyperplane bits past it (sf1's ~1300-row buckets
    * — the measured 31× decade). Barriers (graft.ops.Barrier): the
    * per-vector frame feeds the census and both join sides; the
    * scored output keeps downstream threshold filters from collapsing
    * into the join condition (which would re-evaluate the dot per
    * pair inside the join loop). Shared by q23_embdup and the q216
    * threshold ladder. */
  private def embDupScored(s: SparkSession, d: String): DataFrame =
    graft.ops.Barrier(embDupScoredPlan(s, d))

  /** Pre-barrier q23 scoring pipeline — `private[graft]` for plan
    * audits (the final q23/q216 plans start at the post-barrier
    * checkpoint scan and show none of the joins). */
  private[graft] def embDupScoredPlan(s: SparkSession, d: String): DataFrame = {
    val emb = graft.ops.Barrier(Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), bucketCol.as("bucket"),
        bucketRefBits.as("ref"),
        dot(col("embedding"), col("embedding")).as("nrm")))
    val r = graft.ops.BoundedPair.refined(emb, "bucket", "ref", "pb")
    r.as("a")
      .join(r.as("b"),
        col("a.pb") === col("b.pb") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (dot(col("a.embedding"), col("b.embedding"))
          / (sqrt(col("a.nrm")) * sqrt(col("b.nrm")))).as("sim"))
  }

  /** DuckDB rendering of the same sketch (kept adjacent so the two
    * stay in lockstep). */
  private val bucketSqlDuck =
    """CAST(list_sum([CASE WHEN list_sum(list_transform(range(1, 65), i ->
         (CAST(concat('0x', substr(md5(CAST(j AS VARCHAR)||','||CAST(i AS VARCHAR)), 1, 6)) AS BIGINT) / CAST(16777216 AS DOUBLE) - CAST(0.5 AS DOUBLE))
         * CAST(embedding[i] AS DOUBLE))) > 0
       THEN (CAST(1 AS BIGINT) << j) ELSE 0 END for j in range(0, 4)]) AS BIGINT)"""

  /** DuckDB rendering of [[bucketRefBits]] — the 16 continuation
    * hyperplanes (j in 4..19), bit (j−4) each: the same md5-derived
    * plane formula as [[bucketSqlDuck]], so the guard's refinement key
    * is engine-replayable (q261 is the parity gate). */
  private val refSqlDuck =
    """CAST(list_sum([CASE WHEN list_sum(list_transform(range(1, 65), i ->
         (CAST(concat('0x', substr(md5(CAST(j AS VARCHAR)||','||CAST(i AS VARCHAR)), 1, 6)) AS BIGINT) / CAST(16777216 AS DOUBLE) - CAST(0.5 AS DOUBLE))
         * CAST(embedding[i] AS DOUBLE))) > 0
       THEN (CAST(1 AS BIGINT) << (j - 4)) ELSE 0 END for j in range(4, 20)]) AS BIGINT)"""

  /** DuckDB rendering of BoundedPair.depthExpr's integer CASE ladder. */
  private def depthSqlDuck(bn: String, budget: Long): String =
    (1 to graft.ops.BoundedPair.MaxBits)
      .foldLeft(s"CASE WHEN $bn <= $budget THEN 0") { case (acc, e) =>
        acc + s" WHEN $bn <= ${budget << e} THEN $e"
      } + s" ELSE ${graft.ops.BoundedPair.MaxBits} END"

  private val dotDuck =
    "list_sum(list_transform(range(1, len(%A)+1), i -> CAST(%A[i] AS DOUBLE) * CAST(%B[i] AS DOUBLE)))"

  private def dDot(a: String, b: String): String =
    dotDuck.replace("%A", a).replace("%B", b)

  private def dCos(a: String, b: String): String =
    s"${dDot(a, b)} / (sqrt(${dDot(a, a)}) * sqrt(${dDot(b, b)}))"

  /** One Lloyd's round, DuckDB rendering — kept in lockstep with
    * [[graft.ops.KMeans]]: centroid = exact rational (S, c); distance
    * ranks by Σ(c·x_j − S_j)² / c² (ONE double division of exact
    * integers, ≡ the Spark side's c²·x·x − 2c·x·S + S·S polynomial);
    * ties break on the lower cid; an empty cluster keeps its previous
    * state via the LEFT JOIN + coalesce. */
  private def kmAssign(a: String, sIn: String, v: String = "v",
                       dim: Int = 64): String =
    s"""$a AS (SELECT vec_id, cid FROM (
            SELECT v.vec_id, s.cid,
              row_number() OVER (PARTITION BY v.vec_id ORDER BY
                CAST(list_sum(list_transform(range(1, ${dim + 1}), i ->
                  (s.c * v.q8[i] - s.s[i]) * (s.c * v.q8[i] - s.s[i]))) AS DOUBLE)
                / CAST(s.c * s.c AS DOUBLE) ASC, s.cid ASC) rn
            FROM $v v CROSS JOIN $sIn s) WHERE rn = 1)"""

  private def kmUpdate(n: String, a: String, sIn: String, sOut: String,
                       v: String = "v", dim: Int = 64): String =
    s"""u$n AS (SELECT a.cid, t.i, CAST(sum(v.q8[t.i]) AS BIGINT) sm, count(*) c
            FROM $a a JOIN $v v USING (vec_id), unnest(range(1, ${dim + 1})) t(i)
            GROUP BY a.cid, t.i),
          w$n AS (SELECT cid, list(sm ORDER BY i) s, min(c) c FROM u$n GROUP BY cid),
          $sOut AS (SELECT p.cid, coalesce(w.s, p.s) s, coalesce(w.c, p.c) c
            FROM $sIn p LEFT JOIN w$n w ON p.cid = w.cid)"""

  /** Seeds + `iters` unrolled training rounds over table `v` (columns
    * vec_id, q8 of length `dim`); all CTE names carry `sfx`. Leaves
    * `s$iters$sfx` (final centroid state) bound. `kSql` is the seed
    * count as a SQL expression — the default 8 pins the historical
    * oracles; the guarded q100/q251 oracles pass KMeans.kForBudget
    * rendered data-driven so k tracks the corpus like the Spark side. */
  private def kmRounds(iters: Int, v: String = "v", dim: Int = 64,
                       sfx: String = "", kSql: String = "8"): String = {
    val seed =
      s"""s0$sfx AS (SELECT vec_id cid, q8 s, CAST(1 AS BIGINT) c FROM $v
                 WHERE vec_id BETWEEN 1 AND ($kSql))"""
    val rounds = (0 until iters).map(n =>
      s"${kmAssign(s"a$n$sfx", s"s$n$sfx", v, dim)},\n          " +
        kmUpdate(s"$sfx$n", s"a$n$sfx", s"s$n$sfx", s"s${n + 1}$sfx", v, dim))
      .mkString(",\n          ")
    s"$seed,\n          $rounds"
  }

  /** Null-filter + int8 quantization: the `e`/`mq`/`v` prefix shared
    * by every trained-codebook oracle (the q48/q49 quantization). */
  private val quantCtes: String =
    s"""e AS (SELECT vec_id, embedding FROM embeddings
                   WHERE len(list_filter(embedding, x -> x IS NULL)) = 0),
          mq AS (SELECT vec_id, embedding,
                   list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) maxabs
                 FROM e),
          v AS (SELECT vec_id,
                  CASE WHEN maxabs > 0
                       THEN list_transform(embedding, x -> greatest(CAST(-127 AS BIGINT),
                              least(CAST(127 AS BIGINT),
                                CAST(floor(CAST(x AS DOUBLE) * 127 / maxabs) AS BIGINT))))
                       ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END q8
                FROM mq)"""

  /** Quantization + seeding + `iters` unrolled training rounds: the
    * WITH-body prefix shared by the q71/q72 oracles. Leaves `v`
    * (quantized vectors) and `s$iters` (final centroid state) bound. */
  private def kmeansCtes(iters: Int, kSql: String = "8"): String =
    s"$quantCtes,\n          ${kmRounds(iters, kSql = kSql)}"

  /** KMeans.kForBudget(n, 256) rendered data-driven over `v` — the
    * guarded q100/q251 oracles' seed count, in lockstep with the Spark
    * side's `kForBudget(qemb.count())`. */
  private val kForBudgetSql =
    "SELECT least(64, greatest(8, (count(*) + 255) // 256)) FROM v"

  /** DuckDB rendering of [[q8RefBits]] — the 16 JL-sign integer
    * hyperplanes over the int8 vector (q123's md5-parity ±1 matrix),
    * bit j set iff the exact integer dot is positive; the guard's
    * cell-refinement key is engine-replayable. */
  private val refBitsQ8Duck =
    """CAST(list_sum(list_transform(range(0, 16), j ->
         CASE WHEN list_sum(list_transform(range(1, 65), i -> q8[i] *
           (CASE WHEN CAST(concat('0x', substr(md5('rp,' || CAST(i-1 AS VARCHAR) || ',' || CAST(j AS VARCHAR)), 1, 1)) AS INT) % 2 = 0
                 THEN 1 ELSE -1 END))) > 0
         THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"""

  /** Trained-PQ oracle (q73): per 16-dim subspace m — slice, train
    * `iters` rounds, final-assign (the per-vector code), and an ADC
    * table dq_m (query-to-centroid distance per cid, the SAME integer
    * polynomial). adist sums the four looked-up table entries in
    * Spark's reduce order. */
  private def pqTrainedOracle(iters: Int): String = {
    val subs = (0 until 4).map { m =>
      s"""v$m AS (SELECT vec_id, q8[${m * 16 + 1}:${m * 16 + 16}] q8 FROM v),
          ${kmRounds(iters, s"v$m", 16, s"_$m")},
          ${kmAssign(s"afin_$m", s"s$iters" + s"_$m", s"v$m", 16)},
          dq_$m AS (SELECT s.cid,
                  CAST(list_sum(list_transform(range(1, 17), i ->
                    (s.c * q.q8[i] - s.s[i]) * (s.c * q.q8[i] - s.s[i]))) AS DOUBLE)
                  / CAST(s.c * s.c AS DOUBLE) d
                FROM (SELECT q8 FROM v$m WHERE vec_id = 0) q
                CROSS JOIN s$iters${s"_$m"} s)"""
    }.mkString(",\n          ")
    s"""WITH $quantCtes,
          $subs
         SELECT a0.vec_id,
                ((dq0.d + dq1.d) + dq2.d) + dq3.d AS adist
         FROM afin_0 a0
         JOIN afin_1 a1 USING (vec_id)
         JOIN afin_2 a2 USING (vec_id)
         JOIN afin_3 a3 USING (vec_id)
         JOIN dq_0 dq0 ON dq0.cid = a0.cid
         JOIN dq_1 dq1 ON dq1.cid = a1.cid
         JOIN dq_2 dq2 ON dq2.cid = a2.cid
         JOIN dq_3 dq3 ON dq3.cid = a3.cid
         WHERE a0.vec_id <> 0
         ORDER BY adist ASC, a0.vec_id LIMIT 10"""
  }

  /** The four q73 subspace trainings + per-code exact SSE rollups —
    * q132's replay. */
  private def pqDistortionOracle(iters: Int): String = {
    val subs = (0 until 4).map { m =>
      s"""v$m AS (SELECT vec_id, q8[${m * 16 + 1}:${m * 16 + 16}] q8 FROM v),
          ${kmRounds(iters, s"v$m", 16, s"_$m")},
          ${kmAssign(s"afin_$m", s"s$iters" + s"_$m", s"v$m", 16)},
          r_$m AS (
            SELECT CAST($m AS BIGINT) m, a.cid, count(*) n, min(s.c) c,
                   sum(CAST(list_sum(list_transform(range(1, 17), i ->
                     (s.c * v.q8[i] - s.s[i]) * (s.c * v.q8[i] - s.s[i]))) AS BIGINT)) sse
            FROM afin_$m a JOIN v$m v USING (vec_id)
            JOIN s$iters${s"_$m"} s ON a.cid = s.cid
            GROUP BY a.cid)"""
    }.mkString(",\n          ")
    s"""WITH $quantCtes,
          $subs
         SELECT m, cid, CAST(n AS BIGINT) n, CAST(c AS BIGINT) c,
                CAST(sse AS BIGINT) sse_num
         FROM (SELECT * FROM r_0 UNION ALL SELECT * FROM r_1
               UNION ALL SELECT * FROM r_2 UNION ALL SELECT * FROM r_3)
         ORDER BY m, cid"""
  }

  /** 2 unrolled training rounds + the final assignment pass — the
    * exact replay of q71's KMeans.train(maxIter = 2) + assign. */
  private def kmeansOracle(iters: Int): String =
    s"""WITH ${kmeansCtes(iters)},
          ${kmAssign("afin", s"s$iters")}
         SELECT vec_id, cid FROM afin ORDER BY vec_id"""

  /** Trained IVF-PQ oracle (q74): coarse training + lists/probes (the
    * q72 CTEs) composed with the four subspace trainings + ADC tables
    * (the q73 CTEs); the probe join gates which rows are ranked. */
  private def ivfPqTrainedOracle(iters: Int): String = {
    val subs = (0 until 4).map { m =>
      s"""v$m AS (SELECT vec_id, q8[${m * 16 + 1}:${m * 16 + 16}] q8 FROM v),
          ${kmRounds(iters, s"v$m", 16, s"_$m")},
          ${kmAssign(s"afin_$m", s"s$iters" + s"_$m", s"v$m", 16)},
          dq_$m AS (SELECT s.cid,
                  CAST(list_sum(list_transform(range(1, 17), i ->
                    (s.c * q.q8[i] - s.s[i]) * (s.c * q.q8[i] - s.s[i]))) AS DOUBLE)
                  / CAST(s.c * s.c AS DOUBLE) d
                FROM (SELECT q8 FROM v$m WHERE vec_id = 0) q
                CROSS JOIN s$iters${s"_$m"} s)"""
    }.mkString(",\n          ")
    s"""WITH $quantCtes,
          ${kmRounds(iters)},
          ad AS (SELECT v.vec_id, s.cid,
                   CAST(list_sum(list_transform(range(1, 65), i ->
                     (s.c * v.q8[i] - s.s[i]) * (s.c * v.q8[i] - s.s[i]))) AS DOUBLE)
                   / CAST(s.c * s.c AS DOUBLE) d
                 FROM v CROSS JOIN s$iters s),
          r AS (SELECT vec_id, cid,
                  row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) rn
                FROM ad),
          lists AS (SELECT vec_id, cid FROM r WHERE rn = 1),
          probes AS (SELECT cid FROM r WHERE vec_id = 0 AND rn <= 2),
          $subs
         SELECT a0.vec_id,
                ((dq0.d + dq1.d) + dq2.d) + dq3.d AS adist
         FROM afin_0 a0
         JOIN afin_1 a1 USING (vec_id)
         JOIN afin_2 a2 USING (vec_id)
         JOIN afin_3 a3 USING (vec_id)
         JOIN dq_0 dq0 ON dq0.cid = a0.cid
         JOIN dq_1 dq1 ON dq1.cid = a1.cid
         JOIN dq_2 dq2 ON dq2.cid = a2.cid
         JOIN dq_3 dq3 ON dq3.cid = a3.cid
         JOIN lists l ON l.vec_id = a0.vec_id
         JOIN probes p ON p.cid = l.cid
         WHERE a0.vec_id <> 0
         ORDER BY adist ASC, a0.vec_id LIMIT 10"""
  }

  /** Trained-IVF search oracle: the kmeans CTEs, then coarse-assign
    * every vector (rn = 1), probe the query's 2 nearest trained
    * centroids (rn <= 2 for vec_id 0) and rank survivors by the exact
    * integer dot — the q72 replay. */
  private def ivfTrainedOracle(iters: Int): String =
    s"""WITH ${kmeansCtes(iters)},
          ad AS (SELECT v.vec_id, s.cid,
                   CAST(list_sum(list_transform(range(1, 65), i ->
                     (s.c * v.q8[i] - s.s[i]) * (s.c * v.q8[i] - s.s[i]))) AS DOUBLE)
                   / CAST(s.c * s.c AS DOUBLE) d
                 FROM v CROSS JOIN s$iters s),
          r AS (SELECT vec_id, cid,
                  row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) rn
                FROM ad),
          lists AS (SELECT vec_id, cid FROM r WHERE rn = 1),
          probes AS (SELECT cid FROM r WHERE vec_id = 0 AND rn <= 2),
          q AS (SELECT q8 qq FROM v WHERE vec_id = 0)
         SELECT l.vec_id,
                CAST(list_sum(list_transform(range(1, 65), i -> v.q8[i] * q.qq[i])) AS BIGINT) AS qsim
         FROM lists l JOIN v USING (vec_id) JOIN probes p ON l.cid = p.cid, q
         WHERE l.vec_id <> 0
         ORDER BY qsim DESC, l.vec_id LIMIT 10"""

  /** The q72 trained-IVF oracle generalized to the q222 nprobe
    * ladder: same quantize/train CTEs and centroid-distance ranking;
    * per nprobe level, the probed lists' row count and the @10
    * intersection with the exact integer-dot ranking. */
  private def nprobeLadderOracle(iters: Int): String =
    s"""WITH ${kmeansCtes(iters)},
          ad AS (SELECT v.vec_id, s.cid,
                   CAST(list_sum(list_transform(range(1, 65), i ->
                     (s.c * v.q8[i] - s.s[i]) * (s.c * v.q8[i] - s.s[i]))) AS DOUBLE)
                   / CAST(s.c * s.c AS DOUBLE) d
                 FROM v CROSS JOIN s$iters s),
          r AS (SELECT vec_id, cid,
                  row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) rn
                FROM ad),
          lists AS (SELECT vec_id, cid FROM r WHERE rn = 1 AND vec_id <> 0),
          pr AS (SELECT cid, rn pk FROM r WHERE vec_id = 0),
          q AS (SELECT q8 qq FROM v WHERE vec_id = 0),
          scored AS (SELECT l.vec_id, l.cid,
                       CAST(list_sum(list_transform(range(1, 65), i ->
                         v.q8[i] * q.qq[i])) AS BIGINT) qsim
                     FROM lists l JOIN v USING (vec_id), q),
          exact AS (SELECT vec_id FROM scored ORDER BY qsim DESC, vec_id LIMIT 10),
          np AS (SELECT CAST(unnest([1, 2, 4, 8]) AS BIGINT) nprobe),
          arm AS (SELECT np.nprobe, sc.vec_id,
                    row_number() OVER (PARTITION BY np.nprobe
                      ORDER BY sc.qsim DESC, sc.vec_id) rn
                  FROM np JOIN pr ON pr.pk <= np.nprobe
                       JOIN scored sc ON sc.cid = pr.cid),
          hits AS (SELECT a.nprobe, count(*) h
                   FROM arm a JOIN exact e ON a.vec_id = e.vec_id
                   WHERE a.rn <= 10 GROUP BY 1),
          sizes AS (SELECT cid, count(*) n FROM lists GROUP BY 1),
          scanned AS (SELECT np.nprobe,
                        CAST(coalesce(sum(sz.n), 0) AS BIGINT) n_scanned
                      FROM np JOIN pr ON pr.pk <= np.nprobe
                           LEFT JOIN sizes sz ON sz.cid = pr.cid
                      GROUP BY 1),
          tot AS (SELECT count(*) nc FROM lists)
         SELECT s.nprobe, s.n_scanned,
                s.n_scanned * 1000000 // t.nc AS scan_ppm,
                CAST(coalesce(h.h, 0) AS BIGINT) AS hits10
         FROM scanned s CROSS JOIN tot t LEFT JOIN hits h ON s.nprobe = h.nprobe
         ORDER BY s.nprobe"""

  /** Product-quantization encode + ADC ranking (the q69 pipeline),
    * parameterized by the centroid predicate so [[graft.PqLookupSpec]]
    * can drive it with a NON-contiguous cid set.
    *
    * The codebook lookup is keyed BY cid, never by array position: a
    * positional `element_at(cb, code)` silently reads the wrong
    * centroid the moment the cid range has a hole — and because both
    * engines would shift their indexing identically, the oracle
    * parity harness cannot catch that regression. Only the
    * dropped-centroid spec can, which is why the helper exists. */
  private[graft] def pqAdc(emb: DataFrame, centroidPred: Column): DataFrame = {
    val cbs = emb.filter(centroidPred)
      .agg(sort_array(collect_list(struct(
        col("vec_id").cast(org.apache.spark.sql.types.LongType).as("cid"),
        expr("transform(embedding, x -> cast(x as double))").as("cv")))).as("cb"))
    // native PQ encode (graft.functions.PqCodes): one codegen'd call
    // per row replaces the 4× array_min(transform(aggregate(zip_with)))
    // HOF tower — same sequential fold, same (d2, cid) tie order,
    // bit-identical codes (PqCodesSpec pins parity with the HOF form)
    val coded = emb.crossJoin(broadcast(cbs))
      .select(col("vec_id"), col("cb"),
        graft.Functions.pq_codes(col("embedding"), col("cb"), 16).as("codes"))
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    // native ADC distance (graft.functions.PqAdc): the cid-keyed
    // codebook lookup + per-subspace squared L2 + subspace-order sum
    // in one codegen'd call — replaces the interpreted
    // aggregate(array(aggregate(zip_with(...))×4)) tower with
    // bit-identical sequential-fold arithmetic and null poisoning
    // (PqAdcSpec pins parity with the HOF form)
    coded.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        graft.Functions.pq_adc(col("qv"), col("cb"), col("codes"), 16, 4)
          .as("adist"))
      .orderBy(col("adist").asc, col("vec_id"))
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact top-20 cosine vs vec_id 0 (ties broken by vec_id).
    "q16_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), cosine("embedding", "qv").as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(20)
    }),

    // Bucketed ANN: only the query's hyperplane bucket is searched.
    "q22_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), bucketCol.as("bucket"))
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"), col("bucket").as("qbucket"))
      emb.filter(col("vec_id") =!= 0)
        .join(broadcast(q), col("bucket") === col("qbucket"))
        .select(col("vec_id"), cosine("embedding", "qv").as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    }),

    // IVF-style ANN — the codebook alternative to q22's hyperplane
    // LSH: a deterministic coarse quantizer (the vectors with ids
    // 1..8 as centroids — a sampled codebook, broadcast like any IVF
    // coarse index), every vector assigned to its nearest centroid's
    // inverted list (argmax dot, ties to the smallest centroid id),
    // and the query probing only its nprobe=2 nearest lists.
    //
    // Assignment is MAP-ONLY: the codebook collapses to ONE array row
    // (collect_list of K centroids), rides a broadcast to every
    // corpus partition, and `centroid_topk` computes the per-row
    // argmax inline — no n×K expansion, no window (a window keyed on
    // a per-row-unique id is a full corpus shuffle). At scale K grows
    // ~√n, the list id becomes a partition column, and a probe
    // touches nprobe/K of the corpus; nothing here shuffles the
    // corpus at any n.
    "q40_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cb = emb.filter(col("vec_id").between(1, 8))
        .agg(sort_array(collect_list(struct(
          col("vec_id").cast("long").as("cid"),
          col("embedding").as("cv")))).as("codebook"))
      val withCb = emb.crossJoin(broadcast(cb))
      val lists = withCb.select(col("vec_id"), col("embedding"),
        graft.Functions.centroid_topk(col("embedding"), col("codebook"), 1)
          .getItem(0).as("cid"))
      val probes = withCb.filter(col("vec_id") === 0)
        .select(explode(graft.Functions.centroid_topk(
          col("embedding"), col("codebook"), 2)).as("cid"))
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      lists.join(broadcast(probes), "cid")
        .filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), cosine("embedding", "qv").as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    }),

    // Multiprobe ANN: q22's bucketed search plus the 1-bit probe
    // neighborhood — the recall-recovery path for higher nBits (a
    // vector whose sketch differs from the query's in exactly one
    // plane is still scanned). The probe set is (nBits+1) rows riding
    // a broadcast; the corpus is never shuffled, and at scale the
    // exploded probe list partition-prunes to (nBits+1)/2^nBits of it.
    "q44_multiprobe" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), bucketCol.as("bucket"))
      val probes = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"),
          explode(multiprobe(col("bucket"), 4)).as("bucket"))
      emb.filter(col("vec_id") =!= 0)
        .join(broadcast(probes), Seq("bucket"))
        .select(col("vec_id"), cosine("embedding", "qv").as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    }),

    // Symmetric int8 quantization — the embedding storage/compression
    // step (4× smaller vectors for the ANN index). Map-only native
    // kernel (vec_quant8); output posexploded to scalar (vec_id, i, q)
    // rows because the driver's comparator hashes scalar cells only.
    // floor() semantics make the mapping integer-exact across engines.
    "q48_quant" -> ((s, d) => {
      Tables.embeddings(s, d)
        .filter(col("vec_id") < 200)
        // NULL-element vectors are excluded EXPLICITLY on both sides:
        // vec_quant8 poisons them to NULL (posexplode then drops the
        // row) while DuckDB's list_transform keeps per-element NULLs —
        // the shared filter makes the two engines agree on any corpus
        .filter(!graft.Functions.any_null(col("embedding")))
        .select(col("vec_id"),
          posexplode(graft.Functions.vec_quant8(col("embedding"))))
        .select(col("vec_id"),
          col("pos").cast(org.apache.spark.sql.types.LongType).as("i"),
          col("col").as("q"))
        .orderBy("vec_id", "i")
    }),

    // Quantized ANN — search over the COMPRESSED vectors: exact
    // integer dot products of the int8 codes rank the corpus against
    // the quantized query (broadcast 1-row). The end-to-end
    // compression→search path of a 100 TB embedding store: 4× less
    // scan I/O, integer SIMD-friendly scoring, zero float surface so
    // the oracle hashes exactly. Barrier: the quantized table feeds
    // both the query lookup and the scan.
    "q49_qann" -> ((s, d) => {
      val qemb = graft.ops.Barrier(Tables.embeddings(s, d)
        .filter(!graft.Functions.any_null(col("embedding"))) // see q48 note
        .select(col("vec_id"), graft.Functions.vec_quant8(col("embedding")).as("q8")))
      val q = qemb.filter(col("vec_id") === 0).select(col("q8").as("qq"))
      qemb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          graft.Functions.vec_dot_int(col("q8"), col("qq")).as("qsim"))
        .orderBy(col("qsim").desc, col("vec_id"))
        .limit(10)
    }),

    // Random signed projection — the Johnson-Lindenstrauss
    // dimensionality-reduction operator (Achlioptas ±1 variant, JCSS
    // 2003): 64-d int8 codes → 16-d integer projections p_j =
    // Σ_i sign(i,j)·q_i, where the ±1 signs derive from md5("rp,i,j")
    // parity — deterministic, re-derivable in the oracle, the same
    // discipline as the LSH planes and q84's weights. The sign matrix
    // rides the plan as a 16×64 literal (a production 1024×64 matrix
    // is still KBs — always a broadcast, never a join); the whole
    // operator is map-only over the quantized scan, and every output
    // is an exact integer. Output posexploded to scalar (vec_id, j,
    // p) rows for the driver's comparator.
    "q123_rproj" -> ((s, d) => {
      Tables.embeddings(s, d)
        .filter(col("vec_id") < 200)
        .filter(!graft.Functions.any_null(col("embedding"))) // see q48 note
        .select(col("vec_id"), graft.Functions.vec_quant8(col("embedding")).as("q8"))
        .select(col("vec_id"), posexplode(rpProject(col("q8"))))
        .select(col("vec_id"), col("pos").cast("long").as("j"), col("col").as("p"))
        .orderBy("vec_id", "j")
    }),

    // ANN in the projected space — why q123 exists: score 16 longs
    // per vector instead of 64, another 4× I/O/compute cut on top of
    // quantization (JL keeps inner products approximately, the
    // documented trade-off; q49 remains the full-dimension exact-code
    // path and q77's recall-audit shape measures the loss). Same
    // plan discipline as q49: the projected table materializes ONCE
    // (Barrier) and feeds both the query lookup and the scan, the
    // 1-row projected query broadcasts, ranking is native integer
    // vec_dot_int + TakeOrderedAndProject — join-free, shuffle-free.
    "q124_rproj_ann" -> ((s, d) => {
      val pv = graft.ops.Barrier(Tables.embeddings(s, d)
        .filter(!graft.Functions.any_null(col("embedding")))
        .select(col("vec_id"), graft.Functions.vec_quant8(col("embedding")).as("q8"))
        .select(col("vec_id"), rpProject(col("q8")).as("p16")))
      val q = pv.filter(col("vec_id") === 0).select(col("p16").as("qp"))
      pv.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          graft.Functions.vec_dot_int(col("p16"), col("qp")).as("pscore"))
        .orderBy(col("pscore").desc, col("vec_id"))
        .limit(10)
    }),

    // Clustering-quality audit — the inertia (within-cluster SSE)
    // table that accompanies every trained codebook: per cluster, its
    // population and Σ‖x − μ‖² under the q71 model. Exact-integer
    // surface: with rational centroids μ = s/c the per-point distance
    // numerator c²·(x·x) − 2c·(x·s) + (s·s) is the assignExpr
    // polynomial (already Long-bounded with the loud overflow guard),
    // so the emitted (n, c, sse_num) triple is integral and inertia =
    // sse_num/c² follows driver-side. Scale shape: assignment is
    // map-only (model rides the plan as literals), the per-point
    // numerator joins the k-row model BROADCAST, and the rollup is a
    // k-sized partial-agg'd groupBy — the whole audit is one pass.
    "q130_inertia" -> ((s, d) => {
      val qemb = graft.ops.Barrier(Tables.embeddings(s, d)
        .filter(!graft.Functions.any_null(col("embedding"))) // see q48 note
        .select(col("vec_id"), graft.Functions.vec_quant8(col("embedding")).as("q8")))
      // corpus-scaled codebook (KMeans.kForBudget): 8 cells at every
      // oracle/bench sf, growing past sf0.1 so per-cell SSE state and
      // the q100-family cell populations stay budget-bounded
      val seeds = graft.ops.KMeans.seedsFromIds(qemb, "vec_id", "q8",
        (1L to graft.ops.KMeans.kForBudget(qemb.count()).toLong))
      val model = graft.ops.KMeans.train(qemb, "vec_id", "q8", 64, seeds, maxIter = 2)
      import s.implicits._
      val modelDf = model.map(st =>
        (st.cid, st.count, st.sums.map(x => x * x).sum, st.sums.toSeq))
        .toDF("cid", "c", "ss", "sums")
      qemb
        .withColumn("cid", graft.ops.KMeans.assignExpr(col("q8"), model))
        .join(broadcast(modelDf), "cid")
        .select(col("cid"), col("c"),
          (col("c") * col("c") * graft.Functions.vec_dot_int(col("q8"), col("q8"))
            - lit(2L) * col("c") * graft.Functions.vec_dot_int(col("q8"), col("sums"))
            + col("ss")).as("num"))
        .groupBy("cid")
        .agg(count(lit(1)).as("n"), min(col("c")).as("c"),
          sum(col("num")).as("sse_num"))
        .orderBy("cid")
    }),

    // PQ distortion audit — q130's inertia discipline applied to the
    // product-quantizer: per subspace and per code, the population
    // and exact-integer SSE numerator of the assigned 16-d slices
    // under the trained sub-codebooks. Σ sse_num/c² over subspaces is
    // the PQ reconstruction error — THE number that decides code
    // width (4×16-d at 8 codes here; a production 64×8-d at 256
    // codes trades table size for distortion, same audit). One scan
    // per subspace (all four share the Barrier-materialized corpus),
    // map-only assignment, broadcast k-row models, 4·k-row output.
    "q132_pq_distortion" -> ((s, d) => {
      import graft.ops.KMeans
      val qemb = graft.ops.Barrier(Tables.embeddings(s, d)
        .filter(!graft.Functions.any_null(col("embedding"))) // see q48 note
        .select(col("vec_id"), graft.Functions.vec_quant8(col("embedding")).as("q8")))
      val fullSeeds = KMeans.seedsFromIds(qemb, "vec_id", "q8", (1L to 8L))
      val models = KMeans.trainSubspaces(qemb, "q8", 16,
        KMeans.sliceSeeds(fullSeeds, 16, 4), maxIter = 2)
      import s.implicits._
      val parts = models.zipWithIndex.map { case (model, m) =>
        val modelDf = model.map(st =>
          (st.cid, st.count, st.sums.map(x => x * x).sum, st.sums.toSeq))
          .toDF("cid", "c", "ss", "sums")
        qemb.select(col("vec_id"), expr(s"slice(q8, ${m * 16 + 1}, 16)").as("qs"))
          .withColumn("cid", KMeans.assignExpr(col("qs"), model))
          .join(broadcast(modelDf), "cid")
          .select(lit(m.toLong).as("m"), col("cid"), col("c"),
            (col("c") * col("c") * graft.Functions.vec_dot_int(col("qs"), col("qs"))
              - lit(2L) * col("c") * graft.Functions.vec_dot_int(col("qs"), col("sums"))
              + col("ss")).as("num"))
      }
      parts.reduce(_ union _)
        .groupBy("m", "cid")
        .agg(count(lit(1)).as("n"), min(col("c")).as("c"),
          sum(col("num")).as("sse_num"))
        .orderBy("m", "cid")
    }),

    // Recall audit for the projected space — the q77 discipline
    // applied to q124: JL projection trades exactness for 4× less
    // scored payload, and this query MEASURES that trade (recall@10
    // of projected-space ranking vs the full-dimension int8 ranking)
    // instead of asserting it. One Barrier materializes codes +
    // projections for all three consumers; both arms are broadcast-
    // query TakeOrderedAndProject top-10s; the intersection is a
    // 10-row left-semi count. At scale this runs over a query SAMPLE
    // — the audit cost is queries × corpus-scan, same as serving.
    "q125_rproj_recall" -> ((s, d) => {
      val base = graft.ops.Barrier(Tables.embeddings(s, d)
        .filter(!graft.Functions.any_null(col("embedding")))
        .select(col("vec_id"), graft.Functions.vec_quant8(col("embedding")).as("q8"))
        .withColumn("p16", rpProject(col("q8"))))
      val q = base.filter(col("vec_id") === 0)
        .select(col("q8").as("qq"), col("p16").as("qp"))
      val exact = base.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id"), graft.Functions.vec_dot_int(col("q8"), col("qq")).as("s"))
        .orderBy(col("s").desc, col("vec_id")).limit(10)
      val proj = base.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id"), graft.Functions.vec_dot_int(col("p16"), col("qp")).as("s"))
        .orderBy(col("s").desc, col("vec_id")).limit(10)
      exact.join(proj, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("hits"), lit(10L).as("k"))
    }),

    // Metadata-filtered ANN — the "filtered vector search" problem:
    // rank only vectors whose document passes a metadata predicate
    // (lang = 'de'). PRE-filtering: the predicate pushes into the
    // documents scan, the surviving keys broadcast as a semi-join
    // against the embedding scan, and scoring touches only survivors
    // — right whenever the filter is selective (post-filtering an ANN
    // bucket instead wins when it isn't; both compose with q22/q44's
    // buckets). The corpus is never shuffled: filter keys ride the
    // broadcast, ranking is TakeOrderedAndProject.
    "q58_fann" -> ((s, d) => {
      val keep = Tables.documents(s, d)
        .filter(col("lang") === "de")
        .select(col("doc_id").as("vec_id"))
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      emb.join(broadcast(keep), Seq("vec_id"), "left_semi")
        .filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), cosine("embedding", "qv").as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    }),

    // Product quantization + ADC search — the third leg of the
    // compression stack (hyperplane LSH q22, IVF q40, int8 q48/q49):
    // the 64-dim vector splits into M=4 16-dim subvectors, each
    // encoded as its nearest centroid id from a per-subvector
    // codebook (sampled centroids, like q40) — a 4-small-int code per
    // vector (64× smaller than float32). Search is asymmetric
    // distance computation: d(q, x) ≈ Σ_m ‖q_m − c_{m,code_m(x)}‖².
    // Encoding is MAP-ONLY (one broadcast codebook row, per-row
    // argmin inline via array_min over (d2, cid) structs — exact
    // tie-break, no n×K expansion); ranking is TakeOrderedAndProject.
    // Every L2 is the same sequential fold in both engines, so the
    // assignment AND the ADC doubles hash-match exactly. At scale M
    // and the per-subvector K grow (8-16 subvectors × 256 centroids),
    // the codebook stays a broadcast, and the scan reads codes (bytes)
    // instead of vectors — with q40's IVF lists on top for the
    // coarse cut.
    "q69_pqann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .filter(!graft.Functions.any_null(col("embedding"))) // see q48 note
      pqAdc(emb, col("vec_id").between(1, 8))
    }),

    // IVF-PQ — the production ANN architecture, composed from the two
    // verified pieces: q40's IVF coarse quantizer cuts the corpus to
    // the query's nprobe=2 inverted lists, and q69's PQ codes rank the
    // survivors by asymmetric distance. ONE broadcast row carries both
    // codebooks (same sampled centroids); encoding stays map-only
    // (cid + 4 PQ codes per vector in one pass); the probe rides a
    // broadcast; ranking is TakeOrderedAndProject. At 100 TB the list
    // id is a partition column (scan prunes to nprobe/K of the
    // corpus), the PQ codes are the only columns read, and full
    // vectors are never touched at query time.
    "q70_ivfpq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .filter(!graft.Functions.any_null(col("embedding"))) // see q48 note
      val cbs = emb.filter(col("vec_id").between(1, 8))
        .agg(
          sort_array(collect_list(struct(
            col("vec_id").cast(org.apache.spark.sql.types.LongType).as("cid"),
            col("embedding").as("cv")))).as("cbi"),
          sort_array(collect_list(struct(
            col("vec_id").cast(org.apache.spark.sql.types.LongType).as("cid"),
            expr("transform(embedding, x -> cast(x as double))").as("cv")))).as("cbp"))
      val withCb = emb.crossJoin(broadcast(cbs))
      // native PQ encode — see the q69/pqAdc note (bit-identical to
      // the array_min(transform(...)) HOF tower it replaces)
      val coded = withCb.select(col("vec_id"), col("cbp"),
        graft.Functions.centroid_topk(col("embedding"), col("cbi"), 1)
          .getItem(0).as("cid"),
        graft.Functions.pq_codes(col("embedding"), col("cbp"), 16).as("codes"))
      val probes = withCb.filter(col("vec_id") === 0)
        .select(explode(graft.Functions.centroid_topk(
          col("embedding"), col("cbi"), 2)).as("cid"))
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      // native ADC distance with the cid-keyed codebook lookup — see
      // the q69/pqAdc note (bit-identical to the HOF tower it replaces)
      coded.join(broadcast(probes), "cid")
        .filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          graft.Functions.pq_adc(col("qv"), col("cbp"), col("codes"), 16, 4)
            .as("adist"))
        .orderBy(col("adist").asc, col("vec_id"))
        .limit(10)
    }),

    // Trained k-means codebook (Lloyd's, 2 rounds) over int8-quantized
    // embeddings — the production path that replaces q40/q69/q70's
    // sampled centroids with trained ones. graft.ops.KMeans carries
    // EXACT integer state (element sums + count per centroid), so
    // training is bit-deterministic under any partitioning and the
    // oracle replays it verbatim (2 unrolled assign/update rounds).
    // Per round: one map-only assign (native vec_dot_int against
    // plan-time centroid literals) + one groupBy(cid) with map-side
    // partial aggregation; k·(d+1) longs cross the wire. At 100 TB the
    // train input is a deterministic hash-sample (means need no full
    // pass) and the final assign is the only full-corpus pass.
    "q71_kmeans" -> ((s, d) => {
      // Barrier: the quantized corpus feeds seed collection, every
      // training round, and the final assignment — materialize once
      // instead of re-reading parquet per pass (graft.ops.Barrier)
      val qemb = graft.ops.Barrier(Tables.embeddings(s, d)
        .filter(!graft.Functions.any_null(col("embedding"))) // see q48 note
        .select(col("vec_id"), graft.Functions.vec_quant8(col("embedding")).as("q8")))
      val seeds = graft.ops.KMeans.seedsFromIds(qemb, "vec_id", "q8", (1L to 8L))
      val model = graft.ops.KMeans.train(qemb, "vec_id", "q8", 64, seeds, maxIter = 2)
      graft.ops.KMeans.assign(qemb, "vec_id", "q8", model).orderBy("vec_id")
    }),

    // IVF search over the TRAINED codebook — q71's model gating q49's
    // integer ranking: coarse-assign the corpus to trained centroids
    // (map-only, plan-time literals), probe the query's 2 nearest
    // lists, rank survivors by exact integer dot. Probe selection is
    // DRIVER-side query planning (the query is one vector; its nprobe
    // centroids come from the broadcast-sized model, no job needed).
    // At 100 TB cid is a partition column: the scan prunes to
    // nprobe/k of the corpus and ranking is TakeOrderedAndProject.
    "q72_ivf_trained" -> ((s, d) => {
      import graft.ops.KMeans
      // Barrier: the quantized corpus feeds seed collection, every
      // training round, and the final assignment — materialize once
      // instead of re-reading parquet per pass (graft.ops.Barrier)
      val qemb = graft.ops.Barrier(Tables.embeddings(s, d)
        .filter(!graft.Functions.any_null(col("embedding"))) // see q48 note
        .select(col("vec_id"), graft.Functions.vec_quant8(col("embedding")).as("q8")))
      val seeds = KMeans.seedsFromIds(qemb, "vec_id", "q8", (1L to 8L))
      val model = KMeans.train(qemb, "vec_id", "q8", 64, seeds, maxIter = 2)
      val qVec = qemb.filter(col("vec_id") === 0)
        .select("q8").head().getSeq[Long](0).toArray
      val probes = model.map(st => (KMeans.distanceTo(qVec, st), st.cid))
        .sorted.take(2).map(_._2)
      val q = qemb.filter(col("vec_id") === 0).select(col("q8").as("qq"))
      qemb.select(col("vec_id"), col("q8"),
          KMeans.assignExpr(col("q8"), model).as("cid"))
        .filter(col("cid").isin(probes: _*) && col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          graft.Functions.vec_dot_int(col("q8"), col("qq")).as("qsim"))
        .orderBy(col("qsim").desc, col("vec_id"))
        .limit(10)
    }),

    // Trained product quantization — KMeans per 16-dim subspace (the
    // real PQ training, replacing q69's sampled sub-codebooks) + the
    // classic ADC LOOKUP-TABLE trick: distances from the fixed query
    // subvector to every trained centroid are 4×8 driver-side
    // constants (same exact-integer polynomial as assignment), so the
    // per-row search cost is 4 map-literal lookups + 3 adds — no
    // vector math touches the corpus at query time. Encoding stays
    // map-only (native vec_dot_int against plan-time literals); the
    // ranking is TakeOrderedAndProject. At 100 TB: train each
    // subspace on a hash-sample, store codes as 4 bytes/vector, and
    // the ADC tables rebuild per query from the broadcast-sized model.
    "q73_pq_trained" -> ((s, d) => {
      import graft.ops.KMeans
      // Barrier: the quantized corpus feeds seed collection, every
      // training round, and the final assignment — materialize once
      // instead of re-reading parquet per pass (graft.ops.Barrier)
      val qemb = graft.ops.Barrier(Tables.embeddings(s, d)
        .filter(!graft.Functions.any_null(col("embedding"))) // see q48 note
        .select(col("vec_id"), graft.Functions.vec_quant8(col("embedding")).as("q8")))
      // one seed collect + ONE scan per Lloyd round trains all 4
      // subspaces (exact integers ⇒ bit-identical to separate runs)
      val fullSeeds = KMeans.seedsFromIds(qemb, "vec_id", "q8", (1L to 8L))
      val models = KMeans.trainSubspaces(qemb, "q8", 16,
        KMeans.sliceSeeds(fullSeeds, 16, 4), maxIter = 2).zipWithIndex
        .map { case (mod, m) => m -> mod }
      val qVec = qemb.filter(col("vec_id") === 0)
        .select("q8").head().getSeq[Long](0).toArray
      val dTables = models.map { case (m, model) =>
        val qSub = qVec.slice(m * 16, m * 16 + 16)
        m -> model.map(st => st.cid -> KMeans.distanceTo(qSub, st)).toMap
      }.toMap
      val codeCols = models.map { case (m, model) =>
        KMeans.assignExpr(expr(s"slice(q8, ${m * 16 + 1}, 16)"), model).as(s"c$m")
      }
      val coded = qemb.select((col("vec_id") +: codeCols): _*)
      val adist = (0 until 4)
        .map(m => element_at(typedLit(dTables(m)), col(s"c$m")))
        .reduce(_ + _) // ((d0+d1)+d2)+d3 — the oracle adds in the same order
      coded.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), adist.as("adist"))
        .orderBy(col("adist").asc, col("vec_id"))
        .limit(10)
    }),

    // Trained IVF-PQ — the fully-trained production composition:
    // q71's coarse model prunes the corpus to the query's nprobe=2
    // inverted lists, q73's per-subspace models + ADC lookup tables
    // rank the survivors. EVERY codebook is trained (no sampled
    // centroids anywhere) and the query plan is STILL join-free: one
    // map-only pass emits (coarse cid, 4 PQ codes), the probe filter
    // is an isin literal, ranking is TakeOrderedAndProject. At 100 TB
    // the coarse cid is the partition column (scan prunes to
    // nprobe/k), codes are the only columns read, and the ADC tables
    // rebuild per query from the broadcast-sized models.
    "q74_ivfpq_trained" -> ((s, d) => {
      import graft.ops.KMeans
      // Barrier: the quantized corpus feeds seed collection, every
      // training round, and the final assignment — materialize once
      // instead of re-reading parquet per pass (graft.ops.Barrier)
      val qemb = graft.ops.Barrier(Tables.embeddings(s, d)
        .filter(!graft.Functions.any_null(col("embedding"))) // see q48 note
        .select(col("vec_id"), graft.Functions.vec_quant8(col("embedding")).as("q8")))
      val fullSeeds = KMeans.seedsFromIds(qemb, "vec_id", "q8", (1L to 8L))
      val coarse = KMeans.train(qemb, "vec_id", "q8", 64, fullSeeds, maxIter = 2)
      // all 4 PQ subspaces in one scan per round — see the q73 note
      val models = KMeans.trainSubspaces(qemb, "q8", 16,
        KMeans.sliceSeeds(fullSeeds, 16, 4), maxIter = 2).zipWithIndex
        .map { case (mod, m) => m -> mod }
      val qVec = qemb.filter(col("vec_id") === 0)
        .select("q8").head().getSeq[Long](0).toArray
      val probes = coarse.map(st => (KMeans.distanceTo(qVec, st), st.cid))
        .sorted.take(2).map(_._2)
      val dTables = models.map { case (m, model) =>
        val qSub = qVec.slice(m * 16, m * 16 + 16)
        m -> model.map(st => st.cid -> KMeans.distanceTo(qSub, st)).toMap
      }.toMap
      val codeCols = models.map { case (m, model) =>
        KMeans.assignExpr(expr(s"slice(q8, ${m * 16 + 1}, 16)"), model).as(s"c$m")
      }
      val coded = qemb.select(
        (col("vec_id") +: KMeans.assignExpr(col("q8"), coarse).as("cid") +: codeCols): _*)
      val adist = (0 until 4)
        .map(m => element_at(typedLit(dTables(m)), col(s"c$m")))
        .reduce(_ + _)
      coded.filter(col("cid").isin(probes: _*) && col("vec_id") =!= 0)
        .select(col("vec_id"), adist.as("adist"))
        .orderBy(col("adist").asc, col("vec_id"))
        .limit(10)
    }),

    // kNN classification — the label-consumer of similarity search:
    // majority vote over the query's top-20 cosine neighbors (ties →
    // lower label). The neighbor scan is q16's TakeOrderedAndProject
    // (distributed partial top-k, never a global sort); the vote is a
    // 20-row aggregate. At scale the neighbor set comes from any of
    // the ANN paths (q22/q40/q72/q74) instead of the exact scan.
    "q75_knn" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      val knn = emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label").cast("long").as("label"),
          cosine("embedding", "qv").as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(20)
      knn.groupBy("label").agg(count(lit(1)).as("votes"))
        .orderBy(col("votes").desc, col("label"))
        .limit(1)
    }),

    // Label purity of the TRAINED clusters — the quality audit a real
    // pipeline runs after (re)training a codebook: per (cluster,
    // label) counts under q71's model. Map-only assignment (label
    // rides the same row — no join anywhere) + one k×labels-sized
    // aggregate. Exact integers end-to-end.
    "q76_purity" -> ((s, d) => {
      import graft.ops.KMeans
      val qemb = graft.ops.Barrier(Tables.embeddings(s, d)
        .filter(!graft.Functions.any_null(col("embedding"))) // see q48 note
        .select(col("vec_id"), col("label").cast("long").as("label"),
          graft.Functions.vec_quant8(col("embedding")).as("q8"))) // Barrier: see q71
      val seeds = KMeans.seedsFromIds(qemb, "vec_id", "q8", (1L to 8L))
      val model = KMeans.train(qemb, "vec_id", "q8", 64, seeds, maxIter = 2)
      qemb.select(col("label"), KMeans.assignExpr(col("q8"), model).as("cid"))
        .groupBy("cid", "label")
        .agg(count(lit(1)).as("n"))
        .orderBy("cid", "label")
    }),

    // Embedding-distribution DRIFT monitor — the other post-deploy
    // audit (q76 checks label quality; this checks INPUT shift): the
    // corpus splits into a reference window (even vec_ids) and a new
    // window (odd), both assigned under the same trained codebook,
    // and each cluster's occupancy share is compared across windows.
    // The 1% absolute-share gate runs EXACTLY, q98-style: |n_new·R −
    // n_ref·N|·100 > N·R with operands in DECIMAL(38,0)/HUGEINT (the
    // products pass Long at corpus scale). Shape: one map-only assign
    // pass (plan-time centroid literals), one k-sized aggregate, the
    // totals broadcast as one row — at 100 TB the monitor costs one
    // scan of the new window and the decision is free. A tripped gate
    // is what feeds the q71 retrain / streaming-KMeans swap loop.
    "q111_drift" -> ((s, d) => {
      import graft.ops.KMeans
      val qemb = graft.ops.Barrier(Tables.embeddings(s, d)
        .filter(!graft.Functions.any_null(col("embedding"))) // see q48 note
        .select(col("vec_id"), graft.Functions.vec_quant8(col("embedding")).as("q8")))
      // corpus-scaled codebook (KMeans.kForBudget, q100's dial): drift
      // buckets track cells, so the audit keeps cell-sized resolution
      // as the corpus grows instead of diluting into 8 giant cells
      val seeds = KMeans.seedsFromIds(qemb, "vec_id", "q8",
        (1L to KMeans.kForBudget(qemb.count()).toLong))
      val model = KMeans.train(qemb, "vec_id", "q8", 64, seeds, maxIter = 2)
      val counts = KMeans.assign(qemb, "vec_id", "q8", model)
        .groupBy("cid").agg(
          sum(when(pmod(col("vec_id"), lit(2)) === 0, 1L).otherwise(0L)).as("n_ref"),
          sum(when(pmod(col("vec_id"), lit(2)) === 1, 1L).otherwise(0L)).as("n_new"))
      val tot = counts.agg(sum(col("n_ref")).as("tr"), sum(col("n_new")).as("tn"))
      counts.crossJoin(broadcast(tot))
        .select(col("cid"), col("n_ref"), col("n_new"),
          (expr("(n_new * 1000000) div tn") - expr("(n_ref * 1000000) div tr"))
            .as("shift_ppm"),
          expr("abs(cast(n_new as decimal(38,0)) * tr " +
            "- cast(n_ref as decimal(38,0)) * tn) * 100 " +
            "> cast(tn as decimal(38,0)) * tr").as("is_drift"))
        .orderBy("cid")
    }),

    // IVF nprobe ladder — the TUNING decision behind q72/q74's fixed
    // nprobe=2, measured instead of assumed: per candidate probe
    // count (1/2/4/8 of the k=8 trained lists), the fraction of the
    // corpus the probe actually scans vs the recall@10 it buys
    // against the exact integer-dot ranking — the cost/recall curve
    // an operator reads before pinning nprobe in production (q216 is
    // this ladder for the dedup cosine threshold). Shapes: the
    // trained coarse model is q71's; assignment + query similarity
    // ride ONE barrier'd corpus pass; each ladder arm is a pruned
    // filter + TakeOrderedAndProject over that frame (at 100 TB cid
    // is the partition column, so each arm prunes at listing time);
    // scan counts come from the k-row list-size rollup joined to a
    // 15-row broadcast (nprobe, cid) probe plan — never a re-scan.
    "q222_nprobe_ladder" -> ((s, d) => {
      import graft.ops.KMeans
      import s.implicits._
      // Barrier: the quantized corpus feeds seed collection, every
      // training round, and the assignment pass (graft.ops.Barrier)
      val qemb = graft.ops.Barrier(Tables.embeddings(s, d)
        .filter(!graft.Functions.any_null(col("embedding"))) // see q48 note
        .select(col("vec_id"), graft.Functions.vec_quant8(col("embedding")).as("q8")))
      val seeds = KMeans.seedsFromIds(qemb, "vec_id", "q8", (1L to 8L))
      val model = KMeans.train(qemb, "vec_id", "q8", 64, seeds, maxIter = 2)
      // driver-side probe planning from the broadcast-sized model
      // (the q72 discipline): centroids ranked by exact-integer
      // distance polynomial, ties to the lower cid like the assign
      val qVec = qemb.filter(col("vec_id") === 0)
        .select("q8").head().getSeq[Long](0).toArray
      val ranked = model.map(st => (KMeans.distanceTo(qVec, st), st.cid))
        .sorted.map(_._2)
      val q = qemb.filter(col("vec_id") === 0).select(col("q8").as("qq"))
      // ONE corpus pass: coarse cid + exact query similarity per row,
      // barrier'd because the exact arm, 4 ladder arms, and the
      // list-size rollup all consume it
      val assigned = graft.ops.Barrier(qemb
        .filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          KMeans.assignExpr(col("q8"), model).as("cid"),
          graft.Functions.vec_dot_int(col("q8"), col("qq")).as("qsim")))
      val exact = assigned.orderBy(col("qsim").desc, col("vec_id")).limit(10)
        .select("vec_id")
      val levels = Seq(1, 2, 4, 8)
      val arms = levels.map { np =>
        assigned.filter(col("cid").isin(ranked.take(np): _*))
          .orderBy(col("qsim").desc, col("vec_id")).limit(10)
          .select(lit(np.toLong).as("nprobe"), col("vec_id"))
      }.reduce(_.union(_))
      val hits = arms.join(exact, "vec_id")
        .groupBy("nprobe").agg(count(lit(1)).as("hits10"))
      val probePlan = levels
        .flatMap(np => ranked.take(np).map(c => (np.toLong, c)))
        .toDF("nprobe", "cid")
      val sizes = assigned.groupBy("cid").agg(count(lit(1)).as("n"))
      val scanned = probePlan.join(broadcast(sizes), Seq("cid"), "left")
        .groupBy("nprobe")
        .agg(sum(coalesce(col("n"), lit(0L)))
          .cast(org.apache.spark.sql.types.LongType).as("n_scanned"))
      val tot = assigned.agg(count(lit(1)).as("n_corpus"))
      scanned.crossJoin(broadcast(tot))
        .join(hits, Seq("nprobe"), "left")
        .select(col("nprobe"), col("n_scanned"),
          expr("(n_scanned * 1000000) div n_corpus").as("scan_ppm"),
          coalesce(col("hits10"), lit(0L)).as("hits10"))
        .orderBy("nprobe")
    }),

    // int8 quantization ranking-fidelity audit — the MEASUREMENT
    // under the premise the whole trained stack stands on: q49/q71/
    // q72/q74 all rank by the exact integer dot over vec_quant8
    // codes in place of float cosine (4× less scan I/O, zero float
    // surface), and nothing verified that the substitution preserves
    // the RANKING. Per k (1/5/10/20): how many of the float-cosine
    // top-k the integer-dot top-k retains, as exact counts + ppm —
    // q125 audits the JL projection against the int8 arm; this audits
    // the int8 arm against the float truth. ONE barrier'd pass scores
    // both similarities; each arm is a TakeOrderedAndProject over the
    // materialized 3-column frame; positions ride a 20-row window
    // (post-limit, so the unpartitioned window is bounded); the
    // ladder is a conditional-agg explode (q207 shape), no re-scan.
    "q223_quant_fidelity" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables.embeddings(s, d)
        .filter(!graft.Functions.any_null(col("embedding"))) // see q48 note
        .select(col("vec_id"), col("embedding"),
          graft.Functions.vec_quant8(col("embedding")).as("q8"))
      val q = base.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"), col("q8").as("qq"))
      val scored = graft.ops.Barrier(base.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          cosine("embedding", "qv").as("sim"),
          graft.Functions.vec_dot_int(col("q8"), col("qq")).as("qsim")))
      val fa = scored.orderBy(col("sim").desc, col("vec_id")).limit(20)
        .withColumn("rf",
          row_number().over(Window.orderBy(col("sim").desc, col("vec_id"))))
        .select("vec_id", "rf")
      val ia = scored.orderBy(col("qsim").desc, col("vec_id")).limit(20)
        .withColumn("ri",
          row_number().over(Window.orderBy(col("qsim").desc, col("vec_id"))))
        .select("vec_id", "ri")
      val j = fa.join(ia, "vec_id")
      val ks = Seq(1, 5, 10, 20)
      val heads = ks.map(k =>
        count(when(col("rf") <= k && col("ri") <= k, 1)).as(s"h_$k"))
      j.agg(heads.head, heads.tail: _*)
        .select(expr("explode(array(" + ks.map(k =>
          s"struct(${k}L as k, h_$k as hits, (h_$k * 1000000) div ${k}L as recall_ppm)")
          .mkString(", ") + "))").as("r"))
        .select(col("r.k"), col("r.hits"), col("r.recall_ppm"))
        .orderBy("k")
    }),

    // ANN recall audit — the index-quality eval a production pipeline
    // runs before trusting an approximate path: recall@10 of the
    // LSH-bucketed search (q22) against exact brute force (q16's
    // scan), as a left-semi intersection count. Both searches are
    // deterministic, so the measurement is oracle-exact. At scale
    // this runs over a query SAMPLE and gates index deploys (recall
    // below threshold → more planes / multiprobe / retrain).
    "q77_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), bucketCol.as("bucket"))
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"), col("bucket").as("qbucket"))
      val exact = emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), cosine("embedding", "qv").as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
      val ann = emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .filter(col("bucket") === col("qbucket"))
        .select(col("vec_id"), cosine("embedding", "qv").as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
      exact.join(ann, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("hits"), lit(10L).as("k"))
    }),

    // Batched ANN — the production serving shape: a TABLE of query
    // vectors (vec_id < 5), each answered with its top-3 bucket-local
    // neighbors in one job. The query side is small → broadcast; the
    // corpus joins on bucket equality (never all-pairs), and the
    // grouped top-k plans as WindowGroupLimit (≤k rows per query
    // survive each map task before the rank exchange — the shuffle
    // carries O(queries × k), not the candidate set). At 100 TB this
    // is the nightly batch-inference join: bucket (or trained-IVF
    // cid) is the corpus partition column, queries broadcast, and
    // per-query candidates never leave their partition unranked.
    "q78_batch_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), bucketCol.as("bucket"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("bucket").as("qbucket"))
      val ranked = emb.filter(col("vec_id") >= 5)
        .join(broadcast(queries), col("bucket") === col("qbucket"))
        .select(col("qid"), col("vec_id"), cosine("embedding", "qv").as("sim"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))))
      ranked.filter(col("rn") <= 3)
        .select(col("qid"), col("vec_id"), col("sim"))
        .orderBy("qid", "vec_id")
    }),

    // Hard-negative mining — the contrastive-training consumer of
    // similarity search: for each anchor in a training batch, the top-3
    // highest-cosine vectors with a DIFFERENT label (the negatives that
    // actually move an embedding model; random negatives are mostly
    // zero-gradient). Shape: the anchor batch broadcasts (a training
    // batch is broadcast-sized by construction); per-anchor ranking is
    // WindowGroupLimit — partial top-k map-side, the qid shuffle
    // carries O(anchors·k) rows, never the corpus. The exact scan here
    // is the candidate source at THIS corpus size; at 100 TB the
    // candidates come from any ANN path (q22/q72/q74 — same plumbing
    // as q78's bucket gate) and the label test rides the candidate
    // row, so mining stays one pass either way.
    "q103_hardneg" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          col("label").cast(org.apache.spark.sql.types.LongType).as("label"))
      val anchors = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("label").as("qlabel"))
      val ranked = emb.filter(col("vec_id") >= 5)
        .join(broadcast(anchors), col("label") =!= col("qlabel"))
        .select(col("qid"), col("vec_id"), col("label"),
          cosine("embedding", "qv").as("sim"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))))
      ranked.filter(col("rn") <= 3)
        .select(col("qid"), col("vec_id"), col("label"), col("sim"))
        .orderBy("qid", "vec_id")
    }),

    // Batched recall audit — the production index gate: every real
    // ANN deploy evals over a query SET, not one vector. Composes
    // q78's serving shape (broadcast query table, bucket join,
    // WindowGroupLimit per-query top-k) with q77's left-semi
    // intersection, once per query: per-qid recall@10 rows plus the
    // aggregate rate as the ROLLUP total (qid = NULL). Everything
    // after the two top-k passes is O(queries × k) — the semi-join,
    // the per-query counts, and the rollup all ride k-sized frames,
    // so the audit costs two scans regardless of corpus size (and at
    // 100 TB runs over a query sample exactly like q77).
    "q81_batch_recall" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // Each arm gets its OWN scan (fresh exprIds): combining two
      // corpus × qs joins that share one lineage into a single plan
      // trips DetectAmbiguousSelfJoin regardless of aliasing.
      def arm(bucketGated: Boolean): DataFrame = {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"), bucketCol.as("bucket"))
        val qs = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"),
            col("bucket").as("qbucket"))
        val corpus = emb.filter(col("vec_id") >= 5)
        val joined =
          if (bucketGated) corpus.join(broadcast(qs), col("bucket") === col("qbucket"))
          else corpus.crossJoin(broadcast(qs))
        val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
        joined
          .select(col("qid"), col("vec_id"), cosine("embedding", "qv").as("sim"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
          .select("qid", "vec_id")
      }
      // The intersection is computed join-free: tag each arm (1 | 2),
      // group on (qid, vec_id) — a sum of 3 means "in both top-10s".
      // The exact arm always emits rows for every qid, so zero-recall
      // queries still report hits = 0 with no join back to the query
      // table.
      val pairs = arm(bucketGated = false).withColumn("t", lit(1L))
        .unionByName(arm(bucketGated = true).withColumn("t", lit(2L)))
      val per = pairs.groupBy("qid", "vec_id").agg(sum("t").as("ts"))
        .groupBy("qid")
        .agg(sum(when(col("ts") === 3, 1L).otherwise(0L)).as("hits"))
      // rollup(col(...)), not rollup("qid"): the String overload
      // resolves through Dataset.col, whose dataset-id tag trips
      // DetectAmbiguousSelfJoin over the two-arm union below
      per.rollup(col("qid"))
        .agg(sum("hits").as("hits"), (lit(10L) * count(lit(1))).as("k"))
        .withColumn("recall", col("hits") / col("k"))
        .orderBy("qid")
    }),

    // Embedding-cosine near-dup pairs via bucket-equality self-join.
    // Norms are computed once per VECTOR before the join (n rows), not
    // once per PAIR (≈ n²/buckets rows); the per-pair work is a single
    // dot product. Same doubles — sqrt(na) is pair-order independent.
    "q23_embdup" -> ((s, d) =>
      embDupScored(s, d).filter(col("sim") >= 0.4).orderBy("vec_a", "vec_b")),

    // Cosine-threshold sensitivity ladder — the calibration curve
    // behind q23's 0.4 threshold decision: for each candidate
    // threshold, how many bucketed pairs and how many distinct
    // vectors would be flagged. The bucket-join scoring runs ONCE
    // (the barriered q23 kernel); the ladder is an explode of the
    // (tiny) scored pair set across 4 thresholds plus an explode of
    // the two pair ends — the corpus is never rescanned, the
    // comparison is the same IEEE expression on both engines
    // (sim·100 ≥ thr), and counts are exact (each kept pair
    // contributes exactly 2 end rows, so n_pairs = rows/2).
    "q216_embdup_ladder" -> ((s, d) => {
      val e = embDupScored(s, d)
        .select(explode(expr("array(30L, 40L, 50L, 60L)")).as("thr"),
          col("sim"), col("vec_a"), col("vec_b"))
        .filter(col("sim") * 100 >= col("thr"))
        .select(col("thr"), explode(array(col("vec_a"), col("vec_b"))).as("vec"))
      e.groupBy("thr")
        .agg((count(lit(1)) / 2).cast(org.apache.spark.sql.types.LongType).as("n_pairs"),
          countDistinct(col("vec")).as("n_vecs"))
        .orderBy("thr")
    }),

    // Semantic dedup (the SemDeDup pipeline shape: cluster, then dedup
    // WITHIN clusters only): coarse-cluster the corpus with the TRAINED
    // k-means codebook (q71's model), generate candidate pairs only
    // inside a cluster, and mark every vector that has a lower-id
    // cluster-mate above the cosine threshold as a semantic duplicate.
    // The keep-lowest-id rule is the deterministic greedy equivalent of
    // "keep one representative per ε-ball" — oracle-replayable, no
    // iteration. The cosine gate is EXACT integers on the int8-quantized
    // vectors: cos ≥ 1/2 ⇔ dot > 0 ∧ 4·dot² ≥ na·nb (dot ≤ 127²·64 ≈
    // 2^20, so 4·dot² ≤ 2^42 — no overflow, no floats, engines can't
    // diverge). At 100 TB: the pair join shuffles on cid (cluster-local,
    // never all-pairs); k grows with the corpus (KMeans.kForBudget — 8
    // at every oracle/bench sf, scaling past sf0.1) so E[cluster size]
    // stays bounded, and a cell still over budget sub-bands on JL-sign
    // refinement bits before pairing (graft.ops.BoundedPair) — total
    // pair work is ≤ ~n·budget/2 at any corpus size. Production τ is
    // ~0.95; 1/2 here so the tiny test corpus exercises the drop path.
    "q100_semdedup" -> ((s, d) => {
      import graft.ops.KMeans
      val qemb = graft.ops.Barrier(Tables.embeddings(s, d)
        .filter(!graft.Functions.any_null(col("embedding"))) // see q48 note
        .select(col("vec_id"), graft.Functions.vec_quant8(col("embedding")).as("q8")))
      val k = KMeans.kForBudget(qemb.count())
      val seeds = KMeans.seedsFromIds(qemb, "vec_id", "q8", (1L to k.toLong))
      val model = KMeans.train(qemb, "vec_id", "q8", 64, seeds, maxIter = 2)
      // Barrier: the assignment feeds both pair arms and the final
      // projection — materialize once (norms ride the row: computed per
      // VECTOR here, not per PAIR inside the join)
      val asg = graft.ops.Barrier(qemb.select(col("vec_id"), col("q8"),
        KMeans.assignExpr(col("q8"), model).as("cid"),
        graft.Functions.vec_dot_int(col("q8"), col("q8")).as("nrm"),
        q8RefBits(col("q8")).as("ref")))
      // pair join key: the budget-bounded cell. Budget 512 ≥ the whole
      // sf0.01 corpus, so at oracle scale the guard is quiet BY
      // CONSTRUCTION (k-means cells are data-driven and can skew, so
      // a measured margin under a smaller budget would not survive a
      // testdata regen); past sf0.1 the kForBudget dial keeps cells
      // near 256 anyway and the guard only catches skewed ones
      val asgR = graft.ops.BoundedPair.refined(asg, "cid", "ref", "pcid",
        budget = 512L)
      val dup = asgR.as("a")
        .join(asgR.as("b"),
          col("a.pcid") === col("b.pcid") && col("a.vec_id") < col("b.vec_id"))
        .select(col("b.vec_id").as("vec_id"),
          graft.Functions.vec_dot_int(col("a.q8"), col("b.q8")).as("dp"),
          (col("a.nrm") * col("b.nrm")).as("nn"))
        .filter(col("dp") > 0 && col("dp") * col("dp") * 4 >= col("nn"))
        .select("vec_id").distinct()
      asg.join(dup.withColumn("dupe", lit(true)), Seq("vec_id"), "left_outer")
        .select(col("vec_id"), col("cid"),
          coalesce(col("dupe"), lit(false)).as("is_dup"))
        .orderBy("vec_id")
    }),

    // Hubness audit — the k-occurrence distribution N_5(x): how often
    // each vector appears in OTHER vectors' top-5 neighbor lists.
    // High-dimensional spaces grow "hubs" (vectors that are everyone's
    // neighbor) and anti-hubs (never retrieved); a right-skewed N_k
    // histogram is the standard diagnostic that cosine retrieval
    // quality will degrade and that q103's hard-negative mining will
    // keep re-sampling the same hub vectors. Neighborhoods are
    // CLUSTER-LOCAL (q100's trained-codebook contract: pair work
    // shuffles on cid, never all-pairs; k grows with the corpus so
    // cluster sizes stay budget-bounded); ranking is the IEEE cosine
    // of exact integer (dot, ‖a‖²·‖b‖²) pairs — engine-identical —
    // with vec_id tie-break, and the top-5 window partitions per
    // QUERY vector (5-row state). The histogram is one partial-agg'd
    // rollup; vectors retrieved by nobody land in the k_occ = 0 bin
    // via the left join against the assignment frame.
    "q251_hubness" -> ((s, d) => {
      import graft.ops.KMeans
      import org.apache.spark.sql.expressions.Window
      val qemb = graft.ops.Barrier(Tables.embeddings(s, d)
        .filter(!graft.Functions.any_null(col("embedding")))
        .select(col("vec_id"), graft.Functions.vec_quant8(col("embedding")).as("q8")))
      // q100's scale dials: k grows with the corpus (8 at every
      // oracle/bench sf) and an over-budget cell sub-bands on the JL
      // refinement bits before pairing — neighborhoods stay CELL-local
      // by contract, so the bounded key narrows them, never widens
      val k = KMeans.kForBudget(qemb.count())
      val seeds = KMeans.seedsFromIds(qemb, "vec_id", "q8", (1L to k.toLong))
      val model = KMeans.train(qemb, "vec_id", "q8", 64, seeds, maxIter = 2)
      val asg = graft.ops.Barrier(qemb.select(col("vec_id"), col("q8"),
        KMeans.assignExpr(col("q8"), model).as("cid"),
        graft.Functions.vec_dot_int(col("q8"), col("q8")).as("nrm"),
        q8RefBits(col("q8")).as("ref")))
      // budget 512 ≥ the whole sf0.01 corpus — provably quiet at
      // oracle scale (q100's rationale: data-driven cells can skew)
      val asgR = graft.ops.BoundedPair.refined(asg, "cid", "ref", "pcid",
        budget = 512L)
      val wTop = Window.partitionBy("src").orderBy(desc("sim"), col("nbr"))
      val top5 = asgR.as("a")
        .join(asgR.as("b"),
          col("a.pcid") === col("b.pcid") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("src"), col("b.vec_id").as("nbr"),
          (graft.Functions.vec_dot_int(col("a.q8"), col("b.q8")).cast(org.apache.spark.sql.types.DoubleType)
            / sqrt((col("a.nrm") * col("b.nrm"))
              .cast(org.apache.spark.sql.types.DoubleType))).as("sim"))
        .withColumn("rn", row_number().over(wTop))
        .filter(col("rn") <= 5)
      val occ = asg.select(col("vec_id"))
        .join(top5.groupBy(col("nbr").as("vec_id"))
          .agg(count(lit(1)).as("k_occ")), Seq("vec_id"), "left")
        .select(coalesce(col("k_occ"), lit(0L)).as("k_occ"))
      occ.groupBy("k_occ").agg(count(lit(1)).as("n_vectors"))
        .orderBy("k_occ")
    }),

    // Embedding dimension health audit — per-dimension quantized
    // moments over the whole corpus: the "dead/collapsed dimension"
    // check an embedding pipeline runs before committing to an index
    // (a dimension whose variance is ~0 wastes index bits and skews
    // distance geometry). floor(x·1e4) quantization is integer-exact
    // across engines (the q48 floor convention); moments accumulate
    // as exact integers with Decimal(38,0) cross-multiplication for
    // the n·Σq²−(Σq)² variance numerator, so nothing depends on
    // float summation order at any corpus size. Shape: one
    // posexplode (map-side, dims× rows) into a 64-group partial-agg'd
    // rollup — the only exchange carries 64 keys of integer state.
    // NULL-element vectors are excluded explicitly on both sides,
    // q48's convention.
    "q188_dim_audit" -> ((s, d) => {
      Tables.embeddings(s, d)
        .filter(!graft.Functions.any_null(col("embedding")))
        .select(posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("dim").cast(org.apache.spark.sql.types.LongType).as("dim"),
          floor(col("x").cast(org.apache.spark.sql.types.DoubleType) * 10000)
            .cast(org.apache.spark.sql.types.LongType).as("q"))
        .groupBy("dim")
        .agg(count(lit(1)).as("n"), sum(col("q")).as("sum_q"),
          sum(col("q").cast(org.apache.spark.sql.types.DecimalType(38, 0)) * col("q"))
            .cast(org.apache.spark.sql.types.LongType).as("sumsq_q"))
        .select(col("dim"), col("n"), col("sum_q"), col("sumsq_q"),
          expr("""cast((cast(n as decimal(38,0)) * sumsq_q
                        - cast(sum_q as decimal(38,0)) * sum_q)
                       div (cast(n as decimal(38,0)) * n) as bigint)""").as("var_q"),
          expr("""cast(n as decimal(38,0)) * sumsq_q
                  - cast(sum_q as decimal(38,0)) * sum_q
                  < cast(1000000 as decimal(38,0)) * n * n""").as("dead"))
        .orderBy("dim")
    }),

    // Incremental IVF maintenance — the index-APPEND path the
    // persisted-index story (IvfIndex) needs at 100 TB: new vectors
    // land against the EXISTING trained codebook (train on the old
    // 90%, assign everyone — the append is a broadcast-model MAP-ONLY
    // pass, never a retrain, never a shuffle of the indexed corpus),
    // and the per-list growth audit is what tells you when drift has
    // skewed the lists enough to schedule a retrain (a list growing
    // 10× its share degrades probe cost). One k-row output: old/new
    // occupancy and exact growth ppm (greatest(n_old, 1) guards an
    // empty list without diverging truncate/floor).
    "q237_ivf_append" -> ((s, d) => {
      import graft.ops.KMeans
      val qemb = graft.ops.Barrier(Tables.embeddings(s, d)
        .filter(!graft.Functions.any_null(col("embedding")))
        .select(col("vec_id"), graft.Functions.vec_quant8(col("embedding")).as("q8")))
      val old = qemb.filter(col("vec_id") % 10 =!= 0)
      val seeds = KMeans.seedsFromIds(old, "vec_id", "q8", (1L to 8L))
      val model = KMeans.train(old, "vec_id", "q8", 64, seeds, maxIter = 2)
      qemb.select(col("vec_id"),
          KMeans.assignExpr(col("q8"), model).as("cid"),
          (col("vec_id") % 10 === 0).as("is_new"))
        .groupBy("cid")
        .agg(sum(when(!col("is_new"), 1L).otherwise(0L)).as("n_old"),
          sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"))
        .withColumn("growth_ppm",
          expr("(n_new * 1000000) div greatest(n_old, 1L)"))
        .orderBy("cid")
    }),

    // Pair-budget census — the guard-sizing dashboard an operator
    // reads before trusting a bucket family at a new corpus size: per
    // 4-bit annBucket, the membership, whether it exceeds q23's
    // production budget (256), the refinement depth the guard would
    // apply, and the expected refined sub-bucket size. Exact integers
    // end to end (the depth is BoundedPair's integer CASE ladder — no
    // float log anywhere), so the oracle replays the guard's planning
    // math verbatim. Scale shape: one partial-agg'd census
    // (≤ 2^nBits rows), no joins, embeddings never leave the scan.
    "q260_pair_budget_census" -> ((s, d) => {
      Tables.embeddings(s, d).select(bucketCol.as("bucket"))
        .filter(col("bucket").isNotNull)
        .groupBy("bucket").agg(count(lit(1)).as("bn"))
        .select(col("bucket"), col("bn"),
          (col("bn") > 256L).as("over_budget"),
          graft.ops.BoundedPair.depthExpr(col("bn"), 256L)
            .cast(org.apache.spark.sql.types.LongType).as("e"))
        .withColumn("sub_expect", expr("bn div shiftleft(1L, cast(e as int))"))
        .orderBy("bucket")
    }),

    // Pair-work audit — the with-vs-without-the-guard comparison at a
    // deliberately undersized STRESS budget (16), so the sub-banding
    // engages even on the 500-row oracle corpus and the oracle must
    // replay the entire refinement machinery cross-engine: the 16
    // continuation hyperplanes (planes 4..19, the first DuckDB
    // validation of bucketRefBits parity), the integer depth ladder,
    // the masked-ref regrouping, and the pair-count algebra. Reports
    // raw bucket pairs, guarded pairs, and kept_ppm — the cost dial
    // an operator reads next to q260's census when sizing a budget.
    // Scale shape: two censuses off one barriered pass; the 1-row
    // totals meet on a broadcast.
    "q261_pair_work_audit" -> ((s, d) => {
      val emb = graft.ops.Barrier(Tables.embeddings(s, d)
        .select(col("vec_id"), bucketCol.as("bucket"), bucketRefBits.as("ref"))
        .filter(col("bucket").isNotNull))
      val r = graft.ops.BoundedPair.refined(emb, "bucket", "ref", "pb",
        budget = 16L)
      val guarded = r.groupBy("pb").agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)).as("pairs_guarded"))
      val raw = emb.groupBy("bucket").agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)).as("pairs_raw"))
      raw.crossJoin(broadcast(guarded))
        .select(col("pairs_raw"), col("pairs_guarded"),
          expr("(pairs_guarded * 1000000) div pairs_raw").as("kept_ppm"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q16_topk" ->
      s"""WITH q AS (SELECT embedding qv FROM embeddings WHERE vec_id = 0)
          SELECT e.vec_id, ${dCos("e.embedding", "q.qv")} AS sim
          FROM embeddings e, q WHERE e.vec_id <> 0
          ORDER BY sim DESC, e.vec_id LIMIT 20""",
    "q22_ann" ->
      s"""WITH b AS (
            SELECT vec_id, embedding, $bucketSqlDuck bucket FROM embeddings),
          q AS (SELECT embedding qv, bucket qbucket FROM b WHERE vec_id = 0)
          SELECT e.vec_id, ${dCos("e.embedding", "q.qv")} AS sim
          FROM b e, q WHERE e.vec_id <> 0 AND e.bucket = q.qbucket
          ORDER BY sim DESC, e.vec_id LIMIT 10""",
    "q40_ivf" ->
      s"""WITH c AS (
            SELECT vec_id cid, embedding cv FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
          a AS (
            SELECT e.vec_id, e.embedding, c.cid, ${dDot("e.embedding", "c.cv")} cd
            FROM embeddings e CROSS JOIN c),
          r AS (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY cd DESC, cid ASC) rn
            FROM a),
          lists AS (SELECT vec_id, cid, embedding FROM r WHERE rn = 1),
          probes AS (SELECT cid FROM r WHERE vec_id = 0 AND rn <= 2),
          q AS (SELECT embedding qv FROM embeddings WHERE vec_id = 0)
          SELECT b.vec_id, ${dCos("b.embedding", "q.qv")} AS sim
          FROM lists b JOIN probes p ON b.cid = p.cid, q
          WHERE b.vec_id <> 0
          ORDER BY sim DESC, b.vec_id LIMIT 10""",
    "q44_multiprobe" ->
      s"""WITH b AS (
            SELECT vec_id, embedding, $bucketSqlDuck bucket FROM embeddings),
          q AS (SELECT embedding qv, bucket qb FROM b WHERE vec_id = 0),
          p AS (SELECT qv, unnest([qb, xor(qb, 1), xor(qb, 2), xor(qb, 4), xor(qb, 8)]) AS bucket FROM q)
          SELECT e.vec_id, ${dCos("e.embedding", "p.qv")} AS sim
          FROM b e JOIN p ON e.bucket = p.bucket
          WHERE e.vec_id <> 0
          ORDER BY sim DESC, e.vec_id LIMIT 10""",
    "q48_quant" ->
      """WITH m AS (
           SELECT vec_id, embedding,
                  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) maxabs
           FROM embeddings
           WHERE vec_id < 200
             AND len(list_filter(embedding, x -> x IS NULL)) = 0)
         SELECT vec_id, i - 1 AS i,
                CASE WHEN maxabs > 0
                     THEN greatest(CAST(-127 AS BIGINT), least(CAST(127 AS BIGINT),
                            CAST(floor(CAST(embedding[i] AS DOUBLE) * 127 / maxabs) AS BIGINT)))
                     ELSE CAST(0 AS BIGINT) END AS q
         FROM m, unnest(range(1, len(embedding)+1)) t(i)
         ORDER BY vec_id, i""",
    // both ranking arms in SQL over the shared quantize+project CTEs;
    // recall@10 = the IN-count of the projected arm in the exact arm.
    "q125_rproj_recall" ->
      """WITH m AS (
           SELECT vec_id, embedding,
                  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) maxabs
           FROM embeddings
           WHERE len(list_filter(embedding, x -> x IS NULL)) = 0),
         v AS (
           SELECT vec_id,
                  CASE WHEN maxabs > 0
                       THEN list_transform(embedding, x -> greatest(CAST(-127 AS BIGINT),
                              least(CAST(127 AS BIGINT),
                                CAST(floor(CAST(x AS DOUBLE) * 127 / maxabs) AS BIGINT))))
                       ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END q8
           FROM m),
         pv AS (
           SELECT vec_id, q8,
                  [CAST(list_sum(list_transform(range(1, 65), i -> q8[i] *
                     (CASE WHEN CAST(concat('0x', substr(md5('rp,' || CAST(i-1 AS VARCHAR) || ',' || CAST(j AS VARCHAR)), 1, 1)) AS INT) % 2 = 0
                           THEN 1 ELSE -1 END))) AS BIGINT)
                   for j in range(0, 16)] p16
           FROM v),
         q AS (SELECT q8 qq, p16 qp FROM pv WHERE vec_id = 0),
         exact AS (
           SELECT pv.vec_id,
                  CAST(list_sum(list_transform(range(1, 65), i -> pv.q8[i] * qq[i])) AS BIGINT) s
           FROM pv, q WHERE pv.vec_id <> 0
           ORDER BY s DESC, pv.vec_id LIMIT 10),
         proj AS (
           SELECT pv.vec_id,
                  CAST(list_sum(list_transform(range(1, 17), k -> pv.p16[k] * qp[k])) AS BIGINT) s
           FROM pv, q WHERE pv.vec_id <> 0
           ORDER BY s DESC, pv.vec_id LIMIT 10)
         SELECT CAST(count(*) AS BIGINT) AS hits, CAST(10 AS BIGINT) AS k
         FROM exact WHERE vec_id IN (SELECT vec_id FROM proj)""",
    // int8 quantization (the q48 CTEs) + md5-parity ±1 signs; the
    // projection replays as a list comprehension over 16 output dims.
    "q123_rproj" ->
      """WITH m AS (
           SELECT vec_id, embedding,
                  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) maxabs
           FROM embeddings
           WHERE vec_id < 200
             AND len(list_filter(embedding, x -> x IS NULL)) = 0),
         v AS (
           SELECT vec_id,
                  CASE WHEN maxabs > 0
                       THEN list_transform(embedding, x -> greatest(CAST(-127 AS BIGINT),
                              least(CAST(127 AS BIGINT),
                                CAST(floor(CAST(x AS DOUBLE) * 127 / maxabs) AS BIGINT))))
                       ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END q8
           FROM m)
         SELECT vec_id, j,
                CAST(list_sum(list_transform(range(1, 65), i -> q8[i] *
                  (CASE WHEN CAST(concat('0x', substr(md5('rp,' || CAST(i-1 AS VARCHAR) || ',' || CAST(j AS VARCHAR)), 1, 1)) AS INT) % 2 = 0
                        THEN 1 ELSE -1 END))) AS BIGINT) p
         FROM v, unnest(range(0, 16)) t(j)
         ORDER BY vec_id, j""",
    // same projection over the full corpus; ranking = integer dot of
    // the 16-long projections against vec 0's, top 10.
    "q124_rproj_ann" ->
      """WITH m AS (
           SELECT vec_id, embedding,
                  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) maxabs
           FROM embeddings
           WHERE len(list_filter(embedding, x -> x IS NULL)) = 0),
         v AS (
           SELECT vec_id,
                  CASE WHEN maxabs > 0
                       THEN list_transform(embedding, x -> greatest(CAST(-127 AS BIGINT),
                              least(CAST(127 AS BIGINT),
                                CAST(floor(CAST(x AS DOUBLE) * 127 / maxabs) AS BIGINT))))
                       ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END q8
           FROM m),
         pv AS (
           SELECT vec_id,
                  [CAST(list_sum(list_transform(range(1, 65), i -> q8[i] *
                     (CASE WHEN CAST(concat('0x', substr(md5('rp,' || CAST(i-1 AS VARCHAR) || ',' || CAST(j AS VARCHAR)), 1, 1)) AS INT) % 2 = 0
                           THEN 1 ELSE -1 END))) AS BIGINT)
                   for j in range(0, 16)] p16
           FROM v),
         q AS (SELECT p16 qp FROM pv WHERE vec_id = 0)
         SELECT pv.vec_id,
                CAST(list_sum(list_transform(range(1, 17), k -> pv.p16[k] * qp[k])) AS BIGINT) AS pscore
         FROM pv, q WHERE pv.vec_id <> 0
         ORDER BY pscore DESC, pv.vec_id LIMIT 10""",
    "q49_qann" ->
      """WITH m AS (
           SELECT vec_id, embedding,
                  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) maxabs
           FROM embeddings
           WHERE len(list_filter(embedding, x -> x IS NULL)) = 0),
         v AS (
           SELECT vec_id,
                  CASE WHEN maxabs > 0
                       THEN list_transform(embedding, x -> greatest(CAST(-127 AS BIGINT),
                              least(CAST(127 AS BIGINT),
                                CAST(floor(CAST(x AS DOUBLE) * 127 / maxabs) AS BIGINT))))
                       ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END q8
           FROM m),
         q AS (SELECT q8 qq FROM v WHERE vec_id = 0)
         SELECT v.vec_id,
                CAST(list_sum(list_transform(range(1, len(v.q8)+1), i -> v.q8[i] * qq[i])) AS BIGINT) AS qsim
         FROM v, q WHERE v.vec_id <> 0
         ORDER BY qsim DESC, v.vec_id LIMIT 10""",
    "q58_fann" ->
      s"""WITH k AS (SELECT doc_id FROM documents WHERE lang = 'de'),
          q AS (SELECT embedding qv FROM embeddings WHERE vec_id = 0)
          SELECT e.vec_id, ${dCos("e.embedding", "q.qv")} AS sim
          FROM embeddings e JOIN k ON e.vec_id = k.doc_id, q
          WHERE e.vec_id <> 0
          ORDER BY sim DESC, e.vec_id LIMIT 10""",
    "q69_pqann" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings
                    WHERE len(list_filter(embedding, x -> x IS NULL)) = 0),
          c AS (SELECT vec_id cid, embedding cv FROM e WHERE vec_id BETWEEN 1 AND 8),
          sub AS (SELECT unnest([0,1,2,3]) AS m),
          a AS (SELECT e.vec_id, s.m, c.cid,
                  list_sum(list_transform(range(1, 17), i ->
                    (CAST(e.embedding[s.m*16+i] AS DOUBLE) - CAST(c.cv[s.m*16+i] AS DOUBLE))
                    * (CAST(e.embedding[s.m*16+i] AS DOUBLE) - CAST(c.cv[s.m*16+i] AS DOUBLE)))) d2
                FROM e CROSS JOIN sub s CROSS JOIN c),
          r AS (SELECT vec_id, m, cid,
                  row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) rn
                FROM a),
          codes AS (SELECT vec_id, list(cid ORDER BY m) cds
                    FROM r WHERE rn = 1 GROUP BY vec_id),
          cb AS (SELECT list(struct_pack(cid := cid, cv := cv) ORDER BY cid) cbs FROM c),
          q AS (SELECT embedding qv FROM e WHERE vec_id = 0)
          SELECT co.vec_id,
                 list_sum(list_transform(range(0, 4), m ->
                   list_sum(list_transform(range(1, 17), i ->
                     (CAST(q.qv[m*16+i] AS DOUBLE) - CAST(list_filter(cb.cbs, cc -> cc.cid = co.cds[m+1])[1].cv[m*16+i] AS DOUBLE))
                     * (CAST(q.qv[m*16+i] AS DOUBLE) - CAST(list_filter(cb.cbs, cc -> cc.cid = co.cds[m+1])[1].cv[m*16+i] AS DOUBLE)))))) AS adist
          FROM codes co, cb, q
          WHERE co.vec_id <> 0
          ORDER BY adist ASC, co.vec_id LIMIT 10""",
    "q70_ivfpq" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
                     WHERE len(list_filter(embedding, x -> x IS NULL)) = 0),
          c AS (SELECT vec_id cid, embedding cv FROM e WHERE vec_id BETWEEN 1 AND 8),
          iv AS (SELECT e.vec_id, c.cid, ${dDot("e.embedding", "c.cv")} cd
                 FROM e CROSS JOIN c),
          ir AS (SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY cd DESC, cid ASC) rn
                 FROM iv),
          lists AS (SELECT vec_id, cid FROM ir WHERE rn = 1),
          probes AS (SELECT cid FROM ir WHERE vec_id = 0 AND rn <= 2),
          sub AS (SELECT unnest([0,1,2,3]) AS m),
          a AS (SELECT e.vec_id, s.m, c.cid,
                  list_sum(list_transform(range(1, 17), i ->
                    (CAST(e.embedding[s.m*16+i] AS DOUBLE) - CAST(c.cv[s.m*16+i] AS DOUBLE))
                    * (CAST(e.embedding[s.m*16+i] AS DOUBLE) - CAST(c.cv[s.m*16+i] AS DOUBLE)))) d2
                FROM e CROSS JOIN sub s CROSS JOIN c),
          r AS (SELECT vec_id, m, cid,
                  row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) rn
                FROM a),
          codes AS (SELECT vec_id, list(cid ORDER BY m) cds
                    FROM r WHERE rn = 1 GROUP BY vec_id),
          cb AS (SELECT list(struct_pack(cid := cid, cv := cv) ORDER BY cid) cbs FROM c),
          q AS (SELECT embedding qv FROM e WHERE vec_id = 0)
          SELECT co.vec_id,
                 list_sum(list_transform(range(0, 4), m ->
                   list_sum(list_transform(range(1, 17), i ->
                     (CAST(q.qv[m*16+i] AS DOUBLE) - CAST(list_filter(cb.cbs, cc -> cc.cid = co.cds[m+1])[1].cv[m*16+i] AS DOUBLE))
                     * (CAST(q.qv[m*16+i] AS DOUBLE) - CAST(list_filter(cb.cbs, cc -> cc.cid = co.cds[m+1])[1].cv[m*16+i] AS DOUBLE)))))) AS adist
          FROM codes co
          JOIN lists l ON co.vec_id = l.vec_id
          JOIN probes p ON l.cid = p.cid, cb, q
          WHERE co.vec_id <> 0
          ORDER BY adist ASC, co.vec_id LIMIT 10""",
    "q71_kmeans" -> kmeansOracle(2),
    // q71's training replay + the final assign, counted per window
    // half with the cross-multiplied 1% share gate
    "q111_drift" ->
      s"""WITH ${kmeansCtes(2)},
          ${kmAssign("afin", "s2")},
          c AS (SELECT cid,
                  sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) n_ref,
                  sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) n_new
                FROM afin GROUP BY cid),
          t AS (SELECT sum(n_ref) tr, sum(n_new) tn FROM c)
         SELECT cid, CAST(n_ref AS BIGINT) n_ref, CAST(n_new AS BIGINT) n_new,
                CAST((n_new * 1000000) // tn - (n_ref * 1000000) // tr
                  AS BIGINT) shift_ppm,
                abs(CAST(n_new AS HUGEINT) * tr - CAST(n_ref AS HUGEINT) * tn)
                  * 100 > CAST(tn AS HUGEINT) * tr AS is_drift
         FROM c CROSS JOIN t ORDER BY cid""",
    // q71's training replay + per-point distance numerators against
    // the final state, rolled up per cluster.
    "q130_inertia" ->
      s"""WITH ${kmeansCtes(2)},
          ${kmAssign("afin", "s2")},
          pt AS (
            SELECT a.cid, s.c,
                   CAST(list_sum(list_transform(range(1, 65), i ->
                     (s.c * v.q8[i] - s.s[i]) * (s.c * v.q8[i] - s.s[i]))) AS BIGINT) num
            FROM afin a JOIN v USING (vec_id) JOIN s2 s ON a.cid = s.cid)
          SELECT cid, CAST(count(*) AS BIGINT) n, CAST(min(c) AS BIGINT) c,
                 CAST(sum(num) AS BIGINT) sse_num
          FROM pt GROUP BY cid ORDER BY cid""",
    "q72_ivf_trained" -> ivfTrainedOracle(2),
    "q222_nprobe_ladder" -> nprobeLadderOracle(2),
    // float-cosine top-k vs integer-dot top-k retention ladder: the
    // quantization-fidelity audit over the shared null-filtered
    // quantization CTEs.
    "q223_quant_fidelity" ->
      s"""WITH $quantCtes,
            qf AS (SELECT embedding qv FROM e WHERE vec_id = 0),
            qi AS (SELECT q8 qq FROM v WHERE vec_id = 0),
            fa AS (SELECT vec_id,
                     row_number() OVER (ORDER BY ${dCos("e.embedding", "qf.qv")} DESC, vec_id) rf
                   FROM e, qf WHERE vec_id <> 0),
            ia AS (SELECT vec_id,
                     row_number() OVER (ORDER BY
                       CAST(list_sum(list_transform(range(1, 65), i ->
                         v.q8[i] * qi.qq[i])) AS BIGINT) DESC, vec_id) ri
                   FROM v, qi WHERE vec_id <> 0),
            j AS (SELECT fa.rf, ia.ri FROM fa JOIN ia USING (vec_id)
                  WHERE fa.rf <= 20 AND ia.ri <= 20),
            ks AS (SELECT CAST(unnest([1, 5, 20, 10]) AS BIGINT) k)
           SELECT ks.k,
                  CAST(coalesce(sum(CASE WHEN j.rf <= ks.k AND j.ri <= ks.k
                                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS hits,
                  CAST(coalesce(sum(CASE WHEN j.rf <= ks.k AND j.ri <= ks.k
                                         THEN 1 ELSE 0 END), 0) AS BIGINT)
                    * 1000000 // ks.k AS recall_ppm
           FROM ks LEFT JOIN j ON true
           GROUP BY ks.k ORDER BY ks.k""",
    "q73_pq_trained" -> pqTrainedOracle(2),
    "q132_pq_distortion" -> pqDistortionOracle(2),
    "q74_ivfpq_trained" -> ivfPqTrainedOracle(2),
    "q75_knn" ->
      s"""WITH q AS (SELECT embedding qv FROM embeddings WHERE vec_id = 0),
          knn AS (
            SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
                   ${dCos("e.embedding", "q.qv")} AS sim
            FROM embeddings e, q WHERE e.vec_id <> 0
            ORDER BY sim DESC, e.vec_id LIMIT 20)
          SELECT label, CAST(count(*) AS BIGINT) AS votes
          FROM knn GROUP BY label
          ORDER BY votes DESC, label LIMIT 1""",
    "q77_recall" ->
      s"""WITH b AS (
            SELECT vec_id, embedding, $bucketSqlDuck bucket FROM embeddings),
          q AS (SELECT embedding qv, bucket qbucket FROM b WHERE vec_id = 0),
          exact AS (
            SELECT e.vec_id, ${dCos("e.embedding", "q.qv")} AS sim
            FROM b e, q WHERE e.vec_id <> 0
            ORDER BY sim DESC, e.vec_id LIMIT 10),
          ann AS (
            SELECT e.vec_id, ${dCos("e.embedding", "q.qv")} AS sim
            FROM b e, q WHERE e.vec_id <> 0 AND e.bucket = q.qbucket
            ORDER BY sim DESC, e.vec_id LIMIT 10)
          SELECT CAST(count(*) AS BIGINT) AS hits, CAST(10 AS BIGINT) AS k
          FROM exact WHERE vec_id IN (SELECT vec_id FROM ann)""",
    "q81_batch_recall" ->
      s"""WITH b AS (
            SELECT vec_id, embedding, $bucketSqlDuck bucket FROM embeddings),
          q AS (SELECT vec_id qid, embedding qv, bucket qbucket FROM b WHERE vec_id < 5),
          candx AS (
            SELECT q.qid, e.vec_id, ${dCos("e.embedding", "q.qv")} AS sim
            FROM b e, q WHERE e.vec_id >= 5),
          exact AS (
            SELECT qid, vec_id FROM (
              SELECT qid, vec_id,
                     row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) rn
              FROM candx) WHERE rn <= 10),
          canda AS (
            SELECT q.qid, e.vec_id, ${dCos("e.embedding", "q.qv")} AS sim
            FROM b e JOIN q ON e.bucket = q.qbucket WHERE e.vec_id >= 5),
          ann AS (
            SELECT qid, vec_id FROM (
              SELECT qid, vec_id,
                     row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) rn
              FROM canda) WHERE rn <= 10),
          h AS (
            SELECT e.qid, count(*) n FROM exact e
            JOIN ann a ON e.qid = a.qid AND e.vec_id = a.vec_id
            GROUP BY e.qid),
          per AS (
            SELECT q.qid, coalesce(h.n, 0) hits
            FROM q LEFT JOIN h ON q.qid = h.qid)
          SELECT qid, CAST(sum(hits) AS BIGINT) AS hits,
                 CAST(10 * count(*) AS BIGINT) AS k,
                 CAST(sum(hits) AS BIGINT) / CAST(10 * count(*) AS BIGINT) AS recall
          FROM per GROUP BY ROLLUP(qid) ORDER BY qid""",
    "q78_batch_ann" ->
      s"""WITH b AS (
            SELECT vec_id, embedding, $bucketSqlDuck bucket FROM embeddings),
          q AS (SELECT vec_id qid, embedding qv, bucket qbucket FROM b WHERE vec_id < 5),
          cand AS (
            SELECT q.qid, e.vec_id, ${dCos("e.embedding", "q.qv")} AS sim
            FROM b e JOIN q ON e.bucket = q.qbucket
            WHERE e.vec_id >= 5),
          r AS (SELECT qid, vec_id, sim,
                  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) rn
                FROM cand)
          SELECT qid, vec_id, sim FROM r WHERE rn <= 3
          ORDER BY qid, vec_id""",
    "q103_hardneg" ->
      s"""WITH a AS (
            SELECT vec_id qid, embedding qv, CAST(label AS BIGINT) AS qlabel
            FROM embeddings WHERE vec_id < 5),
          c AS (
            SELECT a.qid, e.vec_id, CAST(e.label AS BIGINT) AS label,
                   ${dCos("e.embedding", "a.qv")} AS sim
            FROM embeddings e JOIN a ON CAST(e.label AS BIGINT) <> a.qlabel
            WHERE e.vec_id >= 5),
          r AS (SELECT qid, vec_id, label, sim,
                  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) rn
                FROM c)
          SELECT qid, vec_id, label, sim FROM r WHERE rn <= 3
          ORDER BY qid, vec_id""",
    "q76_purity" ->
      s"""WITH ${kmeansCtes(2)},
          ${kmAssign("afin", "s2")},
          lbl AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings)
          SELECT a.cid, l.label, CAST(count(*) AS BIGINT) AS n
          FROM afin a JOIN lbl l USING (vec_id)
          GROUP BY a.cid, l.label
          ORDER BY a.cid, l.label""",
    // The pair-budget guard is RENDERED into the oracle (census →
    // exact-integer depth ladder → low-e refinement bits on the join
    // key — q261's machinery), so this oracle is valid at EVERY sf:
    // where buckets fit the 256 budget e = 0 and the key reduces to
    // the raw bucket (bit-identical to the historical oracle); where
    // they don't (sf1+), both engines sub-band identically.
    "q23_embdup" ->
      s"""WITH b AS (
            SELECT vec_id, embedding, $bucketSqlDuck bucket, $refSqlDuck AS refbits
            FROM embeddings),
          c AS (SELECT bucket, CAST(count(*) AS BIGINT) bn FROM b
                WHERE bucket IS NOT NULL GROUP BY 1),
          g AS (SELECT bucket, CAST(${depthSqlDuck("bn", 256L)} AS INT) e FROM c),
          k AS (SELECT b.vec_id, b.embedding, b.bucket,
                       b.refbits & ((CAST(1 AS BIGINT) << g.e) - 1) sub
                FROM b JOIN g USING (bucket))
          SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
                 ${dCos("x.embedding", "y.embedding")} AS sim
          FROM k x JOIN k y ON x.bucket = y.bucket AND x.sub = y.sub
                           AND x.vec_id < y.vec_id
          WHERE ${dCos("x.embedding", "y.embedding")} >= 0.4
          ORDER BY vec_a, vec_b""",
    // q23's bucketed pair scoring swept across 4 thresholds: pair and
    // distinct-vector counts per threshold (guard rendered, as in q23).
    "q216_embdup_ladder" ->
      s"""WITH b AS (
            SELECT vec_id, embedding, $bucketSqlDuck bucket, $refSqlDuck AS refbits
            FROM embeddings),
          c AS (SELECT bucket, CAST(count(*) AS BIGINT) bn FROM b
                WHERE bucket IS NOT NULL GROUP BY 1),
          g AS (SELECT bucket, CAST(${depthSqlDuck("bn", 256L)} AS INT) e FROM c),
          kk AS (SELECT b.vec_id, b.embedding, b.bucket,
                        b.refbits & ((CAST(1 AS BIGINT) << g.e) - 1) sub
                 FROM b JOIN g USING (bucket)),
          p AS (
            SELECT x.vec_id vec_a, y.vec_id vec_b,
                   ${dCos("x.embedding", "y.embedding")} sim
            FROM kk x JOIN kk y ON x.bucket = y.bucket AND x.sub = y.sub
                               AND x.vec_id < y.vec_id),
          t AS (SELECT unnest([30, 40, 50, 60]) thr),
          e AS (SELECT thr, vec_a, vec_b FROM p CROSS JOIN t WHERE sim * 100 >= thr),
          u AS (SELECT thr, vec_a AS vec FROM e UNION ALL SELECT thr, vec_b AS vec FROM e)
          SELECT CAST(thr AS BIGINT) AS thr,
                 CAST(count(*) // 2 AS BIGINT) AS n_pairs,
                 CAST(count(DISTINCT vec) AS BIGINT) AS n_vecs
          FROM u GROUP BY 1 ORDER BY 1""",
    // Guard + scale dials rendered: k = kForBudget(n) data-driven (8 at
    // every historical sf, growing past it like the Spark side), and the
    // 512-budget cell guard sub-bands on the JL refinement bits — valid
    // at every sf, reducing to the historical oracle where quiet.
    "q100_semdedup" ->
      s"""WITH ${kmeansCtes(2, kForBudgetSql)},
          ${kmAssign("afin", "s2")},
          n AS (SELECT v.vec_id, a.cid, v.q8,
                  CAST(list_sum(list_transform(range(1, 65), i ->
                    v.q8[i] * v.q8[i])) AS BIGINT) nrm,
                  $refBitsQ8Duck refbits
                FROM v JOIN afin a USING (vec_id)),
          cg AS (SELECT cid, CAST(count(*) AS BIGINT) bn FROM n GROUP BY 1),
          gg AS (SELECT cid, CAST(${depthSqlDuck("bn", 512L)} AS INT) e FROM cg),
          kk AS (SELECT n.*, n.refbits & ((CAST(1 AS BIGINT) << gg.e) - 1) sub
                 FROM n JOIN gg USING (cid)),
          p AS (SELECT b.vec_id,
                  CAST(list_sum(list_transform(range(1, 65), i ->
                    a.q8[i] * b.q8[i])) AS BIGINT) dp,
                  a.nrm * b.nrm nn
                FROM kk a JOIN kk b ON a.cid = b.cid AND a.sub = b.sub
                                   AND a.vec_id < b.vec_id),
          dup AS (SELECT DISTINCT vec_id FROM p WHERE dp > 0 AND 4 * dp * dp >= nn)
          SELECT n.vec_id, n.cid, dup.vec_id IS NOT NULL AS is_dup
          FROM n LEFT JOIN dup ON n.vec_id = dup.vec_id
          ORDER BY n.vec_id""",
    // q100's trained cells → cluster-local IEEE-cosine top-5 per
    // query vector → reverse-occurrence histogram (guard + k dial
    // rendered as in q100).
    "q251_hubness" ->
      s"""WITH ${kmeansCtes(2, kForBudgetSql)},
          ${kmAssign("afin", "s2")},
          n AS (SELECT v.vec_id, a.cid, v.q8,
                  CAST(list_sum(list_transform(range(1, 65), i ->
                    v.q8[i] * v.q8[i])) AS BIGINT) nrm,
                  $refBitsQ8Duck refbits
                FROM v JOIN afin a USING (vec_id)),
          cg AS (SELECT cid, CAST(count(*) AS BIGINT) bn FROM n GROUP BY 1),
          gg AS (SELECT cid, CAST(${depthSqlDuck("bn", 512L)} AS INT) e FROM cg),
          kk AS (SELECT n.*, n.refbits & ((CAST(1 AS BIGINT) << gg.e) - 1) sub
                 FROM n JOIN gg USING (cid)),
          p AS (SELECT a.vec_id src, b.vec_id nbr,
                  CAST(list_sum(list_transform(range(1, 65), i ->
                    a.q8[i] * b.q8[i])) AS DOUBLE)
                    / sqrt(CAST(a.nrm * b.nrm AS DOUBLE)) sim
                FROM kk a JOIN kk b ON a.cid = b.cid AND a.sub = b.sub
                                   AND a.vec_id <> b.vec_id),
          t5 AS (SELECT src, nbr FROM (
                   SELECT src, nbr,
                     row_number() OVER (PARTITION BY src ORDER BY sim DESC, nbr) rn
                   FROM p) WHERE rn <= 5),
          oc AS (SELECT n.vec_id, CAST(count(t5.src) AS BIGINT) k_occ
                 FROM n LEFT JOIN t5 ON n.vec_id = t5.nbr
                 GROUP BY n.vec_id)
          SELECT k_occ, count(*) n_vectors
          FROM oc GROUP BY 1 ORDER BY 1""",
    // per-dimension quantized moments; exact-integer variance via
    // decimal cross-multiplication (q48 floor convention).
    "q188_dim_audit" ->
      """WITH e AS (SELECT vec_id, unnest(embedding) AS x,
                           generate_subscripts(embedding, 1) - 1 AS dim
                    FROM embeddings
                    WHERE NOT EXISTS (SELECT 1 FROM unnest(embedding) u(y) WHERE y IS NULL)),
         q AS (SELECT dim, CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT) AS q FROM e),
         m AS (SELECT CAST(dim AS BIGINT) AS dim, count(*) AS n,
                      CAST(sum(q) AS BIGINT) AS sum_q,
                      CAST(sum(CAST(q AS HUGEINT) * q) AS BIGINT) AS sumsq_q
               FROM q GROUP BY dim)
         SELECT dim, n, sum_q, sumsq_q,
                CAST((CAST(n AS HUGEINT) * sumsq_q - CAST(sum_q AS HUGEINT) * sum_q)
                     // (CAST(n AS HUGEINT) * n) AS BIGINT) AS var_q,
                CAST(n AS HUGEINT) * sumsq_q - CAST(sum_q AS HUGEINT) * sum_q
                  < CAST(1000000 AS HUGEINT) * n * n AS dead
         FROM m ORDER BY dim""",
    // train on the old 90% (same unrolled rounds), final-assign ALL
    // vectors, per-list old/new occupancy + growth.
    "q237_ivf_append" ->
      s"""WITH $quantCtes,
          vold AS (SELECT * FROM v WHERE vec_id % 10 <> 0),
          ${kmRounds(2, "vold")},
          ${kmAssign("afin", "s2", "v")}
         SELECT a.cid,
                CAST(sum(CASE WHEN a.vec_id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT) n_old,
                CAST(sum(CASE WHEN a.vec_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) n_new,
                CAST((sum(CASE WHEN a.vec_id % 10 = 0 THEN 1 ELSE 0 END) * 1000000)
                     // greatest(sum(CASE WHEN a.vec_id % 10 <> 0 THEN 1 ELSE 0 END), 1) AS BIGINT) growth_ppm
         FROM afin a GROUP BY a.cid ORDER BY a.cid""",

    "q260_pair_budget_census" ->
      s"""WITH c AS (
            SELECT bucket, CAST(count(*) AS BIGINT) bn FROM (
              SELECT $bucketSqlDuck bucket FROM embeddings)
            WHERE bucket IS NOT NULL GROUP BY 1),
          g AS (
            SELECT bucket, bn, bn > 256 AS over_budget,
                   CAST(${depthSqlDuck("bn", 256L)} AS BIGINT) e
            FROM c)
          SELECT bucket, bn, over_budget, e,
                 bn // (CAST(1 AS BIGINT) << CAST(e AS INT)) AS sub_expect
          FROM g ORDER BY bucket""",

    "q261_pair_work_audit" ->
      s"""WITH b AS (
            SELECT vec_id, $bucketSqlDuck bucket, $refSqlDuck AS refbits
            FROM embeddings),
          bb AS (SELECT * FROM b WHERE bucket IS NOT NULL),
          c AS (SELECT bucket, CAST(count(*) AS BIGINT) bn FROM bb GROUP BY 1),
          g AS (SELECT bucket, CAST(${depthSqlDuck("bn", 16L)} AS INT) e FROM c),
          k AS (SELECT bb.bucket, bb.refbits & ((CAST(1 AS BIGINT) << g.e) - 1) sub
                FROM bb JOIN g USING (bucket)),
          gc AS (SELECT CAST(count(*) AS BIGINT) c FROM k GROUP BY bucket, sub),
          rc AS (SELECT CAST(count(*) AS BIGINT) c FROM bb GROUP BY bucket),
          t AS (SELECT
            (SELECT CAST(COALESCE(sum(c * (c - 1) // 2), 0) AS BIGINT) FROM rc) pairs_raw,
            (SELECT CAST(COALESCE(sum(c * (c - 1) // 2), 0) AS BIGINT) FROM gc) pairs_guarded)
          SELECT pairs_raw, pairs_guarded,
                 (pairs_guarded * 1000000) // pairs_raw AS kept_ppm
          FROM t"""
  )
}
