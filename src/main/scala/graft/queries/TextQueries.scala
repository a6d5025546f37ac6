package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Text-analysis operators over `documents` — the LLM-pipeline text
  * slice: token statistics, a marker-word language-ID heuristic,
  * quality scoring, and rolling-hash document fingerprinting.
  *
  * Every output column is integer/boolean (ratios carried as scaled
  * integer pairs), so oracle parity is exact — no float rounding
  * surface. All queries are map-side per-document projections followed
  * by nothing heavier than a sort for determinism: embarrassingly
  * parallel at any scale, no shuffle except the final presentation
  * ORDER BY.
  */
object TextQueries {

  /** q145's deterministic split gate: salted md5 bucket in [0, 100) as
    * a pure function of a doc-id column (the q41 trick — stable under
    * re-runs, a doc never migrates splits when the corpus grows).
    * `private[graft]` because q215's leakage audit (DedupQueries)
    * labels pair ends with the SAME gate — sharing one definition
    * means the audited split can never silently drift from the split
    * q145 actually ships. */
  private[graft] def splitBucket(c: String): Column = expr(
    s"pmod(cast(conv(substring(md5(concat('split:', cast($c as string))), 1, 15), 16, 10) as bigint), 100)")

  /** The 80/10/10 split name over [[splitBucket]]. */
  private[graft] def splitName(c: String): Column =
    when(splitBucket(c) < 80, "train")
      .when(splitBucket(c) < 90, "valid")
      .otherwise("test")

  /** Normalized text + word array, shared by all queries. */
  private def withWords(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).as("t"))
      .withColumn("words", split(col("t"), " "))

  /** Word-initial character-bigram profiles for the language-ID
    * heuristic: score = how many word-initial bigrams fall in the
    * language's profile set, predicted = deterministic argmax. A real
    * deployment learns full n-gram profiles from labeled corpora; the
    * operator shape (n-gram extraction → per-language profile score →
    * argmax) is exactly this. Word-initial grams keep the pass at one
    * gram per token instead of one per character (an all-positions
    * scan measured 17 s at sf0.1 in the interpreted HOF). */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "he", "va", "ue"),
    "fr" -> Seq("qu", "wi", "li", "ne"),
    "de" -> Seq("ag", "ha", "so", "rt"),
    "es" -> Seq("da", "ro", "st", "ea"),
    "zh" -> Seq("jo", "ba", "me", "rg"))

  private def inSet(grams: Seq[String]): String =
    grams.map("'" + _ + "'").mkString(",")

  /** The eval-split overlap probe shared by q55/q59/q60: (doc_id,
    * span) rows where a corpus document's k-word shingle appears in
    * the eval split's shingle set. The eval side is tiny at any
    * corpus size (benchmarks are MBs) so it BROADCASTS; the corpus
    * probe is map-local. */
  private def evalOverlap(s: SparkSession, d: String, k: Int): DataFrame = {
    val sh = withWords(s, d)
      .select(col("doc_id"), graft.Functions.word_shingles(col("t"), k).as("spans"))
    val ev = sh.filter(col("doc_id") % 97 === 0)
      .select(explode(col("spans")).as("span")).distinct()
    sh.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), explode(col("spans")).as("span"))
      .join(broadcast(ev), Seq("span"))
  }

  /** DuckDB mirror of [[evalOverlap]] + per-doc hit counts. */
  private def decontamOracle(k: Int): String =
    s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
        w AS (SELECT doc_id, string_split(t, ' ') words FROM n),
        sh AS (SELECT doc_id,
                 list_distinct(list_transform(range(1, len(words)-${k - 2}),
                   i -> array_to_string(words[i:i+${k - 1}], ' '))) spans
               FROM w WHERE len(words) >= $k),
        ev AS (SELECT DISTINCT unnest(spans) span FROM sh WHERE doc_id % 97 = 0),
        corp AS (SELECT doc_id, unnest(spans) span FROM sh WHERE doc_id % 97 <> 0)
        SELECT corp.doc_id, count(*) AS n_hits
        FROM corp JOIN ev ON corp.span = ev.span
        GROUP BY corp.doc_id ORDER BY corp.doc_id"""

  /** DuckDB rendering of the score the native `bigram_scores`
    * expression computes Spark-side (one pass, all profiles). */
  private def scoreDuck(grams: Seq[String]): String =
    s"""len(list_filter(list_transform(words, w -> w[1:2]),
          b -> b in (${inSet(grams)})))"""

  /** Deterministic 64-bucket hashed-unigram weight vector for the
    * q84 model gate: md5-derived uniforms in [-0.5, 0.5) — the same
    * trick as the LSH planes, so the oracle re-derives bit-identical
    * doubles. Stands in for trained classifier weights. */
  private val qmWeights: Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 64).map { k =>
      val hex = md.digest(s"w,$k".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 6), 16) / 16777216.0d - 0.5d
    }
  }

  /** The hashed-linear model score over a `words` array column — the
    * ONE definition of the q84 scoring convention (64 md5-derived
    * buckets, [[qmWeights]], left-fold sum: the IEEE order every
    * oracle replays). All quality-model consumers (q84/q105/q114/
    * q116/q127/q226/q234/q236) go through here; quantization
    * (floor·1000 etc.) stays at the call site. */
  private def qmScore(words: Column): Column = {
    val wlit = typedLit(qmWeights)
    val bucket: Column => Column = w =>
      (pmod(conv(substring(md5(w), 1, 15), 16, 10).cast(LongType), lit(64L))
        + lit(1L)).cast(IntegerType)
    aggregate(transform(words, w => element_at(wlit, bucket(w))),
      lit(0.0), (acc, x) => acc + x)
  }

  /** Sequence packing into fixed-size concatenation bins, the
    * pretraining batch-assembly step. pack_id = (greatest(cum,1) − 1)
    * div binChars over the (n_chars DESC, doc_id) longest-first order
    * — contiguous fill, exact integers (greatest keeps the dividend
    * non-negative: Spark `div` truncates toward zero while DuckDB `//`
    * floors, so a −1 dividend would diverge; with greatest both
    * engines compute the same non-negative quotient).
    *
    * nShards is the skew control: with nShards = 1 the window key is
    * `lang` alone (the reference semantics; fine at test SF, but a
    * ~half-English corpus puts half the rows in ONE prefix-sum task
    * at 100 TB). With nShards > 1 the key is (lang, shard) where
    * shard = md5-prefix(doc_id) % nShards — the q41 oracle-replayable
    * hash gate, identical in Spark and DuckDB — and pack ids are
    * offset per shard (local·nShards + shard): globally unique per
    * lang, deterministic under any partitioning, and each packing
    * stream is 1/nShards of its language. Bins of shard s are only
    * ever filled from shard s — the packs differ from the nShards = 1
    * assignment, which is fine: packing is an assembly policy, not a
    * per-row semantic. */
  def packBins(docs: DataFrame, binChars: Long, nShards: Int): DataFrame = {
    require(binChars > 0 && nShards >= 1, s"packBins: bad ($binChars, $nShards)")
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("shard",
        if (nShards == 1) lit(0L)
        else expr("pmod(cast(conv(substring(md5(cast(doc_id as string)), 1, 15), " +
          s"16, 10) as bigint), $nShards)"))
    val keys = if (nShards == 1) Seq(col("lang")) else Seq(col("lang"), col("shard"))
    val w = Window.partitionBy(keys: _*)
      .orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("cum", sum(col("n_chars")).over(w))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        (expr(s"(greatest(cum, 1) - 1) div $binChars") * lit(nShards.toLong)
          + col("shard")).as("pack_id"))
      .orderBy("lang", "pack_id", "doc_id")
  }

  /** Merge rounds for the trained-BPE queries (q86/q87). Small enough
    * to unroll in the oracle, large enough that multi-character
    * symbols re-merge (real BPE dynamics). */
  private val bpeRounds = 6

  /** DuckDB replay of `graft.ops.Bpe.train(vocab, rounds)`: the
    * vocab + initial symbol table prefix, then per round — pair
    * counts (m/pc), argmax (b$k, exact-integer (n DESC, lhs, rhs)
    * tie-break as a scalar subquery), and the leftmost-greedy merge
    * (c/r/g/e/f → s${k+1}) — the IDENTICAL window algebra as
    * `Bpe.applyMerge`, so every round is bit-equal in both engines.
    * Leaves b0..b${rounds-1} (the merge rules) and s$rounds (the
    * tokenized vocabulary) bound. */
  private def bpeCtes(rounds: Int): String = {
    val prefix =
      s"""n AS (SELECT doc_id, $normDuck t FROM documents),
          wd AS (SELECT string_split(t, ' ') words FROM n),
          v AS (SELECT u AS w, count(*) freq
                FROM (SELECT unnest(words) u FROM wd) GROUP BY 1),
          sp AS (SELECT w, freq, unnest(range(1, length(w) + 1)) pos FROM v),
          s0 AS (SELECT w, freq, pos, w[pos:pos] sym FROM sp)"""
    val rs = (0 until rounds).map { k =>
      s"""m$k AS (SELECT w, freq, pos, sym,
                 lead(sym) OVER (PARTITION BY w ORDER BY pos) nxt FROM s$k),
          pc$k AS (SELECT sym lhs, nxt rhs, sum(freq) n FROM m$k
                   WHERE nxt IS NOT NULL GROUP BY 1, 2),
          b$k AS (SELECT lhs, rhs, CAST(n AS BIGINT) n FROM pc$k
                  ORDER BY n DESC, lhs, rhs LIMIT 1),
          c$k AS (SELECT *, (sym = (SELECT lhs FROM b$k)
                         AND nxt = (SELECT rhs FROM b$k)) cand FROM m$k),
          r$k AS (SELECT *, CASE WHEN cand AND NOT coalesce(
                    lag(cand) OVER (PARTITION BY w ORDER BY pos), false)
                    THEN pos END st FROM c$k),
          g$k AS (SELECT *, max(st) OVER (PARTITION BY w ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) runstart
                  FROM r$k),
          e$k AS (SELECT *, (cand AND (pos - runstart) % 2 = 0) selhere FROM g$k),
          f$k AS (SELECT *, coalesce(lag(selhere) OVER
                    (PARTITION BY w ORDER BY pos), false) selprev FROM e$k),
          s${k + 1} AS (SELECT w, freq,
                   row_number() OVER (PARTITION BY w ORDER BY pos) pos,
                   CASE WHEN selhere THEN sym || nxt ELSE sym END sym
                 FROM f$k WHERE NOT selprev)"""
    }.mkString(",\n          ")
    s"$prefix,\n          $rs"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting + length stats: whitespace tokens, a BPE-ish
    // tokenization (letter runs + single digits — the subword-style
    // split), distinct types, word-char total, longest token. All
    // integers, fused into ONE native byte pass (text_stats) — the
    // regexp_count / array_distinct / per-word HOF max formulation
    // was four interpreted passes over the same text.
    // Sequence packing — the pretraining batch-assembly step: fill
    // fixed-size concatenation bins (4096 chars) with documents,
    // longest-first, one packing stream PER LANGUAGE. nShards = 1 is
    // the reference semantics pin; q80 is the de-skewed scale form.
    "q79_packing" -> ((s, d) => packBins(Tables.documents(s, d), 4096L, 1)),

    // Sharded sequence packing — the 100 TB form of q79. A real
    // pretraining corpus is ~half one language, so a lang-only window
    // key sends half the rows through ONE prefix-sum task; here the
    // window key is (lang, shard) with shard = md5-gate(doc_id) % 8
    // (the q41 oracle-replayable hash), so every packing stream is
    // 1/nShards of its language and stays executor-local. pack_id is
    // offset per shard (local*nShards + shard) — globally unique per
    // lang, deterministic under any partitioning.
    "q80_packing_sharded" -> ((s, d) => packBins(Tables.documents(s, d), 4096L, 8)),

    // Deletion blast radius on the PACKED artifact — q262's tombstone
    // set (same 'tomb:' md5 gate, ~2%) intersected with q80's sharded
    // pack assignment: every pack that holds ≥1 tombstoned document
    // must be re-assembled (a packed sequence is a concatenation — you
    // can't hole-punch it), so the repack plan lists, per touched
    // pack, the docs/chars deleted and the survivor mass that gets
    // re-packed. With a ~2% deletion rate and ~3-doc packs the plan
    // touches ~6% of packs — the table that turns "delete these docs"
    // into a bounded rewrite instead of a full re-pack. Scale shape:
    // the pack manifest at 100 TB is a LANDED artifact (q80 defines
    // it; here it's recomputed inline because oracle queries are
    // self-contained), and the aggregate ships only (lang, pack_id,
    // 4 longs) per pack with map-side partial agg — document text
    // never moves; the HAVING-style n_del filter prunes untouched
    // packs before the presentation sort.
    "q263_repack_plan" -> ((s, d) => {
      val del = expr(
        "pmod(cast(conv(substring(md5(concat('tomb:', cast(doc_id as string))), " +
          "1, 15), 16, 10) as bigint), 50) = 0")
      packBins(Tables.documents(s, d), 4096L, 8)
        .withColumn("del", del)
        .groupBy("lang", "pack_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("del").cast(LongType)).as("n_del"),
          sum(when(col("del"), col("n_chars")).otherwise(lit(0L))).as("chars_del"),
          sum(when(!col("del"), col("n_chars")).otherwise(lit(0L))).as("chars_left"))
        .filter(col("n_del") >= 1)
        .orderBy("lang", "pack_id")
    }),

    // Pack ASSEMBLY — the step after q79/q80: turn pack assignments
    // into the actual concatenated training sequences (newline-joined,
    // in packing order). The only data movement is each document
    // riding ONE shuffle keyed by its pack — collect_list keeps
    // map-side partial aggregation, and a pack is ≤ binChars + one
    // document by construction, so per-group state is bounded. Output
    // pins the assembled bytes by md5 + length (the comparator hashes
    // scalars; the sequences themselves would be the written output).
    // Deterministic training-order shuffle — the step between
    // curation and packing every pretraining run performs: an order
    // the trainer reads that is (a) uniform-random-looking, (b)
    // seeded and reproducible, (c) stable under append (a doc's
    // (shard, pos) depends only on its id, never on arrival order or
    // partitioning), (d) produced WITHOUT a global sort. Shard =
    // salted-md5 mod 32 (hash-balanced); position = rank of the
    // salted hash within the shard via DistributedRank — 32 shards
    // through a plain window would collapse the corpus onto 32
    // tasks, the exact few-group shape the rank engine exists for.
    "q184_shuffle" -> ((s, d) => {
      val salted = expr(
        "cast(conv(substring(md5(concat(cast(doc_id as string), ':shuffle-seed-42')), 1, 15), 16, 10) as bigint)")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), salted.as("h"))
        .withColumn("shard", pmod(col("h"), lit(32L)))
      graft.ops.DistributedRank.rowNumber(docs, "pos",
          Seq("shard"), Seq(col("h"), col("doc_id")))
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("shard", "pos")
    }),

    "q83_pack_assembly" -> ((s, d) => {
      val packs = packBins(Tables.documents(s, d), 4096L, 1)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("pack_id"))
      val texts = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val assembled = array_join(
        transform(
          array_sort(collect_list(struct(
            (-col("n_chars")).as("k1"), col("doc_id").as("k2"),
            col("text").as("t")))),
          x => x.getField("t")),
        "\n")
      packs.join(texts, "doc_id")
        .groupBy("lang", "pack_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          md5(assembled).as("pack_md5"), length(assembled).as("pack_len"))
        .select(col("lang"), col("pack_id"), col("n_docs"), col("sum_chars"),
          col("pack_md5"), col("pack_len").cast(LongType).as("pack_len"))
        .orderBy("lang", "pack_id")
    }),

    "q17_text" -> ((s, d) => {
      withWords(s, d)
        .select(col("doc_id"), graft.Functions.text_stats(col("t")).as("st"))
        .select(col("doc_id"), col("st.n_tokens").as("n_tokens"),
          col("st.n_bpe").as("n_bpe"), col("st.n_types").as("n_types"),
          col("st.n_wordchars").as("n_wordchars"), col("st.max_tok").as("max_tok"))
        .orderBy("doc_id")
    }),

    // Language-ID: marker-word score per language, deterministic
    // first-wins argmax (en > fr > de > es > zh on ties). ONE native
    // pass over the words for all five profiles (bigram_scores) —
    // the per-language size(filter(transform(...))) HOF chains were
    // interpreted, five passes per doc.
    "q24_lang" -> ((s, d) => {
      val spec = markers.map(_._2.mkString(",")).mkString(";")
      val scored = withWords(s, d)
        .withColumn("sc", graft.Functions.bigram_scores(col("words"), spec))
      val Seq(en, fr, de, es, zh) =
        (1 to markers.length).map(i => element_at(col("sc"), i))
      scored.select(
        col("doc_id"),
        en.as("s_en"), fr.as("s_fr"), de.as("s_de"), es.as("s_es"), zh.as("s_zh"),
        when(en >= fr && en >= de && en >= es && en >= zh, "en")
          .when(fr >= de && fr >= es && fr >= zh, "fr")
          .when(de >= es && de >= zh, "de")
          .when(es >= zh, "es")
          .otherwise("zh").as("predicted"))
        .orderBy("doc_id")
    }),

    // Quality scoring: length gate, stopword-ratio gate, scaled mean
    // token length, composite score — integers only.
    "q25_quality" -> ((s, d) => {
      withWords(s, d)
        .select(col("doc_id"),
          size(col("words")).cast(LongType).as("n_tokens"),
          length(regexp_replace(col("t"), " ", "")).cast(LongType).as("n_wordchars"),
          expr("size(filter(words, w -> w in ('the', 'a')))").cast(LongType).as("n_stop"))
        .select(
          col("doc_id"), col("n_tokens"), col("n_stop"),
          (col("n_tokens") >= 30).as("len_ok"),
          (col("n_stop") * 10 <= col("n_tokens")).as("stop_ok"),
          expr("(n_wordchars * 100) div n_tokens").as("mean_tok_len_x100"),
          (when(col("n_tokens") >= 30, 1L).otherwise(0L)
            + when(col("n_stop") * 10 <= col("n_tokens"), 1L).otherwise(0L)
            + when(expr("(n_wordchars * 100) div n_tokens").between(300, 800), 1L)
              .otherwise(0L)).as("quality_score"))
        .orderBy("doc_id")
    }),

    // Model-based quality scoring — the fastText-style hashed linear
    // classifier a curation stack runs AFTER the heuristic gates
    // (q25): score = Σ_word weight[md5-bucket(word)] over hashed
    // unigram features, keep iff score > 0. Hashed features mean NO
    // vocabulary table and no shuffle — the whole model is 64 doubles
    // riding the plan as a literal (a production model is ~2M floats:
    // still a broadcast, same shape). Map-only; the left-to-right
    // aggregate keeps the float sum order engine-portable (the q16
    // pattern). Weights here are md5-derived stand-ins: deterministic
    // and re-derivable in the oracle, exactly like the LSH planes.
    "q84_quality_model" -> ((s, d) => {
      withWords(s, d)
        .select(col("doc_id"), size(col("words")).cast(LongType).as("n_tokens"),
          qmScore(col("words")).as("score"))
        .select(col("doc_id"), col("n_tokens"), col("score"),
          (col("score") > 0).as("kept"))
        .orderBy("doc_id")
    }),

    // Per-language CALIBRATED quality gate — the fairness fix for
    // model-based filters (a raw global threshold over-filters
    // whatever the model under-scores, classically non-English):
    // each language keeps its own top 60% by q84's hashed-linear
    // score, so the cut is a per-stratum percentile, not an absolute
    // score. rank·10 ≤ n_l·6 is the percentile test in exact integer
    // form; ranking ties break on doc_id, so the kept set is
    // engine-identical (scores are IEEE-identical by the q84 fold
    // discipline). Both windows share ONE lang exchange. At 100 TB
    // the full per-lang rank graduates to the q92 histogram sketch:
    // estimate each language's 60th-percentile score from mergeable
    // 64-bin sketches, then gate map-only against the threshold —
    // same decision, no corpus-wide rank.
    "q114_calib_quality" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wRank = Window.partitionBy("lang").orderBy(desc("score"), col("doc_id"))
      val wCnt = Window.partitionBy("lang")
      withWords(s, d)
        .select(col("doc_id"), col("lang"),
          qmScore(col("words")).as("score"))
        .withColumn("rn", row_number().over(wRank))
        .withColumn("n_l", count(lit(1)).over(wCnt))
        .select(col("doc_id"), col("lang"), col("score"),
          (col("rn") * 10 <= col("n_l") * 6).as("kept"))
        .orderBy("doc_id")
    }),

    // Bigram continuation table — the n-gram-LM build step (KenLM's
    // count stage): for every frequent head word, its top-3 next
    // words by count. Decides nothing by itself but feeds smoothing,
    // autocomplete, and the q45-style repetition analysis. Scale
    // shape: (w1, w2) counts partial-agg map-side; the head-total
    // filter is a second groups-sized aggregate joined back; the
    // top-3 rides WindowGroupLimit (≤3 rows per head per map task
    // before the exchange) — never a per-head sort of the vocabulary.
    "q134_nextword" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val pairs = Tables.documents(s, d)
        .select(split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " ")
          .as("words"))
        .filter(size(col("words")) >= 2)
        .select(explode(expr(
          "transform(slice(words, 1, size(words)-1), (w, i) -> struct(w as w1, element_at(words, i+2) as w2))"))
          .as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      val cnt = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
      val heads = cnt.groupBy("w1").agg(sum(col("n")).as("tot"))
        .filter(col("tot") >= 50)
      val w = Window.partitionBy("w1").orderBy(desc("n"), col("w2"))
      cnt.join(heads, "w1")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("w1"), col("w2"), col("n"), col("tot"),
          col("rn").cast(LongType).as("rn"))
        .orderBy("w1", "rn")
    }),

    // PMI collocations — pointwise mutual information over adjacent
    // word pairs (Church & Hanks 1990), the collocation-mining staple
    // that surfaces multiword units ("new york") frequency alone
    // buries. Exact-integer surface: pmi ≈ floor-log2(c_xy·N) −
    // floor-log2(c_x·c_y) via length(bin(·)) — the q106/q120 trick,
    // engine-portable with no float log; c_xy ≥ 20 suppresses hapax
    // noise (classic PMI pathology). Scale shape: bigram and unigram
    // count tables partial-agg map-side; the two unigram joins key on
    // the term (vocab-sized sort-merge — the right shape when both
    // sides are vocab-scale); N broadcasts; final = top-30
    // TakeOrderedAndProject.
    "q135_pmi" -> ((s, d) => {
      val words = Tables.documents(s, d)
        .select(split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " ")
          .as("words"))
        .filter(size(col("words")) >= 2)
      val pairs = words
        .select(explode(expr(
          "transform(slice(words, 1, size(words)-1), (w, i) -> struct(w as w1, element_at(words, i+2) as w2))"))
          .as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      val bg = graft.ops.Barrier(pairs.groupBy("w1", "w2").agg(count(lit(1)).as("nxy")))
      val uni = graft.ops.Barrier(
        pairs.select(col("w1").as("t")).union(pairs.select(col("w2").as("t")))
          .groupBy("t").agg(count(lit(1)).as("c")))
      val tot = bg.agg(sum(col("nxy")).as("nn"))
      bg.filter(col("nxy") >= 20)
        .join(uni.toDF("w1", "cx"), "w1")
        .join(uni.toDF("w2", "cy"), "w2")
        .crossJoin(broadcast(tot))
        .select(col("w1"), col("w2"), col("nxy"), col("cx"), col("cy"),
          (length(bin(col("nxy") * col("nn")))
            - length(bin(col("cx") * col("cy")))).cast(LongType).as("pmi_l2"))
        .orderBy(desc("pmi_l2"), desc("nxy"), col("w1"), col("w2"))
        .limit(30)
    }),

    // Term-frequency spectrum — the Good-Turing view of each source's
    // vocabulary (hapax/dis legomena and the tail): singleton-heavy
    // sources are noisy (OCR junk, random ids), singleton-poor ones
    // are templated; hapax share also estimates unseen-type mass
    // (Good-Turing's n1/N). Two-level aggregate: (source, term)
    // counts partial-agg map-side, then a sources-sized spectrum
    // rollup — the exchange carries the per-source vocabulary once,
    // and the spectrum itself is 5 longs per source.
    "q133_spectrum" -> ((s, d) => {
      val counts = Tables.documents(s, d)
        .select(col("source"),
          explode(split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " "))
            .as("term"))
        .filter(col("term") =!= "")
        .groupBy("source", "term").agg(count(lit(1)).as("cnt"))
      counts.groupBy("source")
        .agg(count(lit(1)).as("vocab"),
          sum(col("cnt")).as("tokens"),
          sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("hapax"),
          sum(when(col("cnt") === 2, 1L).otherwise(0L)).as("dis"),
          sum(when(col("cnt") >= 3, 1L).otherwise(0L)).as("rest"))
        .select(col("source"), col("vocab"), col("tokens"), col("hapax"),
          col("dis"), col("rest"),
          expr("(hapax * 1000000) div vocab").as("hapax_ppm"))
        .orderBy("source")
    }),

    // Corpus snapshot diff — the change-data-capture audit a weekly
    // corpus rebuild publishes: content-hash FULL OUTER JOIN of two
    // snapshots → per-source added/removed/changed/unchanged counts.
    // Snapshots here are deterministic slices of the one test table
    // (old = id%7≠0, new = id%5≠0 with id%11=0 content revised) so
    // every status is populated and the oracle replays exactly; in
    // production the inputs are two partitioned table versions.
    // Scale shape: the join carries (id, source, 32-hex hash) — text
    // never shuffles; snapshot tables bucketed by doc_id make the
    // full-outer exchange-free (demonstrated: BucketingSpec's
    // "bucketed snapshots full-outer join with zero exchange"), and
    // the result aggregate is sources×4-sized with map-side combine.
    "q129_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("text"))
      val old = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), col("source").as("src_o"),
          md5(col("text").cast(BinaryType)).as("h_old"))
      val neu = docs.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"), col("source").as("src_n"),
          md5(when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).cast(BinaryType)).as("h_new"))
      old.join(neu, Seq("doc_id"), "full_outer")
        .select(coalesce(col("src_o"), col("src_n")).as("source"),
          when(col("h_old").isNull, "added")
            .when(col("h_new").isNull, "removed")
            .when(col("h_old") =!= col("h_new"), "changed")
            .otherwise("unchanged").as("status"))
        .groupBy("source", "status").agg(count(lit(1)).as("n"))
        .orderBy("source", "status")
    }),

    // Weighted sampling without replacement — sequential Poisson
    // sampling (Ohlsson, "Sequential Poisson Sampling", J. Official
    // Statistics 1998; the πps design behind size-weighted corpus
    // subsampling): priority = u/w with u uniform, keep the k
    // smallest per stratum — inclusion probability ∝ weight, here
    // n_chars (longer docs carry more tokens). Deterministic exact
    // form: u is the q41/q95 md5-ppm hash gate and the priority is
    // the scaled integer (u·10^12) div w (u < 2^20, so the product
    // sits far below 2^63), ties broken by doc_id — the sample
    // replays bit-for-bit on any engine. Scale shape: the rank
    // window rides WindowGroupLimit (≤ k rows per lang per map task
    // BEFORE the exchange, the q62 discipline) so the shuffle is
    // O(langs × k) at any corpus size.
    "q128_wsample" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang").orderBy(col("pkey"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("u_ppm",
          pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast(LongType), lit(1000000L)))
        .withColumn("pkey", expr("(u_ppm * 1000000000000) div n_chars"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("u_ppm"), col("pkey"), col("rn").cast(LongType).as("rn"))
        .orderBy("lang", "rn")
    }),

    // Per-language quality DECILES — the reporting form of q114's
    // calibration: instead of one keep/drop cut, every document gets
    // its within-language decile by model score (ntile(10) over the
    // same deterministic (score DESC, doc_id) order), the table a
    // curation team reads to pick thresholds and a sampler (q105)
    // consumes as tier labels. ntile's even-split semantics are
    // engine-portable given a total order, and scores are
    // IEEE-identical by the q84 fold discipline, so the assignment
    // hash-matches. One lang exchange (same window family as q114);
    // the q116 histogram sketch remains the no-rank scale path.
    "q127_deciles" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wRank = Window.partitionBy("lang").orderBy(desc("score"), col("doc_id"))
      withWords(s, d)
        .select(col("doc_id"), col("lang"),
          qmScore(col("words")).as("score"))
        .withColumn("decile", ntile(10).over(wRank).cast(LongType))
        .orderBy("doc_id")
    }),

    // q114's 100 TB SCALE VARIANT in code (the q79→q80 discipline:
    // the documented scale path must exist as an implemented,
    // oracle-gated surface): instead of ranking every document inside
    // a per-lang window (en ≈ half a real corpus → one straggler
    // task), the per-lang 40th-percentile score threshold comes off a
    // MERGEABLE 64-bin histogram sketch (hist_agg over the ×1000
    // integer-quantized score, the q92 kernel — 64 longs per lang
    // cross the wire), and the gate is a MAP-ONLY bucket compare
    // against the broadcast threshold table. Keep-fraction carries
    // bucket-width error (≤ one bin) — the documented sketch
    // trade-off; decisions replay exactly because every step is
    // integer arithmetic over IEEE-identical scores.
    "q116_calib_sketch" -> ((s, d) => {
      val scored = graft.ops.Barrier(withWords(s, d)
        .select(col("doc_id"), col("lang"),
          qmScore(col("words")).as("score"))
        .withColumn("sq", floor(col("score") * 1000).cast(LongType)))
      val th = scored.groupBy("lang")
        .agg(graft.Functions.hist_agg(col("sq"), -4000L, 4000L, 64).as("hist"))
        .withColumn("n", expr("aggregate(hist, 0L, (a, x) -> a + x)"))
        // smallest bucket whose running count reaches ceil(0.4·n):
        // everything strictly above it is kept (top ≤60% per lang)
        .withColumn("b40", expr(
          """array_min(filter(sequence(0, 63), b ->
             aggregate(slice(hist, 1, b + 1), 0L, (a, x) -> a + x)
               >= (2 * n + 4) div 5))"""))
        .select(col("lang"), col("b40"))
      scored.join(broadcast(th), "lang")
        .select(col("doc_id"), col("lang"), col("sq"),
          (expr("least(63L, greatest(0L, (sq + 4000) div 125))") > col("b40"))
            .as("kept"))
        .orderBy("doc_id")
    }),

    // Quality-weighted sampling — soft quality filtering (the
    // FineWeb/Gopher practice: DOWNSAMPLE low-quality strata instead
    // of dropping them, preserving diversity): q84's hashed-linear
    // score tiers each document (>0.5 → keep 100%, >0 → 50%, else
    // 10%), and the q41/q95 deterministic md5 hash gate applies the
    // tier's rate — reproducible, oracle-replayable, map-only
    // end-to-end (the model rides the plan as 64 literal doubles; the
    // gate needs no shuffle, no RNG state). Tier thresholds compare
    // IEEE-identical scores, so tiering is engine-exact.
    "q105_quality_sample" -> ((s, d) => {
      withWords(s, d)
        .select(col("doc_id"),
          qmScore(col("words")).as("score"))
        .select(col("doc_id"), col("score"),
          when(col("score") > 0.5d, 100L).when(col("score") > 0.0d, 50L)
            .otherwise(10L).as("keep_pct"))
        .withColumn("kept",
          pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast(LongType), lit(100L)) < col("keep_pct"))
        .orderBy("doc_id")
    }),

    // Unigram-LM surprisal filter — the CCNet/RedPajama "perplexity
    // bucket" gate with an exact-integer surface: the LM is the
    // corpus's own unigram counts, surprisal(w) = floor(log2 T) −
    // floor(log2 cnt(w)) computed as length(bin(x)) differences —
    // bin() renders identically in Spark and DuckDB, so the integer
    // log2 quantization is engine-portable with NO float log. kept =
    // doc's mean surprisal below the corpus mean, cross-multiplied
    // (surp·T < G·n) in DECIMAL(38,0)/HUGEINT so the products pass
    // Long at 100 TB token counts (q98's discipline). Scale shape:
    // ONE corpus explode feeds both the vocab count and the scoring
    // join (Barrier); the count shuffle is vocab-sized with map-side
    // combine; per-term surprisal is computed once per TERM (vocab
    // rows), not per token; global (G, T) is a broadcast 1-row frame.
    "q106_lm_filter" -> ((s, d) => {
      val wx = graft.ops.Barrier(withWords(s, d)
        .select(col("doc_id"), explode(col("words")).as("term")))
      val cnts = graft.ops.Barrier(
        wx.groupBy("term").agg(count(lit(1)).as("cnt")))
      val tot = cnts.agg(sum(col("cnt")).as("tt"))
      val surpT = cnts.crossJoin(broadcast(tot))
        .select(col("term"),
          (length(bin(col("tt"))) - length(bin(col("cnt"))))
            .cast(LongType).as("surp"))
      val perDoc = graft.ops.Barrier(wx.join(surpT, "term")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum(col("surp")).as("surp")))
      val glob = perDoc.agg(sum(col("surp")).as("gs"),
        sum(col("n_tokens")).as("gn"))
      val dec = DecimalType(38, 0)
      perDoc.crossJoin(broadcast(glob))
        .select(col("doc_id"), col("n_tokens"), col("surp"),
          (col("surp").cast(dec) * col("gn").cast(dec)
            < col("gs").cast(dec) * col("n_tokens").cast(dec)).as("kept"))
        .orderBy("doc_id")
    }),

    // Per-source lexical diversity — the corpus-health metric that
    // catches templated/spun content near-dup filters miss (a source
    // can be 0% duplicate yet use the same 200 bigrams everywhere):
    // bigram type-token ratio per source, exact integers + ppm. Scale
    // shape: the distinct count is the standard two-level aggregate —
    // partial distinct on (source, shingle) map-side, then a
    // source-keyed count — so the exchange carries distinct bigrams
    // per source, never the token stream; the 100 TB estimation path
    // is IMPLEMENTED as q131 (hll_agg over the same grouping:
    // sketches merge map-side, 64 bytes per source cross the wire).
    "q121_diversity" -> ((s, d) => {
      // ALL adjacent pairs, not the distinct set word_shingles builds
      // (TTR's denominator is occurrences): index-zipped transform
      // over the words array, exploded once.
      val sh = Tables.documents(s, d)
        .select(col("source"),
          split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " ")
            .as("words"))
        .filter(size(col("words")) >= 2)
        .select(col("source"), explode(expr(
          "transform(slice(words, 1, size(words)-1), (w, i) -> concat(w, ' ', element_at(words, i+2)))"))
          .as("sh"))
      sh.groupBy("source")
        .agg(count(lit(1)).as("n_bigrams"),
          countDistinct(col("sh")).as("n_distinct"))
        .select(col("source"), col("n_bigrams"), col("n_distinct"),
          expr("(n_distinct * 1000000) div n_bigrams").as("ttr_ppm"))
        .orderBy("source")
    }),

    // q121's 100 TB SCALE VARIANT (the q114→q116 / q79→q80
    // discipline: a documented scale path must exist as an
    // oracle-gated surface): the exact distinct-bigram count ranks a
    // (source, bigram)-keyed exchange whose payload grows with the
    // vocabulary; here the distinct count comes off the q102
    // HyperLogLog sketch instead — the per-source shuffle payload is
    // 64 one-byte registers + one long, CONSTANT at any corpus size.
    // The emitted register sum is exact-integer (oracle-replayable);
    // the estimate carries HLL's ~13% error at b=6 — the documented
    // sketch trade-off; q121 remains the exact form.
    "q131_diversity_sketch" -> ((s, d) => {
      val sh = Tables.documents(s, d)
        .select(col("source"),
          split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " ")
            .as("words"))
        .filter(size(col("words")) >= 2)
        .select(col("source"), explode(expr(
          "transform(slice(words, 1, size(words)-1), (w, i) -> concat(w, ' ', element_at(words, i+2)))"))
          .as("sh"))
        .select(col("source"),
          conv(substring(md5(col("sh")), 1, 15), 16, 10).cast(LongType).as("h"))
      sh.groupBy("source")
        .agg(count(lit(1)).as("n_bigrams"),
          graft.Functions.hll_agg(col("h"), 6).as("hll_s"))
        .select(col("source"), col("n_bigrams"), col("hll_s"),
          (lit(0.709d) * lit(4096.0d) * lit(3.6028797018963968e16d)
            / col("hll_s").cast("double")).as("est"))
        .orderBy("source")
    }),

    // Hashed importance resampling — the DSIR recipe (Xie et al.,
    // "Data Selection for Language Models via Importance Resampling",
    // NeurIPS 2023) in exact-integer form: score every raw document
    // by how much more likely its hashed-unigram features are under a
    // TARGET domain's distribution than under the raw corpus's own,
    // then keep documents that look like the target. Here the target
    // is the src0 slice (the curated-domain stand-in, as doc_id % 97
    // stands in for the eval split in q55); log-probabilities are
    // floor-log2 integers via length(bin(cnt+1)) — the q106 trick, so
    // weight = Σ_tokens [log2 p_t(b) − log2 p_r(b)] is an exact
    // integer both engines reproduce bit-for-bit (+1 is the Laplace
    // smoothing that keeps unseen buckets finite). Scale shape: ONE
    // token explode feeds both distributions (Barrier); the bucket
    // tables are 64 rows (hashing means NO vocabulary shuffle —
    // DSIR's own point); scoring is a broadcast join + partial-agg'd
    // per-doc sum. kept = w > 0, the deterministic resampling gate.
    "q120_dsir" -> ((s, d) => {
      val bucket: Column => Column = w =>
        pmod(conv(substring(md5(w), 1, 15), 16, 10).cast(LongType), lit(64L))
      val wx = graft.ops.Barrier(Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " ")
            .as("words"))
        .select(col("doc_id"), col("source"), explode(col("words")).as("term"))
        .withColumn("b", bucket(col("term")))
        .withColumn("is_t", (col("source") === "src0").cast(LongType)))
      val bc = graft.ops.Barrier(wx.groupBy("b").agg(
        sum(col("is_t")).as("ct"),
        sum(lit(1L) - col("is_t")).as("cr")))
      val tot = bc.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
      val wtab = bc.crossJoin(broadcast(tot))
        .select(col("b"),
          ((length(bin(col("ct") + 1)) - length(bin(col("cr") + 1)))
            + (length(bin(col("tr"))) - length(bin(col("tt")))))
            .cast(LongType).as("s"))
      wx.filter(col("is_t") === 0L)
        .join(broadcast(wtab), "b")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum(col("s")).as("w"))
        .select(col("doc_id"), col("n_tokens"), col("w"), (col("w") > 0L).as("kept"))
        .orderBy("doc_id")
    }),

    // Hashed bag-of-words retrieval (MIPS) — sparse-to-dense
    // featurization feeding the integer similarity stack WITHOUT an
    // embedding model: each document becomes a 16-long vector of
    // md5-hashed term-bucket counts (the q84 hashing trick, so no
    // vocabulary table and no shuffle to featurize), and retrieval is
    // maximum-inner-product over exact integer dot products against a
    // broadcast 1-row query vector (q49's ranking kernel). Map-only
    // featurize + TakeOrderedAndProject top-k; at scale the vectors
    // feed the q82 shape-signature buckets or vec_quant8 → IVF so the
    // scan visits candidate buckets only.
    "q107_bow_mips" -> ((s, d) => {
      // native one-pass featurize (graft.functions.BowCounts): one
      // digest per word straight off the byte buffer — the HOF chain
      // it replaces (16 filter lanes × interpreted md5/hex/conv per
      // word) was the whole 5.4 s q107 wall at sf0.1
      val vecs = graft.ops.Barrier(withWords(s, d)
        .select(col("doc_id"), graft.Functions.bow_counts(col("t"), 16).as("v")))
      val q = vecs.filter(col("doc_id") === 0).select(col("v").as("qv"))
      vecs.filter(col("doc_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("doc_id"),
          aggregate(zip_with(col("v"), col("qv"), (x, y) => x * y),
            lit(0L), (acc, x) => acc + x).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
    }),

    // BPE tokenizer training, step 1 — corpus-wide adjacent
    // character-pair frequencies (the argmax of this table IS the
    // next BPE merge). Collapse to the DISTINCT vocabulary first:
    // the big shuffle carries (word, freq) — vocab-sized, not
    // corpus-sized — pair generation then explodes over the vocab
    // only, and the pair aggregate + top-k ride tiny frames
    // (TakeOrderedAndProject). At 100 TB this is the only sane shape:
    // pair work scales with |vocab|, not tokens.
    "q85_bpe_pairs" -> ((s, d) => {
      val vocab = withWords(s, d)
        .select(explode(col("words")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
      vocab
        .filter(length(col("w")) >= 2)
        .select(col("freq"),
          explode(expr(
            "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
            .as("pair"))
        .groupBy("pair").agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(20)
    }),

    // TRAINED BPE merges — q85's pair statistic iterated into actual
    // merge rules (graft.ops.Bpe): 6 rounds of exact-integer pair
    // argmax + leftmost-greedy non-overlapping merge over the
    // DISTINCT vocabulary's symbol table. The corpus collapses to
    // (word, freq) once; every round after that is vocab-sized window
    // algebra plus a 1-row argmax collect (the Lloyd's-loop shape).
    // Deterministic under any partitioning, so the oracle replays all
    // 6 rounds verbatim as unrolled CTEs. Output = the merge-rule
    // table itself.
    "q86_bpe_train" -> ((s, d) => {
      val vocab = withWords(s, d)
        .select(explode(col("words")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
      val (merges, _) = graft.ops.Bpe.train(vocab, bpeRounds)
      s.createDataFrame(merges).orderBy("step")
    }),

    // BPE tokenization under the trained merges — the corpus token
    // table a tokenizer deploy actually produces. Tokenize the VOCAB
    // (the word-level cache every fast tokenizer uses: |vocab| words,
    // not |corpus| tokens), then corpus token frequencies fall out of
    // the freq weights already riding each word — no join back to the
    // corpus at all. Top-30 tokens, exact integer counts.
    "q87_bpe_tokens" -> ((s, d) => {
      val vocab = withWords(s, d)
        .select(explode(col("words")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
      val (_, toks) = graft.ops.Bpe.train(vocab, bpeRounds)
      toks.groupBy(col("sym").as("token")).agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(30)
    }),

    // Tokenizer FERTILITY by language — the metric tokenizer-fairness
    // decisions actually quote (tokens-per-word by language; a
    // tokenizer trained on skewed data inflates minority-language
    // sequence lengths and training cost): the q86/q87 trained-BPE
    // pipeline evaluated per stratum. Tokenizer trains ONCE on the
    // corpus-global vocab (as deployed); per-word token counts come
    // off the |vocab|-sized symbol table; the only corpus-sized work
    // is the (lang, word) usage count — partial-agg'd, vocab×langs
    // shuffle. fert_ppm is exact-integer tokens-per-word ×1e6.
    "q115_fertility" -> ((s, d) => {
      val vocab = withWords(s, d)
        .select(explode(col("words")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
      val (_, toks) = graft.ops.Bpe.train(vocab, bpeRounds)
      val tokCount = toks.groupBy("w").agg(count(lit(1)).as("nt"))
      val lw = withWords(s, d)
        .select(col("lang"), explode(col("words")).as("w"))
        .groupBy("lang", "w").agg(count(lit(1)).as("f"))
      lw.join(tokCount, "w")
        .groupBy("lang")
        .agg(sum(col("f")).as("n_words"),
          sum(col("f") * col("nt")).as("n_tokens"))
        .select(col("lang"), col("n_words"), col("n_tokens"),
          expr("(n_tokens * 1000000) div n_words").as("fert_ppm"))
        .orderBy("lang")
    }),

    // Document fingerprint: 31-polynomial rolling hash of the
    // normalized text mod 2^31-1 (full doc + 64-char prefix), via the
    // native codegen expression (the HOF-per-char formulation is
    // interpreted and ~10× slower).
    "q26_fingerprint" -> ((s, d) => {
      withWords(s, d).select(
        col("doc_id"),
        graft.Functions.rolling_hash(col("t")).as("fp"),
        graft.Functions.rolling_hash(substring(col("t"), 1, 64)).as("fp_prefix"))
        .orderBy("doc_id")
    }),

    // Repetition filtering — the Gopher/C4-style gate against
    // templated/boilerplate text: duplicate-word fraction and
    // top-word/top-bigram concentration, all integers, from ONE
    // native pass (repetition_stats). Map-only: the explode +
    // groupBy(doc, token) alternative shuffles a row per TOKEN.
    // rep_ok mirrors the published thresholds in spirit: ≤30%
    // duplicate words and the dominant bigram ≤20% of all bigrams.
    "q45_repetition" -> ((s, d) => {
      withWords(s, d)
        .select(col("doc_id"), graft.Functions.repetition_stats(col("t")).as("r"))
        .select(col("doc_id"),
          col("r.n_words").as("n_words"),
          col("r.n_types").as("n_types"),
          col("r.top_word_n").as("top_word_n"),
          col("r.top_bigram_n").as("top_bigram_n"))
        .select(col("doc_id"), col("n_words"), col("n_types"),
          col("top_word_n"), col("top_bigram_n"),
          expr("(100 * (n_words - n_types)) div n_words").as("dup_word_pct"),
          ((col("n_words") - col("n_types")) * 100 <= col("n_words") * 30
            && col("top_bigram_n") * 100 <= greatest(col("n_words") - 1, lit(1L)) * 20)
            .as("rep_ok"))
        .orderBy("doc_id")
    }),

    // Repetition SCRUB — the rewrite counterpart of q45's gate:
    // collapse every run of consecutively repeated tokens to one
    // occurrence ("batch batch batch" → "batch"), the cheap
    // degenerate-repetition cleanup applied before tokenization (a
    // stuck generator or template expansion repeats in place; cross-
    // doc boilerplate is q89's job). One indexed filter HOF per row —
    // map-only, codegen'd, no shuffle; the cleaned text travels as an
    // md5 witness so the corpus-sized result stays 3 longs + 32 hex
    // chars per doc at any scale.
    "q241_rep_scrub" -> ((s, d) => {
      withWords(s, d)
        .select(col("doc_id"), col("words"),
          expr("filter(words, (x, i) -> i = 0 OR x != element_at(words, i))")
            .as("kept"))
        .select(col("doc_id"),
          size(col("words")).cast(LongType).as("n_words"),
          (size(col("words")) - size(col("kept"))).cast(LongType).as("n_removed"),
          md5(array_join(col("kept"), " ").cast(BinaryType)).as("scrub_md5"))
        .orderBy("doc_id")
    }),

    // Distinctive terms — TF-IDF's ranking with a float-free surface:
    // per doc, the top-3 terms ordered by (tf DESC, df ASC, term) —
    // exactly the tf·idf ordering for fixed tf since idf is monotone
    // decreasing in df, with integer-only outputs so the oracle
    // hash-matches. The corpus-statistics join shape at scale:
    // (doc, term) counts partial-aggregate map-side before the
    // shuffle; the document-frequency table aggregates distinct
    // (doc, term) pairs by term (and above ~1e6 vocab would take a
    // min-df cutoff and broadcast); ranking windows partition by
    // doc_id — never a global sort.
    "q46_terms" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wx = withWords(s, d)
        .select(col("doc_id"), explode(col("words")).as("term"))
      // ONE explode + ONE (doc, term) shuffle: df re-aggregates the
      // already-aggregated tf table (a (doc,term,tf) row exists iff
      // the doc contains the term), instead of a second corpus
      // explode + distinct shuffle. Barrier: tf feeds both df and the
      // ranking join.
      val tf = graft.ops.Barrier(wx.groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf")))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tf").desc, col("df").asc, col("term"))
      tf.join(df, "term")
        .withColumn("rnk", row_number().over(w).cast(LongType))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"))
        .orderBy("doc_id", "rnk")
    }),

    // Cross-document boilerplate spans — the C4-style "same span in
    // multiple documents" detector that feeds span-level scrubbing:
    // 3-word shingles (the native word_shingles3 set, so a span
    // counts once per doc) aggregated by span with map-side combine,
    // kept where ≥5 distinct docs share the span, top-20 by spread.
    // Scale shape: the only shuffle is the (span → count) partial
    // aggregation; TakeOrderedAndProject for the top-k — no global
    // sort, no row-per-token shuffle (distinct spans per doc, not
    // occurrences).
    "q47_spans" -> ((s, d) => {
      withWords(s, d)
        .select(col("doc_id"),
          explode(graft.Functions.word_shingles3(col("t"))).as("span"))
        .groupBy("span")
        .agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 5)
        .orderBy(col("n_docs").desc, col("span"))
        .limit(20)
    }),

    // Boilerplate SCRUB — q47's census applied as sub-document
    // dedup (the C4/RefinedWeb "remove repeated spans" op): any word
    // covered by a 3-word span that ≥5 distinct docs share is
    // removed, and the scrubbed text is pinned by md5. Fully
    // DISTRIBUTED — no driver collect anywhere (an earlier IN-set
    // literal formulation capped the dictionary at 10k spans and
    // fell over when a corpus regen produced 25k): (1) the q47
    // census (span → doc count, map-side combined, vocab-of-spans
    // sized); (2) positional spans from each doc joined against the
    // broadcast frequent-span table — matches explode to the ≤3
    // covered word positions and collapse to one position-set per
    // doc (bounded by doc length); (3) a map-side scrub probing
    // that set. Shuffles: the census (span-keyed), the match
    // collapse + rejoin (doc_id-keyed). At dictionary sizes beyond
    // broadcast, drop the hint — same plan with a shuffle join on
    // span; scan cost never depends on dictionary size.
    "q89_boiler_scrub" -> ((s, d) => {
      val freq = withWords(s, d)
        .select(col("doc_id"),
          explode(graft.Functions.word_shingles3(col("t"))).as("span"))
        .groupBy("span").agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 5)
        .select("span")
      // positional 3-word spans (start index i covers words i..i+2);
      // word_shingles3 is the distinct SET (census-side), so the
      // positional stream comes straight off the words array
      val cov = withWords(s, d)
        .select(col("doc_id"), col("words"))
        .filter(size(col("words")) >= 3)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, size(words) - 3), i ->
             struct(i AS i, concat_ws(' ', words[i], words[i+1], words[i+2]) AS span))"""))
          .as("x"))
        .select(col("doc_id"), col("x.i").as("i"), col("x.span").as("span"))
        .join(broadcast(freq), "span")
        .select(col("doc_id"), explode(sequence(col("i"), col("i") + 2)).as("p"))
        .groupBy("doc_id").agg(collect_set(col("p")).as("cov"))
      withWords(s, d)
        .select(col("doc_id"), col("words"))
        .join(cov, Seq("doc_id"), "left")
        .withColumn("clean",
          expr("filter(words, (x, p) -> cov IS NULL OR NOT array_contains(cov, p))"))
        .select(col("doc_id"),
          size(col("words")).cast(LongType).as("n_words"),
          (size(col("words")) - size(col("clean"))).cast(LongType).as("n_removed"),
          md5(expr("array_join(clean, ' ')").cast(BinaryType)).as("scrub_md5"))
        .orderBy("doc_id")
    }),

    // Repeated long-span audit — exact substring-level dedup signal
    // (the Lee et al. "Deduplicating Training Data Makes Language
    // Models Better" measurement, word-granular): every 20-word run
    // shared VERBATIM by ≥2 documents marks its positions as
    // duplicated, and each doc reports its duplicated-token fraction
    // (the decision input for substring-removal or doc-drop
    // policies; q89 scrubs short high-df boilerplate, this audits
    // LONG verbatim reuse at df≥2). Scale shape: spans hash to a
    // 60-bit truncated-md5 BIGINT BEFORE any exchange (the shingle
    // convention — reproducible in the oracle as
    // CAST('0x'||substr(md5(s),1,15) AS BIGINT)), so the Barrier
    // checkpoint, the census, and the coverage join move 8-byte keys,
    // never 20-word text nor 32-hex strings (measured 3× lighter at
    // sf1); the position collapse is doc-keyed; the span stream is
    // Barrier-materialized once for both consumers.
    "q112_spandup" -> ((s, d) => {
      val K = 20
      val spans = graft.ops.Barrier(withWords(s, d)
        .select(col("doc_id"), col("words"))
        .filter(size(col("words")) >= K)
        .select(col("doc_id"), explode(expr(
          s"""transform(sequence(0, size(words) - $K), i -> struct(i AS i,
              cast(conv(substring(md5(cast(concat_ws(' ', slice(words, i + 1, $K)) as binary)), 1, 15), 16, 10) as bigint) AS h))"""))
          .as("x"))
        .select(col("doc_id"), col("x.i").as("i"), col("x.h").as("h")))
      val dup = spans.select("doc_id", "h").distinct()
        .groupBy("h").agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2).select("h")
      // covered-position count by PER-DOC INTERVAL MERGE, not position
      // explode: each dup span covers [i, i+K), and for starts sorted
      // within a doc the union length is Σ min(K, next_i − i) (+K for
      // the last) — one doc-keyed window over the span rows instead of
      // K rows per span + a corpus-wide DISTINCT (20× the intermediate
      // volume and an extra exchange; measured 34.5 → 18.7 s at sf10,
      // flat at sf1 where the position stream still fit in memory)
      val wd = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("i")
      val cov = spans.join(dup, "h")
        .withColumn("nxt", lead(col("i"), 1).over(wd))
        .select(col("doc_id"),
          when(col("nxt").isNull, lit(K.toLong))
            .otherwise(least(lit(K.toLong), (col("nxt") - col("i")).cast(LongType)))
            .as("c"))
        .groupBy("doc_id").agg(sum("c").as("n_cov"))
      withWords(s, d)
        .select(col("doc_id"), size(col("words")).cast(LongType).as("n_words"))
        .join(cov, Seq("doc_id"), "left")
        .withColumn("n_cov", coalesce(col("n_cov"), lit(0L)))
        .select(col("doc_id"), col("n_words"), col("n_cov"),
          expr("(n_cov * 1000000) div n_words").as("dup_ppm"))
        .orderBy("doc_id")
    }),

    // Document chunking — the sequence-windowing step before
    // tokenizer packing (pretraining) or embedding (RAG): 100-token
    // windows at stride 80 (20-token overlap), last window clipped.
    // Map-only: the explode multiplies rows inside the partition, no
    // shuffle until the presentation ORDER BY; chunk content is
    // pinned by md5 so the oracle verifies the actual slices, not
    // just the arithmetic.
    "q50_chunks" -> ((s, d) => {
      withWords(s, d)
        .select(col("doc_id"), col("words"))
        .withColumn("n", size(col("words")).cast(LongType))
        .withColumn("k", explode(expr("sequence(0L, (n + 79) div 80 - 1)")))
        .select(col("doc_id"), col("k").as("chunk_id"),
          (col("k") * 80).as("tok_start"),
          least(lit(100L), col("n") - col("k") * 80).as("tok_len"),
          md5(expr("array_join(slice(words, cast(k*80+1 as int), cast(least(100L, n - k*80) as int)), ' ')")
            .cast(BinaryType)).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id")
    }),

    // Corpus heavy hitters — exact frequent words, computed the way a
    // 100 TB corpus has to: a Misra-Gries sketch pass (fixed
    // capacity-bounded state per partition, map-side mergeable, a
    // guaranteed SUPERSET of everything above N/(capacity+1)) yields
    // ≤4000 candidates; only candidates are exactly re-counted (the
    // semi-join keeps the (word, count) shuffle candidate-bounded
    // instead of one row per distinct word); the true threshold
    // N/1000 then filters exactly. Sketch → candidates → exact
    // confirm, like the LSH and bloom families — the final output is
    // deterministic even though the sketch's extra candidates vary
    // with merge order. The corpus is re-scanned per pass (3 cheap
    // pushed-down scans) rather than checkpointing an exploded
    // row-per-token table.
    "q54_heavy" -> ((s, d) => {
      def words = withWords(s, d)
        .select(explode(col("words")).as("word"))
        .filter(col("word") =!= "")
      val cands = words
        .agg(graft.Functions.misra_gries(col("word"), 4000).as("cs"))
        .select(explode(col("cs")).as("word"))
      val total = words.agg(count(lit(1)).as("n")).scalar()
      words.join(broadcast(cands), Seq("word"), "left_semi")
        .groupBy("word")
        .agg(count(lit(1)).as("n_word"))
        .filter(col("n_word") * 1000 > total)
        .orderBy("word")
    }),

    // Count-Min point queries — the watchlist/denylist frequency
    // monitor that completes the sketch family: Misra-Gries (q54)
    // answers "which terms are heavy", CMS answers "how often does
    // term X occur" for any X chosen AFTER the scan. The corpus term
    // stream collapses into 4×512 exact integer counters (cms_agg:
    // mergeable, map-side-combined, 16 KB total at ANY corpus size);
    // each watchlist term's estimate is min over 4 element_at reads
    // of the broadcast scalar — no rescan, no per-term state. The
    // exact column is the audit: counting restricted to the 9
    // broadcast watch terms is a map-side filter + 9-row aggregate,
    // NOT a vocab-sized shuffle. CMS never under-estimates
    // (est ≥ cnt always — CmsAggSpec pins it); the absent sentinel
    // term shows the collision overestimate honestly.
    "q118_cms" -> ((s, d) => {
      val P = 2147483647L
      val words = withWords(s, d)
        .select(explode(col("words")).as("term")).filter(col("term") =!= "")
        .select(col("term"),
          conv(substring(md5(col("term")), 1, 15), 16, 10).cast(LongType).as("h"))
      val cms = words.agg(graft.Functions.cms_agg(col("h"), 4, 512).as("c")).scalar()
      val watch = Seq("a", "customer", "data", "error", "key",
        "request", "supplier", "the", "zzqqabsent")
      import s.implicits._
      val wdf = watch.toDF("term")
      def bucket(r: Int, h: Column): Column =
        ((lit((1103515245L * (r + 1) + 12345L) % P) * (h % lit(P))
          + lit(977L * (r + 1))) % lit(P)) % lit(512L)
      val est = least((0 until 4).map(r =>
        element_at(cms,
          (lit(r * 512L) + bucket(r, col("h")) + lit(1L)).cast(IntegerType))): _*)
      val exact = words.join(broadcast(wdf), Seq("term"), "left_semi")
        .groupBy("term").agg(count(lit(1)).as("cnt"))
      wdf.select(col("term"),
          conv(substring(md5(col("term")), 1, 15), 16, 10).cast(LongType).as("h"))
        .select(col("term"), est.as("est"))
        .join(exact, Seq("term"), "left_outer")
        .select(col("term"), col("est"), coalesce(col("cnt"), lit(0L)).as("cnt"))
        .orderBy("term")
    }),

    // Benchmark decontamination — the eval-overlap scrub every
    // pretraining corpus needs: documents sharing any word-shingle
    // with the eval split are flagged (n_hits = distinct shared
    // spans). The eval side is tiny at ANY corpus size (benchmarks
    // are MBs), so its distinct shingle set BROADCASTS and the
    // corpus-side probe is map-local — the per-doc shingle explode
    // partial-aggregates before the one (doc_id → count) shuffle.
    // k=3 here (the native word_shingles3 kernel, shared with q47);
    // production decontam raises k to 8-13 grams — same plan shape,
    // only the span extractor's window width changes.
    "q55_decontam" -> ((s, d) => {
      evalOverlap(s, d, 3)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hits"))
        .orderBy("doc_id")
    }),

    // Decontamination at a production span width — q55's plan with
    // the parameterized kernel at k=4 (`word_shingles(t, k)`): wider
    // spans are MORE selective (fewer, longer shingles per doc and
    // far fewer accidental collisions), so the broadcast eval set
    // SHRINKS as k grows — the 8-13-gram deployment is strictly
    // cheaper than the k=3 test pin. Same broadcast-probe shape.
    "q60_decontam4" -> ((s, d) => {
      evalOverlap(s, d, 4)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hits"))
        .orderBy("doc_id")
    }),

    // Exact per-stratum length quantiles — the corpus-profiling step
    // behind sequence-length bucketing and packing budgets: median /
    // p90 / max of n_chars per (lang, source), rank-selected so the
    // result is integer-exact (no interpolation surface). ONE shuffle:
    // both window functions share the (lang, source) partitioning and
    // the following groupBy reuses it — Catalyst plans a single
    // exchange. Only (lang, source, n_chars, doc_id) ever shuffles,
    // never text. At 100 TB strata stay bounded (langs × sources), so
    // per-stratum sort depth is data/strata; a skewed stratum would
    // switch to the KMV/sketch path (q38) — this op is the exact form.
    "q56_quantile" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang", "source").orderBy(col("n_chars"), col("doc_id"))
      val wc = Window.partitionBy("lang", "source")
      Tables.documents(s, d)
        .select(col("lang"), col("source"), col("n_chars"), col("doc_id"))
        .withColumn("rn", row_number().over(w).cast(LongType))
        .withColumn("n", count(lit(1)).over(wc))
        .groupBy("lang", "source")
        .agg(
          max(when(col("rn") === expr("(n+1) div 2"), col("n_chars"))).as("p50"),
          max(when(col("rn") === expr("(9*n+9) div 10"), col("n_chars"))).as("p90"),
          max(when(col("rn") === col("n"), col("n_chars"))).as("p100"))
        .orderBy("lang", "source")
    }),

    // The curation funnel — the queries above composed into the final
    // keep/drop manifest a pretraining corpus build emits, one row per
    // document with every gate's verdict:
    //   keep_exact   canonical-text exact dedup (earliest doc_id per
    //                md5 wins; the ONLY shuffle — 16-byte keys, not
    //                bodies),
    //   not_eval     the eval split itself never trains,
    //   decontam_ok  no shingle overlap with the eval split (q55's
    //                broadcast probe),
    //   quality_ok   q25's integer gates all pass,
    //   rep_ok       q45's repetition gate.
    // Near-dup clustering composes the same way via q51's keep-list
    // (kept out here so the funnel stays one cheap pass + one
    // broadcast probe). Everything except the md5 window is map-local;
    // at 100 TB this runs as one job whose shuffle carries
    // (md5, doc_id, 5 booleans).
    "q59_funnel" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = withWords(s, d)
        .select(col("doc_id"), col("t"),
          graft.Functions.repetition_stats(col("t")).as("r"),
          expr("cast(size(filter(words, w -> w in ('the', 'a'))) as bigint)").as("n_stop"),
          length(regexp_replace(col("t"), " ", "")).cast(LongType).as("n_wordchars"))
        .select(col("doc_id"), col("t"),
          col("r.n_words").as("n_words"), col("r.n_types").as("n_types"),
          col("r.top_bigram_n").as("top_bigram_n"), col("n_stop"), col("n_wordchars"))
      val hits = evalOverlap(s, d, 3)
        .select(col("doc_id")).distinct()
        .withColumn("hit", lit(true))
      val wMd5 = Window.partitionBy(md5(col("t").cast(BinaryType)))
      base
        .withColumn("keep_exact", col("doc_id") === min(col("doc_id")).over(wMd5))
        .join(broadcast(hits), Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("keep_exact"),
          (col("doc_id") % 97 =!= 0).as("not_eval"),
          col("hit").isNull.as("decontam_ok"),
          // ONE gate definition shared with the streaming form
          // (graft.streaming.Curation) so batch and stream can't drift
          graft.streaming.Curation
            .qualityOk(col("n_words"), col("n_stop"), col("n_wordchars"))
            .as("quality_ok"),
          graft.streaming.Curation
            .repOk(col("n_words"), col("n_types"), col("top_bigram_n"))
            .as("rep_ok"))
        .withColumn("kept",
          col("keep_exact") && col("not_eval") && col("decontam_ok")
            && col("quality_ok") && col("rep_ok"))
        .orderBy("doc_id")
    }),

    // Denylist redaction — the PII-scrub shape (dictionary-driven
    // token replacement + audit count + content pin): map-only, one
    // HOF pass over the word array, no shuffle except the
    // presentation ORDER BY. Word-set matching instead of regex keeps
    // the oracle surface engine-exact (Java regex vs RE2 word
    // boundaries diverge); a production denylist of thousands of
    // terms compiles the same shape to the Aho-Corasick native
    // kernel (`Functions.ac_count`, exercised by q99).
    "q57_scrub" -> ((s, d) => {
      val inList = "'customer','supplier','key'"
      withWords(s, d)
        .select(col("doc_id"),
          expr(s"cast(size(filter(words, x -> x in ($inList))) as bigint)")
            .as("n_redacted"),
          md5(expr(s"array_join(transform(words, x -> CASE WHEN x in ($inList) THEN '<PII>' ELSE x END), ' ')")
            .cast(BinaryType)).as("red_md5"))
        .orderBy("doc_id")
    }),

    // Per-source capping — the "domain cap" every web corpus applies
    // (no single site dominates training data): keep at most 20
    // documents per source, chosen by a deterministic content-
    // independent hash rank so every engine/run/shard keeps the same
    // ones. The rank window rides WindowGroupLimit push-down (as
    // q53): each map task keeps ≤20 rows per source BEFORE the
    // window exchange, so the shuffle is O(sources × cap) at any
    // corpus size — never a full per-source sort.
    "q62_capsource" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hk = expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)")
      val w = Window.partitionBy("source").orderBy(col("hk"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
        .withColumn("hk", hk)
        .withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= 20)
        .select("doc_id", "source", "rk")
        .orderBy("doc_id")
    }),

    // Deterministic stratified sampling — the data-mixing op of a
    // training pipeline: downsample the dominant language (en keeps
    // 10%, the rest 50%) with a content-independent hash gate, so the
    // same doc_id is kept or dropped identically on every run, every
    // engine, every shard. Map-only (the gate is a per-row filter; no
    // shuffle except the presentation ORDER BY); at 100 TB the rates
    // come from a broadcast mixing table keyed by (lang, source,
    // quality bucket) instead of a CASE.
    // Multi-pattern substring audit — the Aho-Corasick kernel both
    // IN-set probes (q57 word scrub, q89 span scrub) name as their
    // big-dictionary graduation, made real: ONE pass per document
    // counts occurrences of every dictionary pattern at every start
    // position (overlaps included), O(|text| + matches) independent
    // of dictionary size. Substring semantics are strictly stronger
    // than the word-set probes (patterns span word boundaries).
    // Map-only; the oracle replays each pattern as a positional
    // window scan — O(|text|·|dict|), exactly the cost the automaton
    // removes. Patterns deliberately overlap each other ("scan" ⊃
    // "an", "ca") so the count exercises the fail-chain fold.
    "q99_ac_audit" -> ((s, d) => {
      val dict = Seq("scan", "an", "ca", "vector join", "dup")
      withWords(s, d)
        .select(col("doc_id"),
          graft.Functions.ac_count(col("t"), dict).as("n_hits"))
        .filter(col("n_hits") > 0)
        .orderBy("doc_id")
    }),

    // BM25 retrieval scoring — the ranking half of the q94 index
    // story: Okapi BM25 (k1 = 1.2, b = 0.75) for the query
    // {vector, scan, dup} over the corpus. The idf uses Robertson's
    // RAW RATIO (N − df + 0.5)/(df + 0.5) rather than its log: every
    // arithmetic op in the score is then IEEE-exact (+,−,×,÷ are
    // correctly rounded; ln is not), so scores are bit-identical
    // across engines with a FIXED fold order ((s1 + s2) + s3) —
    // the q84 float-determinism discipline. Corpus stats (N, Σdl,
    // per-term df) come from ONE auxiliary aggregate that broadcasts
    // as a single row; scoring is map-only over the scan and top-20
    // is a TakeOrderedAndProject. At 100 TB the stats row is a
    // pre-computed index artifact and scoring composes with q94's
    // postings to visit only matching docs.
    "q96_bm25" -> ((s, d) => bm25Top20(s, d)),

    // Hybrid retrieval fusion — reciprocal-rank fusion (RRF, the
    // standard hybrid-search combiner) of the SPARSE arm (q96's BM25
    // top-20 over documents) and the DENSE arm (q16's exact-cosine
    // top-20 over embeddings, doc_id ≡ vec_id in the testdata):
    // rrf = Σ_arms 1/(60 + rank), missing-from-arm contributes 0.
    // Ranks are integers from deterministic (score DESC, id)
    // orderings, so the only float work is two IEEE divisions and one
    // add per fused row — engine-identical. Shape: each arm is a
    // distributed top-k (TakeOrderedAndProject); ranking and fusion
    // touch ≤ 2k rows, so the windows and the full-outer join are
    // driver-trivial at ANY corpus size — the corpus-sized work stays
    // in the arms, which scale independently (q94 postings, q72/q74
    // ANN).
    "q104_hybrid" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val sparse = bm25Top20(s, d)
        .withColumn("r_bm25", row_number()
          .over(Window.orderBy(desc("score"), col("doc_id"))).cast(LongType))
        .select(col("doc_id").as("id"), col("r_bm25"))
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      val dense = emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          (graft.Functions.vec_dot(col("embedding"), col("qv"))
            / (sqrt(graft.Functions.vec_dot(col("embedding"), col("embedding")))
              * sqrt(graft.Functions.vec_dot(col("qv"), col("qv"))))).as("sim"))
        .orderBy(desc("sim"), col("vec_id")).limit(20)
        .withColumn("r_dense", row_number()
          .over(Window.orderBy(desc("sim"), col("vec_id"))).cast(LongType))
        .select(col("vec_id").as("id"), col("r_dense"))
      sparse.join(dense, Seq("id"), "full_outer")
        .select(col("id"), col("r_bm25"), col("r_dense"),
          (coalesce(lit(1.0d) / (lit(60L) + col("r_bm25")).cast(DoubleType),
              lit(0.0d))
            + coalesce(lit(1.0d) / (lit(60L) + col("r_dense")).cast(DoubleType),
              lit(0.0d))).as("rrf"))
        .orderBy(desc("rrf"), col("id"))
        .limit(10)
    }),

    // Temperature mixture sampling — the multilingual rebalancing
    // step (XLM-R style): target share ∝ n_l^α with α = 0.5, achieved
    // by DOWNsampling via rate_l = sqrt(n_min / n_l) (the smallest
    // language keeps everything; dominant languages shrink toward
    // balance). Unlike q41's fixed mixing table, the rates are
    // COMPUTED from corpus statistics: pass 1 is a languages-sized
    // aggregate, the rate table broadcasts, and the gate is the
    // md5-ppm hash — deterministic, so the oracle replays the exact
    // keep set. Float surface is one IEEE divide + sqrt + floor per
    // LANGUAGE (not per row) — engine-identical by IEEE semantics.
    "q95_temp_sample" -> ((s, d) => {
      val counts = Tables.documents(s, d)
        .groupBy("lang").agg(count(lit(1)).as("n_l"))
      val nmin = Tables.documents(s, d)
        .groupBy("lang").agg(count(lit(1)).as("nl2"))
        .agg(min(col("nl2")).as("n_min"))
      val rates = counts.crossJoin(broadcast(nmin))
        .withColumn("ppm",
          floor(lit(1e6) * sqrt(col("n_min").cast(DoubleType) / col("n_l")))
            .cast(LongType))
        .select(col("lang"), col("n_l"), col("ppm"))
      val gate = expr("pmod(cast(conv(substring(md5(cast(doc_id as string)), " +
        "1, 15), 16, 10) as bigint), 1000000)")
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"))
        .join(broadcast(rates), Seq("lang"))
        .withColumn("hb", gate)
        .groupBy("lang")
        .agg(max(col("n_l")).as("n_total"), max(col("ppm")).as("rate_ppm"),
          sum(when(col("hb") < col("ppm"), 1L).otherwise(0L)).as("n_kept"))
        .orderBy("lang")
    }),

    // Token-budget mixture scheduler — the PLANNING operator behind
    // every data-mixing recipe (DoReMi/Pile-style static weights):
    // given target mixture weights per language and a global token
    // budget (80% of the corpus here), compute each stratum's
    // allocation with cap-and-redistribute waterfilling — a stratum
    // whose available tokens can't fill its target share caps at
    // avail, and the shortfall redistributes over the uncapped
    // strata proportional to their weights. EXACT integer math
    // end-to-end (ppm weights, floor divides), so the oracle replays
    // the schedule bit-for-bit. Scale shape: the only corpus-sized
    // work is ONE partial-agg'd groupBy(lang) scan; everything after
    // operates on a languages-sized table with two broadcast scalar
    // joins — the 100 TB cost is the scan, the decision is free.
    // sample_ppm is the per-stratum hash-gate rate a q41/q95-style
    // deterministic sampler then applies row-wise.
    "q110_mixture" -> ((s, d) => {
      val w = typedLit(Map(
        "en" -> 400000L, "zh" -> 200000L, "de" -> 150000L,
        "fr" -> 150000L, "es" -> 100000L))
      val strata = Tables.documents(s, d)
        .groupBy("lang")
        .agg(sum(expr("n_chars div 4")).as("avail"))
        .withColumn("w_ppm", coalesce(element_at(w, col("lang")), lit(0L)))
      val total = strata.agg(sum(col("avail")).as("tot"))
      val base = strata.crossJoin(broadcast(total))
        .withColumn("alloc0", expr("(((tot * 4) div 5) * w_ppm) div 1000000"))
        .withColumn("capped", col("alloc0") > col("avail"))
      val sums = base.agg(
        sum(when(col("capped"), col("alloc0") - col("avail")).otherwise(0L))
          .as("leftover"),
        sum(when(!col("capped"), col("w_ppm")).otherwise(0L)).as("w_free"))
      base.crossJoin(broadcast(sums))
        .withColumn("alloc", least(col("avail"),
          col("alloc0") + when(col("capped"), 0L)
            .otherwise(expr("(leftover * w_ppm) div w_free"))))
        .select(col("lang"), col("avail"), col("w_ppm"), col("alloc"),
          expr("(alloc * 1000000) div avail").as("sample_ppm"))
        .orderBy("lang")
    }),

    // Inverted index — the retrieval-side build every search/RAG
    // stack needs: term → sorted posting list of documents. The big
    // shuffle is (term, doc_id) pairs — term-partitioned, which IS
    // the posting layout at scale (each reducer owns a term range =
    // an index segment; `Bucketing.writeBucketed` on term persists it
    // exchange-free for lookups). Stopword-scale terms are excluded
    // by a df window (capped at 500 here), which also bounds every posting
    // list the query materializes; a full-scale build caps or
    // block-compresses postings the same way. Posting lists are
    // pinned by md5 of the ascending doc-id join, not just counted.
    "q94_index" -> ((s, d) => {
      withWords(s, d)
        .select(col("doc_id"), explode(array_distinct(col("words"))).as("term"))
        .filter(col("term") =!= "")
        .groupBy("term")
        .agg(count(lit(1)).as("df"),
          md5(expr("array_join(array_sort(collect_list(doc_id)), ',')")
            .cast(BinaryType)).as("postings_md5"))
        .filter(col("df").between(5, 500))
        .orderBy(desc("df"), col("term"))
        .limit(30)
    }),

    // Distribution sketch — per-lang length quantiles off the
    // `hist_agg` mergeable fixed-width histogram (64 buckets × 16
    // chars over [0, 1024)). This is q56's 100 TB alternative: exact
    // rank-select sorts every stratum; the sketch reduces each group
    // to 64 longs of ASSOCIATIVE integer state (map-side combined,
    // partition-order independent — bit-identical by construction),
    // and quantiles read the cumulative histogram with bucket-width
    // error: smallest bucket whose running count reaches ceil(q·N),
    // quoted at the bucket's upper bound. All integer arithmetic,
    // replayed exactly by the oracle's width-bucket GROUP BY + running
    // sum; the full histogram rides the row as an md5 pin.
    "q92_hist" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(graft.Functions.hist_agg(col("n_chars"), 0L, 1024L, 64).as("hist"))
        .withColumn("n", expr("aggregate(hist, 0L, (a, x) -> a + x)"))
        .withColumn("b50", expr(
          """array_min(filter(sequence(0, 63), b ->
             aggregate(slice(hist, 1, b + 1), 0L, (a, x) -> a + x)
               >= (n + 1) div 2))"""))
        .withColumn("b90", expr(
          """array_min(filter(sequence(0, 63), b ->
             aggregate(slice(hist, 1, b + 1), 0L, (a, x) -> a + x)
               >= (9 * n + 9) div 10))"""))
        .select(col("lang"), col("n"),
          ((col("b50") + 1) * 16).cast(LongType).as("est_p50"),
          ((col("b90") + 1) * 16).cast(LongType).as("est_p90"),
          md5(expr("array_join(hist, ',')").cast(BinaryType)).as("hist_md5"))
        .orderBy("lang")
    }),

    "q41_sample" -> ((s, d) => {
      val gate = expr(
        "pmod(cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint), 100)")
      Tables.documents(s, d)
        .withColumn("hb", gate)
        .withColumn("rate", when(col("lang") === "en", lit(10)).otherwise(lit(50)))
        .filter(col("hb") < col("rate"))
        .select(col("doc_id"), col("lang"), col("hb").cast(LongType).as("hb"))
        .orderBy("doc_id")
    }),

    // Train/valid/test split manifest — the dataset-card table every
    // release ships: a salted md5 gate (the q41 trick, engine-portable
    // and stable under re-runs — a doc NEVER migrates between splits
    // when the corpus grows) assigns 80/10/10, then one partial-agg'd
    // rollup per (split, source) reports docs / chars / en share.
    // Map-only assignment; the rollup shuffles |splits|·|sources|
    // groups.
    "q145_split" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("split", splitName("doc_id"))
        .groupBy("split", "source")
        .agg(count(lit(1)).as("docs"),
          sum(col("n_chars")).as("chars"),
          count(when(col("lang") === "en", 1)).as("en_docs"))
        .orderBy("split", "source")
    }),

    // Blocked edit-distance near-dup — the character-level check that
    // catches small in-place edits MinHash's bag-of-shingles view
    // blurs: Levenshtein ≤ 5 over normalized 80-char prefixes,
    // blocked by (lang, 40-char length band) so the join is
    // block-local, with a block-size budget (>200 rows → excluded,
    // the q21 guard discipline) so a degenerate band can never go
    // quadratic — at 100 TB the band width narrows and the budget
    // holds per-block cost constant while the bands themselves
    // partition-parallelize. The T=5 bar is the near-dup norm (6% of
    // the prefix); a T=20 variant measured the bag prefilter nearly
    // useless (65% of same-band prefixes pass a 2T=40 L1 — natural
    // text shares char frequencies) while T=5's 2T=10 gate rejects
    // sharply AND shrinks the banded DP 3×. The metric is the classic
    // unit-cost edit distance both engines implement identically.
    "q146_editdup" -> ((s, d) => {
      val p = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        expr("n_chars div 40").as("band"),
        expr("substring(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), 1, 80)").as("pre"))
      // bag-of-chars signature, computed ONCE per doc: every edit
      // moves the per-char-count L1 by ≤2, so L1(bag_a, bag_b) > 2T
      // proves lev > T — a 37-add reject that spares the O(len·T) DP
      // on ~all of the block's pairs (the DP measured 7.4 s at sf0.1
      // = the whole query). Engineering that MEASURED, not assumed:
      // the aggregate(zip_with(...)) HOF L1 ran 2.5× SLOWER than the
      // DP it dodges (→ native vec_l1_int), the 37-×-replace() bag
      // build cost 3.4 s on its own (→ native char_bag one-pass
      // kernel), and without the Barrier the projection collapses
      // into the join and re-derives both signatures PER PAIR. Net:
      // 7.4 s → ~1.5 s, result set — and oracle — unchanged (the
      // filter is a strict superset condition).
      val b = graft.ops.Barrier(p.withColumn("bsz",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy("lang", "band")))
        .filter(col("bsz") <= 200)
        .withColumn("bag", graft.Functions.char_bag(col("pre"))))
      val l = b.select(col("doc_id").as("doc_a"), col("lang"), col("band"),
        col("pre").as("pa"), col("bag").as("ba"))
      val r = b.select(col("doc_id").as("doc_b"), col("lang"), col("band"),
        col("pre").as("pb"), col("bag").as("bb"))
      l.join(r, Seq("lang", "band"))
        .filter(col("doc_a") < col("doc_b"))
        // the L1 gate and the DP live in ONE short-circuiting CASE:
        // as separate .filter()s CombineFilters is free to reorder
        // the conjuncts and ran the DP on every pair anyway (measured
        // — the filter order is semantics here, not style). The
        // threshold form returns -1 for "exceeded", so the gate is
        // [0, 5], not <=5 (every far pair would sail through as -1).
        .withColumn("dist",
          when(graft.Functions.vec_l1_int(col("ba"), col("bb")) <= 10,
            levenshtein(col("pa"), col("pb"), 6)).otherwise(lit(-1)))
        .filter(col("dist").between(0, 5))
        .select(col("doc_a"), col("doc_b"), col("dist").cast(LongType).as("dist"))
        .orderBy("doc_a", "doc_b")
    }),

    // Vocabulary-coverage (OOV) audit — before committing to a fixed
    // vocab, measure what it misses: the top-40 corpus words (count
    // desc, word asc — fully deterministic) stand as the vocab; every
    // token either hits it or counts OOV, rolled up per language in
    // exact ppm. Scale shape: the term-frequency pass is the q46
    // map-side-combined word count; the vocab is 40 rows broadcast
    // into a left-anti-style membership join; the per-language rollup
    // shuffles |langs| groups. No driver-side collect — the vocab
    // stays a DataFrame end to end.
    "q147_oov" -> ((s, d) => {
      val toks = withWords(s, d).filter(length(col("t")) > 0)
        .select(col("lang"), explode(col("words")).as("word"))
      val vocab = toks.groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word")).limit(40)
        .select(col("word"), lit(1).as("hit"))
      toks.join(broadcast(vocab), Seq("word"), "left_outer")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_tokens"),
          count(when(col("hit").isNull, 1)).as("n_oov"))
        .select(col("lang"), col("n_tokens"), col("n_oov"),
          expr("(n_oov * 1000000) div n_tokens").as("oov_ppm"))
        .orderBy("lang")
    }),

    // Bigram-LM surprisal filter — q106's unigram gate upgraded to a
    // CONDITIONAL model: token surprisal under P(v|u) with add-one
    // smoothing, so formulaic text (predictable continuations) scores
    // low even when its unigrams are common. The log2 stays exact via
    // the floor-log trick (length(bin(x)) = ⌊log2 x⌋+1): surp(u,v) =
    // ⌊log2(c(u)+V)⌋ − ⌊log2(c(u,v)+1)⌋ in pure integers, and the
    // keep gate cross-multiplies against the corpus mean (q98's
    // discipline, DECIMAL(38,0) for the 100 TB products). Scale
    // shape: ONE bigram explode feeds both counts and scoring
    // (Barrier); all model tables are bigram-TYPE-sized with map-side
    // combine; V and the global mean are broadcast 1-row frames.
    "q148_bigram_lm" -> ((s, d) => {
      val bg = graft.ops.Barrier(withWords(s, d)
        .filter(size(col("words")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(slice(words, 1, size(words)-1), (w, i) -> struct(w AS u, element_at(words, i+2) AS v))"))
          .as("b"))
        .select(col("doc_id"), col("b.u").as("u"), col("b.v").as("v")))
      val bc = graft.ops.Barrier(
        bg.groupBy("u", "v").agg(count(lit(1)).as("cb")))
      val uc = bc.groupBy("u").agg(sum(col("cb")).as("cu"))
      val vs = bc.agg(countDistinct(col("v")).as("vn"))
      // hint("merge") on the vocabulary-sized sides: both uc (distinct
      // unigrams) and surp (distinct bigrams) grow with the corpus, but
      // they derive from a checkpointed frame whose post-agg size
      // Catalyst underestimates — at sf10 the planner auto-broadcast
      // the multi-GB bigram table and died building it on the driver
      // (the scorePairs computed-array precedent). The 1-row vs/glob
      // broadcasts stay explicit.
      val surp = bc.join(uc.hint("merge"), Seq("u")).crossJoin(broadcast(vs))
        .select(col("u"), col("v"),
          (length(bin(col("cu") + col("vn"))) - length(bin(col("cb") + 1)))
            .cast(LongType).as("surp"))
      val perDoc = graft.ops.Barrier(bg.join(surp.hint("merge"), Seq("u", "v"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum(col("surp")).as("surp")))
      val glob = perDoc.agg(sum(col("surp")).as("gs"),
        sum(col("n_bigrams")).as("gn"))
      val dec = DecimalType(38, 0)
      perDoc.crossJoin(broadcast(glob))
        .select(col("doc_id"), col("n_bigrams"), col("surp"),
          (col("surp").cast(dec) * col("gn").cast(dec)
            <= col("gs").cast(dec) * col("n_bigrams").cast(dec)).as("kept"))
        .orderBy("doc_id")
    }),

    // Distribution drift (two-sample KS) — the release gate that
    // catches a pipeline change silently shifting the LENGTH
    // distribution even when counts and dedup rates look fine:
    // Kolmogorov–Smirnov distance between the old (doc_id%10<8) and
    // new snapshot's n_chars ECDFs, exact via cross-multiplication —
    // D·n₁·n₂ = max_t |F₁(t)·n₂ − F₂(t)·n₁| over observed values, no
    // float CDF. Emitted as the argmax row with D in ppm (integer
    // div), so the number survives any corpus size in DECIMAL(38,0).
    // Scale shape: one value-keyed rollup (map-side combined) is the
    // only corpus-sized work; the cumulative window runs over the
    // VALUE domain (distinct lengths — bounded like a calendar, and
    // range-binnable if a domain ever isn't); totals broadcast as one
    // row; argmax is a 1-row TakeOrdered.
    "q150_ks" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val sides = Tables.documents(s, d)
        .select(col("n_chars"), (col("doc_id") % 10 < 8).as("old"))
      val per = sides.groupBy("n_chars").agg(
        count(when(col("old"), 1)).as("o"),
        count(when(!col("old"), 1)).as("w"))
      val cw = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
      val cum = per.withColumn("co", sum(col("o")).over(cw))
        .withColumn("cn", sum(col("w")).over(cw))
      val tot = per.agg(sum(col("o")).as("n1"), sum(col("w")).as("n2"))
      val dec = DecimalType(38, 0)
      cum.crossJoin(broadcast(tot))
        .withColumn("ks",
          abs(col("co").cast(dec) * col("n2").cast(dec)
            - col("cn").cast(dec) * col("n1").cast(dec)))
        .select(col("n_chars").as("t"), col("n1"), col("n2"),
          expr("cast((ks * 1000000) div (cast(n1 as decimal(38,0)) * cast(n2 as decimal(38,0))) as bigint)")
            .as("ks_ppm"),
          col("ks"))
        .orderBy(col("ks").desc, col("t")).limit(1)
        .select("t", "n1", "n2", "ks_ppm")
    }),

    // Source concentration (Gini) — is the corpus a broad mix or
    // three crawls wearing a trenchcoat? Exact integer Gini over
    // per-source character mass: with sources sorted ascending
    // (chars, source), G·n·Σx = Σ(2i−n−1)·xᵢ — emitted in ppm via
    // integer division, DECIMAL(38,0) products (q98's discipline).
    // The per-source rollup is the only corpus-sized work; the rank
    // window and both aggregates run on the sources-sized table.
    "q151_gini" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val sc = Tables.documents(s, d)
        .groupBy("source").agg(sum(col("n_chars")).as("chars"))
      val w = Window.orderBy(col("chars"), col("source"))
      val n1 = sc.agg(count(lit(1)).as("ns"))
      val dec = DecimalType(38, 0)
      sc.withColumn("i", row_number().over(w))
        .crossJoin(broadcast(n1))
        .agg(first(col("ns")).as("n_sources"),
          sum(col("chars")).as("total_chars"),
          sum((col("i") * 2 - col("ns") - 1).cast(dec)
            * col("chars").cast(dec)).as("gnum"))
        .select(col("n_sources"), col("total_chars"),
          expr("cast((gnum * 1000000) div (cast(n_sources as decimal(38,0)) * cast(total_chars as decimal(38,0))) as bigint)")
            .as("gini_ppm"))
    }),

    // Fill-in-the-middle transform — the PSM data augmentation
    // infilling models train on (Bavarian et al. 2022): each document
    // splits at two DETERMINISTIC salted-hash positions into
    // (prefix, middle, suffix) and reassembles as prefix⊕suffix⊕middle.
    // The split points are md5-derived (the q41 gate family), so the
    // transform is reproducible across engines and runs — no RNG in
    // the data path. p1 ∈ [1, L/3], p2 ∈ (2L/3, L] guarantees
    // non-empty spans without a comparison chain. Map-only: the 100 TB
    // cost is exactly one pass, no shuffle; output pins the
    // reassembled bytes by md5 + the split geometry.
    "q155_fim" -> ((s, d) => {
      def h(salt: String) = expr(
        s"cast(conv(substring(md5(concat('$salt', cast(doc_id as string))), 1, 15), 16, 10) as bigint)")
      Tables.documents(s, d)
        .filter(col("n_chars") >= 20)
        .withColumn("len", length(col("text")))
        .withColumn("p1", lit(1) + pmod(h("fim1:"), expr("len div 3")))
        .withColumn("p2", col("len") - pmod(h("fim2:"), expr("len div 3")))
        .select(col("doc_id"), col("p1").cast(LongType).as("p1"),
          col("p2").cast(LongType).as("p2"),
          md5(concat(
            expr("substring(text, 1, p1)"),
            lit("<SUF>"), expr("substring(text, p2 + 1)"),
            lit("<MID>"), expr("substring(text, p1 + 1, p2 - p1)"))
            .cast(BinaryType)).as("fim_md5"))
        .orderBy("doc_id")
    }),

    // Pack boundary metadata — the attention-mask side table every
    // packed-sequence trainer needs (document i must not attend to
    // document j): per pack, the 1-based start offset of every
    // document in q83's assembled sequence (newline separators
    // included). Same single pack-keyed shuffle as q83; the offsets
    // fold is a per-group array op bounded by docs-per-pack.
    "q156_pack_offsets" -> ((s, d) => {
      val packs = packBins(Tables.documents(s, d), 4096L, 1)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("pack_id"))
      packs.groupBy("lang", "pack_id")
        .agg(count(lit(1)).as("n_docs"),
          // packing order = (n_chars desc, doc_id): sort once, then
          // prefix-sum lens (+1 per newline separator) into offsets
          array_sort(collect_list(struct((-col("n_chars")).as("k1"),
            col("doc_id").as("k2"), col("n_chars").as("ln")))).as("ds"))
        .select(col("lang"), col("pack_id"), col("n_docs"),
          expr("""array_join(
                    transform(ds, (x, i) -> cast(
                      i + 1 + aggregate(slice(ds, 1, i), 0L, (a, y) -> a + y.ln)
                      AS string)),
                    ",")""").as("offsets"))
        .orderBy("lang", "pack_id")
    }),

    // Content-defined chunk dedup — the storage-layer primitive the
    // fixed-frame pass (q162) can't be: cut points follow the CONTENT
    // (8-byte window hash ≡ 0 mod 64 → ~64-char expected chunks), so
    // an early insertion shifts one chunk, not every frame after it,
    // and shared spans between edited documents still land in
    // identical chunks. Pipeline: native cdc_bounds per doc (one byte
    // pass), chunk slicing as an array fold over the SMALL bounds
    // array, then q15's hash-keyed dedup at chunk granularity —
    // the shuffle carries (16-byte md5, doc_id). Output = chunks
    // shared across documents.
    "q173_cdc" -> ((s, d) => {
      val chunks = withWords(s, d)
        .select(col("doc_id"), col("t"))
        .filter(length(col("t")) >= 8)
        .withColumn("bounds", graft.Functions.cdc_bounds(col("t"), 8, 64))
        .withColumn("cuts",
          expr("concat(array(0), bounds, array(length(t)))"))
        .select(col("doc_id"), explode(expr(
          """filter(
               transform(sequence(1, size(cuts) - 1),
                 i -> substring(t, element_at(cuts, i) + 1,
                                element_at(cuts, i + 1) - element_at(cuts, i))),
               c -> length(c) > 0)""")).as("chunk"))
      chunks.groupBy(md5(col("chunk").cast(BinaryType)).as("h"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"),
          max(length(col("chunk"))).as("chunk_len"))
        .filter(col("n_docs") > 1)
        .orderBy("h")
    }),

    // CDC storage-savings manifest — the number a chunk store is
    // judged by: bytes stored once per DISTINCT chunk vs bytes in the
    // raw stream, in exact ppm. Same chunk pipeline as q173; the
    // rollup is one two-level aggregate (chunk-hash keyed, then one
    // row), so the exchange carries distinct chunk hashes + lengths.
    "q174_cdc_savings" -> ((s, d) => {
      val chunks = withWords(s, d)
        .select(col("doc_id"), col("t"))
        .filter(length(col("t")) >= 8)
        .withColumn("bounds", graft.Functions.cdc_bounds(col("t"), 8, 64))
        .withColumn("cuts",
          expr("concat(array(0), bounds, array(length(t)))"))
        .select(explode(expr(
          """filter(
               transform(sequence(1, size(cuts) - 1),
                 i -> substring(t, element_at(cuts, i) + 1,
                                element_at(cuts, i + 1) - element_at(cuts, i))),
               c -> length(c) > 0)""")).as("chunk"))
      chunks
        .groupBy(md5(col("chunk").cast(BinaryType)).as("h"))
        .agg(count(lit(1)).as("occ"), max(length(col("chunk"))).as("ln"))
        .agg(count(lit(1)).as("n_distinct_chunks"),
          sum(col("occ")).as("n_chunks"),
          sum(col("ln") * col("occ")).as("raw_chars"),
          sum(col("ln")).as("stored_chars"))
        .select(col("n_distinct_chunks"), col("n_chunks"),
          col("raw_chars").cast(LongType).as("raw_chars"),
          col("stored_chars").cast(LongType).as("stored_chars"),
          expr("((raw_chars - stored_chars) * 1000000) div raw_chars").as("savings_ppm"))
    }),

    // Vocabulary growth (Heaps' law curve) — how many NEW word-bigram
    // types each corpus decile contributes: the tokenizer/vocab-
    // planning measurement ("is the type inventory still growing, or
    // has the corpus saturated?"). Bigram types, because that's the
    // granularity where a real curve lives (unigram inventories
    // saturate almost immediately). Each type's first-occurrence doc
    // is a map-side-combined min over a type-keyed shuffle (the only
    // corpus-sized exchange, and it carries (bigram, min) pairs —
    // per-doc array_distinct shrinks it before the exchange); deciles
    // come from the dense doc-id range via a broadcast scalar, so the
    // curve rollup and its running sum act on ≤10 rows — the
    // unpartitioned window is deliberate and bounded.
    "q185_heaps" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val nd = Tables.documents(s, d)
        .agg((max(col("doc_id")) + 1L).as("nd"))
      val firstSeen = withWords(s, d)
        .filter(size(col("words")) >= 2)
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(0, size(words) - 2), i -> concat(words[i], ' ', words[i+1]))")))
          .as("bg"))
        .groupBy("bg").agg(min(col("doc_id")).as("first_doc"))
      val w10 = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
      firstSeen.crossJoin(broadcast(nd))
        .select(expr("(first_doc * 10) div nd").as("decile"))
        .groupBy("decile").agg(count(lit(1)).as("new_types"))
        .withColumn("cum_types", sum(col("new_types")).over(w10))
        .orderBy("decile")
    }),

    // Character-concentration junk screen — the gibberish/mash gate a
    // curation stack runs beside q25's token heuristics: a document
    // whose single most frequent character dominates its body (spaces
    // excluded) is keyboard mash, filler, or decode garbage, not
    // prose. Map-only and SINGLE-PASS: the native `char_bag` kernel
    // scans the string once into a 37-slot count array (the q146
    // build kernel), and every statistic reads that tiny array —
    // indices 0..35 are the space-free body. (A first cut ran the
    // census as HOF lambdas over split(b, ''); CollapseProject
    // re-inlined the split into every lambda and the sf1 rehearsal
    // measured 48× at 10× data — the one-pass kernel restored ~1×.)
    // No shuffle except the presentation ORDER BY; exact integer ppm;
    // the junk test cross-multiplies (top·1e6 > 300000·n) so no
    // division rounding is in the decision path.
    "q186_charjunk" -> ((s, d) => {
      withWords(s, d)
        .select(col("doc_id"), graft.Functions.char_bag(col("t")).as("bag"))
        .select(col("doc_id"),
          expr("aggregate(slice(bag, 1, 36), 0L, (a, x) -> a + x)").as("n_body"),
          expr("cast(size(filter(slice(bag, 1, 36), x -> x > 0L)) as bigint)")
            .as("n_alpha"),
          expr("array_max(slice(bag, 1, 36))").as("top_char_n"))
        .select(col("doc_id"), col("n_body"), col("n_alpha"), col("top_char_n"),
          expr("CASE WHEN n_body = 0 THEN 0L ELSE (top_char_n * 1000000) div n_body END")
            .as("conc_ppm"),
          (col("n_body") === 0L ||
            col("top_char_n") * 1000000L > lit(300000L) * col("n_body"))
            .as("junk"))
        .orderBy("doc_id")
    }),

    // Per-language character-trigram profiles — the PROFILE-LEARNING
    // step behind n-gram language ID (q24 consumes exactly this kind
    // of table; Cavnar-Trenkle builds it from labeled text): top-20
    // trigrams per language by exact count with a (n DESC, gram)
    // deterministic rank. The trigram stream comes from the engine's
    // own GENERATOR extension tier — `char_ngrams` (a native Catalyst
    // CollectionGenerator, iterated by GenerateExec like posexplode,
    // inside whole-stage codegen) — not a HOF chain; the rollup
    // partial-aggregates (lang, gram) map-side (trigram space is
    // ≤37³-bounded for the normalized alphabet, so the exchange is
    // dictionary-sized), and the rank window rides WindowGroupLimit
    // (≤20 rows per language per map task before the window
    // exchange).
    // The rollup is the native `gram3_agg` aggregate, not a
    // char_ngrams explode + hash-aggregate: the trigram domain over
    // the normalized alphabet is CLOSED (37³), so per-(lang) counts
    // are one ~405 KB array per group — the update is a byte walk
    // with array-indexed bumps (no per-position row, no hash probe),
    // the exchange ships langs × 405 KB regardless of corpus size,
    // and gram strings are rebuilt from the array INDEX only for the
    // ≤37³ surviving rows (measured 16.9 → 2.3 s at sf10, 9.6 → 1.6 s
    // at sf1 — and the decade ratio drops to 1.4×: the exchange is
    // constant-size, so only the byte walk scales with the corpus).
    "q194_trigram_profile" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang").orderBy(col("n").desc, col("gram"))
      val alpha = "abcdefghijklmnopqrstuvwxyz0123456789 "
      withWords(s, d)
        .filter(length(col("t")) >= 3)
        .groupBy("lang").agg(graft.Functions.gram3_agg(col("t")).as("counts"))
        .select(col("lang"), posexplode(col("counts")).as(Seq("idx", "n")))
        .filter(col("n") > 0)
        .withColumn("gram", expr(
          s"""concat(substring('$alpha', idx div 1369 + 1, 1),
                     substring('$alpha', (idx div 37) % 37 + 1, 1),
                     substring('$alpha', idx % 37 + 1, 1))"""))
        .withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= 20)
        .select(col("lang"), col("rk"), col("gram"), col("n"))
        .orderBy("lang", "rk")
    }),

    // Posting-list compression planning — the bit-budget estimate an
    // index build runs before choosing an encoding (q94 builds the
    // postings; this prices them): delta-gap cost in bits, where a
    // gap of g costs floor(log2 g)+1 = length of its binary string —
    // conv(g, 10, 2) here, bin(g) in the oracle, EXACT integer on
    // both engines (no float log anywhere). savings vs raw 64-bit
    // ids in ppm. The df gate is CORPUS-RELATIVE (5 ≤ df ≤ 90% of
    // docs, the broadcast-scalar doc count) so it keeps meaning at
    // every SF — a fixed cap emptied at 10× data; a full-scale build
    // caps or block-compresses the ubiquitous-term lists the same
    // way, which also bounds the collect_list here.
    "q197_posting_bits" -> ((s, d) => {
      val nd = Tables.documents(s, d).agg(count(lit(1)).as("nd"))
      withWords(s, d)
        .select(col("doc_id"), explode(array_distinct(col("words"))).as("term"))
        .filter(col("term") =!= "")
        .groupBy("term")
        .agg(count(lit(1)).as("df"),
          sort_array(collect_list(col("doc_id"))).as("ids"))
        .crossJoin(broadcast(nd))
        .filter(col("df") >= 5 && col("df") * 10 <= col("nd") * 9)
        .select(col("term"), col("df"),
          expr("""cast(length(conv(ids[0] + 1, 10, 2)) +
                    aggregate(transform(sequence(2, cast(df as int)),
                                        i -> length(conv(element_at(ids, i) - element_at(ids, i - 1), 10, 2))),
                              0, (a, x) -> a + x) as bigint)""").as("bits"),
          (col("df") * 64).as("raw_bits"))
        .withColumn("savings_ppm",
          expr("((raw_bits - bits) * 1000000) div raw_bits"))
        .orderBy(col("df").desc, col("term")).limit(30)
    }),

    // Mixture allocation, EXECUTED — q110 computes how much of each
    // language to keep; this query performs the selection: the same
    // capped-weight + one-round-redistribution arithmetic in DOC
    // units, then a deterministic content-independent salted-hash
    // rank per language (DistributedRank — a 5-language window would
    // collapse the corpus onto 5 tasks) keeps exactly `alloc` docs.
    // The kept SET is pinned by md5 over the sorted id list, so the
    // oracle verifies the actual selection, not just the counts —
    // reproducible across runs, engines, and shards because a doc's
    // fate depends only on (lang avails, its own id). The id-list pin
    // is alloc-sized per language; a 100 TB run would pin per-shard
    // sublists instead.
    "q199_mixture_select" -> ((s, d) => {
      val wMap = typedLit(Map(
        "en" -> 400000L, "zh" -> 200000L, "de" -> 150000L,
        "fr" -> 150000L, "es" -> 100000L))
      val st = Tables.documents(s, d).groupBy("lang")
        .agg(count(lit(1)).as("avail"))
        .withColumn("w_ppm", coalesce(element_at(wMap, col("lang")), lit(0L)))
      val tot = st.agg(sum(col("avail")).as("t"))
      val base = st.crossJoin(broadcast(tot))
        .withColumn("alloc0", expr("(((t * 4) div 5) * w_ppm) div 1000000"))
        .withColumn("capped", col("alloc0") > col("avail"))
      val sums = base.agg(
        sum(when(col("capped"), col("alloc0") - col("avail")).otherwise(0L))
          .as("leftover"),
        sum(when(!col("capped"), col("w_ppm")).otherwise(0L)).as("w_free"))
      val alloc = base.crossJoin(broadcast(sums))
        .withColumn("alloc", least(col("avail"),
          col("alloc0") + when(col("capped"), 0L)
            .otherwise(expr("(leftover * w_ppm) div w_free"))))
        .select(col("lang").as("alang"), col("avail"), col("alloc"))
      val hk = expr(
        "cast(conv(substring(md5(concat('mix:', cast(doc_id as string))), 1, 15), 16, 10) as bigint)")
      val ranked = graft.ops.DistributedRank.rowNumber(
        Tables.documents(s, d).select(col("doc_id"), col("lang"))
          .withColumn("hk", hk),
        "r", Seq("lang"), Seq(col("hk"), col("doc_id")))
      val keptAgg = ranked
        .join(broadcast(alloc), col("lang") === col("alang"))
        .filter(col("r") <= col("alloc"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          md5(expr("array_join(array_sort(collect_list(doc_id)), ',')")
            .cast(BinaryType)).as("kept_md5"))
      alloc.join(keptAgg, col("alang") === col("lang"), "left")
        .select(col("alang").as("lang"), col("avail"), col("alloc"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("kept_md5"))
        .orderBy("lang")
    }),

    // Corpus data card — the per-language report every curation run
    // publishes with its output (the "datasheet" numbers): doc and
    // token counts, exact-duplicate rate (md5 over the normalized
    // text — a doc counts as dup iff its hash occurs ≥2 ANYWHERE in
    // the corpus), and the q25 quality-gate pass rate, all exact ppm.
    // One corpus scan feeds the per-doc frame; the dup census joins
    // 16-byte HASHES back (q129's hashes-not-text discipline); the
    // final rollup is languages-sized. Composition, oracle-gated:
    // the card's quality column replays q25's exact scoring.
    "q200_data_card" -> ((s, d) => {
      val per = withWords(s, d)
        .select(col("doc_id"), col("lang"),
          expr("n_chars div 4").as("toks"),
          md5(col("t").cast(BinaryType)).as("h"),
          (when(size(col("words")) >= 30, 1L).otherwise(0L)
            + when(expr("size(filter(words, x -> x in ('the', 'a'))) * 10")
                <= size(col("words")), 1L).otherwise(0L)
            + when(expr("(length(replace(t, ' ', '')) * 100) div size(words)")
                .between(300, 800), 1L).otherwise(0L)).as("score"))
      val dh = per.groupBy("h").agg(count(lit(1)).as("nh"))
        .filter(col("nh") >= 2).select(col("h").as("dh"))
      per.join(dh, col("h") === col("dh"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).cast(LongType).as("tokens"),
          count(col("dh")).as("dup_docs"),
          count(when(col("score") >= 2, 1)).as("pass_docs"))
        .select(col("lang"), col("n_docs"), col("tokens"),
          col("dup_docs"),
          expr("(dup_docs * 1000000) div n_docs").as("dup_ppm"),
          col("pass_docs"),
          expr("(pass_docs * 1000000) div n_docs").as("pass_ppm"))
        .select(col("lang"), col("n_docs"), col("tokens"), col("dup_docs"),
          col("dup_ppm"), col("pass_docs"), col("pass_ppm"))
        .orderBy("lang")
    }),

    // Normalization-ablation dedup — the measurement behind the
    // "normalize before you dedup" pipeline decision: per source, how
    // many exact-dup documents exist on the RAW bytes vs after the
    // engine's canonical text form (lower → strip non-alnum → collapse
    // whitespace, the q24/q108 shingle normalization), and the ppm of
    // extra duplicates normalization surfaces. Both censuses group by
    // a 32-byte md5 — text never reaches a shuffle; the two dup-hash
    // frames join back hash-keyed; gain_ppm is exact integer division
    // (norm dups ⊇ raw dups by construction, so it's non-negative).
    "q205_norm_dedup" -> ((s, d) => {
      val per = Tables.documents(s, d)
        .select(col("source"),
          md5(col("text").cast(BinaryType)).as("h_raw"),
          md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
            .cast(BinaryType)).as("h_norm"))
      def dups(c: String, out: String) = per
        .groupBy(col(c).as("h")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2).select(col("h").as(out))
      per
        .join(dups("h_raw", "dr"), col("h_raw") === col("dr"), "left")
        .join(dups("h_norm", "dn"), col("h_norm") === col("dn"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(col("dr")).as("raw_dups"),
          count(col("dn")).as("norm_dups"))
        .select(col("source"), col("n_docs"), col("raw_dups"), col("norm_dups"),
          expr("((norm_dups - raw_dups) * 1000000) div n_docs").as("gain_ppm"))
        .orderBy("source")
    }),

    // Context-length truncation ladder — the measurement behind the
    // max-sequence-length decision: for each candidate cap, how many
    // documents get truncated and what fraction of corpus tokens is
    // lost (q79's packer and q155's FIM consume the chosen cap). ONE
    // map-only pass: all four caps are conditional aggregates of the
    // same scan (count over cap, Σ min(toks, cap)), folded into a
    // single 1-row frame and exploded to the 4-row ladder — no join,
    // no second scan, drop ppm by exact integer division. Token
    // convention is q200's n_chars/4.
    "q207_trunc_ladder" -> ((s, d) => {
      val caps = Seq(64L, 128L, 256L, 512L)
      val aggd = Tables.documents(s, d)
        .select(expr("n_chars div 4").as("toks"))
        .agg(
          sum(col("toks")).as("total"),
          caps.flatMap(c => Seq(
            count(when(col("toks") > c, 1)).as(s"nt_$c"),
            sum(least(col("toks"), lit(c))).as(s"kept_$c"))): _*)
      // drop_ppm cross-multiplies in Decimal(38,0) (the q211
      // discipline): at 100 TB the dropped-token count under a small
      // cap is ~1e13, and ×1e6 wraps a Long — DuckDB's HUGEINT
      // arithmetic is the oracle mirror; the ppm quotient fits bigint.
      aggd.select(expr(
        "explode(array(" + caps.map(c =>
          s"struct(${c}L as cap, nt_$c as n_trunc, cast(kept_$c as bigint) as kept_toks, " +
            s"cast(((cast(total as decimal(38,0)) - kept_$c) * 1000000) div total as bigint) as drop_ppm)").mkString(", ") + "))")
        .as("r"))
        .select(col("r.cap"), col("r.n_trunc"), col("r.kept_toks"), col("r.drop_ppm"))
        .orderBy("cap")
    }),

    // Language-ID confusion matrix — the classifier AUDIT the q24
    // predictor needs before it gates a corpus: per (labeled, ?
    // predicted) cell, counts and the row-normalized share in exact
    // ppm (the diagonal is per-language recall). Same native
    // bigram_scores pass as q24 — run ONCE: the per-language totals
    // are sum(n) over the ~|langs|² matrix itself (a window on the
    // already-aggregated frame), not a second corpus scan; text never
    // shuffles.
    "q217_lang_confusion" -> ((s, d) => {
      val spec = markers.map(_._2.mkString(",")).mkString(";")
      val scored = withWords(s, d)
        .withColumn("sc", graft.Functions.bigram_scores(col("words"), spec))
      val Seq(en, fr, de, es, zh) =
        (1 to markers.length).map(i => element_at(col("sc"), i))
      val pred = scored.select(col("lang"),
        when(en >= fr && en >= de && en >= es && en >= zh, "en")
          .when(fr >= de && fr >= es && fr >= zh, "fr")
          .when(de >= es && de >= zh, "de")
          .when(es >= zh, "es")
          .otherwise("zh").as("predicted"))
      pred.groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
        .select(col("lang"), col("predicted"), col("n"),
          expr("(n * 1000000) div sum(n) over (partition by lang)")
            .as("cell_ppm"))
        .orderBy("lang", "predicted")
    }),

    // Duplication × quality association — "are duplicates junk?": the
    // q25/q200 heuristic pass rate among near-dup cluster members vs
    // singleton documents. A strong association justifies dropping
    // whole clusters; independence says dedup and quality gates earn
    // their keep separately. Dup membership is the distinct union of
    // q18's confirmed pair ends ((long) ids only); the quality score
    // rides the text scan; the 2-row report is exact ppm.
    "q218_quality_vs_dup" -> ((s, d) => {
      val pairs = DedupArtifacts.pairs(s, d)
        .select("doc_a", "doc_b")
      val dup = pairs.select(col("doc_a").as("doc_id"))
        .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
        .withColumn("is_dup", lit(1L))
      withWords(s, d)
        .select(col("doc_id"),
          (when(size(col("words")) >= 30, 1L).otherwise(0L)
            + when(expr("size(filter(words, x -> x in ('the', 'a'))) * 10")
                <= size(col("words")), 1L).otherwise(0L)
            + when(expr("(length(replace(t, ' ', '')) * 100) div size(words)")
                .between(300, 800), 1L).otherwise(0L)).as("score"))
        .join(dup, Seq("doc_id"), "left")
        .select(coalesce(col("is_dup"), lit(0L)).as("is_dup"),
          when(col("score") >= 2, 1L).otherwise(0L).as("pass"))
        .groupBy("is_dup")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("pass")).cast(org.apache.spark.sql.types.LongType).as("n_pass"))
        .withColumn("pass_ppm", expr("(n_pass * 1000000) div n_docs"))
        .orderBy("is_dup")
    }),

    // Pack fill-rate histogram — the efficiency report on q80's
    // sharded packer (how much of each 4096-char bin is actually
    // used; the tail bucket over 100% is the single overflow doc a
    // cumulative packer admits, the under-full buckets are the
    // per-(lang, shard) stream tails): per-pack char totals rolled
    // into exact 10%-point fill buckets — two partial-agg'd integer
    // rollups over the (doc_id, lang, n_chars, pack_id) assignment,
    // never the text.
    "q221_pack_fill" -> ((s, d) => {
      packBins(Tables.documents(s, d), 4096L, 8)
        .groupBy(col("lang"), col("pack_id"))
        .agg(sum(col("n_chars")).cast(org.apache.spark.sql.types.LongType)
          .as("chars"), count(lit(1)).as("n_docs"))
        .select(expr("(chars * 10) div 4096").as("fill_bucket"),
          col("chars"), col("n_docs"))
        .groupBy("fill_bucket")
        .agg(count(lit(1)).as("n_packs"),
          sum(col("n_docs")).cast(org.apache.spark.sql.types.LongType)
            .as("n_docs"),
          sum(col("chars")).cast(org.apache.spark.sql.types.LongType)
            .as("sum_chars"))
        .orderBy("fill_bucket")
    }),

    // Padding-waste audit — the FINE-TUNING batch-assembly decision
    // (q79's packing concatenates for pretraining; SFT batches pad
    // every sequence to the batch max): batches of 32 docs under
    // three orderings — arrival (doc_id), global length-sorted, and
    // 64-token length BUCKETS (the production middle ground: sorted
    // batching's fill without its epoch-long length correlation) —
    // each scored by padded tokens and fill ppm. Ranks come from
    // DistributedRank (range-partitioned, never a one-partition
    // window); each arm rolls batches-sized frames into ONE row, so
    // the union ships 3 rows total. Ratios cross-multiply in
    // Decimal(38,0)/HUGEINT — token·1e6 products outgrow Long at
    // real corpus sizes.
    "q243_pad_waste" -> ((s, d) => {
      val base = graft.ops.Barrier(withWords(s, d)
        .select(col("doc_id"), size(col("words")).cast(LongType).as("len")))
      def audit(ranked: DataFrame, name: String, batchKey: Seq[Column]): DataFrame =
        ranked
          .withColumn("batch", expr("(r - 1) div 32"))
          .groupBy((batchKey :+ col("batch")): _*)
          .agg(count(lit(1)).as("n"), max("len").as("mx"),
            sum("len").cast(LongType).as("sl"))
          .agg(count(lit(1)).as("n_batches"),
            sum(col("mx") * col("n") - col("sl")).cast(LongType).as("padded_tokens"),
            sum(col("sl")).cast(LongType).as("real_tokens"),
            sum(col("mx") * col("n")).cast(LongType).as("slot_tokens"))
          .select(lit(name).as("strategy"), col("n_batches"),
            col("padded_tokens"),
            expr("""cast((cast(real_tokens as decimal(38,0)) * 1000000)
                         div cast(slot_tokens as decimal(38,0)) as bigint)""")
              .as("fill_ppm"))
      val withBucket = base.withColumn("bucket", expr("len div 64"))
      audit(graft.ops.DistributedRank.rowNumber(
          base, "r", Seq.empty, Seq(col("doc_id"))), "arrival", Seq.empty)
        .unionAll(audit(graft.ops.DistributedRank.rowNumber(
          base, "r", Seq.empty, Seq(col("len").desc, col("doc_id"))), "sorted", Seq.empty))
        .unionAll(audit(graft.ops.DistributedRank.rowNumber(
          withBucket, "r", Seq("bucket"), Seq(col("doc_id"))), "bucketed",
          Seq(col("bucket"))))
        .orderBy("strategy")
    }),

    // Quality-model ROC AUC vs near-dup membership — the THRESHOLD-
    // FREE evaluation of the q84 scorer that q218's fixed-cut 2×2
    // can't give: exact Mann-Whitney U with midrank ties over the
    // milli-quantized score, auc = P(score_dup > score_clean) + ½
    // P(=). Pairs never materialize: group docs by quantized score
    // (domain-bounded — the 64-weight model keeps scores in a fixed
    // range, so buckets are ~1e5 regardless of corpus size), then
    // U×2 = Σ_s n_pos(s)·(2·#neg_below(s) + n_neg(s)) via one
    // cumulative window over the bucket rollup — corpus-sized work is
    // ONE partial-agg'd groupBy; the window state is score-range-
    // bounded. Counts cross-multiply in Decimal(38,0): P·N overflows
    // Long at ~10^10 docs. An AUC near 0.5 means quality and
    // duplication are independent signals (filter them separately);
    // far from 0.5 means one subsumes the other.
    "q246_quality_auc" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val pairs = DedupArtifacts.pairs(s, d).select("doc_a", "doc_b")
      val dup = pairs.select(col("doc_a").as("doc_id"))
        .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
        .withColumn("is_dup", lit(1L))
      val cells = withWords(s, d)
        .select(col("doc_id"),
          floor(qmScore(col("words")) * lit(1000.0d)).cast(LongType).as("sq"))
        .join(dup, Seq("doc_id"), "left")
        .select(col("sq"), coalesce(col("is_dup"), lit(0L)).as("is_dup"))
        .groupBy("sq")
        .agg(sum(col("is_dup")).as("n_pos"),
          sum(lit(1L) - col("is_dup")).as("n_neg"))
      val wCum = Window.orderBy("sq")
        .rowsBetween(Window.unboundedPreceding, -1)
      cells
        .withColumn("cneg", coalesce(sum(col("n_neg")).over(wCum), lit(0L)))
        .agg(sum("n_pos").cast(LongType).as("n_pos"),
          sum("n_neg").cast(LongType).as("n_neg"),
          sum(col("n_pos").cast(DecimalType(38, 0))
            * (col("cneg") * 2 + col("n_neg"))).as("u2"))
        .select(col("n_pos"), col("n_neg"),
          expr("""cast((u2 * 1000000) div (2 * cast(n_pos as decimal(38,0))
                       * cast(n_neg as decimal(38,0))) as bigint)""").as("auc_ppm"))
    }),

    // Inter-filter agreement (Cohen's kappa) — heuristic gate (q25's
    // score ≥ 2) vs model gate (q84's score > 0): how much do the two
    // quality filters agree BEYOND chance? κ near 1 means the cheap
    // heuristic can pre-filter for the model (cascade saves the model
    // pass on most docs); κ near 0 means they fire on different docs
    // and both gates carry signal. One corpus scan computes both
    // verdicts (the scorers share the words array), one partial-agg'd
    // 2×2 census, then exact integers: κ = 2(ad−bc) /
    // ((a+b)(b+d)+(a+c)(c+d)) in Decimal(38,0) (a·d overflows Long at
    // ~10^10 docs), ppm with explicit sign handling so Spark's
    // truncating `div` and DuckDB's flooring `//` agree on negatives.
    "q247_filter_kappa" -> ((s, d) => {
      val verdicts = withWords(s, d)
        .select(
          (when(size(col("words")) >= 30, 1L).otherwise(0L)
            + when(expr("size(filter(words, x -> x in ('the', 'a'))) * 10")
                <= size(col("words")), 1L).otherwise(0L)
            + when(expr("(length(replace(t, ' ', '')) * 100) div size(words)")
                .between(300, 800), 1L).otherwise(0L) >= 2L).as("hpass"),
          (qmScore(col("words")) > 0).as("mpass"))
      verdicts
        .agg(
          sum(when(col("hpass") && col("mpass"), 1L).otherwise(0L))
            .cast(DecimalType(38, 0)).as("a"),
          sum(when(col("hpass") && !col("mpass"), 1L).otherwise(0L))
            .cast(DecimalType(38, 0)).as("b"),
          sum(when(!col("hpass") && col("mpass"), 1L).otherwise(0L))
            .cast(DecimalType(38, 0)).as("c"),
          sum(when(!col("hpass") && !col("mpass"), 1L).otherwise(0L))
            .cast(DecimalType(38, 0)).as("dd"))
        .select(
          col("a").cast(LongType).as("both_pass"),
          col("b").cast(LongType).as("heur_only"),
          col("c").cast(LongType).as("model_only"),
          col("dd").cast(LongType).as("neither"),
          expr("""cast(case when 2*(a*dd - b*c) < 0 then -1 else 1 end
                       * ((abs(2*(a*dd - b*c)) * 1000000)
                          div ((a+b)*(b+dd) + (a+c)*(c+dd))) as bigint)""")
            .as("kappa_ppm"))
    }),

    // Source quality triage with Wilson lower bounds — ranking
    // sources by RAW pass rate over-trusts small sources (a 3-doc
    // source at 3/3 is not better evidence than 9,000/10,000); the
    // Wilson score interval's lower bound (z = 1.96) is the standard
    // small-sample-corrected ranking statistic. Exact integer (n, k)
    // per source from one partial-agg'd rollup; the bound itself is
    // a fixed IEEE expression of (n, k) — engine-identical — floored
    // to ppm so the output stays integer. At 100 TB the rollup is
    // sources-sized; the triage decision (drop / sample / keep per
    // source) feeds q62's cap table.
    "q248_wilson" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("source"),
          trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).as("t"))
        .withColumn("words", split(col("t"), " "))
        .select(col("source"),
          (when(size(col("words")) >= 30, 1L).otherwise(0L)
            + when(expr("size(filter(words, x -> x in ('the', 'a'))) * 10")
                <= size(col("words")), 1L).otherwise(0L)
            + when(expr("(length(replace(t, ' ', '')) * 100) div size(words)")
                .between(300, 800), 1L).otherwise(0L)).as("score"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score") >= 2, 1L).otherwise(0L)).as("n_pass"))
        .select(col("source"), col("n_docs"), col("n_pass"),
          expr("cast((n_pass * 1000000) div n_docs as bigint)").as("pass_ppm"),
          {
            // explicit double lits: a bare 1.9208 parses as DECIMAL in
            // both engines' SQL and would take the decimal-division
            // path in one and not the other — the Column form pins
            // every step to IEEE doubles, mirrored 1:1 in the oracle
            val nD = col("n_docs").cast(DoubleType)
            val p = col("n_pass").cast(DoubleType) / nD
            val lb = (p + lit(1.9208d) / nD
              - lit(1.96d) * sqrt((p * (lit(1.0d) - p) + lit(0.9604d) / nD) / nD)) /
              (lit(1.0d) + lit(3.8416d) / nD)
            floor(lit(1000000.0d) * lb).cast(LongType).as("wilson_lb_ppm")
          })
        .orderBy("source")
    }),

    // Shingle-vocabulary coverage ladder — the vocabulary-budget
    // curve: what share of all 3-word-shingle OCCURRENCES do the
    // top-100 / top-1k / top-10k most frequent shingle TYPES cover?
    // Steep coverage (few types dominate) signals template/boiler-
    // plate density (q89's scrub targets); flat coverage means
    // genuinely diverse text. The type rollup partial-aggregates;
    // ranking uses DistributedRank (never a one-partition corpus
    // window); the cumulative window then runs over the top-10k
    // SUBSET only (rung-bounded state at any corpus size) and each
    // rung reads its exact rank row. The 1-row occurrence total
    // broadcasts back for the exact ppm share.
    "q249_coverage_ladder" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = graft.ops.Barrier(withWords(s, d)
        .filter(size(col("words")) >= 3)
        .select(explode(expr(
          "transform(sequence(1, size(words) - 2), i -> array_join(slice(words, i, 3), ' '))"))
          .as("sh"))
        .groupBy("sh").agg(count(lit(1)).as("cnt")))
      val tot = counts.agg(sum(col("cnt")).cast(LongType).as("total"))
      val ranked = graft.ops.DistributedRank.rowNumber(
          counts, "r", Seq.empty, Seq(col("cnt").desc, col("sh")))
        .filter(col("r") <= 10000L)
      val wCum = Window.orderBy("r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ranked
        .withColumn("covered", sum(col("cnt")).over(wCum).cast(LongType))
        .filter(col("r").isin(100L, 1000L, 10000L))
        .crossJoin(broadcast(tot))
        .select(col("r").as("top_v"), col("covered"), col("total"),
          expr("cast((covered * 1000000) div total as bigint)")
            .as("coverage_ppm"))
        .orderBy("top_v")
    }),

    // Poisson-bootstrap confidence interval — the distributed
    // bootstrap: classical resampling needs n draws WITH replacement
    // per replicate (a global operation), but Poisson(1) multiplicities
    // per (row, replicate) approximate it row-LOCALLY, which is the
    // standard way to bootstrap a 100 TB metric in one scan. Each of
    // B = 100 replicates assigns every doc a multiplicity from the
    // exact inverse-CDF ppm ladder over the md5 gate (deterministic —
    // the oracle replays every draw; tail capped at 9, P < 2e-6), one
    // partial-agg'd rollup lands B (Σm·x, Σm) rows, replicate means
    // are one IEEE division each, and the 95% CI reads nearest-rank
    // order statistics 3 and 98 from a B-row window. Reported against
    // the full-corpus point estimate (1-row broadcast). The metric
    // here is mean chars/doc; any per-row metric slots into the same
    // harness.
    "q252_bootstrap" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      val means = docs
        .select(col("doc_id"), col("n_chars"),
          explode(sequence(lit(0), lit(99))).as("b"))
        .withColumn("u", expr("""pmod(cast(conv(substring(md5(concat('boot:',
          cast(b as string), ',', cast(doc_id as string))), 1, 15), 16, 10)
          as bigint), 1000000)"""))
        .withColumn("m",
          (col("u") >= 367879).cast(LongType) + (col("u") >= 735758).cast(LongType)
            + (col("u") >= 919698).cast(LongType) + (col("u") >= 981011).cast(LongType)
            + (col("u") >= 996340).cast(LongType) + (col("u") >= 999405).cast(LongType)
            + (col("u") >= 999916).cast(LongType) + (col("u") >= 999989).cast(LongType)
            + (col("u") >= 999998).cast(LongType))
        .groupBy("b")
        .agg(sum(col("m") * col("n_chars")).as("sx"), sum(col("m")).as("sm"))
        .select(col("b"),
          (col("sx").cast(DoubleType) / col("sm").cast(DoubleType)).as("mean_b"))
      val ci = means
        .withColumn("r", row_number().over(Window.orderBy(col("mean_b"), col("b"))))
        .filter(col("r") === 3 || col("r") === 98)
        .agg(min(col("mean_b")).as("ci_lo"), max(col("mean_b")).as("ci_hi"))
      docs.agg((sum(col("n_chars")).cast(DoubleType)
          / count(lit(1)).cast(DoubleType)).as("mean_chars"))
        .crossJoin(broadcast(ci))
    }),

    // Neyman allocation — the survey-sampling OPTIMAL split of a
    // labeling/eval budget across strata: n_h ∝ N_h·σ_h (allocating
    // by size alone oversamples homogeneous strata; variance-
    // proportional allocation minimizes the estimator variance for a
    // fixed budget). Per-language exact integer moments give
    // SS_h = m·Σx² − (Σx)² in Decimal(38,0) (char-count squares sum
    // past Long at corpus scale), N_h·σ_h = √SS_h since N_h = m_h,
    // budget B = 1000 splits by largest-remainder rounding (floor +
    // rank-by-remainder top-up — allocations sum to B EXACTLY, ties
    // break on lang). One partial-agg'd corpus rollup; every window
    // after runs on the languages-sized table.
    "q256_neyman" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tot = Window.partitionBy(lit(1))
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("m"),
          sum(col("n_chars").cast(DecimalType(38, 0))).as("sx"),
          sum((col("n_chars") * col("n_chars")).cast(DecimalType(38, 0)))
            .as("sxx"))
        .withColumn("ss", expr("cast(m as decimal(38,0)) * sxx - sx * sx"))
        .withColumn("w", sqrt(col("ss").cast(DoubleType)))
        .withColumn("frac",
          col("w") * lit(1000.0d) / sum(col("w")).over(tot))
        .withColumn("base", floor(col("frac")).cast(LongType))
        .withColumn("rem", col("frac") - col("base").cast(DoubleType))
        .withColumn("leftover", lit(1000L) - sum(col("base")).over(tot))
        .withColumn("rk", row_number()
          .over(Window.orderBy(desc("rem"), col("lang"))).cast(LongType))
        .select(col("lang"), col("m").as("n_docs"),
          col("ss").cast(LongType).as("ss"),
          (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
            .as("alloc"))
        .orderBy("lang")
    }),

    // Partition-skew planning report — the table you read BEFORE
    // choosing a repartition/bucketing key: for each candidate key,
    // group count, the biggest group's row share, and the Amdahl
    // parallelism bound n_rows div max_group (the straggler task's
    // share caps useful parallelism no matter how many executors you
    // add — a key with bound 2 serializes the stage; this is exactly
    // why q80/q128's packing shards by (lang, shard) not lang). Three
    // partial-agg'd rollups union'd; each audit row is one exact-
    // integer aggregate over its groups-sized census.
    "q259_skew_report" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      def audit(keyName: String, census: DataFrame): DataFrame =
        census.agg(count(lit(1)).as("n_groups"),
            sum(col("c")).cast(LongType).as("n_rows"),
            max(col("c")).as("max_group"))
          .select(lit(keyName).as("part_key"), col("n_groups"),
            col("n_rows"), col("max_group"),
            expr("cast((max_group * 1000000) div n_rows as bigint)")
              .as("max_share_ppm"),
            expr("cast(n_rows div max_group as bigint)")
              .as("parallelism_bound"))
      audit("lang", docs.groupBy("lang").agg(count(lit(1)).as("c")))
        .unionAll(audit("source",
          docs.groupBy("source").agg(count(lit(1)).as("c"))))
        .unionAll(audit("lang_x_source",
          docs.groupBy("lang", "source").agg(count(lit(1)).as("c"))))
        .orderBy("part_key")
    }),

    // Output-layout shard plan — the WRITE-side sizing decision q79/
    // q80 is for training batches: per (lang, source) partition of a
    // partitioned corpus write, exact byte totals and the
    // ceil-division shard count that bounds every output file at the
    // byte budget (4096 chars here, ~512 MB in production) without
    // the small-files explosion (total files = Σ ceil(bytes/target),
    // the minimum respecting the bound — see graft.ops.OutputLayout,
    // whose plan() this query IS; OutputLayout.write applies it as a
    // broadcast-join + (keys, shard) repartition so each (dir, shard)
    // lands as exactly one task's file). One map-side-combined
    // rollup; groups = |langs × sources|; all integer arithmetic.
    "q224_shard_plan" -> ((s, d) => {
      graft.ops.OutputLayout
        .plan(Tables.documents(s, d), Seq("lang", "source"), "n_chars", 4096L)
        .withColumn("avg_shard_bytes", expr("bytes div n_shards"))
        .orderBy("lang", "source")
    }),

    // Corpus integrity digest — replication/migration validation at
    // CONSTANT comparison cost: q129 diffs two snapshots row-by-row
    // (a content-hash join — the right tool when you need to know
    // WHICH rows differ); this answers "do the two copies agree AT
    // ALL" by comparing |sources| rows instead of shipping either
    // corpus. Per source: row count + an ORDER-INDEPENDENT content
    // digest — sum over rows of the 60-bit md5 of the canonical
    // field concatenation (engine-portable), accumulated exactly in
    // Decimal(38,0) (a Long sum of 1e18-sized hashes wraps
    // immediately; DuckDB's HUGEINT sum is the oracle mirror) and
    // folded mod 2^61 at presentation. Order-independence means NO
    // sort anywhere: any partitioning, any row order, any cluster
    // size produces the same digest — two clusters compare their
    // k-row frames and re-run q129 only on sources whose digests
    // disagree. Map-only hash + one partial-agg'd rollup; text never
    // leaves the scan.
    "q225_integrity_digest" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("source"),
          expr("cast(conv(substring(md5(concat_ws('', " +
            "cast(doc_id as string), text, lang, cast(n_chars as string)" +
            ")), 1, 15), 16, 10) as bigint)").as("h"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_rows"),
          expr("cast(pmod(sum(cast(h as decimal(38,0))), " +
            "2305843009213693952) as bigint)").as("digest"))
        .orderBy("source")
    }),

    // Blocked front-coding audit — the dictionary-compression
    // planning measurement next to q197's posting-list bit budget:
    // term dictionaries (q94's index, BPE vocabs) ship sorted, and
    // front coding stores each term as (LCP-with-previous, suffix) —
    // here over the 3-word PHRASE dictionary (phrase indexes /
    // n-gram LM tables are where dictionaries get big and
    // prefix-heavy; the synthetic unigram vocab is 31 terms)
    // within prefix blocks (blocks reset the chain — exactly how
    // Lucene/parquet dictionary pages do it, and what keeps the
    // operator parallel: block = 2-char prefix, so the window is
    // block-partitioned, never a global term chain). LCP via the
    // monotone prefix-count identity (count of i where the two
    // length-i prefixes match — no UDF, same HOF both engines).
    // Vocab-sized work throughout; one-row rollup.
    "q235_frontcode" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val vocab = withWords(s, d)
        .select(explode(graft.Functions.word_shingles(col("t"), 3)).as("term"))
        .distinct()
        .withColumn("block", substring(col("term"), 1, 2))
      val w = Window.partitionBy("block").orderBy("term")
      vocab
        .withColumn("prev", lag(col("term"), 1).over(w))
        .withColumn("lcp", when(col("prev").isNull, 0L).otherwise(
          expr("""cast(size(filter(sequence(1, least(length(prev), length(term))),
                    i -> substring(prev, 1, i) = substring(term, 1, i))) as bigint)""")))
        .agg(count(lit(1)).as("n_terms"),
          countDistinct(col("block")).as("n_blocks"),
          sum(length(col("term")).cast(LongType)).as("raw_bytes"),
          sum(col("lcp")).as("lcp_bytes"))
        .select(col("n_terms"), col("n_blocks"), col("raw_bytes"),
          col("lcp_bytes"),
          (col("raw_bytes") - col("lcp_bytes")).as("coded_bytes"),
          expr("(lcp_bytes * 1000000) div raw_bytes").as("savings_ppm"))
    }),

    // Leave-one-source-out data valuation — the attribution question
    // every mixture decision rests on: which source drags the
    // corpus-level quality metric down (removing it RAISES the mean)
    // and which props it up? Metric = the q84/q116 quantized model
    // score; LOO mean for source i needs only (N, T, n_i, s_i) — ONE
    // corpus pass (partial-agg'd per-source rollup) + a sources-sized
    // fold, never a per-source re-scan. Exact integers: scores ride
    // a +100000 shift so every dividend stays positive (Spark div
    // truncates, DuckDB // floors — the packBins discipline); the
    // shift cancels in the delta.
    "q236_loo_source" -> ((s, d) => {
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).as("t"))
        .withColumn("words", split(col("t"), " "))
        .select(col("doc_id"), col("source"),
          (floor(qmScore(col("words")) * 1000).cast(LongType)
            + lit(100000L)).as("sqp"))
      val per = scored.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("sqp")).as("s_i"))
      val tot = per.agg(sum(col("n_docs")).as("n_tot"),
        sum(col("s_i")).as("t_tot"))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"),
          expr("(t_tot * 1000000) div n_tot").as("mean_sc"),
          expr("((t_tot - s_i) * 1000000) div (n_tot - n_docs)").as("loo_mean_sc"))
        .withColumn("delta_sc", col("loo_mean_sc") - col("mean_sc"))
        .orderBy("source")
    }),

    // Cross-source quantile normalization — the calibration step that
    // makes quality scores COMPARABLE across heterogeneous sources
    // (a web crawl's 60th percentile and a books corpus's 60th
    // percentile should gate the same): each doc's within-source rank
    // maps to the global score at the same quantile, g = (r·N) div
    // n_s (clamped to ≥1), i.e. classic quantile normalization onto
    // the pooled distribution. Scores ride the q84/q116 integer
    // quantization (sq = floor(score·1000)); BOTH rank passes go
    // through DistributedRank (per-source AND global — sources and
    // "all" are exactly the few-group shapes that collapse a plain
    // window); the remap is one integer-keyed corpus join against the
    // global rank→score table. Deterministic: total order (sq,
    // doc_id) everywhere.
    "q234_qnorm" -> ((s, d) => {
      val scored = graft.ops.Barrier(
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).as("t"))
          .withColumn("words", split(col("t"), " "))
          .select(col("doc_id"), col("source"),
            floor(qmScore(col("words")) * 1000).cast(LongType).as("sq")))
      val bySrc = graft.ops.DistributedRank.rowNumber(
        scored, "r", Seq("source"), Seq(col("sq"), col("doc_id")))
      val glob = graft.ops.DistributedRank.rowNumber(
          scored.select(col("sq"), col("doc_id")), "g",
          Seq.empty, Seq(col("sq"), col("doc_id")))
        .select(col("g"), col("sq").as("sq_norm"))
      val counts = scored.groupBy("source").agg(count(lit(1)).as("n_s"))
      val nTot = scored.agg(count(lit(1)).as("n_tot"))
      bySrc.join(broadcast(counts), "source")
        .crossJoin(broadcast(nTot))
        .withColumn("g", greatest(expr("(r * n_tot) div n_s"), lit(1L)))
        .join(glob, "g")
        .select(col("doc_id"), col("source"), col("sq"), col("sq_norm"))
        .orderBy("doc_id")
    }),

    // Elastic-reshard planning — the data-movement audit behind every
    // cluster/bucket-count resize: when shards grow 32 → 40, what
    // fraction of the corpus MOVES under (a) mod assignment (h mod n:
    // nearly everything relocates — 1 − 1/lcm-ish) vs (b) rendezvous
    // (HRW) hashing (shard = argmax_s hash(doc, s): only docs whose
    // argmax lands on a NEW shard move, ≈ 8/40 = 20%) — the quantified
    // case for consistent placement of bucketed corpora (q135's
    // bucketing, IvfIndex partitions) where a resize would otherwise
    // re-shuffle 100 TB. Map-only per-doc arithmetic (the argmax is a
    // bounded 40-element array fold; md5-derived weights keep the
    // oracle engine-portable — production swaps in xxhash64), one
    // partial-agg'd 2-row rollup. Deterministic: struct array_max
    // breaks weight ties by shard id identically in both engines.
    "q231_reshard" -> ((s, d) => {
      def hrwShard(n: Int): String =
        s"""array_max(transform(sequence(0, ${n - 1}), s -> struct(
              cast(conv(substring(md5(concat(cast(doc_id as string), '#', cast(s as string))), 1, 15), 16, 10) as bigint) as w,
              s as s))).s"""
      val h = expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)")
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val modArm = docs
        .select(lit("mod").as("method"),
          (pmod(h, lit(32L)) =!= pmod(h, lit(40L))).as("moved"))
      val hrwArm = docs
        .select(lit("rendezvous").as("method"),
          (expr(hrwShard(32)) =!= expr(hrwShard(40))).as("moved"))
      modArm.unionByName(hrwArm)
        .groupBy("method")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("moved"), 1L).otherwise(0L)).as("n_moved"))
        .withColumn("moved_ppm", expr("(n_moved * 1000000) div n_docs"))
        .orderBy("method")
    }),

    // Retrieval evaluation harness — the metrics layer every search/
    // RAG stack needs over its ranking arms (q96 BM25, q104 hybrid):
    // MRR, precision@k and recall@k of the BM25 top-20 against a
    // deterministic relevance set (docs containing ALL three query
    // terms — derived from the same tf pass the scorer uses, so the
    // oracle replays it exactly). All metrics are EXACT ppm integers
    // (1e6 div rank / counts) — no IEEE beyond the already-pinned
    // BM25 scores. Scale shape: the corpus does one relevance pass
    // (partial-agg'd count) + the ranking arm's own distributed
    // top-k; ranks come from a POST-LIMIT 20-row window (q223
    // discipline), metrics fold 20 rows, n_relevant broadcasts.
    "q230_retrieval_eval" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val rel = withWords(s, d).select(col("doc_id"),
        (expr("size(filter(words, x -> x = 'vector')) > 0") &&
          expr("size(filter(words, x -> x = 'scan')) > 0") &&
          expr("size(filter(words, x -> x = 'dup')) > 0")).as("is_rel"))
      val nrel = rel.agg(
        sum(when(col("is_rel"), 1L).otherwise(0L)).as("n_relevant"))
      val wR = Window.orderBy(desc("score"), col("doc_id"))
      bm25Top20(s, d)
        .join(rel, "doc_id")
        .withColumn("rank", row_number().over(wR).cast(LongType))
        .agg(
          sum(when(col("is_rel") && col("rank") <= 5, 1L).otherwise(0L))
            .as("hits5"),
          sum(when(col("is_rel") && col("rank") <= 10, 1L).otherwise(0L))
            .as("hits10"),
          sum(when(col("is_rel"), 1L).otherwise(0L)).as("hits20"),
          min(when(col("is_rel"), col("rank"))).as("first_rel"))
        .crossJoin(broadcast(nrel))
        .select(col("n_relevant"), col("hits5"), col("hits10"),
          col("hits20"),
          expr("(hits5 * 1000000) div 5").as("p5_ppm"),
          expr("(hits10 * 1000000) div 10").as("p10_ppm"),
          expr("(hits20 * 1000000) div 20").as("p20_ppm"),
          expr("(hits20 * 1000000) div n_relevant").as("r20_ppm"),
          coalesce(expr("1000000 div first_rel"), lit(0L)).as("mrr_ppm"))
    }),

    // Curriculum schedule — the composition of the quality ladder
    // (q127's within-language model-score deciles) with the
    // deterministic shuffle (q184's salted-hash order): training
    // reads stage 0 (top-3 deciles) first, then 1 (deciles 4–7),
    // then 2 — easy/clean → hard/noisy — while WITHIN a stage the
    // order is uniform-random-looking, seeded, and stable under
    // append (a doc's (stage, pos) depends only on its content
    // score and id). Three stages through a plain window would
    // collapse the corpus onto 3 tasks — exactly the few-group
    // shape DistributedRank exists for (range-partition + offset
    // arithmetic, `parts`-way parallel). Per-lang decile window is
    // the q127 shape; q116's histogram sketch remains the
    // documented no-rank scale path for the scoring stage.
    "q226_curriculum" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wRank = Window.partitionBy("lang").orderBy(desc("score"), col("doc_id"))
      val staged = withWords(s, d)
        .select(col("doc_id"), col("lang"),
          qmScore(col("words")).as("score"))
        .withColumn("decile", ntile(10).over(wRank))
        .withColumn("stage",
          when(col("decile") <= 3, 0L).when(col("decile") <= 7, 1L)
            .otherwise(2L))
      val salted = expr(
        "cast(conv(substring(md5(concat(cast(doc_id as string), ':curriculum-seed-7')), 1, 15), 16, 10) as bigint)")
      graft.ops.DistributedRank.rowNumber(
          staged.select(col("doc_id"), col("lang"), col("stage"),
            salted.as("h")),
          "pos", Seq("stage"), Seq(col("h"), col("doc_id")))
        .select(col("doc_id"), col("lang"), col("stage"), col("pos"))
        .orderBy("stage", "pos")
    }),

    // Zone-map (min/max) data-skipping audit — the MEASUREMENT under
    // the layout operators (q93 z-order tiles, q224 shard plan): how
    // many 50-row zones a range predicate (n_chars BETWEEN 200 AND
    // 240) must scan under the natural arrival layout (doc_id order)
    // vs a clustered layout (n_chars order) — the exact arithmetic
    // parquet row-group pruning performs against footer min/max
    // stats, where "zone" = row group and clustering = the write-side
    // ORDER BY. Zone rank comes from DistributedRank (a global
    // row_number through a plain window is the 1-task shape); per-
    // zone min/max/match are one partial-agg'd rollup; the final
    // fold is zones-sized. Clustered layout scans the 1-2 zones
    // whose [lo, hi] straddles the band; natural scans ~all — the
    // quantified case for sorting 100 TB writes on the hot filter
    // column.
    "q228_zonemap" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"))
      def zones(layout: String, order: Seq[Column]): DataFrame =
        graft.ops.DistributedRank.rowNumber(docs, "rk", Seq.empty, order)
          .withColumn("zone", expr("(rk - 1) div 50"))
          .groupBy("zone")
          .agg(count(lit(1)).as("n_rows"),
            min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"),
            sum(when(col("n_chars").between(200, 240), 1L).otherwise(0L))
              .as("n_match"))
          .agg(count(lit(1)).as("n_zones"),
            sum(when(col("hi") >= 200 && col("lo") <= 240, 1L)
              .otherwise(0L)).as("zones_scanned"),
            sum(when(col("hi") >= 200 && col("lo") <= 240, col("n_rows"))
              .otherwise(0L)).as("rows_scanned"),
            sum(col("n_match")).as("n_match"))
          .select(lit(layout).as("layout"), col("n_zones"),
            col("zones_scanned"), col("rows_scanned"), col("n_match"))
      zones("clustered", Seq(col("n_chars"), col("doc_id")))
        .unionByName(zones("natural", Seq(col("doc_id"))))
        .orderBy("layout")
    })
  )

  /** q96's BM25 scoring (query {vector, scan, dup}, k1 = 1.2,
    * b = 0.75, raw-ratio idf), shared with the q104 hybrid fusion. */
  private def bm25Top20(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("vector", "scan", "dup")
    def tfOf(t: String) = s"size(filter(words, w -> w = '$t'))"
    val statsAgg = withWords(s, d)
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("words"))).as("sum_dl") +:
          terms.zipWithIndex.map { case (t, i) =>
            sum(when(expr(tfOf(t)) > 0, 1L).otherwise(0L)).as(s"df$i")
          }: _*)
    val scored = withWords(s, d)
      .select(col("doc_id"), col("words"))
      .crossJoin(broadcast(statsAgg))
      .withColumn("dl", size(col("words")))
      .withColumn("avgdl", expr("cast(sum_dl as double) / n_docs"))
    val withScores = terms.zipWithIndex.foldLeft(scored) { case (df, (t, i)) =>
      df.withColumn(s"s$i", expr(
        s"""(((n_docs - df$i) + 0.5d) / (df$i + 0.5d))
            * ((${tfOf(t)} * 2.2d)
               / (${tfOf(t)} + 1.2d * (0.25d + 0.75d
                  * (cast(dl as double) / avgdl))))"""))
    }
    withScores
      .select(col("doc_id"),
        expr("(s0 + s1) + s2").as("score"))
      .filter(col("score") > 0d)
      .orderBy(desc("score"), col("doc_id"))
      .limit(20)
  }

  private val normDuck =
    "trim(regexp_replace(lower(text),'[^a-z0-9]+',' ','g'))"

  /** The q96 BM25 scoring CTEs (binds `sc` with per-term scores) —
    * shared by the q96 and q104 oracles, in lockstep with
    * [[bm25Top20]]. */
  private lazy val bm25Duck =
    s"""n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, string_split(t, ' ') words FROM n),
          tf AS (SELECT doc_id, len(words) dl,
                   len(list_filter(words, x -> x = 'vector')) tf0,
                   len(list_filter(words, x -> x = 'scan')) tf1,
                   len(list_filter(words, x -> x = 'dup')) tf2
                 FROM w),
          st AS (SELECT count(*) n_docs, sum(dl) sum_dl,
                   sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) df0,
                   sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) df1,
                   sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) df2
                 FROM tf),
          sc AS (SELECT doc_id,
                   (((n_docs - df0) + 0.5) / (df0 + 0.5))
                     * ((tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75
                        * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs))))) s0,
                   (((n_docs - df1) + 0.5) / (df1 + 0.5))
                     * ((tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75
                        * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs))))) s1,
                   (((n_docs - df2) + 0.5) / (df2 + 0.5))
                     * ((tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75
                        * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs))))) s2
                 FROM tf CROSS JOIN st)"""

  val oracleSql: Map[String, String] = Map(
    "q184_shuffle" ->
      """WITH h AS (
           SELECT doc_id,
                  CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':shuffle-seed-42')),1,15)) AS BIGINT) h
           FROM documents),
         s AS (SELECT doc_id, h, h % 32 AS shard FROM h)
         SELECT doc_id, shard,
                CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) pos
         FROM s ORDER BY shard, pos""",
    // exact heavy hitters — the sketch is invisible to the result
    "q54_heavy" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT unnest(string_split(t, ' ')) AS word FROM n),
          ww AS (SELECT word FROM w WHERE word <> ''),
          tot AS (SELECT count(*) AS tn FROM ww)
          SELECT word, count(*) AS n_word
          FROM ww GROUP BY word
          HAVING count(*) * 1000 > (SELECT tn FROM tot)
          ORDER BY word""",
    // CMS counters replayed as a (row, bucket) GROUP BY over the same
    // universal-hash mix; point queries LEFT JOIN the counter table
    // (missing bucket = 0) — integer-exact parity with cms_agg.
    "q118_cms" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT unnest(string_split(t, ' ')) AS word FROM n),
          ww AS (SELECT word, CAST(concat('0x', substr(md5(word),1,15)) AS BIGINT) % 2147483647 hm
                 FROM w WHERE word <> ''),
          cms AS (SELECT r, ((1103515245*(r+1)+12345) % 2147483647 * hm + 977*(r+1)) % 2147483647 % 512 AS b,
                         count(*) c
                  FROM ww, unnest(range(0, 4)) t(r) GROUP BY 1, 2),
          watch(term) AS (VALUES ('a'),('customer'),('data'),('error'),('key'),
                                 ('request'),('supplier'),('the'),('zzqqabsent')),
          wh AS (SELECT term, CAST(concat('0x', substr(md5(term),1,15)) AS BIGINT) % 2147483647 hm
                 FROM watch),
          lk AS (SELECT term, r, ((1103515245*(r+1)+12345) % 2147483647 * hm + 977*(r+1)) % 2147483647 % 512 AS b
                 FROM wh, unnest(range(0, 4)) t(r)),
          est AS (SELECT term, min(coalesce(c, 0)) est FROM lk LEFT JOIN cms USING (r, b) GROUP BY term),
          ex AS (SELECT word term, count(*) cnt FROM ww GROUP BY 1)
          SELECT w.term, est.est, coalesce(ex.cnt, 0) AS cnt
          FROM watch w JOIN est USING (term) LEFT JOIN ex USING (term)
          ORDER BY term""",
    "q79_packing" ->
      """SELECT doc_id, lang, n_chars,
                (greatest(CAST(sum(n_chars) OVER (PARTITION BY lang
                   ORDER BY n_chars DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 1) - 1)
                  // 4096 AS pack_id
         FROM documents
         ORDER BY lang, pack_id, doc_id""",
    "q80_packing_sharded" ->
      """WITH s AS (
           SELECT doc_id, lang, n_chars,
                  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS shard
           FROM documents)
         SELECT doc_id, lang, n_chars,
                (greatest(CAST(sum(n_chars) OVER (PARTITION BY lang, shard
                   ORDER BY n_chars DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 1) - 1)
                  // 4096 * 8 + shard AS pack_id
         FROM s
         ORDER BY lang, pack_id, doc_id""",
    // q80's sharded pack assignment joined with the q262 'tomb:' gate:
    // per pack holding >= 1 tombstoned doc, the deleted/surviving
    // doc and char mass.
    "q263_repack_plan" ->
      """WITH s AS (
           SELECT doc_id, lang, n_chars,
                  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS shard
           FROM documents),
         p AS (
           SELECT doc_id, lang, n_chars,
                  (greatest(CAST(sum(n_chars) OVER (PARTITION BY lang, shard
                     ORDER BY n_chars DESC, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 1) - 1)
                    // 4096 * 8 + shard AS pack_id,
                  (CAST(concat('0x', substr(md5('tomb:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 50 = 0) AS del
           FROM s)
         SELECT lang, pack_id,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN del THEN 1 ELSE 0 END) AS BIGINT) AS n_del,
                CAST(sum(CASE WHEN del THEN n_chars ELSE 0 END) AS BIGINT) AS chars_del,
                CAST(sum(CASE WHEN NOT del THEN n_chars ELSE 0 END) AS BIGINT) AS chars_left
         FROM p
         GROUP BY 1, 2
         HAVING sum(CASE WHEN del THEN 1 ELSE 0 END) >= 1
         ORDER BY 1, 2""",
    "q85_bpe_pairs" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, string_split(t, ' ') words FROM n),
          v AS (SELECT u AS w, count(*) freq
                FROM (SELECT unnest(words) u FROM w) GROUP BY 1),
          p AS (SELECT freq, unnest(list_transform(range(1, length(w)), i -> w[i:i+1])) pair
                FROM v WHERE length(w) >= 2)
          SELECT pair, CAST(sum(freq) AS BIGINT) AS n
          FROM p GROUP BY 1
          ORDER BY n DESC, pair LIMIT 20""",
    "q86_bpe_train" -> {
      val union = (0 until bpeRounds)
        .map(k => s"SELECT CAST(${k + 1} AS BIGINT) step, * FROM b$k")
        .mkString("\n          UNION ALL ")
      s"""WITH ${bpeCtes(bpeRounds)}
          SELECT step, lhs, rhs, n FROM (
          $union)
          ORDER BY step"""
    },
    "q87_bpe_tokens" ->
      s"""WITH ${bpeCtes(bpeRounds)}
          SELECT sym AS token, CAST(sum(freq) AS BIGINT) n
          FROM s$bpeRounds GROUP BY 1
          ORDER BY n DESC, token LIMIT 30""",
    "q116_calib_sketch" ->
      s"""WITH n AS (SELECT doc_id, lang, $normDuck t FROM documents),
          w AS (SELECT doc_id, lang, string_split(t, ' ') words FROM n),
          wt AS (SELECT list_transform(range(0, 64), k ->
                   CAST(concat('0x', substr(md5('w,'||CAST(k AS VARCHAR)), 1, 6)) AS BIGINT)
                     / CAST(16777216 AS DOUBLE) - CAST(0.5 AS DOUBLE)) ws),
          scored AS (
            SELECT doc_id, lang,
                   list_sum(list_transform(words, x ->
                     ws[CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % 64 + 1])) AS score
            FROM w, wt),
          sq AS (SELECT doc_id, lang,
                   CAST(floor(score * 1000) AS BIGINT) sq FROM scored),
          hb AS (SELECT doc_id, lang, sq,
                   least(63, greatest(0, (sq + 4000) // 125)) b FROM sq),
          hist AS (SELECT lang, b, count(*) c FROM hb GROUP BY 1, 2),
          nl AS (SELECT lang, count(*) n FROM hb GROUP BY 1),
          cm AS (SELECT h.lang, h.b,
                   sum(h.c) OVER (PARTITION BY h.lang ORDER BY h.b) cum, nl.n
                 FROM hist h JOIN nl USING (lang)),
          b40 AS (SELECT lang, min(b) b40 FROM cm
                  WHERE cum >= (2 * n + 4) // 5 GROUP BY lang)
         SELECT doc_id, hb.lang, sq, hb.b > b40.b40 AS kept
         FROM hb JOIN b40 ON hb.lang = b40.lang
         ORDER BY doc_id""",
    "q115_fertility" ->
      s"""WITH ${bpeCtes(bpeRounds)},
          tk AS (SELECT w, CAST(count(*) AS BIGINT) nt
                 FROM s$bpeRounds GROUP BY w),
          nl AS (SELECT doc_id, lang, $normDuck t FROM documents),
          wl AS (SELECT lang, unnest(string_split(t, ' ')) w FROM nl),
          lw AS (SELECT lang, w, count(*) f FROM wl GROUP BY 1, 2)
         SELECT lang, CAST(sum(f) AS BIGINT) n_words,
                CAST(sum(f * nt) AS BIGINT) n_tokens,
                CAST((sum(f * nt) * 1000000) // sum(f) AS BIGINT) fert_ppm
         FROM lw JOIN tk USING (w)
         GROUP BY lang ORDER BY lang""",
    "q84_quality_model" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, string_split(t, ' ') words FROM n),
          wt AS (SELECT list_transform(range(0, 64), k ->
                   CAST(concat('0x', substr(md5('w,'||CAST(k AS VARCHAR)), 1, 6)) AS BIGINT)
                     / CAST(16777216 AS DOUBLE) - CAST(0.5 AS DOUBLE)) ws),
          scored AS (
            SELECT doc_id, CAST(len(words) AS BIGINT) AS n_tokens,
                   list_sum(list_transform(words, x ->
                     ws[CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % 64 + 1])) AS score
            FROM w, wt)
          SELECT doc_id, n_tokens, score, score > 0 AS kept
          FROM scored ORDER BY doc_id""",
    // lockstep unnest of the shifted word lists; counts, head filter,
    // rank window.
    "q134_nextword" ->
      s"""WITH n AS (SELECT $normDuck t FROM documents),
          wd AS (SELECT string_split(t, ' ') words FROM n),
          p AS (SELECT unnest(words[1:len(words)-1]) w1, unnest(words[2:len(words)]) w2
                FROM wd WHERE len(words) >= 2),
          c AS (SELECT w1, w2, count(*) n FROM p GROUP BY 1, 2),
          h AS (SELECT w1, CAST(sum(n) AS BIGINT) tot FROM c GROUP BY w1 HAVING sum(n) >= 50),
          r AS (SELECT c.w1, c.w2, c.n, h.tot,
                  row_number() OVER (PARTITION BY c.w1 ORDER BY c.n DESC, c.w2) rn
                FROM c JOIN h USING (w1))
          SELECT w1, w2, CAST(n AS BIGINT) n, tot, CAST(rn AS BIGINT) rn
          FROM r WHERE rn <= 3 ORDER BY w1, rn""",
    // the same pair stream; floor-log2 PMI via length(bin(...)).
    "q135_pmi" ->
      s"""WITH n AS (SELECT $normDuck t FROM documents),
          wd AS (SELECT string_split(t, ' ') words FROM n),
          p AS (SELECT unnest(words[1:len(words)-1]) w1, unnest(words[2:len(words)]) w2
                FROM wd WHERE len(words) >= 2),
          c AS (SELECT w1, w2, count(*) nxy FROM p GROUP BY 1, 2),
          u AS (SELECT t, count(*) c FROM (
                  SELECT w1 t FROM p UNION ALL SELECT w2 t FROM p) GROUP BY t),
          tot AS (SELECT CAST(sum(nxy) AS BIGINT) nn FROM c)
          SELECT c.w1, c.w2, CAST(nxy AS BIGINT) nxy,
                 CAST(ux.c AS BIGINT) cx, CAST(uy.c AS BIGINT) cy,
                 CAST(length(bin(nxy * nn)) - length(bin(ux.c * uy.c)) AS BIGINT) pmi_l2
          FROM c JOIN u ux ON c.w1 = ux.t JOIN u uy ON c.w2 = uy.t CROSS JOIN tot
          WHERE nxy >= 20
          ORDER BY pmi_l2 DESC, nxy DESC, w1, w2 LIMIT 30""",
    // (source, term) counts then the conditional spectrum rollup.
    "q133_spectrum" ->
      s"""WITH n AS (SELECT doc_id, source, $normDuck t FROM documents),
          w AS (SELECT source, unnest(string_split(t, ' ')) term FROM n),
          c AS (SELECT source, term, count(*) cnt FROM w WHERE term <> ''
                GROUP BY source, term)
          SELECT source, CAST(count(*) AS BIGINT) vocab,
                 CAST(sum(cnt) AS BIGINT) tokens,
                 CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) hapax,
                 CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) dis,
                 CAST(sum(CASE WHEN cnt >= 3 THEN 1 ELSE 0 END) AS BIGINT) rest,
                 (CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
                   // CAST(count(*) AS BIGINT) AS hapax_ppm
          FROM c GROUP BY source ORDER BY source""",
    // the two snapshot slices full-outer joined on id; statuses from
    // hash presence/equality; per-source counts.
    "q129_snapshot_diff" ->
      """WITH o AS (
           SELECT doc_id, source, md5(text) h FROM documents WHERE doc_id % 7 <> 0),
         nn AS (
           SELECT doc_id, source,
                  md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END) h
           FROM documents WHERE doc_id % 5 <> 0)
         SELECT coalesce(o.source, nn.source) source,
                CASE WHEN o.h IS NULL THEN 'added'
                     WHEN nn.h IS NULL THEN 'removed'
                     WHEN o.h <> nn.h THEN 'changed'
                     ELSE 'unchanged' END status,
                CAST(count(*) AS BIGINT) n
         FROM o FULL OUTER JOIN nn ON o.doc_id = nn.doc_id
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // md5-ppm uniforms, scaled-integer priorities, rank window.
    "q128_wsample" ->
      """WITH p AS (
           SELECT doc_id, lang, n_chars,
                  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 u_ppm
           FROM documents),
         k AS (
           SELECT doc_id, lang, n_chars, u_ppm,
                  (u_ppm * 1000000000000) // n_chars pkey
           FROM p),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY lang ORDER BY pkey, doc_id) rn
           FROM k)
         SELECT doc_id, lang, n_chars, u_ppm, pkey, CAST(rn AS BIGINT) rn
         FROM r WHERE rn <= 20 ORDER BY lang, rn""",
    // same score replay as q114; ntile(10) over the same total order.
    "q127_deciles" ->
      s"""WITH n AS (SELECT doc_id, lang, $normDuck t FROM documents),
          w AS (SELECT doc_id, lang, string_split(t, ' ') words FROM n),
          wt AS (SELECT list_transform(range(0, 64), k ->
                   CAST(concat('0x', substr(md5('w,'||CAST(k AS VARCHAR)), 1, 6)) AS BIGINT)
                     / CAST(16777216 AS DOUBLE) - CAST(0.5 AS DOUBLE)) ws),
          scored AS (
            SELECT doc_id, lang,
                   list_sum(list_transform(words, x ->
                     ws[CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % 64 + 1])) AS score
            FROM w, wt)
          SELECT doc_id, lang, score,
                 CAST(ntile(10) OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS BIGINT) AS decile
          FROM scored ORDER BY doc_id""",
    "q114_calib_quality" ->
      s"""WITH n AS (SELECT doc_id, lang, $normDuck t FROM documents),
          w AS (SELECT doc_id, lang, string_split(t, ' ') words FROM n),
          wt AS (SELECT list_transform(range(0, 64), k ->
                   CAST(concat('0x', substr(md5('w,'||CAST(k AS VARCHAR)), 1, 6)) AS BIGINT)
                     / CAST(16777216 AS DOUBLE) - CAST(0.5 AS DOUBLE)) ws),
          scored AS (
            SELECT doc_id, lang,
                   list_sum(list_transform(words, x ->
                     ws[CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % 64 + 1])) AS score
            FROM w, wt)
          SELECT doc_id, lang, score,
                 row_number() OVER (PARTITION BY lang ORDER BY score DESC, doc_id)
                   * 10 <= count(*) OVER (PARTITION BY lang) * 6 AS kept
          FROM scored ORDER BY doc_id""",
    "q105_quality_sample" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, string_split(t, ' ') words FROM n),
          wt AS (SELECT list_transform(range(0, 64), k ->
                   CAST(concat('0x', substr(md5('w,'||CAST(k AS VARCHAR)), 1, 6)) AS BIGINT)
                     / CAST(16777216 AS DOUBLE) - CAST(0.5 AS DOUBLE)) ws),
          scored AS (
            SELECT doc_id,
                   list_sum(list_transform(words, x ->
                     ws[CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % 64 + 1])) AS score
            FROM w, wt),
          tiered AS (
            SELECT doc_id, score,
                   CASE WHEN score > 0.5 THEN 100
                        WHEN score > 0.0 THEN 50
                        ELSE 10 END AS keep_pct
            FROM scored)
          SELECT doc_id, score, CAST(keep_pct AS BIGINT) AS keep_pct,
                 CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                   % 100 < keep_pct AS kept
          FROM tiered ORDER BY doc_id""",
    // 2-word shingles per source; distinct and total counts + ppm.
    "q121_diversity" ->
      s"""WITH n AS (SELECT doc_id, source, $normDuck t FROM documents),
          wd AS (SELECT source, string_split(t, ' ') words FROM n),
          sh AS (SELECT source,
                   unnest(list_transform(range(1, len(words)), i -> array_to_string(words[i:i+1], ' '))) s
                 FROM wd WHERE len(words) >= 2)
          SELECT source, CAST(count(*) AS BIGINT) n_bigrams,
                 CAST(count(DISTINCT s) AS BIGINT) n_distinct,
                 (CAST(count(DISTINCT s) AS BIGINT) * 1000000) // count(*) AS ttr_ppm
          FROM sh GROUP BY source ORDER BY source""",
    // the q121 bigram stream hashed; HLL registers replayed as the
    // q102 (source, j) max-rho GROUP BY and the exact-integer sum.
    "q131_diversity_sketch" ->
      s"""WITH n AS (SELECT doc_id, source, $normDuck t FROM documents),
          wd AS (SELECT source, string_split(t, ' ') words FROM n),
          sh AS (SELECT source,
                   unnest(list_transform(range(1, len(words)), i -> array_to_string(words[i:i+1], ' '))) s
                 FROM wd WHERE len(words) >= 2),
          hh AS (SELECT source, CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT) h FROM sh),
          tot AS (SELECT source, CAST(count(*) AS BIGINT) n_bigrams FROM hh GROUP BY source),
          dh AS (SELECT DISTINCT source, h FROM hh),
          regs AS (
            SELECT source, h % 64 AS j,
                   max(CASE WHEN h // 64 = 0 THEN 55
                            ELSE 55 - length(bin(h // 64)) END) AS r
            FROM dh GROUP BY source, j),
          s AS (
            SELECT source,
                   CAST(sum(CAST(1 AS BIGINT) << (55 - r)) +
                        (64 - count(*)) * (CAST(1 AS BIGINT) << 55) AS BIGINT) AS hll_s
            FROM regs GROUP BY source)
          SELECT s.source, tot.n_bigrams, s.hll_s,
                 0.709 * 4096.0 * CAST(36028797018963968 AS DOUBLE)
                   / CAST(s.hll_s AS DOUBLE) AS est
          FROM s JOIN tot USING (source)
          ORDER BY source""",
    // DSIR weights replayed: 64-bucket target/raw counts, floor-log2
    // ratios via length(bin(cnt+1)), per-doc sums over raw docs only.
    "q120_dsir" ->
      s"""WITH n AS (SELECT doc_id, source, $normDuck t FROM documents),
          wd AS (SELECT doc_id, source, string_split(t, ' ') words FROM n),
          wx AS (SELECT doc_id, source, unnest(words) term FROM wd),
          bx AS (SELECT doc_id,
                   CAST(concat('0x', substr(md5(term),1,15)) AS BIGINT) % 64 b,
                   CASE WHEN source = 'src0' THEN 1 ELSE 0 END is_t
                 FROM wx),
          bc AS (SELECT b, CAST(sum(is_t) AS BIGINT) ct,
                   CAST(sum(1 - is_t) AS BIGINT) cr FROM bx GROUP BY b),
          tot AS (SELECT CAST(sum(ct) AS BIGINT) tt, CAST(sum(cr) AS BIGINT) tr FROM bc),
          wt AS (SELECT b, CAST((length(bin(ct + 1)) - length(bin(cr + 1)))
                   + (length(bin(tr)) - length(bin(tt))) AS BIGINT) s
                 FROM bc, tot),
          pd AS (SELECT doc_id, count(*) n_tokens, CAST(sum(s) AS BIGINT) w
                 FROM bx JOIN wt USING (b) WHERE is_t = 0 GROUP BY doc_id)
          SELECT doc_id, n_tokens, w, w > 0 AS kept FROM pd ORDER BY doc_id""",
    "q106_lm_filter" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, string_split(t, ' ') words FROM n),
          wx AS (SELECT doc_id, unnest(words) term FROM w),
          c AS (SELECT term, count(*) cnt FROM wx GROUP BY term),
          tot AS (SELECT CAST(sum(cnt) AS BIGINT) tt FROM c),
          sp AS (SELECT term,
                   CAST(length(bin(tt)) - length(bin(cnt)) AS BIGINT) surp
                 FROM c, tot),
          pd AS (SELECT doc_id, count(*) n_tokens,
                   CAST(sum(surp) AS BIGINT) surp
                 FROM wx JOIN sp USING (term) GROUP BY doc_id),
          g AS (SELECT CAST(sum(surp) AS HUGEINT) gs,
                  CAST(sum(n_tokens) AS HUGEINT) gn FROM pd)
          SELECT doc_id, n_tokens, surp,
                 CAST(surp AS HUGEINT) * gn < gs * CAST(n_tokens AS HUGEINT)
                   AS kept
          FROM pd, g ORDER BY doc_id""",
    "q107_bow_mips" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, string_split(t, ' ') words FROM n),
          v AS (SELECT doc_id,
                  list_transform(range(0, 16), k ->
                    CAST(len(list_filter(words, x ->
                      CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % 16
                        = k)) AS BIGINT)) v
                FROM w),
          q AS (SELECT v qv FROM v WHERE doc_id = 0)
          SELECT v.doc_id,
                 CAST(list_sum(list_transform(range(1, 17),
                   i -> v.v[i] * qv[i])) AS BIGINT) AS score
          FROM v, q WHERE v.doc_id <> 0
          ORDER BY score DESC, doc_id LIMIT 10""",
    "q83_pack_assembly" ->
      """WITH p AS (
           SELECT doc_id, lang, n_chars,
                  (greatest(CAST(sum(n_chars) OVER (PARTITION BY lang
                     ORDER BY n_chars DESC, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 1) - 1)
                    // 4096 AS pack_id
           FROM documents)
         SELECT p.lang, p.pack_id,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(p.n_chars) AS BIGINT) AS sum_chars,
                md5(string_agg(d.text, chr(10) ORDER BY p.n_chars DESC, p.doc_id)) AS pack_md5,
                CAST(length(string_agg(d.text, chr(10) ORDER BY p.n_chars DESC, p.doc_id)) AS BIGINT) AS pack_len
         FROM p JOIN (SELECT doc_id, text FROM documents) d USING (doc_id)
         GROUP BY 1, 2
         ORDER BY lang, pack_id""",
    "q17_text" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, t, string_split(t, ' ') words FROM n)
          SELECT doc_id,
                 len(words) AS n_tokens,
                 len(regexp_extract_all(t, '[a-z]+|[0-9]')) AS n_bpe,
                 len(list_distinct(words)) AS n_types,
                 length(replace(t, ' ', '')) AS n_wordchars,
                 list_max(list_transform(words, w -> length(w))) AS max_tok
          FROM w ORDER BY doc_id""",
    "q24_lang" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, string_split(t, ' ') words FROM n),
          sc AS (SELECT doc_id,
                 ${markers.map { case (l, ws) => s"${scoreDuck(ws)} AS s_$l" }.mkString(", ")}
                 FROM w)
          SELECT doc_id, s_en, s_fr, s_de, s_es, s_zh,
                 CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es AND s_en >= s_zh THEN 'en'
                      WHEN s_fr >= s_de AND s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
                      WHEN s_de >= s_es AND s_de >= s_zh THEN 'de'
                      WHEN s_es >= s_zh THEN 'es'
                      ELSE 'zh' END AS predicted
          FROM sc ORDER BY doc_id""",
    "q25_quality" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, t, string_split(t, ' ') words FROM n),
          m AS (SELECT doc_id,
                  len(words) AS n_tokens,
                  length(replace(t, ' ', '')) AS n_wordchars,
                  len(list_filter(words, x -> x in ('the', 'a'))) AS n_stop
                FROM w)
          SELECT doc_id, n_tokens, n_stop,
                 n_tokens >= 30 AS len_ok,
                 n_stop * 10 <= n_tokens AS stop_ok,
                 (n_wordchars * 100) // n_tokens AS mean_tok_len_x100,
                 (CASE WHEN n_tokens >= 30 THEN 1 ELSE 0 END
                  + CASE WHEN n_stop * 10 <= n_tokens THEN 1 ELSE 0 END
                  + CASE WHEN (n_wordchars * 100) // n_tokens BETWEEN 300 AND 800 THEN 1 ELSE 0 END) AS quality_score
          FROM m ORDER BY doc_id""",
    "q26_fingerprint" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents)
          SELECT doc_id,
                 list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, length(t)+1), i -> CAST(ascii(t[i:i]) AS BIGINT))),
                   (acc, c) -> (acc * 31 + c) % 2147483647) AS fp,
                 list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, least(length(t), 64)+1), i -> CAST(ascii(t[i:i]) AS BIGINT))),
                   (acc, c) -> (acc * 31 + c) % 2147483647) AS fp_prefix
          FROM n ORDER BY doc_id""",
    "q45_repetition" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, string_split(t, ' ') words FROM n),
          base AS (SELECT doc_id, len(words) n_words,
                          len(list_distinct(words)) n_types FROM w),
          wx AS (SELECT doc_id, unnest(words) w FROM w),
          twc AS (SELECT doc_id, max(c) top_word_n FROM
                    (SELECT doc_id, w, count(*) c FROM wx GROUP BY doc_id, w)
                  GROUP BY doc_id),
          bg AS (SELECT doc_id, words[i] || ' ' || words[i+1] b
                 FROM w, unnest(range(1, len(words))) t(i)),
          tbc AS (SELECT doc_id, max(c) top_bigram_n FROM
                    (SELECT doc_id, b, count(*) c FROM bg GROUP BY doc_id, b)
                  GROUP BY doc_id)
          SELECT base.doc_id, n_words, n_types, top_word_n,
                 coalesce(top_bigram_n, 0) AS top_bigram_n,
                 (100 * (n_words - n_types)) // n_words AS dup_word_pct,
                 ((n_words - n_types) * 100 <= n_words * 30
                   AND coalesce(top_bigram_n, 0) * 100 <= greatest(n_words - 1, 1) * 20) AS rep_ok
          FROM base
          JOIN twc ON base.doc_id = twc.doc_id
          LEFT JOIN tbc ON base.doc_id = tbc.doc_id
          ORDER BY base.doc_id""",
    "q241_rep_scrub" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, string_split(t, ' ') words FROM n),
          k AS (SELECT doc_id, words,
                       list_filter(words, (x, i) -> i = 1 OR words[i-1] <> x) kept
                FROM w)
          SELECT doc_id, CAST(len(words) AS BIGINT) n_words,
                 CAST(len(words) - len(kept) AS BIGINT) n_removed,
                 md5(array_to_string(kept, ' ')) scrub_md5
          FROM k ORDER BY doc_id""",
    "q46_terms" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, string_split(t, ' ') words FROM n),
          wx AS (SELECT doc_id, unnest(words) term FROM w),
          tf AS (SELECT doc_id, term, count(*) tf FROM wx GROUP BY doc_id, term),
          df AS (SELECT term, count(DISTINCT doc_id) df FROM wx GROUP BY term),
          r AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                       row_number() OVER (PARTITION BY tf.doc_id
                         ORDER BY tf.tf DESC, df.df ASC, tf.term) rnk
                FROM tf JOIN df ON tf.term = df.term)
          SELECT doc_id, rnk, term, tf, df FROM r
          WHERE rnk <= 3 ORDER BY doc_id, rnk""",
    "q47_spans" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, string_split(t, ' ') words FROM n),
          sh AS (SELECT doc_id,
                   list_distinct(list_transform(range(1, len(words)-1),
                     i -> array_to_string(words[i:i+2], ' '))) spans
                 FROM w WHERE len(words) >= 3),
          sx AS (SELECT doc_id, unnest(spans) span FROM sh)
          SELECT span, count(*) n_docs FROM sx
          GROUP BY span HAVING count(*) >= 5
          ORDER BY n_docs DESC, span LIMIT 20""",
    "q50_chunks" ->
      s"""WITH n0 AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, string_split(t, ' ') words FROM n0),
          x AS (SELECT doc_id, words, len(words) n FROM w),
          c AS (SELECT doc_id, words, n, unnest(range(0, (n + 79) // 80)) k FROM x)
          SELECT doc_id, k AS chunk_id, k*80 AS tok_start,
                 least(100, n - k*80) AS tok_len,
                 md5(array_to_string(words[k*80+1 : k*80+least(100, n - k*80)], ' ')) AS chunk_md5
          FROM c ORDER BY doc_id, chunk_id""",
    "q55_decontam" -> decontamOracle(3),
    "q60_decontam4" -> decontamOracle(4),
    "q56_quantile" ->
      """WITH r AS (SELECT lang, source, n_chars,
               row_number() OVER (PARTITION BY lang, source
                 ORDER BY n_chars, doc_id) rn,
               count(*) OVER (PARTITION BY lang, source) n
             FROM documents)
         SELECT lang, source,
                max(CASE WHEN rn = (n+1)//2 THEN n_chars END) AS p50,
                max(CASE WHEN rn = (9*n+9)//10 THEN n_chars END) AS p90,
                max(CASE WHEN rn = n THEN n_chars END) AS p100
         FROM r GROUP BY lang, source ORDER BY lang, source""",
    "q59_funnel" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, t, string_split(t, ' ') words FROM n),
          base AS (SELECT doc_id, t, len(words) n_words,
                     len(list_distinct(words)) n_types,
                     len(list_filter(words, x -> x in ('the', 'a'))) n_stop,
                     length(replace(t, ' ', '')) n_wordchars
                   FROM w),
          bg AS (SELECT doc_id, words[i] || ' ' || words[i+1] b
                 FROM w, unnest(range(1, len(words))) t(i)),
          tbc AS (SELECT doc_id, max(c) top_bigram_n FROM
                    (SELECT doc_id, b, count(*) c FROM bg GROUP BY doc_id, b)
                  GROUP BY doc_id),
          sh AS (SELECT doc_id,
                   list_distinct(list_transform(range(1, len(words)-1),
                     i -> array_to_string(words[i:i+2], ' '))) spans
                 FROM w WHERE len(words) >= 3),
          ev AS (SELECT DISTINCT unnest(spans) span FROM sh WHERE doc_id % 97 = 0),
          corp AS (SELECT doc_id, unnest(spans) span FROM sh WHERE doc_id % 97 <> 0),
          hits AS (SELECT DISTINCT corp.doc_id FROM corp JOIN ev ON corp.span = ev.span),
          g AS (SELECT b.doc_id,
                  b.doc_id = min(b.doc_id) OVER (PARTITION BY md5(b.t)) AS keep_exact,
                  b.doc_id % 97 <> 0 AS not_eval,
                  h.doc_id IS NULL AS decontam_ok,
                  (b.n_words >= 30 AND b.n_stop * 10 <= b.n_words
                    AND (b.n_wordchars * 100) // b.n_words BETWEEN 300 AND 800) AS quality_ok,
                  ((b.n_words - b.n_types) * 100 <= b.n_words * 30
                    AND coalesce(tbc.top_bigram_n, 0) * 100
                        <= greatest(b.n_words - 1, 1) * 20) AS rep_ok
                FROM base b
                LEFT JOIN tbc ON b.doc_id = tbc.doc_id
                LEFT JOIN hits h ON b.doc_id = h.doc_id)
          SELECT doc_id, keep_exact, not_eval, decontam_ok, quality_ok, rep_ok,
                 (keep_exact AND not_eval AND decontam_ok
                   AND quality_ok AND rep_ok) AS kept
          FROM g ORDER BY doc_id""",
    "q89_boiler_scrub" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, string_split(t, ' ') words FROM n),
          sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(words)-1),
                   i -> array_to_string(words[i:i+2], ' '))) spans
                 FROM w WHERE len(words) >= 3),
          sx AS (SELECT doc_id, unnest(spans) span FROM sh),
          f AS (SELECT span FROM sx GROUP BY span HAVING count(*) >= 5),
          st AS (SELECT s.doc_id, s.i FROM
                   (SELECT doc_id, words, unnest(range(1, len(words) - 1)) i FROM w) s
                 WHERE array_to_string(s.words[s.i:s.i+2], ' ') IN (SELECT span FROM f)),
          cov AS (SELECT DISTINCT st.doc_id, st.i + x.j p
                  FROM st CROSS JOIN (VALUES (0), (1), (2)) x(j)),
          wp AS (SELECT doc_id, unnest(list_transform(range(1, len(words) + 1),
                   i -> {'p': i, 'w': words[i]})) pw FROM w),
          wp2 AS (SELECT doc_id, pw.p p, pw.w w FROM wp),
          kept AS (SELECT wp2.doc_id, wp2.p, wp2.w
                   FROM wp2 LEFT JOIN cov ON cov.doc_id = wp2.doc_id AND cov.p = wp2.p
                   WHERE cov.p IS NULL),
          k AS (SELECT doc_id, count(*) n_kept,
                  md5(string_agg(w, ' ' ORDER BY p)) s_md5 FROM kept GROUP BY 1),
          base AS (SELECT doc_id, len(words) n_words FROM w)
          SELECT b.doc_id, CAST(b.n_words AS BIGINT) n_words,
                 CAST(b.n_words - coalesce(k.n_kept, 0) AS BIGINT) n_removed,
                 coalesce(k.s_md5, md5('')) scrub_md5
          FROM base b LEFT JOIN k USING (doc_id)
          ORDER BY doc_id""",
    "q57_scrub" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, string_split(t, ' ') words FROM n)
          SELECT doc_id,
                 len(list_filter(words, x -> x in ('customer','supplier','key'))) AS n_redacted,
                 md5(array_to_string(list_transform(words, x ->
                   CASE WHEN x in ('customer','supplier','key') THEN '<PII>' ELSE x END), ' ')) AS red_md5
          FROM w ORDER BY doc_id""",
    "q62_capsource" ->
      """WITH r AS (SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY
                 CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                 doc_id) rk
             FROM documents)
         SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
         FROM r WHERE rk <= 20 ORDER BY doc_id""",
    "q99_ac_audit" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          h AS (SELECT doc_id,
                  len(list_filter(range(1, len(t) + 1),
                    i -> t[i:i+3] = 'scan'))
                + len(list_filter(range(1, len(t) + 1),
                    i -> t[i:i+1] = 'an'))
                + len(list_filter(range(1, len(t) + 1),
                    i -> t[i:i+1] = 'ca'))
                + len(list_filter(range(1, len(t) + 1),
                    i -> t[i:i+10] = 'vector join'))
                + len(list_filter(range(1, len(t) + 1),
                    i -> t[i:i+2] = 'dup')) AS n_hits
                FROM n)
         SELECT doc_id, CAST(n_hits AS BIGINT) n_hits
         FROM h WHERE n_hits > 0 ORDER BY doc_id""",
    "q96_bm25" ->
      s"""WITH $bm25Duck
         SELECT doc_id, (s0 + s1) + s2 AS score
         FROM sc WHERE (s0 + s1) + s2 > 0
         ORDER BY score DESC, doc_id LIMIT 20""",
    "q104_hybrid" -> {
      val dot =
        "list_sum(list_transform(range(1, len(%A)+1), i -> CAST(%A[i] AS DOUBLE) * CAST(%B[i] AS DOUBLE)))"
      def dd(a: String, b: String) = dot.replace("%A", a).replace("%B", b)
      def cos(a: String, b: String) =
        s"${dd(a, b)} / (sqrt(${dd(a, a)}) * sqrt(${dd(b, b)}))"
      s"""WITH $bm25Duck,
          sp0 AS (SELECT doc_id, (s0 + s1) + s2 AS score
                  FROM sc WHERE (s0 + s1) + s2 > 0
                  ORDER BY score DESC, doc_id LIMIT 20),
          sp AS (SELECT doc_id AS id,
                   CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) r_bm25
                 FROM sp0),
          de0 AS (SELECT e.vec_id, ${cos("e.embedding", "q.qv")} AS sim
                  FROM embeddings e,
                       (SELECT embedding qv FROM embeddings WHERE vec_id = 0) q
                  WHERE e.vec_id <> 0
                  ORDER BY sim DESC, e.vec_id LIMIT 20),
          de AS (SELECT vec_id AS id,
                   CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) r_dense
                 FROM de0)
         SELECT coalesce(sp.id, de.id) AS id, sp.r_bm25, de.r_dense,
                coalesce(CAST(1 AS DOUBLE) / CAST(60 + sp.r_bm25 AS DOUBLE),
                         CAST(0 AS DOUBLE))
                  + coalesce(CAST(1 AS DOUBLE) / CAST(60 + de.r_dense AS DOUBLE),
                             CAST(0 AS DOUBLE)) AS rrf
         FROM sp FULL JOIN de ON sp.id = de.id
         ORDER BY rrf DESC, id LIMIT 10"""
    },
    "q95_temp_sample" ->
      """WITH c AS (SELECT lang, count(*) n_l FROM documents GROUP BY 1),
          r AS (SELECT lang, n_l,
                  CAST(floor(1e6 * sqrt(
                    CAST((SELECT min(n_l) FROM c) AS DOUBLE) / n_l))
                  AS BIGINT) ppm
                FROM c),
          k AS (SELECT d.lang, count(*) n_kept
                FROM documents d JOIN r ON d.lang = r.lang
                WHERE CAST(concat('0x',
                    substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                  % 1000000 < r.ppm
                GROUP BY 1)
         SELECT r.lang, CAST(r.n_l AS BIGINT) n_total, r.ppm AS rate_ppm,
                CAST(coalesce(k.n_kept, 0) AS BIGINT) n_kept
         FROM r LEFT JOIN k USING (lang) ORDER BY r.lang""",
    "q110_mixture" ->
      """WITH s AS (SELECT lang, CAST(sum(n_chars // 4) AS BIGINT) avail
                    FROM documents GROUP BY 1),
          wt AS (SELECT * FROM (VALUES
                   ('en', 400000), ('zh', 200000), ('de', 150000),
                   ('fr', 150000), ('es', 100000)) t(lang, w_ppm)),
          b AS (SELECT s.lang, s.avail,
                  CAST(coalesce(wt.w_ppm, 0) AS BIGINT) w_ppm,
                  (SELECT CAST(sum(avail) AS BIGINT) FROM s) tot
                FROM s LEFT JOIN wt USING (lang)),
          a AS (SELECT lang, avail, w_ppm,
                  (((tot * 4) // 5) * w_ppm) // 1000000 AS alloc0
                FROM b),
          c AS (SELECT *, alloc0 > avail AS capped FROM a),
          t AS (SELECT CAST(sum(CASE WHEN capped THEN alloc0 - avail
                                     ELSE 0 END) AS BIGINT) leftover,
                       CAST(sum(CASE WHEN NOT capped THEN w_ppm
                                     ELSE 0 END) AS BIGINT) w_free
                FROM c),
          f AS (SELECT c.lang, c.avail, c.w_ppm,
                  least(c.avail, c.alloc0 +
                    CASE WHEN c.capped THEN 0
                         ELSE (t.leftover * c.w_ppm) // t.w_free END) AS alloc
                FROM c CROSS JOIN t)
         SELECT lang, avail, w_ppm, CAST(alloc AS BIGINT) alloc,
                CAST((alloc * 1000000) // avail AS BIGINT) sample_ppm
         FROM f ORDER BY lang""",
    "q112_spandup" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, string_split(t, ' ') words FROM n),
          e AS (SELECT doc_id, unnest(range(0, len(words) - 19)) i, words
                FROM w WHERE len(words) >= 20),
          sp AS (SELECT doc_id, i,
                   CAST(concat('0x', substr(md5(array_to_string(words[i+1:i+20], ' ')), 1, 15)) AS BIGINT) h
                 FROM e),
          dd AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM sp)
                 GROUP BY h HAVING count(*) >= 2),
          cv AS (SELECT DISTINCT sp.doc_id, sp.i + u.p AS p
                 FROM sp JOIN dd USING (h), unnest(range(0, 20)) u(p)),
          c AS (SELECT doc_id, CAST(count(*) AS BIGINT) n_cov
                FROM cv GROUP BY 1)
         SELECT w.doc_id, CAST(len(words) AS BIGINT) n_words,
                CAST(coalesce(c.n_cov, 0) AS BIGINT) n_cov,
                CAST((coalesce(c.n_cov, 0) * 1000000) // len(words)
                  AS BIGINT) dup_ppm
         FROM w LEFT JOIN c USING (doc_id) ORDER BY doc_id""",
    "q94_index" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id,
                  unnest(list_distinct(string_split(t, ' '))) AS term
                FROM n),
          p AS (SELECT term, count(*) df,
                  md5(string_agg(CAST(doc_id AS VARCHAR), ','
                    ORDER BY doc_id)) postings_md5
                FROM w WHERE term <> '' GROUP BY 1)
         SELECT term, CAST(df AS BIGINT) df, postings_md5
         FROM p WHERE df BETWEEN 5 AND 500
         ORDER BY df DESC, term LIMIT 30""",
    "q92_hist" ->
      """WITH h AS (SELECT lang,
                      least(greatest(n_chars, 0) // 16, 63) AS b
                    FROM documents),
          cnt AS (SELECT lang, b, count(*) n FROM h GROUP BY 1, 2),
          grid AS (SELECT l.lang, r.range AS b
                   FROM (SELECT DISTINCT lang FROM documents) l
                   CROSS JOIN range(0, 64) r),
          f AS (SELECT g.lang, g.b, coalesce(c.n, 0) AS n
                FROM grid g LEFT JOIN cnt c ON c.lang = g.lang AND c.b = g.b),
          cum AS (SELECT lang, b, n,
                    sum(n) OVER (PARTITION BY lang ORDER BY b) cumn,
                    sum(n) OVER (PARTITION BY lang) tot
                  FROM f),
          q AS (SELECT lang,
                  min(CASE WHEN cumn >= (tot + 1) // 2 THEN b END) b50,
                  min(CASE WHEN cumn >= (9 * tot + 9) // 10 THEN b END) b90,
                  max(tot) tot_n,
                  md5(string_agg(CAST(n AS VARCHAR), ',' ORDER BY b)) hist_md5
                FROM cum GROUP BY 1)
         SELECT lang, CAST(tot_n AS BIGINT) n,
                CAST((b50 + 1) * 16 AS BIGINT) est_p50,
                CAST((b90 + 1) * 16 AS BIGINT) est_p90,
                hist_md5
         FROM q ORDER BY lang""",
    "q41_sample" ->
      """SELECT doc_id, lang,
                CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS hb
         FROM documents
         WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100
               < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
         ORDER BY doc_id""",
    // the salted q41 gate, split thresholds, per-(split, source)
    // manifest rollup.
    "q145_split" ->
      """WITH g AS (
           SELECT *, CAST(concat('0x', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS hb
           FROM documents),
         s AS (SELECT source, lang, n_chars,
                      CASE WHEN hb < 80 THEN 'train' WHEN hb < 90 THEN 'valid' ELSE 'test' END AS split
               FROM g)
         SELECT split, source, count(*) AS docs,
                CAST(sum(n_chars) AS BIGINT) AS chars,
                count(CASE WHEN lang = 'en' THEN 1 END) AS en_docs
         FROM s GROUP BY 1, 2 ORDER BY split, source""",
    // same (lang, band) blocking, same 200-row block budget, same
    // unit-cost Levenshtein over 80-char normalized prefixes.
    "q146_editdup" ->
      """WITH p AS (
           SELECT doc_id, lang, n_chars // 40 AS band,
                  substr(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), 1, 80) pre
           FROM documents),
         g AS (SELECT *, count(*) OVER (PARTITION BY lang, band) bsz FROM p),
         b AS (SELECT * FROM g WHERE bsz <= 200)
         SELECT a.doc_id doc_a, bb.doc_id doc_b,
                CAST(levenshtein(a.pre, bb.pre) AS BIGINT) dist
         FROM b a JOIN b bb ON a.lang = bb.lang AND a.band = bb.band AND a.doc_id < bb.doc_id
         WHERE levenshtein(a.pre, bb.pre) <= 5
         ORDER BY doc_a, doc_b""",
    // top-40 vocab by (count desc, word asc); per-language OOV rollup
    // in exact ppm.
    "q147_oov" ->
      """WITH n AS (SELECT doc_id, lang, trim(regexp_replace(lower(text),'[^a-z0-9]+',' ','g')) t FROM documents),
         toks AS (SELECT lang, unnest(string_split(t, ' ')) word FROM n WHERE length(t) > 0),
         v AS (SELECT word FROM toks GROUP BY word ORDER BY count(*) DESC, word LIMIT 40)
         SELECT lang, count(*) AS n_tokens,
                count(CASE WHEN word NOT IN (SELECT word FROM v) THEN 1 END) AS n_oov,
                (count(CASE WHEN word NOT IN (SELECT word FROM v) THEN 1 END) * 1000000)
                  // count(*) AS oov_ppm
         FROM toks GROUP BY lang ORDER BY lang""",
    // add-one-smoothed conditional surprisal: ⌊log2(c(u)+V)⌋ −
    // ⌊log2(c(u,v)+1)⌋ per bigram type, per-doc sums gated on the
    // cross-multiplied corpus mean.
    "q148_bigram_lm" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, string_split(t, ' ') words FROM n),
          bg AS (SELECT doc_id, words[i] u, words[i+1] v
                 FROM w, unnest(range(1, len(words))) t(i)
                 WHERE len(words) >= 2),
          bc AS (SELECT u, v, count(*) cb FROM bg GROUP BY 1, 2),
          uc AS (SELECT u, CAST(sum(cb) AS BIGINT) cu FROM bc GROUP BY 1),
          vs AS (SELECT count(DISTINCT v) vn FROM bc),
          sp AS (SELECT u, v,
                   CAST(length(bin(cu + vn)) - length(bin(cb + 1)) AS BIGINT) surp
                 FROM bc JOIN uc USING (u), vs),
          pd AS (SELECT doc_id, count(*) n_bigrams, CAST(sum(surp) AS BIGINT) surp
                 FROM bg JOIN sp USING (u, v) GROUP BY 1),
          g AS (SELECT CAST(sum(surp) AS HUGEINT) gs,
                       CAST(sum(n_bigrams) AS HUGEINT) gn FROM pd)
          SELECT doc_id, n_bigrams, surp,
                 CAST(surp AS HUGEINT) * gn <= gs * CAST(n_bigrams AS HUGEINT) AS kept
          FROM pd, g ORDER BY doc_id""",
    // cross-multiplied ECDF distance; argmax row with ppm distance.
    "q150_ks" ->
      """WITH sides AS (SELECT n_chars, (doc_id % 10 < 8) is_old FROM documents),
         per AS (SELECT n_chars, count(CASE WHEN is_old THEN 1 END) o,
                        count(CASE WHEN NOT is_old THEN 1 END) w
                 FROM sides GROUP BY 1),
         cum AS (SELECT n_chars,
                        sum(o) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) co,
                        sum(w) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) cn
                 FROM per),
         tot AS (SELECT CAST(sum(o) AS BIGINT) n1, CAST(sum(w) AS BIGINT) n2 FROM per)
         SELECT n_chars t, n1, n2,
                CAST(abs(CAST(co AS HUGEINT)*n2 - CAST(cn AS HUGEINT)*n1) * 1000000
                     // (CAST(n1 AS HUGEINT)*n2) AS BIGINT) ks_ppm
         FROM cum, tot
         ORDER BY abs(CAST(co AS HUGEINT)*n2 - CAST(cn AS HUGEINT)*n1) DESC, t
         LIMIT 1""",
    // ascending (chars, source) ranks; G·n·Σx = Σ(2i−n−1)·xᵢ in ppm.
    "q151_gini" ->
      """WITH sc AS (SELECT source, CAST(sum(n_chars) AS BIGINT) chars
                     FROM documents GROUP BY 1),
         r AS (SELECT source, chars,
                      row_number() OVER (ORDER BY chars, source) i,
                      count(*) OVER () ns
               FROM sc)
         SELECT CAST(max(ns) AS BIGINT) n_sources,
                CAST(sum(chars) AS BIGINT) total_chars,
                CAST(sum((2*i - ns - 1) * CAST(chars AS HUGEINT)) * 1000000
                     // (CAST(max(ns) AS HUGEINT) * sum(chars)) AS BIGINT) gini_ppm
         FROM r""",
    // salted-hash split points, PSM reassembly pinned by md5.
    "q155_fim" ->
      """WITH s AS (
           SELECT doc_id, text, length(text) len,
                  1 + CAST(concat('0x', substr(md5('fim1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                      % (length(text) // 3) AS p1,
                  length(text)
                  - CAST(concat('0x', substr(md5('fim2:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                      % (length(text) // 3) AS p2
           FROM documents WHERE n_chars >= 20)
         SELECT doc_id, p1, p2,
                md5(substr(text, 1, p1) || '<SUF>' || substr(text, p2 + 1)
                    || '<MID>' || substr(text, p1 + 1, p2 - p1)) AS fim_md5
         FROM s ORDER BY doc_id""",
    // q83's pack assignment; start offsets by prefix-summing lens in
    // packing order (+1 per newline separator).
    "q156_pack_offsets" ->
      """WITH p AS (
           SELECT doc_id, lang, n_chars,
                  (greatest(CAST(sum(n_chars) OVER (PARTITION BY lang
                     ORDER BY n_chars DESC, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 1) - 1)
                    // 4096 AS pack_id
           FROM documents),
         g AS (SELECT lang, pack_id, count(*) n_docs,
                      list(n_chars ORDER BY n_chars DESC, doc_id) lens
               FROM p GROUP BY 1, 2)
         SELECT lang, pack_id, CAST(n_docs AS BIGINT) n_docs,
                array_to_string(list_transform(range(1, CAST(n_docs AS BIGINT) + 1),
                  i -> CAST(i + coalesce(list_sum(lens[1:i-1]), 0) AS VARCHAR)), ',') offsets
         FROM g ORDER BY lang, pack_id""",
    // same window-poly boundaries (list_reduce over each 8-slice),
    // same cut arithmetic, chunk md5 dedup across docs.
    "q173_cdc" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          nn AS (SELECT doc_id, t FROM n WHERE length(t) >= 8),
          b AS (SELECT doc_id, t,
                  list_filter(range(8, length(t) + 1), i ->
                    list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(range(i - 7, i + 1), j -> CAST(ascii(t[j:j]) AS BIGINT))),
                      (acc, c) -> (acc * 31 + c) % 2147483647) % 64 = 0) bounds
                FROM nn),
          cu AS (SELECT doc_id, t,
                   list_concat(list_concat([CAST(0 AS BIGINT)], bounds), [CAST(length(t) AS BIGINT)]) cuts
                 FROM b),
          ch AS (SELECT doc_id,
                   unnest(list_filter(
                     list_transform(range(1, len(cuts)), i ->
                       t[CAST(cuts[i] + 1 AS BIGINT):CAST(cuts[i + 1] AS BIGINT)]),
                     c -> length(c) > 0)) chunk
                 FROM cu)
          SELECT md5(chunk) h, count(DISTINCT doc_id) n_docs,
                 count(*) n_occ, CAST(max(length(chunk)) AS BIGINT) chunk_len
          FROM ch GROUP BY 1 HAVING count(DISTINCT doc_id) > 1
          ORDER BY h""",
    // distinct-chunk vs raw byte mass; savings in exact ppm.
    "q174_cdc_savings" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          nn AS (SELECT doc_id, t FROM n WHERE length(t) >= 8),
          b AS (SELECT doc_id, t,
                  list_filter(range(8, length(t) + 1), i ->
                    list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(range(i - 7, i + 1), j -> CAST(ascii(t[j:j]) AS BIGINT))),
                      (acc, c) -> (acc * 31 + c) % 2147483647) % 64 = 0) bounds
                FROM nn),
          cu AS (SELECT doc_id, t,
                   list_concat(list_concat([CAST(0 AS BIGINT)], bounds), [CAST(length(t) AS BIGINT)]) cuts
                 FROM b),
          ch AS (SELECT unnest(list_filter(
                     list_transform(range(1, len(cuts)), i ->
                       t[CAST(cuts[i] + 1 AS BIGINT):CAST(cuts[i + 1] AS BIGINT)]),
                     c -> length(c) > 0)) chunk
                 FROM cu),
          g AS (SELECT md5(chunk) h, count(*) occ,
                       CAST(max(length(chunk)) AS BIGINT) ln
                FROM ch GROUP BY 1)
          SELECT count(*) AS n_distinct_chunks,
                 CAST(sum(occ) AS BIGINT) AS n_chunks,
                 CAST(sum(ln * occ) AS BIGINT) AS raw_chars,
                 CAST(sum(ln) AS BIGINT) AS stored_chars,
                 (CAST(sum(ln * occ) AS BIGINT) - CAST(sum(ln) AS BIGINT)) * 1000000
                   // CAST(sum(ln * occ) AS BIGINT) AS savings_ppm
          FROM g""",

    // word-bigram -> min first-occurrence doc; deciles over the dense
    // id range; <=10-row running sum.
    "q185_heaps" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM n),
          g AS (SELECT doc_id,
                       unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bg
                FROM w WHERE len(ws) >= 2),
          f AS (SELECT bg, min(doc_id) AS first_doc FROM g GROUP BY bg),
          b AS (SELECT (first_doc * 10) // (SELECT max(doc_id) + 1 FROM documents) AS decile,
                       count(*) AS new_types
                FROM f GROUP BY 1)
          SELECT decile, new_types,
                 CAST(sum(new_types) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum_types
          FROM b ORDER BY decile""",

    // per-doc char census over the space-stripped normalized body.
    "q186_charjunk" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          b AS (SELECT doc_id, replace(t, ' ', '') AS b FROM n),
          c AS (SELECT doc_id, unnest(string_split(b, '')) AS ch FROM b WHERE length(b) > 0),
          g AS (SELECT doc_id, ch, count(*) AS nc FROM c GROUP BY 1, 2),
          m AS (SELECT doc_id, CAST(sum(nc) AS BIGINT) AS n_body,
                       CAST(count(*) AS BIGINT) AS n_alpha,
                       CAST(max(nc) AS BIGINT) AS top_char_n
                FROM g GROUP BY 1)
          SELECT b.doc_id,
                 coalesce(m.n_body, 0) AS n_body,
                 coalesce(m.n_alpha, 0) AS n_alpha,
                 coalesce(m.top_char_n, 0) AS top_char_n,
                 CASE WHEN coalesce(m.n_body, 0) = 0 THEN 0
                      ELSE (m.top_char_n * 1000000) // m.n_body END AS conc_ppm,
                 (coalesce(m.n_body, 0) = 0
                  OR coalesce(m.top_char_n, 0) * 1000000 > 300000 * m.n_body) AS junk
          FROM b LEFT JOIN m ON b.doc_id = m.doc_id
          ORDER BY b.doc_id""",

    // top-20 char trigrams per language, (n DESC, gram) rank.
    "q194_trigram_profile" ->
      s"""WITH n AS (SELECT doc_id, lang, $normDuck t FROM documents),
          g AS (SELECT lang, unnest(list_transform(range(1, length(t) - 1),
                                                   i -> t[i:i+2])) AS gram
                FROM n WHERE length(t) >= 3),
          cnt AS (SELECT lang, gram, count(*) AS n FROM g GROUP BY 1, 2),
          r AS (SELECT lang, gram, n,
                       row_number() OVER (PARTITION BY lang
                         ORDER BY n DESC, gram) rk
                FROM cnt)
          SELECT lang, CAST(rk AS BIGINT) rk, gram, CAST(n AS BIGINT) n
          FROM r WHERE rk <= 20 ORDER BY lang, rk""",

    // delta-gap bit cost of sorted postings; bin() = exact integer
    // floor(log2)+1.
    "q197_posting_bits" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT DISTINCT doc_id, unnest(string_split(t, ' ')) AS term FROM n),
          p AS (SELECT term, count(*) AS df, list_sort(list(doc_id)) AS ids
                FROM w WHERE term <> '' GROUP BY term),
          f AS (SELECT term, df, ids FROM p
                WHERE df >= 5 AND df * 10 <= (SELECT count(*) FROM documents) * 9),
          b AS (SELECT term, CAST(df AS BIGINT) df,
                       CAST(length(bin(ids[1] + 1)) +
                            list_sum(list_transform(range(2, CAST(df AS INTEGER) + 1),
                                                    i -> length(bin(ids[i] - ids[i-1])))) AS BIGINT) AS bits,
                       CAST(df * 64 AS BIGINT) AS raw_bits
                FROM f)
          SELECT term, df, bits, raw_bits,
                 (raw_bits - bits) * 1000000 // raw_bits AS savings_ppm
          FROM b ORDER BY df DESC, term LIMIT 30""",

    // q110's allocation in doc units, EXECUTED: hash-ranked selection
    // per lang, kept set pinned by md5.
    "q199_mixture_select" ->
      """WITH w(lang, w_ppm) AS (VALUES ('en', 400000), ('zh', 200000),
                ('de', 150000), ('fr', 150000), ('es', 100000)),
         st AS (SELECT d.lang, count(*) avail, coalesce(max(w.w_ppm), 0) w_ppm
                FROM documents d LEFT JOIN w ON d.lang = w.lang GROUP BY 1),
         tot AS (SELECT sum(avail) t FROM st),
         base AS (SELECT lang, avail, w_ppm,
                         (((t * 4) // 5) * w_ppm) // 1000000 AS alloc0,
                         (((t * 4) // 5) * w_ppm) // 1000000 > avail AS capped
                  FROM st, tot),
         sums AS (SELECT sum(CASE WHEN capped THEN alloc0 - avail ELSE 0 END) leftover,
                         sum(CASE WHEN NOT capped THEN w_ppm ELSE 0 END) w_free
                  FROM base),
         alloc AS (SELECT lang, avail, w_ppm,
                          least(avail, alloc0 + CASE WHEN capped THEN 0
                                ELSE (leftover * w_ppm) // w_free END) AS alloc
                   FROM base, sums),
         rk AS (SELECT d.doc_id, d.lang,
                       row_number() OVER (PARTITION BY d.lang ORDER BY
                         CAST(concat('0x', substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                         d.doc_id) r
                FROM documents d),
         kept AS (SELECT rk.lang, rk.doc_id
                  FROM rk JOIN alloc ON rk.lang = alloc.lang WHERE rk.r <= alloc.alloc)
         SELECT a.lang, CAST(a.avail AS BIGINT) avail, CAST(a.alloc AS BIGINT) alloc,
                CAST(count(k.doc_id) AS BIGINT) n_kept,
                md5(string_agg(CAST(k.doc_id AS VARCHAR), ',' ORDER BY k.doc_id)) kept_md5
         FROM alloc a LEFT JOIN kept k ON a.lang = k.lang
         GROUP BY 1, 2, 3 ORDER BY a.lang""",

    // per-language datasheet: docs, tokens, exact-dup ppm (corpus-wide
    // hash census), q25 quality pass ppm.
    "q200_data_card" ->
      s"""WITH n AS (SELECT doc_id, lang, n_chars, $normDuck t FROM documents),
          w AS (SELECT doc_id, lang, n_chars, t, string_split(t, ' ') words FROM n),
          per AS (SELECT doc_id, lang, n_chars // 4 AS toks, md5(t) h,
                         (CASE WHEN len(words) >= 30 THEN 1 ELSE 0 END
                          + CASE WHEN len(list_filter(words, x -> x in ('the', 'a'))) * 10
                                      <= len(words) THEN 1 ELSE 0 END
                          + CASE WHEN (length(replace(t, ' ', '')) * 100) // len(words)
                                      BETWEEN 300 AND 800 THEN 1 ELSE 0 END) score
                  FROM w),
          dh AS (SELECT h FROM per GROUP BY h HAVING count(*) >= 2)
          SELECT lang, CAST(count(*) AS BIGINT) n_docs,
                 CAST(sum(toks) AS BIGINT) tokens,
                 CAST(count(CASE WHEN dh.h IS NOT NULL THEN 1 END) AS BIGINT) dup_docs,
                 CAST(count(CASE WHEN dh.h IS NOT NULL THEN 1 END) * 1000000
                      // count(*) AS BIGINT) dup_ppm,
                 CAST(count(CASE WHEN score >= 2 THEN 1 END) AS BIGINT) pass_docs,
                 CAST(count(CASE WHEN score >= 2 THEN 1 END) * 1000000
                      // count(*) AS BIGINT) pass_ppm
          FROM per LEFT JOIN dh ON per.h = dh.h
          GROUP BY 1 ORDER BY 1""",
    // raw-bytes vs canonical-form exact-dup census per source; gain
    // in exact ppm (integer division).
    "q205_norm_dedup" ->
      s"""WITH per AS (
            SELECT source, md5(text) h_raw, md5($normDuck) h_norm
            FROM documents),
          dr AS (SELECT h_raw h FROM per GROUP BY 1 HAVING count(*) >= 2),
          dn AS (SELECT h_norm h FROM per GROUP BY 1 HAVING count(*) >= 2)
          SELECT source, count(*) AS n_docs,
                 CAST(count(dr.h) AS BIGINT) AS raw_dups,
                 CAST(count(dn.h) AS BIGINT) AS norm_dups,
                 CAST(((count(dn.h) - count(dr.h)) * 1000000) // count(*) AS BIGINT) AS gain_ppm
          FROM per LEFT JOIN dr ON per.h_raw = dr.h
                   LEFT JOIN dn ON per.h_norm = dn.h
          GROUP BY 1 ORDER BY 1""",
    // per-cap truncation counts and exact token-loss ppm for the
    // context-length ladder.
    "q207_trunc_ladder" ->
      """WITH t AS (SELECT n_chars // 4 AS toks FROM documents),
          s AS (SELECT CAST(sum(toks) AS BIGINT) total FROM t),
          caps AS (SELECT unnest([64, 128, 256, 512]) AS cap)
          SELECT CAST(cap AS BIGINT) AS cap,
                 CAST(count(CASE WHEN toks > cap THEN 1 END) AS BIGINT) AS n_trunc,
                 CAST(sum(least(toks, cap)) AS BIGINT) AS kept_toks,
                 CAST(((max(total) - sum(least(toks, cap))) * 1000000) // max(total) AS BIGINT) AS drop_ppm
          FROM t CROSS JOIN caps CROSS JOIN s
          GROUP BY cap ORDER BY cap""",
    // q24's predictor grouped into the (labeled, predicted) confusion
    // matrix with row-share ppm.
    "q217_lang_confusion" ->
      s"""WITH n AS (SELECT doc_id, lang, $normDuck t FROM documents),
          w AS (SELECT doc_id, lang, string_split(t, ' ') words FROM n),
          sc AS (SELECT doc_id, lang,
                 ${markers.map { case (l, ws) => s"${scoreDuck(ws)} AS s_$l" }.mkString(", ")}
                 FROM w),
          p AS (SELECT lang,
                 CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es AND s_en >= s_zh THEN 'en'
                      WHEN s_fr >= s_de AND s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
                      WHEN s_de >= s_es AND s_de >= s_zh THEN 'de'
                      WHEN s_es >= s_zh THEN 'es'
                      ELSE 'zh' END AS predicted
                FROM sc),
          tot AS (SELECT lang, count(*) m FROM p GROUP BY 1)
          SELECT p.lang, predicted, count(*) AS n,
                 CAST((count(*) * 1000000) // max(m) AS BIGINT) AS cell_ppm
          FROM p JOIN tot ON p.lang = tot.lang
          GROUP BY 1, 2 ORDER BY 1, 2""",
    // near-dup membership (q18 pair ends) × q25/q200 quality pass,
    // exact ppm per membership class.
    "q218_quality_vs_dup" ->
      s"""WITH w AS (
           SELECT doc_id, string_split(trim(regexp_replace(lower(text),'[^a-z0-9]+',' ','g')),' ') words
           FROM documents),
         sh AS (
           SELECT doc_id, list_transform(range(1, len(words)-1), i -> array_to_string(words[i:i+2],' ')) shingles
           FROM w WHERE len(words) >= 3),
         ss AS (
           SELECT doc_id, list_distinct(shingles) sset FROM sh),
         hsv AS (
           SELECT doc_id, sset, len(sset) nset,
                  list_transform(sset, x -> CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT) % 2147483647) hs
           FROM ss),
         m AS (
           SELECT doc_id, sset, nset,
             [list_aggregate(list_transform(hs, hm ->
                ((CAST(1103515245 AS BIGINT) * (k+1) + 12345) % 2147483647 * hm + 977 * (k+1)) % 2147483647), 'min')
              for k in range(0,12)] mh
           FROM hsv),
         bands AS (
           SELECT doc_id, j, mh[2*j+1] * 2147483647 + mh[2*j+2] sig
           FROM m, unnest(range(0,6)) t(j)),
         cand AS (
           SELECT DISTINCT a.doc_id da, b.doc_id db
           FROM bands a JOIN bands b ON a.j=b.j AND a.sig=b.sig AND a.doc_id < b.doc_id),
         pairs AS (
           SELECT da, db
           FROM cand JOIN hsv x ON da=x.doc_id JOIN hsv y ON db=y.doc_id
           WHERE 5*len(list_intersect(x.sset, y.sset)) >= 3*(x.nset + y.nset - len(list_intersect(x.sset, y.sset)))),
         dup AS (
           SELECT DISTINCT doc_id
           FROM (SELECT da AS doc_id FROM pairs UNION ALL SELECT db FROM pairs)),
         nq AS (SELECT doc_id, $normDuck t FROM documents),
         wq AS (SELECT doc_id, t, string_split(t, ' ') words FROM nq),
         per AS (
           SELECT doc_id,
                  (CASE WHEN len(words) >= 30 THEN 1 ELSE 0 END
                   + CASE WHEN len(list_filter(words, x -> x in ('the', 'a'))) * 10
                               <= len(words) THEN 1 ELSE 0 END
                   + CASE WHEN (length(replace(t, ' ', '')) * 100) // len(words)
                               BETWEEN 300 AND 800 THEN 1 ELSE 0 END) score
           FROM wq)
         SELECT CAST(CASE WHEN dup.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup,
                count(*) AS n_docs,
                CAST(count(CASE WHEN score >= 2 THEN 1 END) AS BIGINT) AS n_pass,
                CAST((count(CASE WHEN score >= 2 THEN 1 END) * 1000000) // count(*) AS BIGINT) AS pass_ppm
         FROM per LEFT JOIN dup ON per.doc_id = dup.doc_id
         GROUP BY 1 ORDER BY 1""",
    // q80's pack assignment rolled into exact 10%-point fill buckets.
    "q221_pack_fill" ->
      """WITH s AS (
           SELECT doc_id, lang, n_chars,
                  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS shard
           FROM documents),
         a AS (
           SELECT doc_id, lang, n_chars,
                  (greatest(CAST(sum(n_chars) OVER (PARTITION BY lang, shard
                     ORDER BY n_chars DESC, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 1) - 1)
                    // 4096 * 8 + shard AS pack_id
           FROM s),
         p AS (
           SELECT lang, pack_id, CAST(sum(n_chars) AS BIGINT) chars,
                  count(*) n_docs
           FROM a GROUP BY 1, 2)
         SELECT CAST((chars * 10) // 4096 AS BIGINT) AS fill_bucket,
                count(*) AS n_packs,
                CAST(sum(n_docs) AS BIGINT) AS n_docs,
                CAST(sum(chars) AS BIGINT) AS sum_chars
         FROM p GROUP BY 1 ORDER BY 1""",
    // three row_number batchings (arrival / length-sorted / 64-token
    // buckets), each rolled to one (batches, padded, fill-ppm) row.
    "q243_pad_waste" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, CAST(len(string_split(t, ' ')) AS BIGINT) len FROM n),
          arr AS (SELECT len, (row_number() OVER (ORDER BY doc_id) - 1) // 32 batch FROM w),
          srt AS (SELECT len, (row_number() OVER (ORDER BY len DESC, doc_id) - 1) // 32 batch FROM w),
          bkt AS (SELECT len, len // 64 bucket,
                         (row_number() OVER (PARTITION BY len // 64 ORDER BY doc_id) - 1) // 32 batch
                  FROM w),
          a1 AS (SELECT batch, count(*) n, max(len) mx, sum(len) sl FROM arr GROUP BY 1),
          a2 AS (SELECT batch, count(*) n, max(len) mx, sum(len) sl FROM srt GROUP BY 1),
          a3 AS (SELECT bucket, batch, count(*) n, max(len) mx, sum(len) sl FROM bkt GROUP BY 1, 2)
          SELECT 'arrival' AS strategy, CAST(count(*) AS BIGINT) n_batches,
                 CAST(sum(mx*n - sl) AS BIGINT) padded_tokens,
                 CAST((sum(sl) * 1000000) // sum(mx*n) AS BIGINT) fill_ppm FROM a1
          UNION ALL
          SELECT 'sorted', CAST(count(*) AS BIGINT), CAST(sum(mx*n - sl) AS BIGINT),
                 CAST((sum(sl) * 1000000) // sum(mx*n) AS BIGINT) FROM a2
          UNION ALL
          SELECT 'bucketed', CAST(count(*) AS BIGINT), CAST(sum(mx*n - sl) AS BIGINT),
                 CAST((sum(sl) * 1000000) // sum(mx*n) AS BIGINT) FROM a3
          ORDER BY strategy""",
    // q18 pair chain → dup labels, q84 scoring → milli-quantized
    // buckets, Mann-Whitney U over the bucket rollup (ties = midrank).
    "q246_quality_auc" ->
      s"""WITH w AS (
           SELECT doc_id, string_split(trim(regexp_replace(lower(text),'[^a-z0-9]+',' ','g')),' ') words
           FROM documents),
         sh AS (
           SELECT doc_id, list_transform(range(1, len(words)-1), i -> array_to_string(words[i:i+2],' ')) shingles
           FROM w WHERE len(words) >= 3),
         ss AS (
           SELECT doc_id, list_distinct(shingles) sset FROM sh),
         hsv AS (
           SELECT doc_id, sset, len(sset) nset,
                  list_transform(sset, x -> CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT) % 2147483647) hs
           FROM ss),
         m AS (
           SELECT doc_id, sset, nset,
             [list_aggregate(list_transform(hs, hm ->
                ((CAST(1103515245 AS BIGINT) * (k+1) + 12345) % 2147483647 * hm + 977 * (k+1)) % 2147483647), 'min')
              for k in range(0,12)] mh
           FROM hsv),
         bands AS (
           SELECT doc_id, j, mh[2*j+1] * 2147483647 + mh[2*j+2] sig
           FROM m, unnest(range(0,6)) t(j)),
         cand AS (
           SELECT DISTINCT a.doc_id da, b.doc_id db
           FROM bands a JOIN bands b ON a.j=b.j AND a.sig=b.sig AND a.doc_id < b.doc_id),
         pairs AS (
           SELECT da, db
           FROM cand JOIN hsv x ON da=x.doc_id JOIN hsv y ON db=y.doc_id
           WHERE 5*len(list_intersect(x.sset, y.sset)) >= 3*(x.nset + y.nset - len(list_intersect(x.sset, y.sset)))),
         dup AS (
           SELECT DISTINCT doc_id
           FROM (SELECT da AS doc_id FROM pairs UNION ALL SELECT db FROM pairs)),
         nq AS (SELECT doc_id, $normDuck t FROM documents),
         wq AS (SELECT doc_id, string_split(t, ' ') words FROM nq),
         wt AS (SELECT list_transform(range(0, 64), k ->
                  CAST(concat('0x', substr(md5('w,'||CAST(k AS VARCHAR)), 1, 6)) AS BIGINT)
                    / CAST(16777216 AS DOUBLE) - CAST(0.5 AS DOUBLE)) ws),
         scored AS (
           SELECT doc_id, CAST(floor(list_sum(list_transform(words, x ->
                    ws[CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % 64 + 1]))
                    * CAST(1000 AS DOUBLE)) AS BIGINT) sq
           FROM wq, wt),
         lab AS (
           SELECT sq, CASE WHEN dup.doc_id IS NULL THEN 0 ELSE 1 END is_dup
           FROM scored LEFT JOIN dup ON scored.doc_id = dup.doc_id),
         cells AS (
           SELECT sq, SUM(is_dup) n_pos, SUM(1 - is_dup) n_neg
           FROM lab GROUP BY sq),
         cum AS (
           SELECT sq, n_pos, n_neg,
                  COALESCE(SUM(n_neg) OVER (ORDER BY sq
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cneg
           FROM cells)
         SELECT CAST(SUM(n_pos) AS BIGINT) n_pos,
                CAST(SUM(n_neg) AS BIGINT) n_neg,
                CAST((SUM(n_pos * (2*cneg + n_neg)) * 1000000)
                     // (2 * SUM(n_pos) * SUM(n_neg)) AS BIGINT) auc_ppm
         FROM cum""",
    // one scan, both gate verdicts, 2×2 census, exact-integer kappa
    // with explicit sign handling (floor ≡ truncate only when ≥ 0).
    "q247_filter_kappa" ->
      s"""WITH nq AS (SELECT doc_id, $normDuck t FROM documents),
         wq AS (SELECT doc_id, t, string_split(t, ' ') words FROM nq),
         wt AS (SELECT list_transform(range(0, 64), k ->
                  CAST(concat('0x', substr(md5('w,'||CAST(k AS VARCHAR)), 1, 6)) AS BIGINT)
                    / CAST(16777216 AS DOUBLE) - CAST(0.5 AS DOUBLE)) ws),
         per AS (
           SELECT (CASE WHEN len(words) >= 30 THEN 1 ELSE 0 END
                   + CASE WHEN len(list_filter(words, x -> x in ('the', 'a'))) * 10
                               <= len(words) THEN 1 ELSE 0 END
                   + CASE WHEN (length(replace(t, ' ', '')) * 100) // len(words)
                               BETWEEN 300 AND 800 THEN 1 ELSE 0 END) >= 2 hpass,
                  list_sum(list_transform(words, x ->
                    ws[CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % 64 + 1])) > 0 mpass
           FROM wq, wt),
         cells AS (
           SELECT SUM(CASE WHEN hpass AND mpass THEN 1 ELSE 0 END) a,
                  SUM(CASE WHEN hpass AND NOT mpass THEN 1 ELSE 0 END) b,
                  SUM(CASE WHEN NOT hpass AND mpass THEN 1 ELSE 0 END) c,
                  SUM(CASE WHEN NOT hpass AND NOT mpass THEN 1 ELSE 0 END) dd
           FROM per)
         SELECT CAST(a AS BIGINT) both_pass, CAST(b AS BIGINT) heur_only,
                CAST(c AS BIGINT) model_only, CAST(dd AS BIGINT) neither,
                CAST((CASE WHEN 2*(a*dd - b*c) < 0 THEN -1 ELSE 1 END)
                     * ((abs(2*(a*dd - b*c)) * 1000000)
                        // ((a+b)*(b+dd) + (a+c)*(c+dd))) AS BIGINT) kappa_ppm
         FROM cells""",
    // sources-sized rollup; the Wilson bound is a fixed IEEE-double
    // expression of (n_pass, n_docs), every literal cast to DOUBLE.
    "q248_wilson" ->
      s"""WITH nq AS (SELECT doc_id, source, $normDuck t FROM documents),
         wq AS (SELECT doc_id, source, t, string_split(t, ' ') words FROM nq),
         per AS (
           SELECT source,
                  (CASE WHEN len(words) >= 30 THEN 1 ELSE 0 END
                   + CASE WHEN len(list_filter(words, x -> x in ('the', 'a'))) * 10
                               <= len(words) THEN 1 ELSE 0 END
                   + CASE WHEN (length(replace(t, ' ', '')) * 100) // len(words)
                               BETWEEN 300 AND 800 THEN 1 ELSE 0 END) score
           FROM wq),
         g AS (
           SELECT source, count(*) n_docs,
                  SUM(CASE WHEN score >= 2 THEN 1 ELSE 0 END) n_pass
           FROM per GROUP BY 1),
         g2 AS (
           SELECT source, n_docs, n_pass,
                  CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE) p,
                  CAST(n_docs AS DOUBLE) nd
           FROM g)
         SELECT source, CAST(n_docs AS BIGINT) n_docs,
                CAST(n_pass AS BIGINT) n_pass,
                CAST((n_pass * 1000000) // n_docs AS BIGINT) pass_ppm,
                CAST(floor(CAST(1000000 AS DOUBLE) * (
                  (p + CAST(1.9208 AS DOUBLE) / nd
                   - CAST(1.96 AS DOUBLE) * sqrt((p * (CAST(1.0 AS DOUBLE) - p)
                       + CAST(0.9604 AS DOUBLE) / nd) / nd))
                  / (CAST(1.0 AS DOUBLE) + CAST(3.8416 AS DOUBLE) / nd)))
                  AS BIGINT) wilson_lb_ppm
         FROM g2 ORDER BY source""",
    // occurrence-weighted shingle-type ranking; the cumulative window
    // runs over the top-10k subset only; rungs read their rank row.
    "q249_coverage_ladder" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
         w AS (SELECT doc_id, string_split(t, ' ') words FROM n),
         sh AS (
           SELECT unnest(list_transform(range(1, len(words)-1),
                    i -> array_to_string(words[i:i+2],' '))) s
           FROM w WHERE len(words) >= 3),
         c AS (SELECT s, count(*) cnt FROM sh GROUP BY s),
         r AS (SELECT s, cnt, row_number() OVER (ORDER BY cnt DESC, s) r FROM c),
         cum AS (
           SELECT r, SUM(cnt) OVER (ORDER BY r
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) covered
           FROM r WHERE r <= 10000),
         tot AS (SELECT CAST(SUM(cnt) AS BIGINT) total FROM c)
         SELECT r AS top_v, CAST(covered AS BIGINT) covered, total,
                CAST((covered * 1000000) // total AS BIGINT) coverage_ppm
         FROM cum, tot WHERE r IN (100, 1000, 10000) ORDER BY top_v""",
    // per-(doc, replicate) Poisson multiplicities from the same md5
    // ppm ladder; replicate means; nearest-rank order statistics.
    "q252_bootstrap" ->
      """WITH reps AS (
           SELECT b, doc_id, n_chars,
                  CAST(concat('0x', substr(md5(concat('boot:', CAST(b AS VARCHAR),
                    ',', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000 u
           FROM documents, unnest(range(0, 100)) t(b)),
         mm AS (
           SELECT b, n_chars,
                  (CAST(u >= 367879 AS BIGINT) + CAST(u >= 735758 AS BIGINT)
                   + CAST(u >= 919698 AS BIGINT) + CAST(u >= 981011 AS BIGINT)
                   + CAST(u >= 996340 AS BIGINT) + CAST(u >= 999405 AS BIGINT)
                   + CAST(u >= 999916 AS BIGINT) + CAST(u >= 999989 AS BIGINT)
                   + CAST(u >= 999998 AS BIGINT)) m
           FROM reps),
         g AS (SELECT b, sum(m * n_chars) sx, sum(m) sm FROM mm GROUP BY b),
         means AS (SELECT b, CAST(sx AS DOUBLE) / CAST(sm AS DOUBLE) mean_b FROM g),
         rk AS (SELECT mean_b, row_number() OVER (ORDER BY mean_b, b) r FROM means),
         ci AS (SELECT min(mean_b) ci_lo, max(mean_b) ci_hi FROM rk WHERE r IN (3, 98)),
         est AS (SELECT CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   mean_chars FROM documents)
         SELECT mean_chars, ci_lo, ci_hi FROM est, ci""",
    // exact per-lang moments → √SS weights → largest-remainder split.
    "q256_neyman" ->
      """WITH g AS (
           SELECT lang, count(*) m, sum(CAST(n_chars AS HUGEINT)) sx,
                  sum(CAST(n_chars AS HUGEINT) * n_chars) sxx
           FROM documents GROUP BY 1),
         s AS (SELECT lang, m, CAST(m AS HUGEINT) * sxx - sx * sx ss FROM g),
         w AS (SELECT lang, m, ss, sqrt(CAST(ss AS DOUBLE)) w FROM s),
         f AS (SELECT lang, m, ss,
                 (w * CAST(1000 AS DOUBLE)) / SUM(w) OVER () frac FROM w),
         b AS (SELECT lang, m, ss, frac, CAST(floor(frac) AS BIGINT) base,
                 frac - CAST(CAST(floor(frac) AS BIGINT) AS DOUBLE) rem FROM f),
         r AS (SELECT lang, m, ss, base, rem,
                 1000 - SUM(base) OVER () leftover,
                 row_number() OVER (ORDER BY rem DESC, lang) rk FROM b)
         SELECT lang, CAST(m AS BIGINT) n_docs, CAST(ss AS BIGINT) ss,
                CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                  AS BIGINT) alloc
         FROM r ORDER BY lang""",
    // three key-candidate censuses, one audit row each.
    "q259_skew_report" ->
      """WITH l AS (SELECT lang k1, '' k2, count(*) c FROM documents GROUP BY 1, 2),
         s AS (SELECT source k1, '' k2, count(*) c FROM documents GROUP BY 1, 2),
         x AS (SELECT lang k1, source k2, count(*) c FROM documents GROUP BY 1, 2),
         a AS (
           SELECT 'lang' part_key, count(*) n_groups,
                  CAST(sum(c) AS BIGINT) n_rows, CAST(max(c) AS BIGINT) max_group
           FROM l
           UNION ALL
           SELECT 'source', count(*), CAST(sum(c) AS BIGINT),
                  CAST(max(c) AS BIGINT) FROM s
           UNION ALL
           SELECT 'lang_x_source', count(*), CAST(sum(c) AS BIGINT),
                  CAST(max(c) AS BIGINT) FROM x)
         SELECT part_key, n_groups, n_rows, max_group,
                CAST((max_group * 1000000) // n_rows AS BIGINT) max_share_ppm,
                CAST(n_rows // max_group AS BIGINT) parallelism_bound
         FROM a ORDER BY part_key""",
    // per-(lang, source) write plan: exact byte totals + ceil-division
    // shard counts under the 4096-byte file budget.
    "q224_shard_plan" ->
      """SELECT lang, source,
                count(*) AS n_rows,
                CAST(sum(n_chars) AS BIGINT) AS bytes,
                CAST((sum(n_chars) + 4095) // 4096 AS BIGINT) AS n_shards,
                CAST(sum(n_chars) // ((sum(n_chars) + 4095) // 4096) AS BIGINT)
                  AS avg_shard_bytes
         FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",
    // order-independent per-source digest: HUGEINT sum of 60-bit md5
    // row hashes, folded mod 2^61 — the q225 replication check.
    "q225_integrity_digest" ->
      """SELECT source, count(*) AS n_rows,
                CAST(sum(CAST(concat('0x', substr(md5(
                       concat_ws(chr(1), CAST(doc_id AS VARCHAR), text,
                                 lang, CAST(n_chars AS VARCHAR))),
                     1, 15)) AS BIGINT)) % 2305843009213693952 AS BIGINT)
                  AS digest
         FROM documents GROUP BY 1 ORDER BY 1""",
    // block-partitioned lag + the same monotone prefix-count LCP.
    "q235_frontcode" ->
      s"""WITH n AS (SELECT doc_id, $normDuck t FROM documents),
          w AS (SELECT doc_id, string_split(t, ' ') words FROM n),
          v AS (SELECT DISTINCT array_to_string(words[i:i+2], ' ') AS term
                FROM w, unnest(range(1, len(words) - 1)) u(i)
                WHERE len(words) >= 3),
          b AS (SELECT term, substr(term, 1, 2) AS block FROM v),
          l AS (SELECT term, block,
                  lag(term) OVER (PARTITION BY block ORDER BY term) prev
                FROM b),
          c AS (SELECT term, block,
                  CASE WHEN prev IS NULL THEN 0
                       ELSE len(list_filter(range(1, least(length(prev), length(term)) + 1),
                              i -> substr(prev, 1, i) = substr(term, 1, i)))
                  END AS lcp
                FROM l)
          SELECT CAST(count(*) AS BIGINT) n_terms,
                 CAST(count(DISTINCT block) AS BIGINT) n_blocks,
                 CAST(sum(length(term)) AS BIGINT) raw_bytes,
                 CAST(sum(lcp) AS BIGINT) lcp_bytes,
                 CAST(sum(length(term)) - sum(lcp) AS BIGINT) coded_bytes,
                 CAST((sum(lcp) * 1000000) // sum(length(term)) AS BIGINT) savings_ppm
          FROM c""",
    // one corpus pass + sources-sized LOO arithmetic; +100000 shift
    // keeps dividends positive (floor ≡ truncate).
    "q236_loo_source" ->
      s"""WITH n AS (SELECT doc_id, source, $normDuck t FROM documents),
          w AS (SELECT doc_id, source, string_split(t, ' ') words FROM n),
          wt AS (SELECT list_transform(range(0, 64), k ->
                   CAST(concat('0x', substr(md5('w,'||CAST(k AS VARCHAR)), 1, 6)) AS BIGINT)
                     / CAST(16777216 AS DOUBLE) - CAST(0.5 AS DOUBLE)) ws),
          scored AS (
            SELECT doc_id, source,
                   CAST(floor(list_sum(list_transform(words, x ->
                     ws[CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % 64 + 1])) * 1000) AS BIGINT)
                     + 100000 AS sqp
            FROM w, wt),
          per AS (SELECT source, count(*) n_docs, sum(sqp) s_i
                  FROM scored GROUP BY 1),
          tot AS (SELECT sum(n_docs) n_tot, sum(s_i) t_tot FROM per)
          SELECT source, CAST(n_docs AS BIGINT) n_docs,
                 CAST((t_tot * 1000000) // n_tot AS BIGINT) mean_sc,
                 CAST(((t_tot - s_i) * 1000000) // (n_tot - n_docs) AS BIGINT) loo_mean_sc,
                 CAST(((t_tot - s_i) * 1000000) // (n_tot - n_docs)
                      - (t_tot * 1000000) // n_tot AS BIGINT) delta_sc
          FROM per, tot ORDER BY source""",
    // per-source and global ranks replayed as windows; the same
    // integer remap g = (r·N) div n_s.
    "q234_qnorm" ->
      s"""WITH n AS (SELECT doc_id, source, $normDuck t FROM documents),
          w AS (SELECT doc_id, source, string_split(t, ' ') words FROM n),
          wt AS (SELECT list_transform(range(0, 64), k ->
                   CAST(concat('0x', substr(md5('w,'||CAST(k AS VARCHAR)), 1, 6)) AS BIGINT)
                     / CAST(16777216 AS DOUBLE) - CAST(0.5 AS DOUBLE)) ws),
          scored AS (
            SELECT doc_id, source,
                   CAST(floor(list_sum(list_transform(words, x ->
                     ws[CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % 64 + 1])) * 1000) AS BIGINT) AS sq
            FROM w, wt),
          bysrc AS (SELECT doc_id, source, sq,
                      row_number() OVER (PARTITION BY source ORDER BY sq, doc_id) r,
                      count(*) OVER (PARTITION BY source) n_s,
                      count(*) OVER () n_tot
                    FROM scored),
          gq AS (SELECT sq AS sq_norm,
                   row_number() OVER (ORDER BY sq, doc_id) g
                 FROM scored)
          SELECT b.doc_id, b.source, b.sq, gq.sq_norm
          FROM bysrc b JOIN gq
            ON gq.g = greatest((b.r * b.n_tot) // b.n_s, 1)
          ORDER BY b.doc_id""",
    // both assignment rules replayed: mod compare + 40-element HRW
    // argmax (list_max over [w, s] pairs — lexicographic, ties by
    // shard id, matching Spark's struct array_max).
    "q231_reshard" ->
      """WITH h AS (SELECT doc_id,
                  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) h
                FROM documents),
         marm AS (SELECT 'mod' AS method, (h % 32 <> h % 40) AS moved FROM h),
         hw AS (SELECT doc_id,
                  list_max(list_transform(range(0, 32), s ->
                    [CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)||'#'||CAST(s AS VARCHAR)), 1, 15)) AS BIGINT), s]))[2] s32,
                  list_max(list_transform(range(0, 40), s ->
                    [CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)||'#'||CAST(s AS VARCHAR)), 1, 15)) AS BIGINT), s]))[2] s40
                FROM documents),
         harm AS (SELECT 'rendezvous' AS method, (s32 <> s40) AS moved FROM hw),
         u AS (SELECT * FROM marm UNION ALL SELECT * FROM harm)
         SELECT method, CAST(count(*) AS BIGINT) n_docs,
                CAST(sum(CASE WHEN moved THEN 1 ELSE 0 END) AS BIGINT) n_moved,
                CAST((sum(CASE WHEN moved THEN 1 ELSE 0 END) * 1000000)
                     // count(*) AS BIGINT) moved_ppm
         FROM u GROUP BY method ORDER BY method""",
    // BM25 replay + relevance from the same tf pass; exact-ppm
    // metric arithmetic (integer floor division both engines).
    "q230_retrieval_eval" ->
      s"""WITH $bm25Duck,
          top AS (SELECT doc_id, (s0 + s1) + s2 AS score FROM sc
                  WHERE (s0 + s1) + s2 > 0
                  ORDER BY score DESC, doc_id LIMIT 20),
          rel AS (SELECT doc_id,
                    (tf0 > 0 AND tf1 > 0 AND tf2 > 0) AS is_rel FROM tf),
          nr AS (SELECT sum(CASE WHEN is_rel THEN 1 ELSE 0 END) n_relevant
                 FROM rel),
          rk AS (SELECT t.doc_id,
                   row_number() OVER (ORDER BY t.score DESC, t.doc_id) rank,
                   r.is_rel
                 FROM top t JOIN rel r ON t.doc_id = r.doc_id),
          m AS (SELECT
                  sum(CASE WHEN is_rel AND rank <= 5 THEN 1 ELSE 0 END) hits5,
                  sum(CASE WHEN is_rel AND rank <= 10 THEN 1 ELSE 0 END) hits10,
                  sum(CASE WHEN is_rel THEN 1 ELSE 0 END) hits20,
                  min(CASE WHEN is_rel THEN rank END) first_rel
                FROM rk)
          SELECT CAST(n_relevant AS BIGINT) n_relevant,
                 CAST(hits5 AS BIGINT) hits5, CAST(hits10 AS BIGINT) hits10,
                 CAST(hits20 AS BIGINT) hits20,
                 CAST((hits5 * 1000000) // 5 AS BIGINT) p5_ppm,
                 CAST((hits10 * 1000000) // 10 AS BIGINT) p10_ppm,
                 CAST((hits20 * 1000000) // 20 AS BIGINT) p20_ppm,
                 CAST((hits20 * 1000000) // n_relevant AS BIGINT) r20_ppm,
                 CAST(coalesce(1000000 // first_rel, 0) AS BIGINT) mrr_ppm
          FROM m, nr""",
    // q127's scoring + ntile stages, q184's salted-hash order within
    // stage — the full curriculum schedule replayed.
    "q226_curriculum" ->
      s"""WITH n AS (SELECT doc_id, lang, $normDuck t FROM documents),
          w AS (SELECT doc_id, lang, string_split(t, ' ') words FROM n),
          wt AS (SELECT list_transform(range(0, 64), k ->
                   CAST(concat('0x', substr(md5('w,'||CAST(k AS VARCHAR)), 1, 6)) AS BIGINT)
                     / CAST(16777216 AS DOUBLE) - CAST(0.5 AS DOUBLE)) ws),
          scored AS (
            SELECT doc_id, lang,
                   list_sum(list_transform(words, x ->
                     ws[CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % 64 + 1])) AS score
            FROM w, wt),
          st AS (SELECT doc_id, lang,
                   ntile(10) OVER (PARTITION BY lang ORDER BY score DESC, doc_id) decile
                 FROM scored),
          stg AS (SELECT doc_id, lang,
                   CAST(CASE WHEN decile <= 3 THEN 0
                             WHEN decile <= 7 THEN 1 ELSE 2 END AS BIGINT) stage,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)||':curriculum-seed-7'), 1, 15)) AS BIGINT) h
                 FROM st)
          SELECT doc_id, lang, stage,
                 CAST(row_number() OVER (PARTITION BY stage ORDER BY h, doc_id) AS BIGINT) pos
          FROM stg ORDER BY stage, pos""",
    // 50-row zones under each layout rank; scanned = zone [lo, hi]
    // straddles the predicate band — parquet footer-pruning replayed.
    "q228_zonemap" ->
      """WITH base AS (SELECT doc_id, n_chars FROM documents),
         nat AS (SELECT n_chars,
                   (row_number() OVER (ORDER BY doc_id) - 1) // 50 AS zone
                 FROM base),
         clu AS (SELECT n_chars,
                   (row_number() OVER (ORDER BY n_chars, doc_id) - 1) // 50 AS zone
                 FROM base),
         natz AS (SELECT zone, count(*) n_rows, min(n_chars) lo, max(n_chars) hi,
                    sum(CASE WHEN n_chars BETWEEN 200 AND 240 THEN 1 ELSE 0 END) n_match
                  FROM nat GROUP BY 1),
         cluz AS (SELECT zone, count(*) n_rows, min(n_chars) lo, max(n_chars) hi,
                    sum(CASE WHEN n_chars BETWEEN 200 AND 240 THEN 1 ELSE 0 END) n_match
                  FROM clu GROUP BY 1),
         f AS (
           SELECT 'natural' layout, CAST(count(*) AS BIGINT) n_zones,
                  CAST(sum(CASE WHEN hi >= 200 AND lo <= 240 THEN 1 ELSE 0 END) AS BIGINT) zones_scanned,
                  CAST(sum(CASE WHEN hi >= 200 AND lo <= 240 THEN n_rows ELSE 0 END) AS BIGINT) rows_scanned,
                  CAST(sum(n_match) AS BIGINT) n_match
           FROM natz
           UNION ALL
           SELECT 'clustered', CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN hi >= 200 AND lo <= 240 THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(sum(CASE WHEN hi >= 200 AND lo <= 240 THEN n_rows ELSE 0 END) AS BIGINT),
                  CAST(sum(n_match) AS BIGINT)
           FROM cluz)
         SELECT * FROM f ORDER BY layout"""
  )
}
