package graft.text

import graft.ops.{QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-statistics operators for training-data curation: vocabulary
  * extraction with out-of-vocabulary scoring, and bigram collocation
  * mining by lift.
  *
  * Cross-engine determinism: both queries avoid transcendental functions
  * entirely — `ln`/`log` are only guaranteed to ~1 ulp and Java/glibc may
  * round differently, so instead of log-probabilities / PMI we use
  * exact-rational equivalents: OOV is a count ratio, and collocations
  * rank by LIFT = n_xy·N / (n_x·n_y), whose numerator/denominator are
  * exact integers below 2^53 (then a single IEEE division both engines
  * perform identically). PMI = log(lift) is monotone in lift, so the
  * ranking is the same one PMI would give.
  *
  * Scale design: the vocabulary is a top-K aggregate (one shuffle +
  * broadcast back); OOV scoring is then a map-side semi-join per token
  * batch. Bigram counting shuffles (w1, w2) pairs once with map-side
  * combine; unigram counts broadcast into the lift computation.
  */
object CorpusStats extends QueryModule {
  import Tables.documents
  import TextOps.{tokens, oTokens}

  val VocabSize = 1000
  val MinPairCount = 3

  /** Shared oracle CTE: exploded tokens. */
  private val oTok =
    s"tok AS (SELECT doc_id, unnest($oTokens) AS w FROM documents)"

  // ============================================================ vocab/OOV
  // top-K vocabulary by document frequency (ties broken lexically), then
  // per-document out-of-vocabulary rate against it — the log-free
  // unigram quality score
  register("q67_vocab_oov",
    s"""WITH $oTok,
       |df AS (SELECT w, COUNT(DISTINCT doc_id) AS doc_freq
       |       FROM tok GROUP BY w),
       |vocab AS (
       |  SELECT w FROM df
       |  QUALIFY ROW_NUMBER() OVER (ORDER BY doc_freq DESC, w ASC)
       |          <= $VocabSize),
       |scored AS (
       |  SELECT t.doc_id,
       |    COUNT(*) AS n_tokens,
       |    COUNT(CASE WHEN v.w IS NULL THEN 1 END) AS n_oov
       |  FROM tok t LEFT JOIN vocab v ON t.w = v.w
       |  GROUP BY t.doc_id)
       |SELECT doc_id, n_tokens, n_oov,
       |  CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate
       |FROM scored""".stripMargin) { (s, d) =>
    val tok = documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
    // orderBy+limit plans as TakeOrderedAndProject — a per-partition
    // top-K merged on the driver, vs a single-partition window sort
    val vocab = tok.groupBy("w")
      .agg(countDistinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("w").asc)
      .limit(VocabSize)
      .select(col("w").as("vw"))
    tok.join(broadcast(vocab), col("w") === col("vw"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("vw").isNull, 1)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast(DoubleType) / col("n_tokens")).as("oov_rate"))
  }

  // ============================================================ collocations
  // adjacent-bigram collocations ranked by lift (the log-free PMI): both
  // engines compute n_xy*N and n_x*n_y as exact integers, one division
  register("q68_collocations", {
    s"""WITH $oTok,
       |uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY w),
       |total AS (SELECT CAST(COUNT(*) AS BIGINT) AS big_n FROM tok),
       |bi AS (
       |  SELECT p.w1 AS w1, p.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS n_xy
       |  FROM (SELECT unnest(list_transform(range(1, len(t)),
       |                i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS p
       |        FROM (SELECT $oTokens AS t FROM documents) d) pairs
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $MinPairCount),
       |lifted AS (
       |  SELECT bi.w1, bi.w2, bi.n_xy,
       |    (CAST(bi.n_xy AS DOUBLE) * CAST(total.big_n AS DOUBLE))
       |      / (CAST(u1.n AS DOUBLE) * CAST(u2.n AS DOUBLE)) AS lift
       |  FROM bi JOIN uni u1 ON bi.w1 = u1.w
       |          JOIN uni u2 ON bi.w2 = u2.w
       |          CROSS JOIN total)
       |SELECT w1, w2, n_xy, lift FROM lifted
       |QUALIFY ROW_NUMBER() OVER (ORDER BY lift DESC, w1 ASC, w2 ASC) <= 50""".stripMargin
  }) { (s, d) =>
    val docsTok = documents(s, d).select(col("doc_id"),
      tokens(col("text")).as("t"))
    val tok = docsTok.select(explode(col("t")).as("w"))
    val uni = tok.groupBy("w").agg(count(lit(1)).as("n"))
    val total = tok.agg(count(lit(1)).as("big_n"))
    // adjacent pairs without a join: zip the array with its own tail
    val tailLen = greatest(size(col("t")) - 1, lit(0))
    val bi = docsTok
      .select(explode(zip_with(
        slice(col("t"), lit(1), tailLen),
        slice(col("t"), lit(2), tailLen),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= MinPairCount)
    val lifted = bi
      .join(broadcast(uni.select(col("w").as("u1w"), col("n").as("n1"))),
        col("w1") === col("u1w"))
      .join(broadcast(uni.select(col("w").as("u2w"), col("n").as("n2"))),
        col("w2") === col("u2w"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("n_xy"),
        ((col("n_xy").cast(DoubleType) * col("big_n").cast(DoubleType))
          / (col("n1").cast(DoubleType) * col("n2").cast(DoubleType)))
          .as("lift"))
    // top-50 via orderBy+limit → TakeOrderedAndProject (distributed
    // partial top-k per partition), NOT a single-partition rank window:
    // the frequent-bigram census grows with the corpus, and PlanLint's
    // global-window sweep is what flagged the old window formulation
    lifted.orderBy(col("lift").desc, col("w1").asc, col("w2").asc)
      .limit(50)
      .select("w1", "w2", "n_xy", "lift")
  }

  // ============================================================ pivot
  // event-type pivot per user — the reshape operator (Spark .pivot with an
  // explicit value list = conditional aggregation; the oracle spells the
  // same CASEs, which is also exactly what Spark plans)
  register("q69_pivot",
    """SELECT user_id,
      |  CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view,
      |  CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
      |  CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
      |  CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error
      |FROM events GROUP BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("view", "click", "purchase", "error"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("view", "click", "purchase", "error"))
  }

  // ======================================================= transitions
  // First-order Markov transition counts over per-user event streams —
  // the "user journey" matrix behind funnel and next-action models, and
  // the same shape a token-bigram transition table takes at corpus
  // scale. One window shuffle on user_id (LAG of the previous event
  // type with a unique (ts, event_id) tie-break), then a partial-
  // aggregated rollup on the (prev, curr) pair — state space bounded by
  // |event types|², independent of stream length.
  register("q116_transitions",
    """WITH ordered AS (
      |  SELECT user_id, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev_type
      |  FROM events)
      |SELECT prev_type, event_type AS curr_type, COUNT(*) AS n
      |FROM ordered WHERE prev_type IS NOT NULL
      |GROUP BY prev_type, event_type""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("curr_type"))
      .agg(count(lit(1)).as("n"))
  }

  // ======================================================= chi-square
  // Contingency-table independence statistic (event type × day-of-month
  // mod 7) without transcendentals: observed counts per cell, expected
  // = row·col/n, per-type χ² contribution = Σ (O−E)²/E folded over the
  // type's cells IN SORTED CELL ORDER — a per-row list fold, never a
  // float SQL aggregation, so the sum order is pinned in both engines
  // (the q113 discipline). Counts shuffle once; the fold runs on
  // |types| tiny rows.
  register("q117_chi_square",
    """WITH cells AS (
      |  SELECT event_type, CAST(day(ts) % 7 AS BIGINT) AS bucket,
      |    COUNT(*) AS o
      |  FROM events GROUP BY event_type, day(ts) % 7),
      |tot AS (
      |  SELECT event_type, bucket, o,
      |    SUM(o) OVER (PARTITION BY event_type) AS row_n,
      |    SUM(o) OVER (PARTITION BY bucket) AS col_n,
      |    SUM(o) OVER () AS n
      |  FROM cells),
      |terms AS (
      |  SELECT event_type,
      |    list(CAST((o - CAST(row_n AS DOUBLE) * col_n / n)
      |        * (o - CAST(row_n AS DOUBLE) * col_n / n)
      |        / (CAST(row_n AS DOUBLE) * col_n / n) AS DOUBLE)
      |      ORDER BY bucket) AS ts_,
      |    COUNT(*) AS n_cells, CAST(MAX(row_n) AS BIGINT) AS row_n
      |  FROM tot GROUP BY event_type)
      |SELECT event_type, n_cells, row_n,
      |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ts_),
      |    (a, b) -> a + b) AS chi2_contrib
      |FROM terms""".stripMargin) { (s, d) =>
    val cells = Tables.events(s, d)
      .groupBy(col("event_type"),
        (dayofmonth(col("ts")) % 7).cast(LongType).as("bucket"))
      .agg(count(lit(1)).as("o"))
    val tot = cells.select(col("event_type"), col("bucket"), col("o"),
      sum(col("o")).over(Window.partitionBy(col("event_type"))).as("row_n"),
      sum(col("o")).over(Window.partitionBy(col("bucket"))).as("col_n"),
      sum(col("o")).over(Window.partitionBy()).as("n"))
    val e = col("row_n").cast(DoubleType) * col("col_n") / col("n")
    val terms = tot
      .select(col("event_type"), col("bucket"),
        ((col("o") - e) * (col("o") - e) / e).as("term"), col("row_n"))
      .groupBy("event_type")
      .agg(transform(array_sort(collect_list(struct(col("bucket"),
        col("term")))), x => x.getField("term")).as("ts_"),
        count(lit(1)).as("n_cells"),
        max(col("row_n")).cast(LongType).as("row_n"))
    terms.select(col("event_type"), col("n_cells"), col("row_n"),
      aggregate(col("ts_"), lit(0.0), (a, b) => a + b).as("chi2_contrib"))
  }

  // ==================================================== trigram counts
  // N-gram language-model count tables — the statistic a corpus
  // pipeline materializes for repetition scoring and classic LM
  // filtering: trigram counts plus the continuation count (how many
  // distinct words follow each bigram context). Shingle explosion is a
  // map-only generator; both aggregates partial-combine on fixed-width
  // keys. Top 100 by (count desc, trigram asc) via TakeOrdered.
  register("q118_trigram_counts",
    s"""WITH tok AS (SELECT doc_id, $oTokens AS t FROM documents),
       |tri AS (
       |  SELECT t[s.s] || ' ' || t[s.s + 1] AS context, t[s.s + 2] AS nxt
       |  FROM tok, LATERAL (
       |    SELECT unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS s) s),
       |counts AS (
       |  SELECT context, nxt, COUNT(*) AS n FROM tri GROUP BY context, nxt),
       |ctx AS (
       |  SELECT context, COUNT(*) AS continuations, CAST(SUM(n) AS BIGINT) AS context_n
       |  FROM counts GROUP BY context)
       |SELECT c.context, c.nxt, c.n, x.continuations, x.context_n
       |FROM counts c JOIN ctx x ON c.context = x.context
       |ORDER BY c.n DESC, c.context ASC, c.nxt ASC LIMIT 100""".stripMargin) {
    (s, d) =>
      val t = col("t")
      val tri = documents(s, d)
        .select(tokens(col("text")).as("t"))
        // clamp to ≥1 (sequence(1,0) DESCENDS) then filter the truncated
        // starts out BEFORE element_at — ANSI throws on out-of-bounds
        .select(t, explode(sequence(lit(1),
          greatest(size(t) - 2, lit(1)).cast(IntegerType))).as("st"))
        .filter(col("st") <= size(t) - 2)
        .select(concat_ws(" ", element_at(t, col("st")),
          element_at(t, col("st") + 1)).as("context"),
          element_at(t, col("st") + 2).as("nxt"))
      val counts = tri.groupBy("context", "nxt").agg(count(lit(1)).as("n"))
      val ctx = counts.groupBy(col("context").as("ctx2"))
        .agg(count(lit(1)).as("continuations"), sum(col("n")).as("context_n"))
      counts.join(ctx, col("context") === col("ctx2"))
        .select(col("context"), col("nxt"), col("n"), col("continuations"),
          col("context_n"))
        .orderBy(col("n").desc, col("context").asc, col("nxt").asc)
        .limit(100)
  }

  // ==================================================== inverted index
  // Posting-list construction — the retrieval-side artifact of a corpus
  // pipeline: per term, document frequency, total term frequency, and
  // the first [[PostingsCap]] doc ids (sorted). The cap is applied with
  // a window rank BEFORE collecting, so per-term aggregation state is
  // bounded by construction — a stopword's postings never accumulate
  // the whole corpus into one aggregate buffer (the unbounded
  // collect_set is exactly what dies at 100 TB). Top 100 terms by
  // (doc_freq desc, term asc) via TakeOrdered.
  val PostingsCap = 20
  register("q124_inverted_index",
    s"""WITH $oTok,
       |pairs AS (
       |  SELECT w, doc_id, COUNT(*) AS tf FROM tok GROUP BY w, doc_id),
       |terms AS (
       |  SELECT w, COUNT(*) AS doc_freq, CAST(SUM(tf) AS BIGINT) AS total_freq
       |  FROM pairs GROUP BY w),
       |ranked AS (
       |  SELECT w, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY w ORDER BY doc_id) AS rk
       |  FROM pairs),
       |posts AS (
       |  SELECT w, array_to_string(list_sort(list(doc_id)), ',') AS postings
       |  FROM ranked WHERE rk <= $PostingsCap GROUP BY w)
       |SELECT t.w AS term, t.doc_freq, t.total_freq, p.postings
       |FROM terms t JOIN posts p ON t.w = p.w
       |ORDER BY t.doc_freq DESC, term ASC LIMIT 100""".stripMargin) { (s, d) =>
    val pairs = documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .groupBy("w", "doc_id").agg(count(lit(1)).as("tf"))
    val terms = pairs.groupBy("w")
      .agg(count(lit(1)).as("doc_freq"), sum(col("tf")).as("total_freq"))
    val rk = Window.partitionBy(col("w")).orderBy(col("doc_id"))
    val posts = pairs
      .withColumn("rk", row_number().over(rk))
      .filter(col("rk") <= PostingsCap)
      .groupBy("w")
      .agg(concat_ws(",", sort_array(collect_list(col("doc_id"))))
        .as("postings"))
    terms.join(posts, "w")
      .select(col("w").as("term"), col("doc_freq"), col("total_freq"),
        col("postings"))
      .orderBy(col("doc_freq").desc, col("term").asc)
      .limit(100)
  }

  // ================================================================ bm25
  /** [[q136]] query terms (drawn from the corpus head vocabulary). */
  val Bm25Terms: Seq[String] = Seq("join", "hash", "scan")
  val Bm25Top = 20

  // BM25-shaped lexical ranking — the retrieval scorer between q38's
  // TF-IDF table and q132's fusion: per-document score for a fixed
  // query, with tf saturation (k1 = 1.2) and length normalization
  // (b = 0.75). The idf factor is the LOG-FREE rational surrogate
  // (N − df + ½)/(df + ½) — the same monotone core BM25 wraps in a log
  // (transcendentals are banned from oracle-gated queries; ordering and
  // saturation behavior are preserved).
  //
  // Determinism: every float literal is e-notation DOUBLE on both sides
  // (plain 0.5 parses as DECIMAL in both engines, whose division scale
  // rules differ); per-term scores pivot to fixed columns so the final
  // sum is the same left-to-right three-term addition in both engines —
  // never an order-ambiguous SUM over rows.
  //
  // Scale: one (doc, term) partial-aggregated shuffle for tf (the WHERE
  // prunes to query terms BEFORE the aggregate); df and the global
  // length stats are broadcast frames; top-20 is TakeOrdered.
  register("q136_bm25_ranking", {
    val inList = Bm25Terms.map(t => s"'$t'").mkString(", ")
    val Seq(t1, t2, t3) = Bm25Terms
    s"""WITH $oTok,
       |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
       |       FROM tok GROUP BY doc_id),
       |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |            CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM tok WHERE w IN ($inList) GROUP BY doc_id, w),
       |df AS (SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       |       FROM tf GROUP BY w),
       |sc AS (
       |  SELECT t.doc_id, t.w,
       |    ((s.n_docs - d.df + 5e-1) / (d.df + 5e-1))
       |      * (t.tf * 22e-1)
       |      / (t.tf + 12e-1 * (25e-2 + 75e-2 * (l.dl / s.avgdl))) AS sco
       |  FROM tf t JOIN df d ON t.w = d.w
       |       JOIN dl l ON t.doc_id = l.doc_id
       |       CROSS JOIN stats s),
       |pv AS (
       |  SELECT doc_id,
       |    MAX(CASE WHEN w = '$t1' THEN sco END) AS s1,
       |    MAX(CASE WHEN w = '$t2' THEN sco END) AS s2,
       |    MAX(CASE WHEN w = '$t3' THEN sco END) AS s3
       |  FROM sc GROUP BY doc_id)
       |SELECT doc_id,
       |  COALESCE(s1, 0e0) + COALESCE(s2, 0e0) + COALESCE(s3, 0e0) AS bm25
       |FROM pv
       |QUALIFY ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC)
       |  <= $Bm25Top""".stripMargin
  }) { (s, d) =>
    val Seq(t1, t2, t3) = Bm25Terms
    val tok = documents(s, d).select(col("doc_id"),
      explode(graft.text.TextOps.tokens(col("text"))).as("w"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast(DoubleType) / count(lit(1))).as("avgdl"))
    val tf = tok.filter(col("w").isin(Bm25Terms: _*))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("w").agg(countDistinct(col("doc_id")).as("df"))
    val sc = tf
      .join(broadcast(df), Seq("w"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("w"),
        expr("""((n_docs - df + 5e-1) / (df + 5e-1))
               | * (tf * 22e-1)
               | / (tf + 12e-1 * (25e-2 + 75e-2 * (dl / avgdl)))"""
          .stripMargin).as("sco"))
    sc.groupBy("doc_id")
      .agg(max(when(col("w") === t1, col("sco"))).as("s1"),
        max(when(col("w") === t2, col("sco"))).as("s2"),
        max(when(col("w") === t3, col("sco"))).as("s3"))
      .select(col("doc_id"),
        (coalesce(col("s1"), lit(0e0)) + coalesce(col("s2"), lit(0e0))
          + coalesce(col("s3"), lit(0e0))).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(Bm25Top)
  }

  // ================================================ source similarity
  // Cross-source vocabulary similarity matrix — the dataset-curation
  // view that finds near-duplicate domains/feeds before mixing (two
  // sources with Jaccard ≈ 1 are the same crawl twice; q119's mixture
  // weights should see one of them). Exact set Jaccard over each
  // source's distinct vocabulary: |∩| from a token-keyed equi-join,
  // integer sizes, one double division.
  //
  // Scale: distinct (source, token) partial-aggregates map-side; the
  // intersection join is keyed on the token with fan-out bounded by the
  // source count (20 here). For source counts where |sources|² pairs
  // stop being "a summary table", use q139's MinHash-signature estimate
  // instead — same output shape, corpus touched exactly once.
  register("q137_source_similarity",
    s"""WITH sv AS (
       |  SELECT DISTINCT source, unnest($oTokens) AS w FROM documents),
       |sizes AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM sv GROUP BY source),
       |inter AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |    CAST(COUNT(*) AS BIGINT) AS n_common
       |  FROM sv a JOIN sv b ON a.w = b.w AND a.source < b.source
       |  GROUP BY a.source, b.source)
       |SELECT source_a, source_b, n_common, sa.n AS n_a, sb.n AS n_b,
       |  CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
       |FROM inter JOIN sizes sa ON source_a = sa.source
       |           JOIN sizes sb ON source_b = sb.source""".stripMargin) {
    (s, d) =>
    val sv = documents(s, d)
      .select(col("source"),
        explode(graft.text.TextOps.tokens(col("text"))).as("w"))
      .distinct()
    val sizes = sv.groupBy("source").agg(count(lit(1)).as("n"))
    val a = sv.select(col("source").as("source_a"), col("w"))
    val b = sv.select(col("source").as("source_b"), col("w").as("wb"))
    val inter = a.join(b, col("w") === col("wb") &&
        col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("n").as("n_a"))), Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("n").as("n_b"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_common"),
        col("n_a"), col("n_b"),
        (col("n_common").cast(DoubleType)
          / (col("n_a") + col("n_b") - col("n_common"))).as("jaccard"))
  }

  // ================================== source similarity, MinHash estimate
  // The documented scale swap for q137: at source counts where the exact
  // token-keyed intersection join stops being cheap, estimate each pair's
  // Jaccard from per-source MinHash signatures instead. Signature slot i
  // is min(xxhash64(i, w)) over the source's distinct vocabulary —
  // computed as MinhashPerms parallel min() aggregates in ONE map-side-
  // combined pass over (source, token), so the shuffle carries exactly
  // |sources| × MinhashPerms longs and the pair comparison runs on a
  // |sources|-row broadcast frame. Nothing downstream of the vocab scan
  // depends on corpus size — this is the O(S²) fix q137's Scaladoc
  // promises.
  //
  // Gate (q55/q56/q85 within_bound pattern): the estimate is
  // engine-specific (a fixed xxhash64 family), so the hash covers the
  // EXACT pair matrix plus a within_bound boolean. matches/P is unbiased
  // with se = sqrt(J(1-J)/P) ≤ 0.044 at P = 128; the 0.2 bound is >4.5σ
  // — and the estimator is fully deterministic, so a pass at one SF is a
  // pass forever on that data.
  val MinhashPerms = 128
  val MinhashJaccardBound = 0.2

  /** The estimate-vs-exact pair frame behind q139 — separate so the spec
    * can assert the actual estimator margin, not just the boolean. */
  def sourceMinhashPairs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val sv = documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .distinct()
    // one wide aggregation: P independent min-hash slots, packed to an array
    val sigs = sv.groupBy("source")
      .agg(count(lit(1)).as("n"),
        array((0 until MinhashPerms).map(i =>
          min(xxhash64(lit(i), col("w")))): _*).as("sig"))
    val a = sigs.select(col("source").as("source_a"), col("n").as("n_a"),
      col("sig").as("sig_a"))
    val b = sigs.select(col("source").as("source_b"), col("n").as("n_b"),
      col("sig").as("sig_b"))
    val est = broadcast(a).join(broadcast(b),
        col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => x === y), m => m)).cast(DoubleType)
          / MinhashPerms).as("est_jaccard"))
    // exact pair matrix (the hashable truth the bound is checked against)
    val exact = sv.select(col("source").as("source_a"), col("w"))
      .join(sv.select(col("source").as("source_b"), col("w").as("wb")),
        col("w") === col("wb") && col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_common"))
    // inner join: like q137's oracle, only intersecting pairs appear
    // (every source pair here shares vocabulary; a zero-overlap pair
    // would be absent from both sides identically)
    est.join(exact, Seq("source_a", "source_b"))
      .select(col("source_a"), col("source_b"), col("est_jaccard"),
        (col("n_common").cast(DoubleType)
          / (col("n_a") + col("n_b") - col("n_common"))).as("jaccard"))
  }

  register("q139_source_minhash_similarity",
    s"""WITH sv AS (
       |  SELECT DISTINCT source, unnest($oTokens) AS w FROM documents),
       |sizes AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM sv GROUP BY source),
       |inter AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |    CAST(COUNT(*) AS BIGINT) AS n_common
       |  FROM sv a JOIN sv b ON a.w = b.w AND a.source < b.source
       |  GROUP BY a.source, b.source)
       |SELECT source_a, source_b,
       |  CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard,
       |  TRUE AS within_bound
       |FROM inter JOIN sizes sa ON source_a = sa.source
       |           JOIN sizes sb ON source_b = sb.source""".stripMargin) {
    (s, d) =>
    sourceMinhashPairs(s, d)
      .select(col("source_a"), col("source_b"), col("jaccard"),
        (abs(col("est_jaccard") - col("jaccard"))
          <= MinhashJaccardBound).as("within_bound"))
  }

  // ======================================== vocabulary coverage curve
  // Tokenizer-design analytics: what share of all corpus token
  // OCCURRENCES do the top-k vocabulary entries cover, at k ∈
  // [[CoverageKs]]? (The Zipf-curve elbow this samples is how a vocab
  // size gets chosen.) The top-k frame is TakeOrdered(max k) — never a
  // vocabulary-sized global window; the cumulative sum runs inside
  // that bounded frame, and the corpus total is a 1-row broadcast.
  // Exact integers + one final division. Grid points sized to the
  // synthetic corpus's 31-token template vocabulary; a natural corpus
  // would use {1e3, 1e4, 1e5} with the same TakeOrdered plan.
  val CoverageKs: Seq[Int] = Seq(5, 10, 25)

  register("q154_vocab_coverage", {
    val maxK = CoverageKs.max
    s"""WITH tok AS (SELECT unnest($oTokens) AS w FROM documents),
       |counts AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM tok GROUP BY w),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM counts),
       |top AS (
       |  SELECT w, c, ROW_NUMBER() OVER (ORDER BY c DESC, w ASC) AS r
       |  FROM counts ORDER BY c DESC, w ASC LIMIT $maxK),
       |cum AS (
       |  SELECT r, CAST(SUM(c) OVER (ORDER BY r
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cum_tokens
       |  FROM top)
       |SELECT cum.r AS k, cum.cum_tokens, tot.total AS total_tokens,
       |  CAST(cum.cum_tokens AS DOUBLE) / tot.total AS coverage
       |FROM cum CROSS JOIN tot
       |WHERE cum.r IN (${CoverageKs.mkString(", ")})""".stripMargin
  }) { (s, d) =>
    val counts = documents(s, d)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val tot = broadcast(counts.agg(sum(col("c")).as("total")))
    val top = counts.orderBy(col("c").desc, col("w").asc)
      .limit(CoverageKs.max)
      .select(col("w"), col("c"), row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("w").asc)).as("r"))
    val cum = top.select(col("r"), sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("r"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)).as("cum_tokens"))
    cum.filter(col("r").isin(CoverageKs.map(Integer.valueOf): _*))
      .crossJoin(tot)
      .select(col("r").cast(LongType).as("k"), col("cum_tokens"),
        col("total").as("total_tokens"),
        (col("cum_tokens").cast(DoubleType) / col("total")).as("coverage"))
  }

  // ============================================== mixture drift (KL)
  // Distribution-shift monitor for the data mixture: per-source
  // language-mix KL divergence against the corpus-wide mix —
  // KL(p_source ‖ p_corpus) = Σ_lang p·ln(p/q). The mixture-manifest
  // companion (q119): a source whose language profile drifts from the
  // corpus (or from its own last snapshot — same operator, different
  // right-hand frame) is flagged before it skews a training run.
  //
  // Determinism (the q141 micro-grid LN pattern): every log ratio
  // ln((n_sl·n)/(n_s·n_l)) takes an EXACT integer-ratio double, is
  // snapped per-cell to a 1e-6 BIGINT grid, and weighted by the
  // integer n_sl — the per-source sum is exact integer arithmetic and
  // the only float ops are the final divisions.
  //
  // Scale: two tiny aggregations (source×lang cells, lang marginals —
  // both bounded by label cardinality, partial-aggregated map-side)
  // and a 1-row corpus total broadcast. The corpus is scanned once.
  val KlDriftMicro = 200000L // flag sources with KL > 0.2 nats

  register("q150_mixture_drift",
    s"""WITH cells AS (
       |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_sl
       |  FROM documents GROUP BY source, lang),
       |src AS (SELECT source, CAST(SUM(n_sl) AS BIGINT) AS n_s
       |  FROM cells GROUP BY source),
       |lng AS (SELECT lang, CAST(SUM(n_sl) AS BIGINT) AS n_l
       |  FROM cells GROUP BY lang),
       |tot AS (SELECT CAST(SUM(n_sl) AS BIGINT) AS n FROM cells),
       |terms AS (
       |  SELECT c.source,
       |    c.n_sl * CAST(ROUND(LN(CAST(c.n_sl * t.n AS DOUBLE)
       |      / (s.n_s * l.n_l)) * 1000000) AS BIGINT) AS term_micro
       |  FROM cells c JOIN src s ON c.source = s.source
       |               JOIN lng l ON c.lang = l.lang CROSS JOIN tot t)
       |SELECT tm.source, s.n_s AS n_docs,
       |  CAST(CAST(SUM(tm.term_micro) AS BIGINT) AS DOUBLE) / s.n_s
       |    / 1000000.0 AS kl_nats,
       |  CAST(SUM(tm.term_micro) AS BIGINT) > s.n_s * $KlDriftMicro
       |    AS drifted
       |FROM terms tm JOIN src s ON tm.source = s.source
       |GROUP BY tm.source, s.n_s""".stripMargin) { (s, d) =>
    val cells = documents(s, d).groupBy("source", "lang")
      .agg(count(lit(1)).as("n_sl"))
    val src = cells.groupBy(col("source").as("src2"))
      .agg(sum(col("n_sl")).as("n_s"))
    val lng = cells.groupBy(col("lang").as("lang2"))
      .agg(sum(col("n_sl")).as("n_l"))
    val tot = cells.agg(sum(col("n_sl")).as("n"))
    val terms = cells
      .join(src, col("source") === col("src2"))
      .join(lng, col("lang") === col("lang2"))
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_s"),
        (col("n_sl") * round(log((col("n_sl") * col("n")).cast(DoubleType)
          / (col("n_s") * col("n_l"))) * 1000000).cast(LongType))
          .as("term_micro"))
    terms.groupBy(col("source"), col("n_s"))
      .agg(sum(col("term_micro")).as("sum_micro"))
      .select(col("source"), col("n_s").as("n_docs"),
        (col("sum_micro").cast(DoubleType) / col("n_s") / 1000000.0)
          .as("kl_nats"),
        (col("sum_micro") > col("n_s") * KlDriftMicro).as("drifted"))
  }

  // ====================================================== BPE learning
  // The first [[BpeRounds]] merge rules of byte-pair-encoding tokenizer
  // training, learned over the corpus's word-frequency table: each round
  // counts adjacent symbol pairs (weighted by word count), picks the
  // most frequent pair (ties: lexicographic — deterministic in both
  // engines), and rewrites every word with the pair merged. The merge
  // rewrite is a plain left-to-right non-overlapping string replace on
  // a space-delimited symbol form (" a a a " --(a,a)--> " aa a ") —
  // replace() scans identically in Spark (Java semantics) and DuckDB,
  // which is exactly BPE's leftmost-first rule.
  //
  // The learned pair arrives at the rewrite as a 1-ROW BROADCAST FRAME,
  // not a collected literal: each round is
  //   pairs → weighted count → TakeOrdered(1) → crossJoin(broadcast)
  // so the driver never holds the vocabulary and the plan stays a
  // single lineage (K chained narrow passes over the vocab frame — the
  // corpus itself is read once for the word counts).
  //
  // Scale: everything after the initial token count runs on the
  // VOCABULARY frame (|distinct words|, not corpus size); pair counts
  // shuffle (pair → weight) partials map-side; the argmax is a 1-row
  // TakeOrdered. Word-frequency BPE is how production tokenizers train
  // at corpus scale — the corpus pass is the count, never the merges.
  val BpeRounds = 3

  register("q145_bpe_merges", {
    // round r CTEs: p{r} = weighted adjacent pairs of w{r-1},
    // t{r} = argmax pair, w{r} = vocab with the pair merged
    val rounds = (1 to BpeRounds).map { r =>
      s"""p$r AS (
         |  SELECT s[i.i] AS pair_a, s[i.i + 1] AS pair_b,
         |    CAST(SUM(cnt) AS BIGINT) AS n
         |  FROM (SELECT cnt, string_split(trim(sym), ' ') AS s
         |        FROM w${r - 1}) ws, LATERAL (
         |    SELECT unnest(range(1, greatest(len(s) - 1, 0) + 1)) AS i) i
         |  GROUP BY 1, 2),
         |t$r AS (
         |  SELECT pair_a, pair_b, n FROM p$r
         |  ORDER BY n DESC, pair_a ASC, pair_b ASC LIMIT 1),
         |w$r AS (
         |  SELECT cnt, replace(sym, ' ' || pair_a || ' ' || pair_b || ' ',
         |    ' ' || pair_a || pair_b || ' ') AS sym
         |  FROM w${r - 1} CROSS JOIN t$r)""".stripMargin
    }.mkString(",\n")
    val out = (1 to BpeRounds).map(r =>
      s"SELECT $r AS round, pair_a, pair_b, n FROM t$r")
      .mkString("\nUNION ALL\n")
    s"""WITH vocab AS (
       |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest($oTokens) AS w FROM documents)
       |  GROUP BY w),
       |w0 AS (
       |  SELECT cnt,
       |    ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS sym
       |  FROM vocab),
       |$rounds
       |$out""".stripMargin
  }) { (s, d) =>
    val vocab = documents(s, d)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    var w = vocab.select(col("cnt"),
      concat(lit(" "), array_join(split(col("word"), ""), " "), lit(" "))
        .as("sym"))
    val merges = (1 to BpeRounds).map { r =>
      val sArr = split(trim(col("sym")), " ")
      val pairs = w
        .select(col("cnt"), sArr.as("s"), explode(sequence(lit(1),
          greatest(size(sArr) - 1, lit(1)).cast(IntegerType))).as("i"))
        .filter(col("i") <= size(col("s")) - 1)
        .select(col("cnt"), element_at(col("s"), col("i")).as("pair_a"),
          element_at(col("s"), col("i") + 1).as("pair_b"))
        .groupBy("pair_a", "pair_b").agg(sum(col("cnt")).as("n"))
      val top = pairs
        .orderBy(col("n").desc, col("pair_a").asc, col("pair_b").asc)
        .limit(1)
      w = w.crossJoin(broadcast(top))
        .select(col("cnt"),
          expr("replace(sym, ' ' || pair_a || ' ' || pair_b || ' ', " +
            "' ' || pair_a || pair_b || ' ')").as("sym"))
      top.select(lit(r).as("round"), col("pair_a"), col("pair_b"), col("n"))
    }
    merges.reduce(_.union(_))
  }

  // ============================================ unigram entropy filter
  // Per-document token-distribution entropy — the pretraining quality
  // signal that separates natural prose (high entropy) from boilerplate
  // and keyword-stuffed spam (low entropy, few tokens dominating).
  // H = −Σ (c/T)·ln(c/T) computed on the q141 measured-safe grid: each
  // LN sees an exact integer ratio c/T and snaps to the BIGINT 1e-6
  // grid BEFORE any aggregation (1-ulp libm wobble is ~10 orders below
  // the grid); Σ c·L(c/T) is then an order-free integer sum, and the
  // final div T truncates identically in both engines.
  //
  // Scale: one (doc_id, token) aggregation with map-side combine — the
  // same shuffle shape as TF — then a per-doc rollup; the join back is
  // keyed on doc_id. Per-doc state never materializes the token set.
  register("q180_token_entropy",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
      |  FROM documents),
      |cnt AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
      |        FROM tok GROUP BY doc_id, w),
      |tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |        CAST(COUNT(*) AS BIGINT) AS vocab
      |        FROM cnt GROUP BY doc_id),
      |terms AS (
      |  SELECT c.doc_id, t.n_tokens, t.vocab,
      |    c.c * CAST(ROUND(LN(CAST(c.c AS DOUBLE) / t.n_tokens) * 1000000)
      |      AS BIGINT) AS term_micro
      |  FROM cnt c JOIN tot t ON c.doc_id = t.doc_id)
      |SELECT doc_id, n_tokens, vocab,
      |  (0 - CAST(SUM(term_micro) AS BIGINT)) // n_tokens AS entropy_micro
      |FROM terms GROUP BY doc_id, n_tokens, vocab""".stripMargin) { (s, d) =>
    val tok = documents(s, d)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
    val cnt = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("vocab"))
    cnt.join(tot, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("vocab"),
        (col("c") * round(log(col("c").cast(DoubleType) / col("n_tokens"))
          * 1000000).cast(LongType)).as("term_micro"))
      .groupBy("doc_id", "n_tokens", "vocab")
      .agg(sum(col("term_micro")).as("sm"))
      .select(col("doc_id"), col("n_tokens"), col("vocab"),
        expr("(0 - sm) div n_tokens").as("entropy_micro"))
  }
}
