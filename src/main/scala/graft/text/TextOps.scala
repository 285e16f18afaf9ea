package graft.text

import graft.ops.{QueryModule, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines over the
  * `documents` table: token counting, quality scoring, language-ID
  * heuristic, document fingerprinting.
  *
  * Everything here is a narrow per-row projection — no shuffle, fully
  * inside whole-stage codegen — so it scales linearly to any corpus size.
  *
  * Cross-engine determinism: the only hash primitive is
  * [[PortableHash.hash60]] (md5-hex prefix parsed as a 60-bit integer),
  * which Spark and DuckDB compute identically; ratios are exact-integer
  * divisions in double.
  */
object TextOps extends QueryModule {
  import Tables.documents
  import PortableHash._

  /** Whitespace tokens of trimmed text — Spark side. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")
  /** DuckDB spelling of [[tokens]]. */
  val oTokens = raw"string_split_regex(trim(text), '\s+')"

  // language marker stopwords — single source of truth for both engines
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in", "it"),
    "es" -> Seq("el", "la", "de", "los", "que", "y", "en", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "les", "des", "et", "est", "une", "dans", "ce"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  private def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, w => w.isin(words.map(lit): _*)))
  private def oMarkerCount(words: Seq[String]): String =
    s"len(list_filter($oTokens, w -> w IN (${words.map(w => s"'$w'").mkString(", ")})))"

  // ============================================================ text stats
  // token counting + quality scoring (length/uniqueness/stopword ratios)
  register("q20_text_stats",
    s"""SELECT doc_id, lang, n_chars,
       |  length(text) AS char_len,
       |  len($oTokens) AS n_tokens,
       |  len(list_distinct($oTokens)) AS n_unique_tokens,
       |  CAST(len(list_distinct($oTokens)) AS DOUBLE)
       |    / len($oTokens) AS unique_ratio,
       |  CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
       |    / len($oTokens) AS avg_token_len,
       |  CAST(${oMarkerCount(markers.head._2)} AS DOUBLE)
       |    / len($oTokens) AS stopword_ratio,
       |  CASE WHEN len($oTokens) BETWEEN 20 AND 10000
       |        AND CAST(len(list_distinct($oTokens)) AS DOUBLE) / len($oTokens) > 0.1
       |       THEN 1 ELSE 0 END AS quality_pass
       |FROM documents""".stripMargin) { (s, d) =>
    val t = tokens(col("text"))
    val nTok = size(t)
    val uniqRatio = size(array_distinct(t)).cast(DoubleType) / nTok
    documents(s, d).select(
      col("doc_id"), col("lang"), col("n_chars"),
      length(col("text")).as("char_len"),
      nTok.as("n_tokens"),
      size(array_distinct(t)).as("n_unique_tokens"),
      uniqRatio.as("unique_ratio"),
      (length(regexp_replace(col("text"), "\\s", "")).cast(DoubleType) / nTok)
        .as("avg_token_len"),
      (markerCount(t, markers.head._2).cast(DoubleType) / nTok)
        .as("stopword_ratio"),
      when(nTok.between(20, 10000) && uniqRatio > 0.1, 1).otherwise(0)
        .as("quality_pass"))
  }

  // ============================================================ language ID
  // n-gram/stopword-marker heuristic with deterministic arg-max tie-break
  register("q21_lang_id", {
    val scores = markers.map { case (l, ws) => s"${oMarkerCount(ws)} AS score_$l" }
    val argmax = markers.map(_._1).foldRight("'und'") { case (l, rest) =>
      val geAll = markers.map(_._1).filter(_ != l).map(o => s"score_$l >= score_$o")
        .mkString(" AND ")
      s"CASE WHEN score_$l > 0 AND $geAll THEN '$l' ELSE $rest END"
    }
    s"""WITH scored AS (
       |  SELECT doc_id, lang, ${scores.mkString(", ")} FROM documents)
       |SELECT doc_id, lang, $argmax AS detected_lang FROM scored""".stripMargin
  }) { (s, d) =>
    val t = tokens(col("text"))
    val scored = documents(s, d).select(col("doc_id") +: col("lang") +:
      markers.map { case (l, ws) => markerCount(t, ws).as(s"score_$l") }: _*)
    val argmax = markers.map(_._1).foldRight(lit("und")) { case (l, rest) =>
      val geAll = markers.map(_._1).filter(_ != l)
        .map(o => col(s"score_$l") >= col(s"score_$o")).reduce(_ && _)
      when(col(s"score_$l") > 0 && geAll, l).otherwise(rest)
    }
    scored.select(col("doc_id"), col("lang"), argmax.as("detected_lang"))
  }

  // ============================================================ tf-idf
  // top-3 salient terms per document, idf as the exact rational N/df
  // (no log: transcendental libm results differ across engines)
  register("q38_tfidf_top_terms",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
      |dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, term, tf, df,
      |    tf * (CAST(n_docs AS DOUBLE) / df) AS score
      |  FROM tf JOIN dft USING (term), n),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |            ORDER BY score DESC, term ASC) AS rank
      |  FROM scored)
      |SELECT doc_id, rank, term, CAST(tf AS BIGINT) AS tf,
      |  CAST(df AS BIGINT) AS df, score
      |FROM ranked WHERE rank <= 3""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val tok = documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dft = tok.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val n = documents(s, d).agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dft, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * (col("n_docs").cast(DoubleType) / col("df")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("doc_id", "rank", "term", "tf", "df", "score")
  }

  // ============================================================ fingerprints
  // md5 content fingerprint over whitespace-normalized text + its 60-bit
  // integer form (the primitive every dedup/LSH op builds on)
  register("q22_fingerprint",
    s"""SELECT doc_id,
       |  md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
       |  ${oHash60(raw"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))")} AS fingerprint60
       |FROM documents""".stripMargin) { (s, d) =>
    val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
    documents(s, d).select(col("doc_id"),
      md5(norm).as("fingerprint"),
      hash60(norm).as("fingerprint60"))
  }

  // ============================================================ tokenizers
  // token counting two ways: whitespace words and a BPE-ish regex
  // lexer (letter runs / digit runs / single punctuation marks) — the
  // pre-tokenization shape GPT-style tokenizers apply before merges
  register("q54_token_counting", {
    val re = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
    s"""SELECT doc_id,
       |  len($oTokens) AS ws_tokens,
       |  len(regexp_extract_all(text, '$re')) AS bpe_ish_tokens,
       |  CAST(len(regexp_extract_all(text, '$re')) AS DOUBLE)
       |    / len($oTokens) AS fertility
       |FROM documents""".stripMargin
  }) { (s, d) =>
    val re = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
    val bpe = size(regexp_extract_all(col("text"), lit(re), lit(0)))
    documents(s, d).select(col("doc_id"),
      size(tokens(col("text"))).as("ws_tokens"),
      bpe.as("bpe_ish_tokens"),
      (bpe.cast(DoubleType) / size(tokens(col("text")))).as("fertility"))
  }


  // ============================================================ sketches
  // Count-Min heavy hitters. The sketch itself is not SQL-expressible,
  // so (like q56/q85) the gate hashes the GUARANTEE: the top-20 terms
  // are selected by EXACT count (totally ordered by (count desc, term) —
  // oracle-able), and each carries within_bound = exact ≤ CMS estimate
  // ≤ exact + 2eN/width (CMS never undercounts; overcount ≤ εN = eN/w
  // per row with the depth-5 min, 2× slack on top; estimates are
  // deterministic via the portable hash, so the bound either holds on
  // this corpus or fails loudly — verified at sf0.001/0.01/soak).
  // Two passes: fold the token stream into one mergeable sketch, then
  // score the exact vocabulary counts against it.
  register("q55_heavy_hitters",
    raw"""WITH tok AS (
       |  SELECT unnest($oTokens) AS term FROM documents),
       |counts AS (SELECT term, COUNT(*) AS exact_count FROM tok GROUP BY term)
       |SELECT term, exact_count, TRUE AS within_bound
       |FROM counts ORDER BY exact_count DESC, term ASC LIMIT 20""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.ml.CMSketch
    val tok = documents(s, d)
      .select(explode(tokens(col("text"))).as("term"))
    val sketch = tok.as[String]
      .select(CMSketch.aggregator().toColumn.name("sk")).head()
    // native cms_estimate expression (no ScalaUDF node — the frozen
    // sketch table rides the plan as a reference object and the probe
    // stays inside whole-stage codegen; see graft.catalyst.CmsEstimate)
    val estimate = graft.catalyst.GraftFunctions.cmsEstimate(col("term"), sketch)
    val bound = math.ceil(2.0 * math.E * sketch.totalCount / sketch.width).toLong
    tok.groupBy("term").agg(count(lit(1)).as("exact_count"))
      .orderBy(col("exact_count").desc, col("term").asc)
      .limit(20)
      .select(col("term"), col("exact_count"),
        (estimate >= col("exact_count") &&
          estimate <= col("exact_count") + bound)
          .as("within_bound"))
  }


  // ============================================================ rolling hash
  // character-level polynomial rolling fingerprint (Rabin-Karp base-131
  // over code points, mod P) — the streaming-friendly fingerprint family;
  // identical left-fold in both engines.
  // Non-BMP safety: Spark 4's split(text, "") segments by CODE POINT
  // (surrogate pairs stay one element) and ascii() returns the full code
  // point (codePointAt, not the first UTF-16 unit), matching DuckDB's
  // string_split + ord exactly — pinned by the "rolling fingerprint
  // handles non-BMP code points" spec in AdviceRegressionSpec.
  register("q57_rolling_fingerprint",
    """SELECT doc_id,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT))),
      |    (a, b) -> (a * 131 + b) % 2147483647) AS rolling_fp,
      |  length(text) AS char_len
      |FROM documents""".stripMargin) { (s, d) =>
    documents(s, d).select(col("doc_id"),
      aggregate(split(col("text"), ""), lit(0L),
        (acc, c) => (acc * 131 + ascii(c)) % 2147483647L).as("rolling_fp"),
      length(col("text")).as("char_len"))
  }

  // ---------------------------------------------------------- PII redaction
  // The pre-training scrub pass: regex-replace emails and phone numbers
  // with typed placeholders and count what was removed (the redaction
  // census is what a pipeline monitors for drift). Patterns stay in the
  // Java∩RE2 common dialect (character classes and bounded repeats — no
  // lookaround). The synthetic corpus carries no PII, so the query seeds
  // it deterministically (same arithmetic both engines), exercising both
  // the match and no-match paths on every run. Spark regexp_replace is
  // global by default; DuckDB needs the explicit 'g' flag.
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  register("q89_pii_redaction",
    s"""WITH seeded AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN doc_id % 3 = 0 THEN
       |           text || ' contact user' || doc_id || '@example.com now'
       |         WHEN doc_id % 5 = 0 THEN
       |           text || ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
       |                || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |         ELSE text END AS text
       |  FROM documents)
       |SELECT doc_id, lang,
       |  len(regexp_extract_all(text, '$emailRe')) AS n_emails,
       |  len(regexp_extract_all(text, '$phoneRe')) AS n_phones,
       |  regexp_replace(regexp_replace(text, '$emailRe', '[EMAIL]', 'g'),
       |    '$phoneRe', '[PHONE]', 'g') AS clean_text
       |FROM seeded""".stripMargin) { (s, d) =>
    val seeded = documents(s, d).select(col("doc_id"), col("lang"),
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com now")))
        .when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" call 555-"),
            lpad((col("doc_id") % 1000).cast(StringType), 3, "0"),
            lit("-"),
            lpad((col("doc_id") % 10000).cast(StringType), 4, "0")))
        .otherwise(col("text")).as("text"))
    seeded.select(col("doc_id"), col("lang"),
      size(regexp_extract_all(col("text"), lit(emailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("text"), lit(phoneRe), lit(0))).as("n_phones"),
      regexp_replace(regexp_replace(col("text"), emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]").as("clean_text"))
  }
}

/** Portable 60-bit hash shared by both engines (md5-hex prefix). */
object PortableHash {
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** JVM-side twin of [[hash60]] for kernels that run outside Catalyst
    * (identical value for identical input). */
  def hash60Jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    // first 15 hex chars = 7.5 bytes; fold the top 8 bytes and drop the
    // low nibble of the 8th
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }
  def oHash60(expr: String): String =
    s"CAST(concat('0x', substring(md5($expr), 1, 15)) AS BIGINT)"

  /** Seeded family member: hash60 of "<seed>:<value>". */
  def hash60Seeded(seed: Int, c: Column): Column =
    hash60(concat(lit(s"$seed:"), c))
  def oHash60Seeded(seed: Int, expr: String): String =
    oHash60(s"concat('$seed:', $expr)")
}
