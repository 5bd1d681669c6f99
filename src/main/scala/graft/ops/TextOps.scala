package graft.ops

import graft.QueryDef
import graft.util.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` corpus (SURVEY.md §2.9):
  * tokenize → explode → word counts (the UDTF surface via built-in
  * Generators), exact dedup, token counting, and quality scoring.
  * The MinHash/SimHash/LSH near-dup family is in TextDedup.scala.
  *
  * Scale notes (100 TB): tokenize+explode is narrow (no shuffle);
  * the word-count groupBy shuffles only (lang, word) partial counts.
  * Exact dedup partitions by a hash of the full text — at 100 TB,
  * group on a 128-bit text fingerprint instead of the raw text to keep
  * shuffle rows small (both forms shown below; the query uses the
  * window form the oracle can mirror exactly).
  */
object TextOps {

  /** Word frequencies per language — split + explode (UDTF surface) +
    * grouped counts; top-100 by (lang, count desc, word). */
  private val textStats = QueryDef(
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"lang", explode(split($"text", " ")).as("word"))
        .groupBy($"lang", $"word")
        .agg(count(lit(1)).as("n"))
        .orderBy($"lang", $"n".desc, $"word")
        .limit(100)
    },
    """SELECT lang, w AS word, COUNT(*) AS n
      |FROM (SELECT lang, UNNEST(string_split(text, ' ')) AS w FROM documents)
      |GROUP BY lang, w
      |ORDER BY lang, n DESC, word LIMIT 100""".stripMargin)

  /** Exact dedup: deterministic keep-lowest-doc_id per identical text
    * (SURVEY.md §2.9). row_number over the text partition — the oracle
    * mirrors the exact same rule. */
  private val dedupExact = QueryDef(
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"text").orderBy($"doc_id")
      Tables.documents(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"doc_id", $"lang", $"source", $"n_chars")
        .orderBy($"doc_id")
    },
    """SELECT doc_id, lang, source, n_chars FROM (
      |  SELECT doc_id, lang, source, n_chars,
      |         ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      |  FROM documents)
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin)

  /** Token counting: whitespace tokens + a BPE-ish regex token count
    * (runs of word chars / digits / single non-space symbols). */
  private val textTokens = QueryDef(
    (s, dir) => {
      import s.implicits._
      Tables.spread(Tables.documents(s, dir), "doc_id")
        .select(
          $"doc_id",
          size(split($"text", " ")).cast("long").as("ws_tokens"),
          size(regexp_extract_all($"text", lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
            .cast("long").as("re_tokens"),
          length($"text").cast("long").as("n_chars_m"))
        .orderBy($"doc_id")
    },
    """SELECT doc_id,
      |       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS re_tokens,
      |       CAST(length(text) AS BIGINT) AS n_chars_m
      |FROM documents ORDER BY doc_id""".stripMargin)

  /** Quality scoring: length / token stats / stopword ratio / distinct-word
    * ratio → a deterministic composite score (training-data filter shape). */
  private val textQuality = QueryDef(
    (s, dir) => {
      import s.implicits._
      val stop = Seq("the", "a", "of", "and", "to", "in", "is")
      val words = split($"text", " ")
      val nTok = size(words).cast("double")
      val nStop = size(filter(words, w => w.isInCollection(stop))).cast("double")
      val nDistinct = size(array_distinct(words)).cast("double")
      Tables.spread(Tables.documents(s, dir), "doc_id")
        .select(
          $"doc_id", $"lang",
          size(words).cast("long").as("n_tokens"),
          round((length($"text").cast("double") / nTok), 4).as("avg_tok_len"),
          round(nStop / nTok, 4).as("stopword_ratio"),
          round(nDistinct / nTok, 4).as("distinct_ratio"),
          round(
            when(nTok > 20, lit(1.0)).otherwise(nTok / 20.0) *
              (lit(1.0) - nStop / nTok) * (nDistinct / nTok), 4).as("quality"))
        .orderBy($"doc_id")
    },
    """WITH b AS (
      |  SELECT doc_id, lang, text,
      |         string_split(text, ' ') AS words,
      |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, lang, text, n_tok,
      |         CAST(len(list_filter(words,
      |           w -> w IN ('the','a','of','and','to','in','is'))) AS DOUBLE) AS n_stop,
      |         CAST(len(list_distinct(words)) AS DOUBLE) AS n_distinct
      |  FROM b)
      |SELECT doc_id, lang, CAST(n_tok AS BIGINT) AS n_tokens,
      |       ROUND(CAST(length(text) AS DOUBLE) / n_tok, 4) AS avg_tok_len,
      |       ROUND(n_stop / n_tok, 4) AS stopword_ratio,
      |       ROUND(n_distinct / n_tok, 4) AS distinct_ratio,
      |       ROUND((CASE WHEN n_tok > 20 THEN 1.0 ELSE n_tok / 20.0 END)
      |             * (1.0 - n_stop / n_tok) * (n_distinct / n_tok), 4) AS quality
      |FROM c ORDER BY doc_id""".stripMargin)

  /** Language ID via character-trigram profiles (SURVEY.md §2.9 "n-gram
    * heuristic"): build per-language trigram counts from a training split
    * (doc_id % 5 != 0), score each held-out doc by Σ tf(tg)·profile(lang,
    * tg) — all integer arithmetic, so both engines agree exactly — and
    * predict the argmax language (ties → lang asc). On this synthetic
    * corpus the vocabularies are identical across languages, so accuracy
    * is chance; the oracle checks the classifier's determinism, not its
    * skill. Scale: profile is |langs × trigrams| — tiny — and broadcast;
    * docs never shuffle raw text, only (doc, trigram) counts. */
  private val langId = QueryDef(
    (s, dir) => {
      import s.implicits._
      // trigrams packed into int64 (base-1021 codepoint arithmetic —
      // injective below codepoint 1021, ASCII corpus; the dedup_ngram
      // trick): the (doc, trigram)-count shuffle and the profile join
      // key carry primitive longs instead of 3-char strings, and the
      // score is invariant under any bijection of the trigram keys
      def cp3(i: Column): Column = ascii($"text".substr(i, lit(1))).cast("long")
      val triCol = transform(
        sequence(lit(1), greatest(length($"text") - 2, lit(1))),
        i => (cp3(i) * 1021L + cp3(i + 1)) * 1021L + cp3(i + 2))
      // ONE trigram explode over the corpus: per-(doc, trigram) counts
      // first, then the train profile is a re-aggregation of those
      // counts (Σ per-doc counts ≡ counting all train instances) and
      // the test tf rows are a filter — instead of exploding the corpus
      // once per branch. At 100 TB the (doc, trigram) count table is
      // the thing you'd materialize anyway.
      val docs = Tables.spread(Tables.documents(s, dir), "doc_id")
      val counts = docs.select($"doc_id", $"lang", explode(triCol).as("tg"))
        .groupBy($"doc_id", $"lang", $"tg").agg(count(lit(1)).as("c"))
      val prof = counts.filter($"doc_id" % 5 =!= 0)
        .groupBy($"lang".as("plang"), $"tg").agg(sum($"c").as("pc"))
      val tf = counts.filter($"doc_id" % 5 === 0)
        .select($"doc_id", $"lang", $"tg", $"c".as("tf"))
      val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"plang")
      tf.join(broadcast(prof), "tg")
        .groupBy($"doc_id", $"lang", $"plang")
        .agg(sum($"tf" * $"pc").as("score"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"doc_id", $"lang", $"plang".as("pred_lang"), $"score")
        .orderBy($"doc_id")
    },
    """WITH tri AS (
      |  SELECT doc_id, lang,
      |         (CAST(ascii(substring(text, i.i, 1)) AS BIGINT) * 1021
      |          + ascii(substring(text, i.i+1, 1))) * 1021
      |          + ascii(substring(text, i.i+2, 1)) AS tg
      |  FROM documents CROSS JOIN (SELECT UNNEST(range(1, 1000)) AS i) i
      |  WHERE i.i <= greatest(length(text) - 2, 1)),
      |prof AS (SELECT lang AS plang, tg, COUNT(*) AS pc
      |         FROM tri WHERE doc_id % 5 != 0 GROUP BY 1, 2),
      |tf AS (SELECT doc_id, lang, tg, COUNT(*) AS tf
      |       FROM tri WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3),
      |scored AS (
      |  SELECT t.doc_id, t.lang, p.plang, CAST(SUM(t.tf * p.pc) AS BIGINT) AS score
      |  FROM tf t JOIN prof p USING (tg) GROUP BY 1, 2, 3)
      |SELECT doc_id, lang, plang AS pred_lang, score FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |                               ORDER BY score DESC, plang) AS rn
      |  FROM scored)
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin)

  /** Edit-distance near-dup scoring (SURVEY.md §2.9 dedup family):
    * exact Levenshtein over 40-char prefixes of a bounded doc subset —
    * integer-exact on both engines. Scale: edit distance is O(n·m) per
    * pair, so it only ever runs as a verify stage on a pre-filtered
    * candidate set (here: the bounded id range stands in for LSH
    * candidates). */
  private val editDistance = QueryDef(
    (s, dir) => {
      import s.implicits._
      val d = Tables.documents(s, dir).filter($"doc_id" < 40)
        .select($"doc_id", substring($"text", 1, 40).as("t"))
      val a = d.select($"doc_id".as("da"), $"t".as("ta"))
      val b = d.select($"doc_id".as("db"), $"t".as("tb"))
      a.join(b, $"da" < $"db")
        .select($"da", $"db", levenshtein($"ta", $"tb").cast("long").as("dist"))
        .filter($"dist" <= 25)
        .orderBy($"da", $"db")
    },
    """WITH d AS (SELECT doc_id, substring(text, 1, 40) AS t
      |           FROM documents WHERE doc_id < 40)
      |SELECT a.doc_id AS da, b.doc_id AS db,
      |       CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
      |FROM d a JOIN d b ON a.doc_id < b.doc_id
      |WHERE levenshtein(a.t, b.t) <= 25
      |ORDER BY da, db""".stripMargin)

  /** TF-IDF term scoring: tf = in-doc count, df = docs containing the
    * word, idf = ln(N/df) — integer counts everywhere except the final
    * rounded score, identical ln/round arithmetic on both engines.
    * Scale: one narrow explode + two keyed aggregations; df is a
    * |vocab|-row broadcast join. Top-100 by (score desc, doc, word). */
  private val tfidf = QueryDef(
    (s, dir) => {
      import s.implicits._
      val docs = Tables.spread(Tables.documents(s, dir), "doc_id")
      val nDocs = docs.select(countDistinct($"doc_id").as("n_docs"))
      val words = docs.select($"doc_id", explode(split($"text", " ")).as("word"))
      val tf = words.groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
      // df derived FROM tf — tf's (doc, word) rows are already distinct,
      // so the second corpus explode + distinct shuffle is redundant
      val df_ = tf.groupBy($"word").agg(count(lit(1)).as("df"))
      tf.join(broadcast(df_), "word")
        .crossJoin(broadcast(nDocs))
        .select($"doc_id", $"word", $"tf", $"df",
          round($"tf" * log($"n_docs".cast("double") / $"df".cast("double")), 4)
            .as("tfidf"))
        .orderBy($"tfidf".desc, $"doc_id", $"word")
        .limit(100)
    },
    """WITH words AS (
      |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents),
      |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY 1, 2),
      |df AS (SELECT word, COUNT(*) AS df
      |       FROM (SELECT DISTINCT doc_id, word FROM words) GROUP BY 1),
      |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
      |SELECT doc_id, word, tf, df,
      |       ROUND(tf * LN(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 4) AS tfidf
      |FROM tf JOIN df USING (word) CROSS JOIN n
      |ORDER BY tfidf DESC, doc_id, word LIMIT 100""".stripMargin)

  /** Deterministic stratified sampling: keep k docs per language,
    * chosen by a replayable integer hash order (doc_id·2654435761 mod
    * 2^31 — Knuth multiplicative; exact int64 arithmetic both engines).
    * The training-data downsampling shape: engine-native `sampleBy` is
    * seed-dependent and not oracle-replayable, this is — and at 100 TB
    * it's one window per stratum, no global sort. */
  private val sampleStratified = QueryDef(
    (s, dir) => {
      import s.implicits._
      // doc_id is reduced mod P BEFORE the Knuth multiply so the
      // product stays under 2^63 for ANY doc_id (unguarded, ids above
      // ~3.5e9 — the 100 TB regime — overflow: Spark wraps negative
      // while DuckDB errors)
      val h = (($"doc_id" % 1000000007L) * 2654435761L) % 2147483648L
      val w = Window.partitionBy($"lang").orderBy($"h", $"doc_id")
      Tables.documents(s, dir)
        .select($"doc_id", $"lang", $"source", h.as("h"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 20)
        .select($"doc_id", $"lang", $"source", $"rn")
        .orderBy($"lang", $"rn")
    },
    """SELECT doc_id, lang, source, rn FROM (
      |  SELECT doc_id, lang, source,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |           ORDER BY ((doc_id % 1000000007) * 2654435761) % 2147483648, doc_id) AS BIGINT) AS rn
      |  FROM documents)
      |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin)

  /** Sequence packing — the training-batch construction step: greedy
    * in-order packing of each language's documents into fixed
    * token-budget bins (budget 512). A doc starts a new bin when the
    * RUNNING token total crosses a budget boundary, i.e. bin =
    * ⌊tokens-before-this-doc / budget⌋ — the offset-based packing rule,
    * all exact integer arithmetic.
    * Scale: the running total is [[Scale.blockedPrefixSum]] — cumsum
    * within (lang, doc-id block) slices in parallel, block offsets
    * (tiny) cumsum'd per lang and joined back — NOT a per-lang window,
    * whose one task per language would sort that language's entire
    * share of the corpus (~10 langs ⇒ single-core TB scans at target
    * scale). Bins then aggregate map-side. */
  private val seqPack = QueryDef(
    (s, dir) => {
      import s.implicits._
      val Budget = 512L
      val toks = Tables.documents(s, dir)
        .select($"doc_id", $"lang", size(split($"text", " ")).cast("long").as("tok"))
      // blockSpan 64 exercises multiple blocks per lang at fixture
      // scale; at corpus scale the span is sized so a block's rows fit
      // one task comfortably (e.g. 1e6)
      Scale.blockedPrefixSum(toks, "lang", "doc_id", "tok", "cum", 64L)
        .withColumn("bin", floor(($"cum" - $"tok") / Budget).cast("long"))
        .groupBy($"lang", $"bin")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"tok").as("tokens"),
          min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
        .orderBy($"lang", $"bin")
    },
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
      |  FROM documents),
      |packed AS (
      |  SELECT doc_id, lang, tok,
      |         SUM(tok) OVER (PARTITION BY lang ORDER BY doc_id
      |                        ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM toks)
      |SELECT lang, CAST(FLOOR((cum - tok) / 512) AS BIGINT) AS bin,
      |       COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS tokens,
      |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM packed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  /** Weighted corpus mixing — the multi-source training-mix step: each
    * source gets a sampling rate (even sources 80%, odd 30% — stand-ins
    * for quality-tiered mixture weights) and docs are kept by a
    * replayable integer hash draw (Knuth multiplicative on doc_id, mod
    * 1000 against the per-mille rate — same determinism discipline as
    * q_sample_stratified; engine-native `sample()` is seed-dependent and
    * not oracle-replayable). Emits the realized mix: kept docs + tokens
    * per source. Scale: a narrow filter + one grouped agg — no shuffle
    * of raw docs, the draw needs no global state. */
  private val corpusMix = QueryDef(
    (s, dir) => {
      import s.implicits._
      // '0'-prefix makes the extraction total: a digitless source yields
      // 0 (even) on BOTH engines, instead of Spark casting '' to NULL
      // while DuckDB raises — and a leading zero never changes the value
      val srcNum = concat(lit("0"), regexp_replace($"source", "[^0-9]", "")).cast("long")
      val rate = when(srcNum % 2 === 0, 800L).otherwise(300L)
      // same overflow guard as q_sample_stratified's hash order
      val draw = (($"doc_id" % 1000000007L) * 2654435761L) % 1000L
      Tables.documents(s, dir)
        .select($"doc_id", $"source",
          size(split($"text", " ")).cast("long").as("tok"),
          srcNum.as("srcnum"), rate.as("rate"), draw.as("draw"))
        .filter($"draw" < $"rate")
        .groupBy($"source")
        .agg(
          count(lit(1)).as("n_kept"),
          sum($"tok").as("tokens"),
          max($"rate").as("rate_permille"))
        .orderBy($"source")
    },
    """WITH drawn AS (
      |  SELECT doc_id, source,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
      |         CASE WHEN CAST('0' || regexp_replace(source, '[^0-9]', '', 'g') AS BIGINT) % 2 = 0
      |              THEN 800 ELSE 300 END AS rate,
      |         ((doc_id % 1000000007) * 2654435761) % 1000 AS draw
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_kept, CAST(SUM(tok) AS BIGINT) AS tokens,
      |       CAST(MAX(rate) AS BIGINT) AS rate_permille
      |FROM drawn WHERE draw < rate
      |GROUP BY source ORDER BY source""".stripMargin)

  val defs: Seq[(String, QueryDef)] = Seq(
    "q_text_stats" -> textStats,
    "q_dedup_exact" -> dedupExact,
    "q_text_tokens" -> textTokens,
    "q_text_quality" -> textQuality,
    "q_lang_id" -> langId,
    "q_edit_distance" -> editDistance,
    "q_tfidf" -> tfidf,
    "q_sample_stratified" -> sampleStratified,
    "q_seq_pack" -> seqPack,
    "q_corpus_mix" -> corpusMix)
}
