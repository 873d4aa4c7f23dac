package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.TextOps

/** Text-analysis family over the `documents` table: token counting,
  * quality scoring, lexicon language-ID, rolling-hash fingerprinting.
  * (Reference analogue: the parser/scalar-function layer, SURVEY.md
  * §2.7 — here generalized to the corpus-processing ops a training-data
  * pipeline needs.)
  *
  * Scale: every query is a single narrow projection or one
  * explode+broadcast-join+agg — no self-joins, no wide shuffles; all
  * scale linearly in corpus size.
  */
object Text {

  /** DuckDB mirror of TextOps.rollingHash. */
  def duckRollingHash(s: String, base: Long = 131L, mod: Long = 1000000007L): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(1, length($s)+1), i -> CAST(unicode($s[i]) AS BIGINT))),
       |  (acc, c) -> (acc * $base + c) % $mod)""".stripMargin

  /** DuckDB mirror of TextOps.hash60. */
  def duckHash60(s: String): String =
    s"(${duckRollingHash(s, 131L, 1000000007L)} + ${duckRollingHash(s, 137L, 998244353L)} * 1073741824)"

  val duckToks = "list_filter(string_split(text, ' '), t -> t <> '')"

  /** Lexicon for marker-based language ID (x3). Tokens drawn from the
    * corpus vocabulary; deterministic and engine-neutral.
    */
  val lexicon: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "fast", "en" -> "slow",
    "es" -> "data", "es" -> "vector", "es" -> "query", "es" -> "table",
    "de" -> "stream", "de" -> "batch", "de" -> "window", "de" -> "group",
    "fr" -> "join", "fr" -> "merge", "fr" -> "sort", "fr" -> "order",
    "zh" -> "hash", "zh" -> "scan", "zh" -> "filter", "zh" -> "key")

  val all: Seq[Q] = Seq(

    // ---- winnowing fingerprint (Schleimer et al. 2003): rolling char
    // k-gram hashes, sliding-window minima over full windows, distinct
    // minima = the document's fingerprint set. Explode+window shape —
    // one shuffle on doc_id, codegen'd hashing, no array lambdas.
    Q("x6_winnowing",
      (s, dir) => {
        import s.implicits._
        val k = 8; val win = 4
        // docs shorter than k have no grams on either engine; without
        // the guard Spark's sequence(1, length-7) would count DOWN and
        // emit spurious positions
        val grams = Tables.load(s, dir, "documents")
          .filter(length($"text") >= k)
          .select($"doc_id", $"text",
            explode(sequence(lit(1), length($"text") - (k - 1))).as("pos"))
          .select($"doc_id", $"pos",
            (length($"text") - (k - 1) - (win - 1)).as("last_full"),
            graft.functions.NativeExprs.rollingHash(s, $"text".substr($"pos", lit(k))).as("gh"))
        val w = Window.partitionBy($"doc_id").orderBy($"pos")
          .rowsBetween(Window.currentRow, win - 1)
        grams
          .withColumn("wmin", min($"gh").over(w))
          .filter($"pos" <= $"last_full")
          .groupBy($"doc_id")
          .agg(
            countDistinct($"wmin").as("n_fp"),
            min($"wmin").as("fp_min"),
            max($"wmin").as("fp_max"))
          .orderBy($"doc_id")
      },
      Some(s"""SELECT doc_id, count(DISTINCT wmin) AS n_fp,
          min(wmin) AS fp_min, max(wmin) AS fp_max
        FROM (
          SELECT doc_id, pos, last_full,
            min(gh) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
          FROM (
            SELECT doc_id, pos, length(text) - 7 - 3 AS last_full,
              ${duckRollingHash("text[pos:pos+7]")} AS gh
            FROM (SELECT doc_id, text, unnest(range(1, length(text) - 6)) AS pos
                  FROM documents)))
        WHERE pos <= last_full
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---- token counting: whitespace tokens + distinct + avg length ----
    Q("x1_text_stats",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"text", TextOps.tokens($"text").as("toks"))
          .select(
            $"doc_id",
            size($"toks").cast("long").as("n_tokens"),
            size(array_distinct($"toks")).cast("long").as("n_uniq_tokens"),
            length($"text").cast("long").as("len"),
            (aggregate(transform($"toks", t => length(t).cast("long")),
              lit(0L), (a, b) => a + b).cast("double") / size($"toks"))
              .as("avg_tok_len"))
          .orderBy($"doc_id")
      },
      Some(s"""SELECT doc_id, len(toks) AS n_tokens,
        len(list_distinct(toks)) AS n_uniq_tokens,
        length(text) AS len,
        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(toks, t -> CAST(length(t) AS BIGINT))), (a,b) -> a+b) AS DOUBLE)
          / len(toks) AS avg_tok_len
        FROM (SELECT doc_id, text, $duckToks AS toks FROM documents)
        ORDER BY doc_id""")),

    // ---- heuristic quality score (stopword/uniqueness/length mix) -----
    Q("x2_quality",
      (s, dir) => {
        import s.implicits._
        val stop = Seq("the", "a", "of", "and", "to", "in")
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"text", TextOps.tokens($"text").as("toks"))
          .select(
            $"doc_id",
            (size(filter($"toks", t => t.isin(stop.map(lit(_)): _*)))
              .cast("double") / size($"toks")).as("stop_ratio"),
            (size(array_distinct($"toks")).cast("double") / size($"toks"))
              .as("uniq_ratio"),
            length($"text").cast("long").as("len"))
          .withColumn("quality",
            lit(0.3) * $"uniq_ratio" + lit(0.4) * (lit(1.0) - $"stop_ratio")
              + lit(0.3) * least(lit(1.0), $"len".cast("double") / lit(256.0)))
          .orderBy($"doc_id")
      },
      Some(s"""SELECT doc_id, stop_ratio, uniq_ratio, len,
        0.3 * uniq_ratio + 0.4 * (1.0 - stop_ratio)
          + 0.3 * least(1.0, CAST(len AS DOUBLE) / 256.0) AS quality
        FROM (SELECT doc_id,
          CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
            / len(toks) AS stop_ratio,
          CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio,
          length(text) AS len
          FROM (SELECT doc_id, text, $duckToks AS toks FROM documents))
        ORDER BY doc_id""")),

    // ---- lexicon language-ID: explode → broadcast lexicon join →
    // argmax per doc (score desc, lang asc tiebreak) -------------------
    Q("x3_langid",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val lex = s.createDataFrame(lexicon).toDF("pred_lang", "tok")
        val hits = docs
          .select($"doc_id", explode(array_distinct(TextOps.tokens($"text"))).as("tok"))
          .join(broadcast(lex), "tok")
          .groupBy($"doc_id", $"pred_lang")
          .agg(count(lit(1)).as("score"))
        val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"pred_lang")
        val best = hits.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
          .select($"doc_id", $"pred_lang", $"score")
        docs.select($"doc_id", $"lang")
          .join(best, Seq("doc_id"), "left")
          .select($"doc_id", $"lang",
            coalesce($"pred_lang", lit("und")).as("pred_lang"),
            coalesce($"score", lit(0L)).as("score"))
          .orderBy($"doc_id")
      },
      Some {
        val vals = lexicon.map { case (l, t) => s"('$l','$t')" }.mkString(", ")
        s"""SELECT d.doc_id, d.lang,
          COALESCE(b.pred_lang, 'und') AS pred_lang,
          COALESCE(b.score, 0) AS score
        FROM documents d LEFT JOIN (
          SELECT doc_id, pred_lang, score FROM (
            SELECT doc_id, pred_lang, score, row_number() OVER
              (PARTITION BY doc_id ORDER BY score DESC, pred_lang) AS rn
            FROM (
              SELECT doc_id, pred_lang, count(*) AS score FROM (
                SELECT doc_id, unnest(list_distinct($duckToks)) AS tok
                FROM documents) t
              JOIN (VALUES $vals) lex(pred_lang, tok) USING (tok)
              GROUP BY doc_id, pred_lang))
          WHERE rn = 1) b ON d.doc_id = b.doc_id
        ORDER BY d.doc_id"""
      }),

    // ---- BPE-ish regex tokenization (byte-level-BPE pretokenizer
    // shape: contraction suffixes | space-prefixed word | number |
    // punctuation run | whitespace run) — token counting for a
    // training-data pipeline. Same leftmost-first alternation in Java
    // regex and DuckDB's RE2.
    Q("x5_bpe_tokens",
      (s, dir) => {
        import s.implicits._
        val pat = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+| +"
        Tables.load(s, dir, "documents")
          .select($"doc_id",
            regexp_extract_all($"text", lit(pat), lit(0)).as("toks"))
          .select($"doc_id",
            size($"toks").cast("long").as("n_bpe"),
            size(array_distinct($"toks")).cast("long").as("n_uniq_bpe"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
        len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+| +')) AS n_bpe,
        len(list_distinct(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+| +'))) AS n_uniq_bpe
        FROM documents ORDER BY doc_id""")),

    // ---- document fingerprinting: full-doc rolling hash + min/distinct
    // token fingerprints (Rabin–Karp / winnowing building blocks) -------
    Q("x4_fingerprint",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"text",
            transform(TextOps.tokens($"text"), t => TextOps.rollingHash(t)).as("tokfps"))
          .select(
            $"doc_id",
            TextOps.rollingHash($"text").as("fp_doc"),
            array_min($"tokfps").as("fp_min"),
            size(array_distinct($"tokfps")).cast("long").as("n_uniq_fp"))
          .orderBy($"doc_id")
      },
      Some(s"""SELECT doc_id,
        ${duckRollingHash("text")} AS fp_doc,
        list_min(tokfps) AS fp_min,
        len(list_distinct(tokfps)) AS n_uniq_fp
        FROM (SELECT doc_id, text,
          list_transform($duckToks, t -> ${duckRollingHash("t")}) AS tokfps
          FROM documents)
        ORDER BY doc_id"""))
  )
}
