package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Text-analysis pipeline over `documents` — token counting, quality
  * scoring, language ID, fingerprinting (BASELINE.json north-star ops).
  * Spark side uses the graft.functions.TextFunctions library; oracle side
  * replicates the same formulas in DuckDB list-lambda SQL.
  */
object LlmText extends QueryPack {

  /** DuckDB spelling of TextFunctions.tokens. */
  private val toksSql =
    """list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0)"""

  val queries: Seq[GraftQuery] = Seq(
    q("q_text_stats",
      s"""SELECT doc_id,
         |  CAST(len($toksSql) AS INT) AS n_tokens,
         |  CAST(CASE WHEN length(text) > 0 THEN
         |    length(regexp_replace(text, '[^.,;:!?''"()\\[\\]]', '', 'g'))
         |      / CAST(length(text) AS DOUBLE) ELSE 0.0 END AS DOUBLE) AS punct_ratio,
         |  CAST(CASE WHEN len($toksSql) > 0 THEN
         |    CAST(list_sum(list_transform($toksSql, t -> length(t))) AS DOUBLE)
         |      / len($toksSql) ELSE 0.0 END AS DOUBLE) AS mean_tok_len,
         |  CAST(CASE WHEN len($toksSql) > 0 THEN
         |    CAST(len(list_filter($toksSql, t -> list_contains(
         |      ['the','a','of','and','to','in','is','that'], t))) AS DOUBLE)
         |      / len($toksSql) ELSE 0.0 END AS DOUBLE) AS stop_ratio
         |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin) { s =>
      s.table("documents").where(col("doc_id") < 200)
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"),
          TextFunctions.punctRatio(col("text")).as("punct_ratio"),
          TextFunctions.meanTokenLen(col("text")).as("mean_tok_len"),
          TextFunctions.stopwordRatio(col("text")).as("stop_ratio"))
        .orderBy("doc_id")
    },

    q("q_text_quality",
      s"""SELECT doc_id, round((
         |    least(length(text) / 500.0, 1.0)
         |  + (CASE WHEN (CASE WHEN len($toksSql) > 0 THEN
         |        CAST(list_sum(list_transform($toksSql, t -> length(t))) AS DOUBLE)
         |          / len($toksSql) ELSE 0.0 END) BETWEEN 3.0 AND 10.0
         |      THEN 1.0 ELSE 0.5 END)
         |  + least((CASE WHEN len($toksSql) > 0 THEN
         |      CAST(len(list_filter($toksSql, t -> list_contains(
         |        ['the','a','of','and','to','in','is','that'], t))) AS DOUBLE)
         |        / len($toksSql) ELSE 0.0 END) * 5.0, 1.0)
         |  + greatest(0.0, 1.0 - (CASE WHEN length(text) > 0 THEN
         |      length(regexp_replace(text, '[^.,;:!?''"()\\[\\]]', '', 'g'))
         |        / CAST(length(text) AS DOUBLE) ELSE 0.0 END) * 5.0)
         |) / 4.0, 6) AS quality
         |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin) { s =>
      s.table("documents").where(col("doc_id") < 200)
        .select(col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    },

    q("q_text_langid",
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |    len(list_filter(list_transform($toksSql, t -> lower(t)),
         |      t -> list_contains(['the','a','of','and','to','in','is','that'], t))) AS s_en,
         |    len(list_filter(list_transform($toksSql, t -> lower(t)),
         |      t -> list_contains(['der','die','das','und','ist','nicht','ein'], t))) AS s_de,
         |    len(list_filter(list_transform($toksSql, t -> lower(t)),
         |      t -> list_contains(['le','la','les','et','est','un','une','du'], t))) AS s_fr,
         |    len(list_filter(list_transform($toksSql, t -> lower(t)),
         |      t -> list_contains(['el','la','los','las','es','un','una','del'], t))) AS s_es
         |  FROM documents
         |), labeled AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
         |         WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
         |         WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
         |         WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
         |         ELSE 'es' END AS detected
         |  FROM scored
         |)
         |SELECT detected, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(*) FILTER (WHERE detected = lang) AS BIGINT) AS n_label_match
         |FROM labeled GROUP BY detected ORDER BY detected""".stripMargin) { s =>
      s.table("documents")
        .withColumn("detected", TextFunctions.langId(col("text")))
        .groupBy("detected")
        .agg(count(lit(1)).as("n"),
          count(when(col("detected") === col("lang"), 1)).as("n_label_match"))
        .orderBy("detected")
    },

    // End-to-end corpus curation: quality gate + language gate + length
    // gate + exact-dedup (first doc per fingerprint wins) — the composed
    // filter chain of a real training-data pipeline, in one relational
    // plan (all gates codegen'd, one shuffle for the dedup).
    q("q_text_curation",
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 30000, text FROM documents WHERE doc_id < 50
         |), scored AS (
         |  SELECT doc_id, text,
         |    len($toksSql) AS n_tok,
         |    (CASE WHEN len($toksSql) > 0 THEN
         |      CAST(len(list_filter($toksSql, t -> list_contains(
         |        ['the','a','of','and','to','in','is','that'], t))) AS DOUBLE)
         |        / len($toksSql) ELSE 0.0 END) AS stop_r,
         |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
         |  FROM corpus
         |), gated AS (
         |  SELECT * FROM scored
         |  WHERE n_tok BETWEEN 20 AND 1000 AND stop_r > 0.05
         |), deduped AS (
         |  SELECT doc_id, fp,
         |    ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |  FROM gated
         |)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id FROM deduped WHERE rn = 1
         |ORDER BY doc_id""".stripMargin) { s =>
      import graft.functions.TextFunctions
      import graft.operators.Dedup
      val d = s.table("documents").select("doc_id", "text")
      val corpus = d.union(d.where(col("doc_id") < 50)
        .select((col("doc_id") + 30000).as("doc_id"), col("text")))
      val gated = corpus
        .withColumn("n_tok", TextFunctions.tokenCount(col("text")))
        .withColumn("stop_r", TextFunctions.stopwordRatio(col("text")))
        .where(col("n_tok").between(20, 1000) && col("stop_r") > 0.05)
      Dedup.exactByContent(gated, "doc_id", "text")
        .select(col("doc_id").cast("bigint").as("doc_id"))
        .orderBy("doc_id")
    },

    q("q_text_fingerprint",
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |  CAST(len(list_filter(string_split_regex(text, '[^A-Za-z0-9]+'),
        |         t -> length(t) > 0))
        |     + list_sum(list_transform(
        |         list_filter(string_split_regex(text, '[^A-Za-z0-9]+'),
        |           t -> length(t) > 0),
        |         t -> length(t) // 5)) AS BIGINT) AS tok_est
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin) { s =>
      s.table("documents").where(col("doc_id") < 200)
        .select(col("doc_id"),
          TextFunctions.fingerprint(col("text")).as("fp"),
          TextFunctions.tokenEstimate(col("text")).as("tok_est"))
        .orderBy("doc_id")
    },

    // PII redaction — email / phone / IPv4 scrubbing, the standard
    // pre-training privacy pass. The corpus is synthetic word soup, so
    // PII-shaped substrings are injected deterministically (same
    // construction on both sides) and then redacted; n_pii counts email
    // hits pre-redaction. All regexp work is codegen'd, zero UDFs.
    q("q_text_pii",
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(synth,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
        |      '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(synth,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_pii
        |FROM (
        |  SELECT doc_id,
        |    concat('contact user', doc_id, '@mail', doc_id % 3, '.org or 415-555-',
        |           lpad(CAST(doc_id AS VARCHAR), 4, '0'), ' from 10.0.',
        |           doc_id % 200, '.7 ', substr(text, 1, 40)) AS synth
        |  FROM documents WHERE doc_id < 150
        |) ORDER BY doc_id""".stripMargin) { s =>
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      s.table("documents").where(col("doc_id") < 150)
        .withColumn("synth",
          concat(lit("contact user"), col("doc_id"), lit("@mail"),
            col("doc_id") % 3, lit(".org or 415-555-"),
            lpad(col("doc_id").cast("string"), 4, "0"), lit(" from 10.0."),
            col("doc_id") % 200, lit(".7 "), substring(col("text"), 1, 40)))
        .select(col("doc_id"),
          regexp_replace(regexp_replace(regexp_replace(col("synth"),
            email, "<EMAIL>"),
            "\\d{3}-\\d{3}-\\d{4}", "<PHONE>"),
            "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b", "<IP>").as("redacted"),
          regexp_count(col("synth"), lit(email)).as("n_pii"))
        .orderBy("doc_id")
    },

    // Repetition metrics (Gopher-style quality rules): unique-token ratio
    // and repeated-bigram fraction. Pure higher-order array functions —
    // per-row, no shuffle, fully codegen-compatible at 100 TB.
    q("q_text_repetition",
      s"""SELECT doc_id,
         |  CAST(len(toks) AS INT) AS n_tok,
         |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio,
         |  CAST(1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) / len(bigrams)
         |    AS DOUBLE) AS bigram_rep
         |FROM (
         |  SELECT doc_id, toks,
         |    list_transform(list_zip(toks[:-2], toks[2:]),
         |      p -> p[1] || ' ' || p[2]) AS bigrams
         |  FROM (SELECT doc_id, $toksSql AS toks
         |        FROM documents WHERE doc_id < 200)
         |) WHERE len(toks) > 1 ORDER BY doc_id""".stripMargin) { s =>
      s.table("documents").where(col("doc_id") < 200)
        .withColumn("toks", TextFunctions.tokens(col("text")))
        .where(size(col("toks")) > 1)
        .withColumn("bigrams",
          expr("transform(slice(toks, 1, size(toks) - 1), (t, i) -> concat(t, ' ', element_at(toks, i + 2)))"))
        .select(col("doc_id"),
          size(col("toks")).as("n_tok"),
          (size(array_distinct(col("toks"))).cast("double") / size(col("toks")))
            .as("uniq_ratio"),
          (lit(1.0) - size(array_distinct(col("bigrams"))).cast("double")
            / size(col("bigrams"))).as("bigram_rep"))
        .orderBy("doc_id")
    },

    // Bigram language-model scoring — the KenLM-shaped perplexity-proxy
    // filter of LLM data pipelines, fully relational: corpus bigram /
    // unigram-context counts (two map-side-combinable aggregates), add-one
    // smoothing over the observed continuation vocabulary, then one join
    // on the bigram key to score every document by mean log-likelihood.
    // No model artifact, no UDF — at 100 TB this is two count shuffles +
    // one scoring join, all on hashed string keys. Per-term casts to
    // DECIMAL(18,10) make the per-doc sum order-independent.
    q("q_lm_score",
      s"""WITH toks AS (
         |  SELECT doc_id, $toksSql AS toks
         |  FROM documents WHERE doc_id < 300),
         |pw AS (
         |  SELECT doc_id, p[1] AS w1, p[2] AS w2
         |  FROM (SELECT doc_id, unnest(list_zip(toks[:-2], toks[2:])) AS p
         |        FROM toks WHERE len(toks) > 1)),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM pw GROUP BY w1, w2),
         |c1 AS (SELECT w1, count(*) AS c1 FROM pw GROUP BY w1),
         |v AS (SELECT count(DISTINCT w2) AS v FROM pw),
         |scored AS (
         |  SELECT pw.doc_id,
         |    CAST(ln((c12.c12 + 1) / CAST(c1.c1 + v.v AS DOUBLE))
         |      AS DECIMAL(18,10)) AS lp
         |  FROM pw
         |  JOIN c12 ON pw.w1 = c12.w1 AND pw.w2 = c12.w2
         |  JOIN c1 ON pw.w1 = c1.w1
         |  CROSS JOIN v)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(CAST(SUM(lp) AS DOUBLE) / count(*) AS DOUBLE) AS lm_score
         |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin) { s =>
      import org.apache.spark.sql.types.DecimalType
      val docs = s.table("documents").where(col("doc_id") < 300)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .where(size(col("toks")) > 1)
      val pw = docs.select(col("doc_id"), explode(expr(
          """zip_with(slice(toks, 1, size(toks) - 1),
            |         slice(toks, 2, size(toks) - 1),
            |         (a, b) -> struct(a AS w1, b AS w2))""".stripMargin))
          .as("p"))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      val c12 = pw.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val c1 = pw.groupBy("w1").agg(count(lit(1)).as("c1"))
      val v = pw.agg(countDistinct(col("w2")).as("v"))
      pw.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
        .crossJoin(broadcast(v))
        .withColumn("lp",
          log((col("c12") + 1) / (col("c1") + col("v")).cast("double"))
            .cast(DecimalType(18, 10)))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_bigrams"),
          (sum(col("lp")).cast("double") / count(lit(1))).as("lm_score"))
        .orderBy("doc_id")
    },

    // TF-IDF top terms per document — the classic relevance/keyword
    // extraction step. Term frequencies are one grouped count off the
    // token explode; document frequencies REUSE that aggregate (df =
    // count over tf, no second corpus pass); the corpus size is a 1-row
    // broadcast. Final top-3-per-doc is a WindowGroupLimit, not a global
    // sort. The rank key is the unrounded score (ties broken by term) —
    // rounding happens only at the output edge.
    q("q_text_tfidf",
      """WITH tf AS (
        |  SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf
        |  FROM documents,
        |    UNNEST(list_filter(string_split_regex(text, '\s+'),
        |                       s -> length(s) > 0)) AS u(t)
        |  GROUP BY doc_id, t),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
        |       GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS score
        |  FROM tf JOIN df ON df.term = tf.term CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, tf, df, score,
        |    row_number() OVER (PARTITION BY doc_id
        |                       ORDER BY score DESC, term) AS rn
        |  FROM scored)
        |SELECT doc_id, CAST(rn AS INT) AS rn, term, tf, df,
        |  round(score, 6) AS tfidf
        |FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin) { s =>
      import org.apache.spark.sql.expressions.Window
      val tf = s.table("documents")
        .select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).cast("bigint").as("tf"))
      // df = rows per term IN tf — a window count over tf, not a
      // tf⋈tf self-join: the join spelling re-ran the corpus explode +
      // tf aggregation per side (2 Generates, 2 two-phase aggs in the
      // r9 plan; guide §2.4 — two operations keyed the same way share
      // one pass). Window COUNT without ORDER BY is the whole-partition
      // count, exactly the old df.
      val wdf = Window.partitionBy("term")
      val n = s.table("documents").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
      tf.withColumn("df", count(lit(1)).over(wdf).cast("bigint"))
        .crossJoin(broadcast(n))
        .withColumn("score", col("tf") * log(col("n").cast("double") / col("df")))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("term"), col("tf"), col("df"),
          round(col("score"), 6).as("tfidf"))
        .orderBy("doc_id", "rn")
    }
  )
}
