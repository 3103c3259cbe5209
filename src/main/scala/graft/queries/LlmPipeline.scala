package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Training-data plumbing over `documents`: deterministic dataset
  * splits, stratified sampling, and vocabulary building — the steps
  * between curation and the trainer. Everything hashes through md5 (the
  * engine-portable fingerprint family), so assignments are reproducible
  * by any other system reading the same corpus, and every query carries
  * a full-formula DuckDB oracle.
  */
object LlmPipeline extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(
    // Deterministic train/val/test assignment: bucket = md5(doc_id) mod
    // 100 → 80/10/10. Hash-based (not random) so the split is stable
    // under reruns, insert-order changes, and repartitioning — the
    // property a 100 TB pipeline needs for resumable preprocessing.
    q("q_split_assign",
      """SELECT doc_id,
        |  CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |       % 100 AS INT) AS bucket,
        |  CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |            % 100 < 80 THEN 'train'
        |       WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |            % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin) { s =>
      val bucket = (HashFunctions.md5Long(col("doc_id").cast("string")) % 100)
        .cast("int")
      s.table("documents")
        .select(col("doc_id"), bucket.as("bucket"),
          when(bucket < 80, "train")
            .when(bucket < 90, "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    },

    // Stratified sample: k docs per language, chosen by hash order (a
    // deterministic uniform draw within each stratum) with a tie-free
    // sort key. Plans as one WindowGroupLimit — no global sort, no
    // per-group collect.
    q("q_sample_stratified",
      """WITH ranked AS (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT lang, doc_id, CAST(rn AS INT) AS rn FROM ranked
        |WHERE rn <= 5 ORDER BY lang, doc_id""".stripMargin) { s =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang")
        .orderBy(HashFunctions.md5Hex(col("doc_id").cast("string")), col("doc_id"))
      s.table("documents")
        .select(col("lang"), col("doc_id"), row_number().over(w).as("rn"))
        .where(col("rn") <= 5)
        .orderBy("lang", "doc_id")
    },

    // Vocabulary head: global token frequencies, top 20 with a
    // deterministic tie-break. One explode + one count shuffle + a
    // TakeOrdered — the classic map-side-combinable shape that scales to
    // any corpus size.
    q("q_vocab_topk",
      """WITH tok AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                            t -> length(t) > 0)) AS token
        |  FROM documents)
        |SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        |FROM tok GROUP BY token
        |ORDER BY n DESC, token LIMIT 20""".stripMargin) { s =>
      s.table("documents")
        .select(explode(filter(split(lower(col("text")), "[^a-z0-9]+"),
          t => length(t) > 0)).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    },

    // Benchmark-contamination detection (the train/eval leak check every
    // LLM data pipeline runs before training): a deterministic holdout
    // (doc_id % 97 = 0 — "the benchmark") defines a set of word-3-grams;
    // every other doc scores |its distinct 3-grams ∩ benchmark grams| /
    // |its distinct 3-grams|. Scale shape: the benchmark gram set is
    // tiny → broadcast semi-join against the exploded corpus grams, two
    // map-side-combinable counts, no all-pairs comparison anywhere.
    q("q_contamination",
      """WITH grams AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(
        |      (CASE WHEN len(list_filter(string_split_regex(text, '\s+'),
        |                                 t -> length(t) > 0)) >= 3
        |        THEN list_transform(
        |          range(1, len(list_filter(string_split_regex(text, '\s+'),
        |                                   t -> length(t) > 0)) - 1),
        |          j -> array_to_string(list_slice(
        |            list_filter(string_split_regex(text, '\s+'),
        |                        t -> length(t) > 0),
        |            j, j + 2), ' '))
        |        ELSE [] END))) AS g
        |  FROM documents),
        |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
        |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams
        |          WHERE doc_id % 97 <> 0 GROUP BY doc_id),
        |inter AS (
        |  SELECT gr.doc_id, COUNT(*) AS i
        |  FROM grams gr JOIN bench b ON gr.g = b.g
        |  WHERE gr.doc_id % 97 <> 0 GROUP BY gr.doc_id)
        |SELECT s.doc_id, CAST(coalesce(i.i, 0) AS BIGINT) AS shared,
        |  CAST(s.sz AS BIGINT) AS grams,
        |  CAST(coalesce(i.i, 0) AS DOUBLE) / s.sz AS score
        |FROM sizes s LEFT JOIN inter i ON i.doc_id = s.doc_id
        |WHERE coalesce(i.i, 0) > 0
        |ORDER BY s.doc_id""".stripMargin) { s =>
      import graft.functions.TextFunctions
      // one n-gram explode per side (benchmark docs are 1/97 of the
      // corpus — negligible), then ONE broadcast left-join carrying a
      // membership flag and ONE grouped count — not separate size /
      // intersection aggregates that would re-explode the corpus
      def gramsOf(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"),
          explode(array_distinct(TextFunctions.wordNgrams(col("text"), 3))).as("g"))
      val docs = s.table("documents")
      val bench = gramsOf(docs.where(col("doc_id") % 97 === 0))
        .select("g").distinct().withColumn("__b", lit(1))
      gramsOf(docs.where(col("doc_id") % 97 =!= 0))
        // No broadcast hint: a real benchmark set is small and fixed, but
        // THIS one is defined as a slice of the corpus and grows with it —
        // a forced broadcast would OOM executors at 100 TB. AQE picks
        // broadcast when the built side is actually small, shuffle-hash /
        // sort-merge on the gram key otherwise.
        .join(bench, Seq("g"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("sz"), count(col("__b")).as("i"))
        .where(col("i") > 0)
        .select(col("doc_id"),
          col("i").cast("bigint").as("shared"),
          col("sz").cast("bigint").as("grams"),
          (col("i").cast("double") / col("sz")).as("score"))
        .orderBy("doc_id")
    },

    // Domain-mixture resampling: per-language keep-rates (the "mix 90%
    // en, 30% everything else" step that shapes a training corpus)
    // applied as a deterministic per-row hash draw — engine-portable,
    // rerun-stable, shuffle-free until the final per-domain audit count.
    q("q_sample_mixture",
      """WITH drawn AS (
        |  SELECT lang,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |      % 1000 AS draw,
        |    CASE WHEN lang = 'en' THEN 900 ELSE 300 END AS keep_mille
        |  FROM documents)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS total,
        |  CAST(sum(CASE WHEN draw < keep_mille THEN 1 ELSE 0 END) AS BIGINT)
        |    AS kept
        |FROM drawn GROUP BY lang ORDER BY lang""".stripMargin) { s =>
      val draw = HashFunctions.md5Long(col("doc_id").cast("string")) % 1000
      val keepMille = when(col("lang") === "en", 900).otherwise(300)
      s.table("documents")
        .select(col("lang"), draw.as("draw"), keepMille.as("keep_mille"))
        .groupBy("lang")
        .agg(count(lit(1)).cast("bigint").as("total"),
          sum(when(col("draw") < col("keep_mille"), 1).otherwise(0))
            .cast("bigint").as("kept"))
        .orderBy("lang")
    },

    // Sequence packing, GPT-pretraining style: concatenate each source's
    // token stream in doc_id order and cut it into fixed 256-token
    // context windows. A doc whose tokens straddle a cut contributes to
    // both chunks. The running offset is a window partitioned by the
    // pack-stream key (`source`) — at 100 TB the stream key is the shard
    // (source × file-split), so the cumulative sum never needs a global
    // order, only a per-shard one; chunk assembly is then one explode of
    // each doc onto its [first,last] chunk range plus one grouped
    // aggregate.
    q("q_pack_chunks",
      """WITH t AS (
        |  SELECT source, doc_id,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |                    s -> length(s) > 0)) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, tok,
        |    sum(tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t),
        |e AS (
        |  SELECT source, doc_id, tok, cum, cum - tok AS soff, j AS chunk_id
        |  FROM c,
        |    UNNEST(range(CAST(floor((cum - tok) / 256.0) AS BIGINT),
        |                 CAST(floor((cum - 1) / 256.0) AS BIGINT) + 1)) AS u(j))
        |SELECT source, chunk_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN CAST(floor(soff / 256.0) AS BIGINT) = chunk_id
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_started,
        |  CAST(sum(least(cum, (chunk_id + 1) * 256)
        |           - greatest(soff, chunk_id * 256)) AS BIGINT) AS n_tokens
        |FROM e GROUP BY source, chunk_id
        |ORDER BY source, chunk_id""".stripMargin) { s =>
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFunctions
      val cap = 256L
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = s.table("documents")
        .select(col("source"), col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("bigint").as("tok"))
        .withColumn("cum", sum("tok").over(w))
        .withColumn("soff", col("cum") - col("tok"))
      c.where(col("tok") > 0)
        .select(col("source"), col("soff"), col("cum"),
          explode(sequence(
            floor(col("soff") / cap).cast("bigint"),
            floor((col("cum") - 1) / cap).cast("bigint"))).as("chunk_id"))
        .groupBy("source", "chunk_id")
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(when(floor(col("soff") / cap).cast("bigint") === col("chunk_id"),
            1).otherwise(0)).cast("bigint").as("n_docs_started"),
          sum(least(col("cum"), (col("chunk_id") + 1) * cap)
            - greatest(col("soff"), col("chunk_id") * cap))
            .cast("bigint").as("n_tokens"))
        .orderBy("source", "chunk_id")
    }
  )
}
