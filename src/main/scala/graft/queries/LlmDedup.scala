package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IterativeFixpoint}

/** Deduplication pipeline over `documents` — exact, MinHash+LSH, SimHash,
  * n-gram Jaccard (BASELINE.json north-star ops), all via graft.operators
  * .Dedup with full-formula DuckDB oracles.
  *
  * The raw corpus has no duplicates, so each query builds a deterministic
  * corpus with planted dups: exact copies (id+200000000) and near-dups with a
  * ' zz9' suffix (id+100000000). The plant is identical SQL on both sides.
  */
object LlmDedup extends QueryPack {

  /** Spark-side corpus with planted near-dups (id+100000000, ' zz9' suffix). */
  private def nearCorpus(s: SparkSession): DataFrame = {
    val d = s.table("documents").select("doc_id", "text")
    d.union(d.where(col("doc_id") < 30)
      .select((col("doc_id") + 100000000).as("doc_id"),
        concat(col("text"), lit(" zz9")).as("text")))
  }

  private val nearCorpusSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 100000000 AS doc_id, text || ' zz9' AS text
      |FROM documents WHERE doc_id < 30""".stripMargin

  /** DuckDB 60-bit md5 hash (HashFunctions.md5Long). */
  private def h60(e: String) = s"CAST(('0x' || substr(md5($e),1,15)) AS BIGINT)"

  /** DuckDB word list (TextFunctions.tokens) — staged as its own CTE
    * column `w` so the regex split runs ONCE per doc; inlining it into
    * the per-shingle lambda (the old spelling) re-split the text per
    * shingle, quadratic in words — 39 s of the 50k-doc oracle.
    */
  private val wordsSql =
    """list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0)"""

  /** DuckDB word-3-gram list over a staged word-list column `w`
    * (TextFunctions.wordNgrams(_, 3)). */
  private val grams3Sql =
    """(CASE WHEN len(w) >= 3
      |  THEN list_transform(range(1, len(w) - 1),
      |    j -> array_to_string(list_slice(w, j, j + 2), ' '))
      |  ELSE [] END)""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    // Exact dedup: planted exact copies (id+200000000 for id<40) found by
    // content fingerprint grouping.
    q("q_dedup_exact",
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 200000000, text FROM documents WHERE doc_id < 40
        |)
        |SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  array_to_string(list_sort(list(doc_id)), ',') AS ids
        |FROM corpus GROUP BY fp HAVING COUNT(*) > 1
        |ORDER BY fp""".stripMargin) { s =>
      val d = s.table("documents").select("doc_id", "text")
      val corpus = d.union(d.where(col("doc_id") < 40)
        .select((col("doc_id") + 200000000).as("doc_id"), col("text")))
      Dedup.exactDupGroups(corpus, "doc_id", "text")
        .withColumn("ids", array_join(col("ids").cast("array<string>"), ","))
        .orderBy("fp")
    },

    // MinHash + LSH candidate pairs (12 hashes, 2 bands × 6 rows; buckets
    // over 64 members dropped as degenerate — same guard on both sides).
    q("q_dedup_minhash",
      s"""WITH corpus AS ($nearCorpusSql),
         |words AS (SELECT doc_id, $wordsSql AS w FROM corpus),
         |hashed AS (
         |  -- one md5 per shingle, mixed per hash id with integer math
         |  -- below (the Spark side's one-md5 + universal-hash layout;
         |  -- md5 inside the 12-way transform is 12x the hashing cost
         |  -- and dominates the oracle at 50k+ docs)
         |  SELECT doc_id,
         |    list_transform($grams3Sql, s -> ${h60("s")} % 2147483647) AS hs
         |  FROM words WHERE len(w) >= 3
         |),
         |sig AS (
         |  SELECT doc_id,
         |    list_transform(range(0, 12), i ->
         |      list_aggregate(list_transform(hs,
         |        h -> (h * (i * 2 + 1) + i * 409 + 7) % 2147483647),
         |        'min')) AS sg
         |  FROM hashed
         |),
         |banded AS MATERIALIZED (
         |  -- MATERIALIZED: referenced three times below; DuckDB inlines
         |  -- CTEs by default, which would recompute the whole shingle+
         |  -- hash chain per reference (40 s/pass at sf1)
         |  SELECT doc_id, b,
         |    array_to_string(list_slice(sg, b * 6 + 1, b * 6 + 6), ',') AS key
         |  FROM sig CROSS JOIN range(0, 2) r(b)
         |),
         |ok AS (
         |  SELECT b, key FROM banded GROUP BY b, key
         |  HAVING COUNT(*) > 1 AND COUNT(*) <= 64
         |)
         |SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b
         |FROM banded a
         |JOIN ok o ON o.b = a.b AND o.key = a.key
         |JOIN banded bb ON a.b = bb.b AND a.key = bb.key
         |  AND a.doc_id < bb.doc_id
         |ORDER BY id_a, id_b""".stripMargin) { s =>
      Dedup.minhashCandidatePairs(nearCorpus(s), "doc_id", "text",
        numHashes = 12, bands = 2, shingleLen = 3, maxBucket = 64)
        .orderBy("id_a", "id_b")
    },

    // Exact n-gram Jaccard verification of the planted near-dup pairs.
    q("q_dedup_jaccard",
      s"""WITH corpus AS ($nearCorpusSql),
         |words AS (SELECT doc_id, $wordsSql AS w FROM corpus),
         |grams AS MATERIALIZED (
         |  SELECT doc_id, unnest(list_distinct($grams3Sql)) AS g FROM words
         |),
         |sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
         |cands AS (SELECT doc_id AS id_a, doc_id + 100000000 AS id_b
         |          FROM documents WHERE doc_id < 30),
         |inter AS (
         |  SELECT c.id_a, c.id_b, COUNT(*) AS i
         |  FROM cands c
         |  JOIN grams ga ON ga.doc_id = c.id_a
         |  JOIN grams gb ON gb.doc_id = c.id_b AND gb.g = ga.g
         |  GROUP BY c.id_a, c.id_b
         |)
         |SELECT i.id_a, i.id_b,
         |  CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i) AS jaccard
         |FROM inter i
         |JOIN sizes sa ON sa.doc_id = i.id_a
         |JOIN sizes sb ON sb.doc_id = i.id_b
         |ORDER BY id_a, id_b""".stripMargin) { s =>
      import s.implicits._
      val cands = s.table("documents").where(col("doc_id") < 30)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 100000000).as("id_b"))
      Dedup.jaccardPairs(nearCorpus(s), "doc_id", "text", cands, shingleLen = 3)
        .orderBy("id_a", "id_b")
    },

    // SimHash fingerprints + Hamming distance between planted pairs:
    // near-dups land within a few bits of each other.
    q("q_dedup_simhash",
      s"""WITH corpus AS ($nearCorpusSql),
         |tok AS (
         |  SELECT doc_id,
         |    unnest(list_distinct(list_filter(string_split_regex(text, '\\s+'),
         |      t -> length(t) > 0))) AS t
         |  FROM corpus WHERE doc_id < 30 OR doc_id >= 100000000
         |),
         |bits AS (
         |  SELECT doc_id, b, CAST(pow(2, b) AS BIGINT) AS p,
         |    SUM(CASE WHEN (${h60("t")} // CAST(pow(2, b) AS BIGINT)) % 2 = 1
         |             THEN 1 ELSE -1 END) AS sgn
         |  FROM tok CROSS JOIN range(0, 16) r(b)
         |  GROUP BY doc_id, b, p
         |),
         |sh AS MATERIALIZED (
         |  SELECT doc_id,
         |    SUM(CASE WHEN sgn > 0 THEN p ELSE 0 END) AS simhash
         |  FROM bits GROUP BY doc_id
         |)
         |SELECT a.doc_id, CAST(a.simhash AS BIGINT) AS simhash,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 100000000
         |ORDER BY a.doc_id""".stripMargin) { s =>
      val sub = nearCorpus(s)
        .where(col("doc_id") < 30 || col("doc_id") >= 100000000)
      val sh = Dedup.simhash(sub, "doc_id", "text", bits = 16)
      val a = sh.select(col("doc_id"), col("simhash"))
      val b = sh.select(col("doc_id").as("doc_id_b"), col("simhash").as("simhash_b"))
      a.join(b, col("doc_id_b") === col("doc_id") + 100000000)
        .select(col("doc_id"), col("simhash"),
          Dedup.hammingDistance(col("simhash"), col("simhash_b"), 16).as("hamming"))
        .orderBy("doc_id")
    },

    // Duplicate CLUSTERS: near-dup pairs chained into components — the
    // step after pair discovery in a real dedup pipeline (doc A ~ B and
    // B ~ C must collapse to ONE survivor even when A !~ C directly).
    // Corpus plants two near-dup generations (a → a+100000000 → a+200000000);
    // edges are Jaccard-verified pairs; components via min-label
    // propagation (IterativeFixpoint.connectedComponents); the oracle
    // recomputes reachability with a recursive CTE.
    q("q_dedup_clusters",
      s"""WITH RECURSIVE corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000000, text || ' zz9' FROM documents WHERE doc_id < 40
         |  UNION ALL
         |  SELECT doc_id + 200000000, text || ' zz9 zz9' FROM documents WHERE doc_id < 20
         |),
         |words AS (SELECT doc_id, $wordsSql AS w FROM corpus),
         |grams AS MATERIALIZED (
         |  SELECT doc_id, unnest(list_distinct($grams3Sql)) AS g FROM words
         |),
         |sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
         |cands AS (
         |  SELECT doc_id AS id_a, doc_id + 100000000 AS id_b
         |  FROM documents WHERE doc_id < 40
         |  UNION ALL
         |  SELECT doc_id + 100000000, doc_id + 200000000
         |  FROM documents WHERE doc_id < 20
         |),
         |inter AS (
         |  SELECT c.id_a, c.id_b, COUNT(*) AS i
         |  FROM cands c
         |  JOIN grams ga ON ga.doc_id = c.id_a
         |  JOIN grams gb ON gb.doc_id = c.id_b AND gb.g = ga.g
         |  GROUP BY c.id_a, c.id_b
         |),
         |edges AS (
         |  SELECT i.id_a AS a, i.id_b AS b FROM inter i
         |  JOIN sizes sa ON sa.doc_id = i.id_a
         |  JOIN sizes sb ON sb.doc_id = i.id_b
         |  WHERE CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i) >= 0.5
         |),
         |und AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
         |reach(id, r) AS (
         |  SELECT a, a FROM und
         |  UNION
         |  SELECT re.id, u.b FROM reach re JOIN und u ON u.a = re.r
         |)
         |SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS component
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin) { s =>
      val d = s.table("documents").select("doc_id", "text")
      val corpus = d
        .union(d.where(col("doc_id") < 40)
          .select((col("doc_id") + 100000000).as("doc_id"),
            concat(col("text"), lit(" zz9")).as("text")))
        .union(d.where(col("doc_id") < 20)
          .select((col("doc_id") + 200000000).as("doc_id"),
            concat(col("text"), lit(" zz9 zz9")).as("text")))
      val cands = d.where(col("doc_id") < 40)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 100000000).as("id_b"))
        .union(d.where(col("doc_id") < 20)
          .select((col("doc_id") + 100000000).as("id_a"),
            (col("doc_id") + 200000000).as("id_b")))
      val edges = Dedup.jaccardPairs(corpus, "doc_id", "text", cands, shingleLen = 3)
        .where(col("jaccard") >= 0.5)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      IterativeFixpoint.connectedComponents(edges)
        .select(col("id").as("doc_id"), col("component"))
        .orderBy("doc_id")
    },

    // C4-style span-level dedup (the corpus has no sentence structure,
    // so the "three-sentence span" becomes a non-overlapping 8-word
    // span): every span seen before anywhere in the corpus — ordered by
    // (doc_id, pos) — is removed; only the globally-first occurrence
    // survives. One explode + one window partitioned by the span
    // fingerprint (md5, so 100 TB of text shuffles 32-byte keys, not
    // span bodies) + one per-doc aggregate. The planted near-dup docs
    // (id+100000000, suffix-only edit) lose every full span to their
    // originals; the originals keep everything.
    q("q_dedup_spans",
      s"""WITH corpus AS ($nearCorpusSql),
         |toks AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(text, '\\s+'),
         |                t -> length(t) > 0) AS w
         |  FROM corpus),
         |spans AS (
         |  SELECT doc_id, j AS pos,
         |    array_to_string(list_slice(w, j * 8 + 1, j * 8 + 8), ' ') AS span
         |  FROM toks,
         |    UNNEST(range(0, greatest(CAST(ceil(len(w) / 8.0) AS BIGINT), 1)))
         |      AS u(j)),
         |ranked AS (
         |  SELECT doc_id, pos,
         |    row_number() OVER (PARTITION BY md5(span)
         |                       ORDER BY doc_id, pos) AS rn
         |  FROM spans)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS spans_total,
         |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS spans_removed
         |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin) { s =>
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFunctions
      val toks = TextFunctions.tokens(col("text"))
      val nSpans = greatest(ceil(size(toks) / 8.0).cast("bigint"), lit(1L))
      val spans = nearCorpus(s)
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(0L), nSpans - 1),
            j => concat_ws(" ", slice(toks, (j * 8 + 1).cast("int"), lit(8)))))
            .as(Seq("pos", "span")))
      val w = Window.partitionBy(md5(col("span"))).orderBy("doc_id", "pos")
      spans.withColumn("rn", row_number().over(w))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("bigint").as("spans_total"),
          sum(when(col("rn") > 1, 1).otherwise(0)).cast("bigint")
            .as("spans_removed"))
        .orderBy("doc_id")
    }
  )
}
