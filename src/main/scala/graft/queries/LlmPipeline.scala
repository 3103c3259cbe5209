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
    }
  )
}
