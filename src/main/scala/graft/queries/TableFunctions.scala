package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table functions / ProjectSet — SURVEY.md §2.9: unnest (explode),
  * ordinality (posexplode), generate_series (sequence), plus Expand-style
  * word counting used by the LLM text pipeline.
  * reference: src/expr/impl/src/table_function/ (26 registrations)
  */
object TableFunctions extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(
    // unnest of a computed list (ProjectSet).
    // reference: src/batch/executors/src/executor/project_set.rs:34
    q("q_unnest",
      """SELECT n_nationkey, unnest([n_nationkey, n_regionkey, 99]) AS v
        |FROM nation WHERE n_nationkey < 5
        |ORDER BY n_nationkey, v""".stripMargin) { s =>
      s.table("nation").where(col("n_nationkey") < 5)
        .select(col("n_nationkey"),
          explode(array(col("n_nationkey"), col("n_regionkey"), lit(99))).as("v"))
        .orderBy("n_nationkey", "v")
    },

    // unnest WITH ORDINALITY (posexplode).
    q("q_unnest_ordinal",
      """SELECT n_nationkey,
        |  CAST(generate_subscripts([n_regionkey, n_nationkey], 1) - 1 AS INT) AS pos,
        |  unnest([n_regionkey, n_nationkey]) AS v
        |FROM nation WHERE n_nationkey < 5
        |ORDER BY n_nationkey, pos""".stripMargin) { s =>
      s.table("nation").where(col("n_nationkey") < 5)
        .select(col("n_nationkey"),
          posexplode(array(col("n_regionkey"), col("n_nationkey"))))
        .toDF("n_nationkey", "pos", "v")
        .orderBy("n_nationkey", "pos")
    },

    // generate_series as a table source.
    // reference: src/expr/impl/src/table_function/generate_series.rs
    q("q_generate_series",
      """SELECT CAST(g AS INT) AS g, CAST(g * g AS INT) AS sq
        |FROM generate_series(1, 20) t(g) ORDER BY g""".stripMargin) { s =>
      s.range(1, 21)
        .select(col("id").cast(IntegerType).as("g"),
          (col("id") * col("id")).cast(IntegerType).as("sq"))
        .orderBy("g")
    },

    // generate_series with step over timestamps.
    q("q_generate_series_ts",
      """SELECT ts FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
        |  TIMESTAMP '2024-01-02 00:00:00', INTERVAL 6 HOUR) t(ts)
        |ORDER BY ts""".stripMargin) { s =>
      s.sql(
        """SELECT explode(sequence(TIMESTAMP '2024-01-01 00:00:00',
          |  TIMESTAMP '2024-01-02 00:00:00', INTERVAL 6 HOUR)) AS ts
          |ORDER BY ts""".stripMargin)
    },

    // jsonb_each over the events properties column — flat object → one
    // (key, value) row per field.
    // reference: src/expr/impl/src/table_function/jsonb.rs (jsonb_each)
    q("q_jsonb_each",
      """SELECT e.event_id, k AS key,
        |  json_extract_string(e.props, '$.' || k) AS value
        |FROM events e, unnest(json_keys(e.props)) AS t(k)
        |WHERE e.event_id % 37 = 0
        |ORDER BY e.event_id, key""".stripMargin) { s =>
      s.table("events").where(col("event_id") % 37 === 0)
        .select(col("event_id"),
          graft.functions.JsonFunctions.jsonbEach(col("props")))
        .orderBy("event_id", "key")
    },

    // jsonb_array_elements WITH ORDINALITY over a constructed JSON array.
    q("q_jsonb_array_elements",
      """SELECT doc_id,
        |  CAST(generate_subscripts(arr, 1) - 1 AS INT) AS pos,
        |  unnest(arr) AS elem
        |FROM (
        |  SELECT doc_id, json_extract_string(
        |    '["' || lang || '","' || source || '"]', '$[*]') AS arr
        |  FROM documents WHERE doc_id % 53 = 0)
        |ORDER BY doc_id, pos""".stripMargin) { s =>
      s.table("documents").where(col("doc_id") % 53 === 0)
        .select(col("doc_id"),
          graft.functions.JsonFunctions.jsonbArrayElementsOrdinal(
            concat(lit("[\""), col("lang"), lit("\",\""),
              col("source"), lit("\"]"))))
        .toDF("doc_id", "pos", "elem")
        .orderBy("doc_id", "pos")
    },

    // jsonb_path_query: wildcard JSONPath over nested JSON — one row per
    // matched value (set-returning form).
    q("q_jsonb_path",
      """SELECT event_id, CAST(u AS BIGINT) AS v FROM (
        |  SELECT e.event_id, unnest(CAST(json_extract(
        |    concat('{"items":[{"v":', CAST(e.event_id % 5 AS VARCHAR),
        |           '},{"v":', CAST(e.event_id % 7 AS VARCHAR), '}]}'),
        |    '$.items[*].v') AS VARCHAR[])) AS u
        |  FROM events e WHERE e.event_id % 41 = 0)
        |ORDER BY event_id, v""".stripMargin) { s =>
      val j = concat(lit("""{"items":[{"v":"""),
        (col("event_id") % 5).cast(StringType),
        lit("""},{"v":"""),
        (col("event_id") % 7).cast(StringType), lit("}]}"))
      s.table("events").where(col("event_id") % 41 === 0)
        .select(col("event_id"),
          explode(graft.functions.JsonFunctions
            .jsonbPathQueryArray(j, "$.items[*].v")).as("u"))
        .select(col("event_id"), col("u").cast(LongType).as("v"))
        .orderBy("event_id", "v")
    },

    // generate_subscripts over a computed list (1-based index TVF).
    // reference: src/expr/impl/src/table_function/generate_subscripts.rs
    q("q_generate_subscripts",
      """SELECT p_partkey,
        |  CAST(generate_subscripts(string_split(p_name, ' '), 1) AS INT) AS i,
        |  unnest(string_split(p_name, ' ')) AS w
        |FROM part WHERE p_partkey < 200 ORDER BY p_partkey, i""".stripMargin) { s =>
      s.table("part").where(col("p_partkey") < 200)
        .select(col("p_partkey"), posexplode(split(col("p_name"), " ")))
        .select(col("p_partkey"), (col("pos") + 1).cast(IntegerType).as("i"),
          col("col").as("w"))
        .orderBy("p_partkey", "i")
    },

    // regexp_matches as a set-returning function: one row per match.
    // reference: src/expr/impl/src/table_function/regexp_matches.rs
    q("q_regexp_matches",
      """SELECT p_partkey,
        |  unnest(regexp_extract_all(p_name, '[a-z]*o[a-z]*')) AS m
        |FROM part WHERE p_partkey < 400 ORDER BY p_partkey, m""".stripMargin) { s =>
      s.table("part").where(col("p_partkey") < 400)
        .select(col("p_partkey"),
          explode(expr("regexp_extract_all(p_name, '[a-z]*o[a-z]*', 0)"))
            .as("m"))
        .orderBy("p_partkey", "m")
    },

    // range TVF (exclusive stop, stepped).
    // reference: src/expr/impl/src/table_function/generate_series.rs
    // registers `range` alongside generate_series
    q("q_range_tvf",
      """SELECT CAST(n_nationkey AS INT) AS k,
        |  CAST(unnest(range(0, n_nationkey, 2)) AS INT) AS v
        |FROM nation WHERE n_nationkey BETWEEN 1 AND 8
        |ORDER BY k, v""".stripMargin) { s =>
      s.table("nation")
        .where(col("n_nationkey").between(1, 8))
        .select(col("n_nationkey").cast(IntegerType).as("k"),
          explode(sequence(lit(0),
            (col("n_nationkey") - 1).cast(IntegerType), lit(2))).as("v"))
        .orderBy("k", "v")
    },

    // explode(split(...)): word expansion — ProjectSet in a real pipeline
    // (word frequency over the documents table).
    q("q_word_explode",
      """SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE doc_id < 100
        |) WHERE w <> '' GROUP BY w
        |ORDER BY n DESC, word LIMIT 20""".stripMargin) { s =>
      s.table("documents").where(col("doc_id") < 100)
        .select(explode(split(col("text"), " ")).as("word"))
        .where(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(20)
    },

    // jsonb_to_recordset in FROM position with the PG column-definition
    // list (reference: src/expr/impl/src/scalar/jsonb_record.rs;
    // PG jsonb_to_recordset) — comma-joined after a relation, so the
    // engine lowers it to LATERAL VIEW inline(from_json(…)) and the
    // JSON argument references the outer row. Element keys are built so
    // k is unique per doc (0..6 vs 100..110) for a total order.
    qDir("q_jsonb_recordset",
      """SELECT d.doc_id,
        |  CAST(json_extract_string(d.j, '$[' || CAST(i AS VARCHAR) || '].k') AS INT) AS k,
        |  json_extract_string(d.j, '$[' || CAST(i AS VARCHAR) || '].lang') AS lang
        |FROM (SELECT doc_id,
        |        '[{"k":' || CAST(doc_id % 7 AS VARCHAR) || ',"lang":"' || lang ||
        |        '"},{"k":' || CAST(doc_id % 11 + 100 AS VARCHAR) || '}]' AS j
        |      FROM documents WHERE doc_id % 53 = 0) d,
        |     unnest([0, 1]) AS t(i)
        |ORDER BY d.doc_id, k""".stripMargin) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("q_jsonb_rs").toString
      val e = new graft.Engine(s, wh)
      e.attachTables(dir)
      e.execute(
        """SELECT d.doc_id, r.k, r.lang
          |FROM (SELECT doc_id,
          |        concat('[{"k":', CAST(doc_id % 7 AS STRING),
          |               ',"lang":"', lang, '"},{"k":',
          |               CAST(doc_id % 11 + 100 AS STRING), '}]') AS j
          |      FROM documents WHERE doc_id % 53 = 0) d,
          |     jsonb_to_recordset(d.j) AS r(k int, lang text)
          |ORDER BY d.doc_id, r.k""".stripMargin)
    },

    // _pg_expandarray (reference table_function/pg_expandarray.rs): one
    // row per array element with a 1-based index, lateral against the
    // outer row. The oracle recomputes via generate_subscripts.
    qDir("q_pg_expandarray",
      """SELECT p.p_partkey,
        |  list_extract(string_split(p.p_name, ' '), i) AS x,
        |  CAST(i AS INT) AS n
        |FROM part p, unnest(generate_series(1,
        |       len(string_split(p.p_name, ' ')))) AS t(i)
        |WHERE p.p_partkey % 97 = 0
        |ORDER BY p.p_partkey, n""".stripMargin) { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("q_pgexp").toString
      val e = new graft.Engine(s, wh)
      e.attachTables(dir)
      e.execute(
        """SELECT p.p_partkey, r.x, r.n
          |FROM part p, _pg_expandarray(split(p.p_name, ' ')) AS r(x, n)
          |WHERE p.p_partkey % 97 = 0
          |ORDER BY p.p_partkey, r.n""".stripMargin)
    },

    // pg_get_keywords (reference table_function/pg_get_keywords.rs —
    // the reference derives the rows from ITS parser's keyword table;
    // graft derives from Spark's sql_keywords() the same way). The
    // oracle pins membership of stable keywords; catcode breadth is
    // spec-driven (the reserved flag tracks the session's ANSI mode).
    // The engine lowers `pg_get_keywords()` by TEXT REWRITE to exactly
    // this sql_keywords() subquery (Engine.rewriteTvfs — lifecycle
    // proven in SqlFrontendSpec); the bench runs the lowered form so it
    // times the TVF, not an Engine bootstrap (the round-3
    // q_create_aggregate rule).
    qDir("q_pg_get_keywords",
      """SELECT word FROM (VALUES ('add'), ('from'), ('select'), ('where'))
        |  AS t(word) ORDER BY word""".stripMargin) { (s, _) =>
      s.sql(
        """SELECT word FROM (SELECT lower(keyword) AS word,
          |  CASE WHEN reserved THEN 'R' ELSE 'U' END AS catcode
          |  FROM sql_keywords()) AS k
          |WHERE word IN ('add', 'from', 'select', 'where')
          |ORDER BY word""".stripMargin)
    },

    // jsonb_to_record (single record) as the sole FROM item — the
    // engine lowers the literal-argument form to an aliased subquery.
    qDir("q_jsonb_record",
      """SELECT 42 AS a, 'hello' AS b, 2.5 AS c""") { (s, dir) =>
      val wh = java.nio.file.Files.createTempDirectory("q_jsonb_r1").toString
      val e = new graft.Engine(s, wh)
      e.attachTables(dir)
      e.execute(
        """SELECT r.a, r.b, r.c
          |FROM jsonb_to_record('{"a": 42, "b": "hello", "c": 2.5}')
          |  AS r(a int, b text, c double)""".stripMargin)
    }
  )
}
