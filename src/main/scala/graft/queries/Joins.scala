package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Join surface — SURVEY.md §2.3. All JoinType values from
  * proto/plan_common.proto:134-148 (Inner, LeftOuter, RightOuter, FullOuter,
  * LeftSemi, LeftAnti, RightSemi, RightAnti, AsofInner, AsofLeftOuter) plus
  * null-safe equality, theta (nested-loop) join, and the broadcast
  * (lookup-join) shape.
  *
  * Scale notes: dimension sides (region/nation/customer-sized) broadcast;
  * fact-fact joins shuffle on the join key and rely on AQE skew handling.
  */
object Joins extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(
    // Inner equi-join, dim side broadcast (lookup-join analog).
    // reference: src/batch/executors/src/executor/join/hash_join.rs:62
    q("q_join_inner",
      """SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |WHERE o.o_totalprice > 450000.0
        |ORDER BY o.o_orderkey""".stripMargin) { s =>
      // no hint: customer is SF-proportional — AQE broadcasts at small
      // SF and shuffles at large (PlanQualitySpec asserts the adaptive
      // choice); a forced hint would OOM the build side at 100x
      val c = s.table("customer")
      val o = s.table("orders").where(col("o_totalprice") > 450000.0)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .select(c("c_custkey"), c("c_name"), o("o_orderkey"), o("o_totalprice"))
        .orderBy("o_orderkey")
    },

    // Left outer join with nulls on the probe side.
    q("q_join_left",
      """SELECT n.n_nationkey, n.n_name,
        |  CAST(COUNT(c.c_custkey) AS BIGINT) AS n_cust
        |FROM nation n LEFT JOIN customer c
        |  ON n.n_nationkey = c.c_nationkey AND c.c_acctbal > 9000
        |GROUP BY n.n_nationkey, n.n_name
        |ORDER BY n.n_nationkey""".stripMargin) { s =>
      val n = s.table("nation")
      val c = s.table("customer")
      n.join(c, n("n_nationkey") === c("c_nationkey") && c("c_acctbal") > 9000, "left")
        .groupBy(n("n_nationkey"), n("n_name"))
        .agg(count(c("c_custkey")).as("n_cust"))
        .orderBy("n_nationkey")
    },

    // Full outer join over partially-overlapping key sets.
    q("q_join_full",
      """SELECT a.k AS ka, b.k AS kb, a.na, b.nb FROM
        |  (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS na
        |     FROM orders WHERE o_totalprice > 430000 GROUP BY o_custkey) a
        |FULL JOIN
        |  (SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS nb
        |     FROM customer WHERE c_acctbal > 9900 GROUP BY c_custkey) b
        |ON a.k = b.k
        |ORDER BY ka NULLS FIRST, kb NULLS FIRST""".stripMargin) { s =>
      val a = s.table("orders").where(col("o_totalprice") > 430000)
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("na"))
      val b = s.table("customer").where(col("c_acctbal") > 9900)
        .groupBy(col("c_custkey").as("k")).agg(count(lit(1)).as("nb"))
      a.join(b, a("k") === b("k"), "full")
        .select(a("k").as("ka"), b("k").as("kb"), col("na"), col("nb"))
        .orderBy(col("ka").asc_nulls_first, col("kb").asc_nulls_first)
    },

    // Left semi join (EXISTS).
    q("q_join_semi",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin) { s =>
      val c = s.table("customer")
      val o = s.table("orders").where(col("o_totalprice") > 450000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // Left anti join (NOT EXISTS): customers with no large order.
    q("q_join_anti",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin) { s =>
      val c = s.table("customer")
      val o = s.table("orders").where(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // Theta (non-equi) nested-loop join: price-band lookup.
    // reference: src/batch/executors/src/executor/join/nested_loop_join.rs:45
    q("q_join_theta",
      """SELECT b.band, CAST(COUNT(*) AS BIGINT) AS n FROM
        |  (SELECT * FROM (VALUES (1, 0.0, 150000.0), (2, 150000.0, 300000.0),
        |                         (3, 300000.0, 1e9)) AS t(band, lo, hi)) b
        |JOIN orders o ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        |GROUP BY b.band ORDER BY b.band""".stripMargin) { s =>
      import s.implicits._
      val bands = Seq((1, 0.0, 150000.0), (2, 150000.0, 300000.0), (3, 300000.0, 1e9))
        .toDF("band", "lo", "hi")
      val o = s.table("orders")
      broadcast(bands)
        .join(o, o("o_totalprice") >= col("lo") && o("o_totalprice") < col("hi"))
        .groupBy("band").agg(count(lit(1)).as("n"))
        .orderBy("band")
    },

    // Null-safe equality (IS NOT DISTINCT FROM, <=>).
    q("q_join_nullsafe",
      """SELECT a.id AS ida, b.id AS idb FROM
        |  (SELECT * FROM (VALUES (1, 'x'), (2, NULL), (3, 'y')) AS t(id, k)) a
        |JOIN
        |  (SELECT * FROM (VALUES (10, 'x'), (20, NULL), (30, 'z')) AS t(id, k)) b
        |ON a.k IS NOT DISTINCT FROM b.k
        |ORDER BY ida, idb""".stripMargin) { s =>
      import s.implicits._
      val a = Seq((1, Some("x")), (2, None: Option[String]), (3, Some("y"))).toDF("id", "k")
      val b = Seq((10, Some("x")), (20, None: Option[String]), (30, Some("z"))).toDF("id", "k")
      a.join(b, a("k") <=> b("k"))
        .select(a("id").as("ida"), b("id").as("idb"))
        .orderBy("ida", "idb")
    },

    // Multi-way star join: region → nation → customer → orders (TPC-H Q5
    // shape). Dims broadcast; single shuffle on the fact key.
    q("q_join_star",
      s"""SELECT r.r_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
         |  ${dsumSql("o.o_totalprice")} AS revenue
         |FROM region r
         |JOIN nation n ON n.n_regionkey = r.r_regionkey
         |JOIN customer c ON c.c_nationkey = n.n_nationkey
         |JOIN orders o ON o.o_custkey = c.c_custkey
         |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin) { s =>
      val r = s.table("region")
      val n = s.table("nation")
      val c = s.table("customer")
      val o = s.table("orders")
      o.join(c, o("o_custkey") === c("c_custkey")) // SF-proportional: AQE decides
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(r("r_name"))
        .agg(count(lit(1)).as("n_orders"), dsum(o("o_totalprice")).as("revenue"))
        .orderBy("r_name")
    },

    // Batch AS-OF join (AsofInner): each order matched with the same
    // customer's latest strictly-earlier order. Implemented as equi-join on
    // the key + window rank — the scalable batch strategy (one shuffle on
    // the key, no per-key sort state).
    // reference: src/stream/src/executor/asof_join.rs:110
    q("q_join_asof",
      """SELECT o_orderkey, o_custkey, prev_orderkey, prev_date FROM (
        |  SELECT o.o_orderkey, o.o_custkey,
        |    p.o_orderkey AS prev_orderkey, p.o_orderdate AS prev_date,
        |    ROW_NUMBER() OVER (PARTITION BY o.o_orderkey
        |                       ORDER BY p.o_orderdate DESC, p.o_orderkey DESC) AS rn
        |  FROM orders o JOIN orders p
        |    ON p.o_custkey = o.o_custkey AND p.o_orderdate < o.o_orderdate
        |  WHERE o.o_orderkey % 20 = 0
        |) WHERE rn = 1
        |ORDER BY o_orderkey""".stripMargin) { s =>
      import org.apache.spark.sql.expressions.Window
      val o = s.table("orders").where(col("o_orderkey") % 20 === 0)
      val p = s.table("orders")
        .select(col("o_orderkey").as("p_orderkey"),
          col("o_custkey").as("p_custkey"), col("o_orderdate").as("p_orderdate"))
      val joined = o.join(p,
        col("p_custkey") === o("o_custkey") && col("p_orderdate") < o("o_orderdate"))
      val w = Window.partitionBy(o("o_orderkey"))
        .orderBy(col("p_orderdate").desc, col("p_orderkey").desc)
      joined
        .select(o("o_orderkey"), o("o_custkey"),
          col("p_orderkey").as("prev_orderkey"), col("p_orderdate").as("prev_date"),
          row_number().over(w).as("rn"))
        .where(col("rn") === 1).drop("rn")
        .orderBy("o_orderkey")
    },

    // Correlated LATERAL subquery join (the reference's LATERAL /
    // set-returning correlated FROM item; Catalyst plans it as a
    // DomainJoin → rewritten correlated join).
    // reference: src/frontend/src/binder/relation/subquery.rs (lateral)
    q("q_join_lateral",
      """SELECT r.r_name, t.n_name FROM region r,
        |LATERAL (SELECT n_name FROM nation n
        |         WHERE n.n_regionkey = r.r_regionkey
        |         ORDER BY n_name LIMIT 2) t
        |ORDER BY r_name, n_name""".stripMargin) { s =>
      s.sql(
        """SELECT r.r_name, t.n_name FROM region r,
          |LATERAL (SELECT n_name FROM nation n
          |         WHERE n.n_regionkey = r.r_regionkey
          |         ORDER BY n_name LIMIT 2) t
          |ORDER BY r_name, n_name""".stripMargin)
    },

    // Batch AS-OF LEFT OUTER join (AsofLeftOuter): as above but orders
    // with no earlier order (a customer's first) survive null-padded —
    // the LEFT JOIN keeps exactly one all-null build row, which the rank
    // picks. reference: proto/plan_common.proto:147 (ASOF_LEFT_OUTER)
    q("q_join_asof_outer",
      """SELECT o_orderkey, o_custkey, prev_orderkey, prev_date FROM (
        |  SELECT o.o_orderkey, o.o_custkey,
        |    p.o_orderkey AS prev_orderkey, p.o_orderdate AS prev_date,
        |    ROW_NUMBER() OVER (PARTITION BY o.o_orderkey
        |                       ORDER BY p.o_orderdate DESC NULLS LAST,
        |                                p.o_orderkey DESC NULLS LAST) AS rn
        |  FROM orders o LEFT JOIN orders p
        |    ON p.o_custkey = o.o_custkey AND p.o_orderdate < o.o_orderdate
        |  WHERE o.o_orderkey % 20 = 0
        |) WHERE rn = 1
        |ORDER BY o_orderkey""".stripMargin) { s =>
      import org.apache.spark.sql.expressions.Window
      val o = s.table("orders").where(col("o_orderkey") % 20 === 0)
      val p = s.table("orders")
        .select(col("o_orderkey").as("p_orderkey"),
          col("o_custkey").as("p_custkey"), col("o_orderdate").as("p_orderdate"))
      val joined = o.join(p,
        col("p_custkey") === o("o_custkey") && col("p_orderdate") < o("o_orderdate"),
        "left")
      val w = Window.partitionBy(o("o_orderkey"))
        .orderBy(col("p_orderdate").desc_nulls_last, col("p_orderkey").desc_nulls_last)
      joined
        .select(o("o_orderkey"), o("o_custkey"),
          col("p_orderkey").as("prev_orderkey"), col("p_orderdate").as("prev_date"),
          row_number().over(w).as("rn"))
        .where(col("rn") === 1).drop("rn")
        .orderBy("o_orderkey")
    },

    // Batch AS-OF forward join (inequality ≥): each order matched with
    // the same customer's EARLIEST at-or-after order other than itself —
    // the Ge probe direction of the reference's inequality matrix.
    // reference: proto/plan_common.proto:156-161 (AsOfInequalityType)
    q("q_join_asof_fwd",
      """SELECT o_orderkey, o_custkey, next_orderkey, next_date FROM (
        |  SELECT o.o_orderkey, o.o_custkey,
        |    p.o_orderkey AS next_orderkey, p.o_orderdate AS next_date,
        |    ROW_NUMBER() OVER (PARTITION BY o.o_orderkey
        |                       ORDER BY p.o_orderdate ASC, p.o_orderkey ASC) AS rn
        |  FROM orders o JOIN orders p
        |    ON p.o_custkey = o.o_custkey AND p.o_orderdate >= o.o_orderdate
        |   AND p.o_orderkey <> o.o_orderkey
        |  WHERE o.o_orderkey % 20 = 0
        |) WHERE rn = 1
        |ORDER BY o_orderkey""".stripMargin) { s =>
      import org.apache.spark.sql.expressions.Window
      val o = s.table("orders").where(col("o_orderkey") % 20 === 0)
      val p = s.table("orders")
        .select(col("o_orderkey").as("p_orderkey"),
          col("o_custkey").as("p_custkey"), col("o_orderdate").as("p_orderdate"))
      val joined = o.join(p,
        col("p_custkey") === o("o_custkey") &&
          col("p_orderdate") >= o("o_orderdate") &&
          col("p_orderkey") =!= o("o_orderkey"))
      val w = Window.partitionBy(o("o_orderkey"))
        .orderBy(col("p_orderdate").asc, col("p_orderkey").asc)
      joined
        .select(o("o_orderkey"), o("o_custkey"),
          col("p_orderkey").as("next_orderkey"), col("p_orderdate").as("next_date"),
          row_number().over(w).as("rn"))
        .where(col("rn") === 1).drop("rn")
        .orderBy("o_orderkey")
    }
  )
}
