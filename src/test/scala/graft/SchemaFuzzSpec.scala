package graft

import scala.util.Random

/** Model-based fuzz of the namespace layer: random interleavings of
  * CREATE/DROP SCHEMA, qualified/search_path CREATE TABLE, DML, RENAME,
  * SET SCHEMA and restarts, diffed against an in-memory model after
  * every mutation batch. Catches resolution bugs (a qualified name
  * captured by the wrong phase) that single-shot specs cannot.
  */
class SchemaFuzzSpec extends SparkSpecBase {

  private val Seeds = 12
  private val OpsPerSeed = 22

  test(s"schema-layer fuzz: $Seeds seeds × $OpsPerSeed ops vs model") {
    (1 to Seeds).foreach { seed =>
      val rnd = new Random(7000 + seed)
      val wh = tmpDir(s"schemafuzz$seed")
      var e = new Engine(spark, wh)
      // model: internal table name -> pk -> v
      val model = scala.collection.mutable.Map[
        String, scala.collection.mutable.Map[Long, Long]]()
      val schemas = scala.collection.mutable.Set[String]()
      var searchPath: Option[String] = None
      var nextId = 0

      def internal(schema: String, bare: String): String =
        if (schema == "public") bare else s"${schema}__$bare"
      def display(n: String): String = {
        val i = n.indexOf("__")
        if (i > 0 && schemas.contains(n.substring(0, i)))
          n.substring(0, i) + "." + n.substring(i + 2)
        else n
      }

      def verify(name: String): Unit = {
        val got = e.execute(s"SELECT k, v FROM ${display(name)} ORDER BY k")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
        val want = model(name).toSeq.sortBy(_._1)
        assert(got == want,
          s"seed $seed: ${display(name)} engine=$got model=$want")
      }

      (1 to OpsPerSeed).foreach { _ =>
        rnd.nextInt(10) match {
          case 0 if schemas.size < 3 =>
            val s = s"fz${seed}s${schemas.size}"
            e.execute(s"CREATE SCHEMA $s")
            schemas += s
          case 1 =>
            val schema =
              if (schemas.isEmpty || rnd.nextBoolean()) "public"
              else schemas.toSeq(rnd.nextInt(schemas.size))
            nextId += 1
            val bare = s"fzt${seed}_$nextId"
            e.execute(s"CREATE TABLE ${if (schema == "public") bare
              else s"$schema.$bare"} (k BIGINT PRIMARY KEY, v BIGINT)")
            model(internal(schema, bare)) =
              scala.collection.mutable.Map.empty
          case 2 | 3 if model.nonEmpty => // insert burst
            val n = model.keys.toSeq(rnd.nextInt(model.size))
            val rows = (1 to 1 + rnd.nextInt(4))
              .map(_ => (rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong))
            val distinct = rows.groupBy(_._1).map(_._2.head).toSeq
            // engine upserts by PK; feed PK-unique batches like a client
            e.execute(s"INSERT INTO ${display(n)} VALUES " +
              distinct.map { case (k, v) => s"($k, $v)" }.mkString(", "))
            distinct.foreach { case (k, v) => model(n)(k) = v }
            verify(n)
          case 4 if model.nonEmpty =>
            val n = model.keys.toSeq(rnd.nextInt(model.size))
            val cut = rnd.nextInt(50)
            e.execute(s"DELETE FROM ${display(n)} WHERE k < $cut")
            model(n).keys.toSeq.filter(_ < cut).foreach(model(n).remove)
            verify(n)
          case 5 if model.nonEmpty =>
            val n = model.keys.toSeq(rnd.nextInt(model.size))
            val bump = rnd.nextInt(100)
            e.execute(s"UPDATE ${display(n)} SET v = v + $bump WHERE k % 2 = 0")
            model(n).foreach { case (k, v) =>
              if (k % 2 == 0) model(n)(k) = v + bump
            }
            verify(n)
          case 6 if model.nonEmpty => // rename (stays in its schema)
            val n = model.keys.toSeq(rnd.nextInt(model.size))
            nextId += 1
            val i = n.indexOf("__")
            val schema =
              if (i > 0 && schemas.contains(n.substring(0, i)))
                n.substring(0, i) else "public"
            val newBare = s"fzt${seed}_$nextId"
            e.execute(s"ALTER TABLE ${display(n)} RENAME TO $newBare")
            model(internal(schema, newBare)) = model.remove(n).get
            verify(internal(schema, newBare))
          case 7 if model.nonEmpty && schemas.nonEmpty => // SET SCHEMA
            val n = model.keys.toSeq(rnd.nextInt(model.size))
            val target = (schemas.toSeq :+ "public")(
              rnd.nextInt(schemas.size + 1))
            val bare = display(n).split("\\.").last
            val dest = internal(target, bare)
            if (dest != n && !model.contains(dest)) {
              e.execute(s"ALTER TABLE ${display(n)} SET SCHEMA $target")
              model(dest) = model.remove(n).get
              verify(dest)
            }
          case 8 if schemas.nonEmpty => // flip search_path
            searchPath = if (rnd.nextBoolean())
              Some(schemas.toSeq(rnd.nextInt(schemas.size))) else None
            searchPath match {
              case Some(s) => e.execute(s"SET search_path TO $s, public")
              case None => e.execute("RESET search_path")
            }
          case 9 => // restart: everything must recover
            e = new Engine(spark.newSession(), wh)
            searchPath.foreach(s =>
              e.execute(s"SET search_path TO $s, public"))
            model.keys.foreach(verify)
          case _ =>
        }
      }
      model.keys.foreach(verify)
      // teardown: cascade-drop the schemas, then the public leftovers
      schemas.foreach(s => e.execute(s"DROP SCHEMA $s CASCADE"))
      model.keys.filter(!_.contains("__"))
        .foreach(n => e.execute(s"DROP TABLE $n"))
    }
  }
}
