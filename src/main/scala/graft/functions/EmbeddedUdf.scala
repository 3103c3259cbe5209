package graft.functions

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Embedded user-defined-function runtimes (reference:
  * src/expr/impl/src/udf/python.rs and quickjs.rs — `CREATE FUNCTION …
  * LANGUAGE python/javascript AS $$body$$` runs the body in an
  * interpreter embedded in the compute node). The JVM cannot embed
  * CPython/QuickJS in-process, so the sandbox-honest rendering is a
  * POOL OF INTERPRETER SUBPROCESSES per executor — `python3 -u -c` /
  * `node -e` workers speaking newline-delimited JSON over stdin/stdout,
  * the same batched typed-columns-out / typed-column-back contract as
  * the external-UDF server path ([[ExternalUdfClient]]), with the
  * function BODY carried in the plan itself so every executor can
  * (re)define it lazily on first call — no driver-side registry to
  * distribute, which is what makes this correct on a 1000-executor
  * cluster: each executor spawns its own small pool, definitions
  * piggyback on the first batch, and round-trips amortize over
  * `batchSize` rows exactly like the Arrow-Flight exchange.
  *
  * Protocol (one line out, one line in):
  *   → {"op":"def","fn":"<name>","body":"<source>"}
  *   ← {"ok":true} | {"error":"message"}
  *   → {"op":"call","fn":"<name>","args":[[row1…],[row2…],…]}
  *   ← {"results":[v1,…]} | {"error":"message"}
  *
  * Non-finite doubles cross the wire as the strings "NaN"/"Infinity"/
  * "-Infinity" (strict JSON both sides); JS BigInt results come back as
  * decimal strings. Dead workers respawn once per call (an OOM-killed
  * interpreter does not fail the query).
  */
object EmbeddedUdfRuntime {

  /** Languages the reference's create_function.rs accepts that this
    * runtime can host. `wasm` stays a documented divergence (no wasm
    * runtime ships here).
    */
  def normalize(lang: String): String = lang.toLowerCase match {
    case "python" => "python"
    case "javascript" | "js" => "javascript"
    case other => throw new IllegalArgumentException(
      s"embedded UDF language '$other' not supported (python/javascript " +
        "here; wasm is a documented divergence)")
  }

  private def command(lang: String): Seq[String] = lang match {
    case "python" => Seq("python3", "-u", "-c", PythonRunner)
    case "javascript" => Seq("node", "-e", JsRunner)
  }

  /** One interpreter process. All access is under the worker's own
    * monitor (a batch is one request/response exchange).
    */
  private final class Worker(lang: String) {
    private val proc =
      try new ProcessBuilder(command(lang): _*).start()
      catch { case e: java.io.IOException =>
        throw new IllegalStateException(
          s"embedded $lang UDF runtime: interpreter not available " +
            s"(${command(lang).head}): ${e.getMessage}")
      }
    // stderr drains on a daemon thread into a bounded ring so a crash
    // diagnosis survives without an unbounded buffer or a blocked pipe
    private val errTail = new java.util.concurrent.ConcurrentLinkedDeque[String]()
    locally {
      val t = new Thread(() => {
        val r = new BufferedReader(new InputStreamReader(
          proc.getErrorStream, StandardCharsets.UTF_8))
        var line = r.readLine()
        while (line != null) {
          errTail.addLast(line)
          while (errTail.size > 20) errTail.pollFirst()
          line = r.readLine()
        }
      }, s"graft-embedded-udf-$lang-stderr")
      t.setDaemon(true)
      t.start()
    }
    private val out = new BufferedWriter(new OutputStreamWriter(
      proc.getOutputStream, StandardCharsets.UTF_8))
    private val in = new BufferedReader(new InputStreamReader(
      proc.getInputStream, StandardCharsets.UTF_8))
    // fn -> hash of the body this worker has exec'd (CREATE OR REPLACE
    // with a new body re-defines on next use)
    private val defined = mutable.Map[String, Int]()

    def exchange(line: String): JValue = {
      out.write(line); out.write("\n"); out.flush()
      val resp = in.readLine()
      if (resp == null) throw new java.io.IOException(
        s"embedded $lang UDF worker died" +
          (if (errTail.isEmpty) ""
           else s"; stderr tail: ${String.join(" | ", errTail)}"))
      JsonMethods.parse(resp)
    }

    def ensureDefined(fn: String, body: String): Unit =
      if (!defined.get(fn).contains(body.hashCode)) {
        val resp = exchange(JsonMethods.compact(JsonMethods.render(JObject(
          "op" -> JString("def"), "fn" -> JString(fn),
          "body" -> JString(body)))))
        (resp \ "error") match {
          case JString(msg) => throw new RuntimeException(
            s"embedded $lang UDF '$fn': definition failed: $msg")
          case _ => defined(fn) = body.hashCode
        }
      }

    def close(): Unit = try proc.destroy() catch { case _: Exception => }
  }

  /** Small fixed pool per (JVM, language): the reference embeds ONE
    * interpreter per compute node (python.rs holds the GIL anyway);
    * a few workers here let local[32] overlap batches without paying
    * 32 interpreter startups. Executors each build their own pool.
    */
  private val PoolSize =
    sys.props.getOrElse("graft.embeddedUdf.pool", "4").toInt
  private val pools =
    new java.util.concurrent.ConcurrentHashMap[String, Array[AnyRef]]()
  private val rr = new java.util.concurrent.atomic.AtomicInteger(0)

  // each slot is a single-element lock box: slot.synchronized guards the
  // worker it holds, and a dead worker is replaced in place
  private final class Slot(val lang: String) {
    var worker: Worker = _
    def get(): Worker = {
      if (worker == null) worker = new Worker(lang)
      worker
    }
    def respawn(): Worker = {
      if (worker != null) worker.close()
      worker = new Worker(lang)
      worker
    }
  }

  private def slot(lang: String): Slot = {
    val arr = pools.computeIfAbsent(lang,
      l => Array.fill[AnyRef](PoolSize)(new Slot(l)))
    arr(math.floorMod(rr.getAndIncrement(), arr.length)).asInstanceOf[Slot]
  }

  // ---- JSON <-> JVM values (superset of the external-UDF set: adds
  // arrays of scalars, so e.g. an embedding column can reach python)

  private def toJ(v: Any): JValue = v match {
    case null => JNull
    case s: String => JString(s)
    case b: Boolean => JBool(b)
    case b: Byte => JLong(b.toLong)
    case s: Short => JLong(s.toLong)
    case i: Int => JLong(i.toLong)
    case l: Long => JLong(l)
    case f: Float => toJDouble(f.toDouble)
    case d: Double => toJDouble(d)
    case d: java.math.BigDecimal => JDecimal(BigDecimal(d))
    case d: BigDecimal => JDecimal(d)
    case a: scala.collection.Seq[_] => JArray(a.toList.map(toJ))
    case a: Array[_] => JArray(a.toList.map(toJ))
    case other => throw new IllegalArgumentException(
      s"embedded UDF: unsupported argument ${other.getClass.getName} " +
        "(bigint/int/double/float/string/boolean/decimal/array only)")
  }

  private def toJDouble(d: Double): JValue =
    if (d.isNaN) JString("NaN")
    else if (d.isPosInfinity) JString("Infinity")
    else if (d.isNegInfinity) JString("-Infinity")
    else JDouble(d)

  private[functions] def fromJ(v: JValue, t: DataType): Any = (v, t) match {
    case (JNull | JNothing, _) => null
    case (JString(s), DoubleType) => s.toDouble // NaN/Infinity encoding
    case (JString(s), FloatType) => s.toFloat
    case (j, LongType) => num(j).toLong
    case (j, IntegerType) => num(j).toInt
    case (j, ShortType) => num(j).toShort
    case (j, DoubleType) => num(j).toDouble
    case (j, FloatType) => num(j).toFloat
    case (JString(s), StringType) => s
    case (j, StringType) => JsonMethods.compact(JsonMethods.render(j))
    case (JBool(b), BooleanType) => b
    case (j, d: DecimalType) => BigDecimal(num(j).toString)
      .setScale(d.scale, BigDecimal.RoundingMode.HALF_UP)
    case (JArray(vs), ArrayType(et, _)) => vs.map(fromJ(_, et))
    case (j, other) => throw new IllegalArgumentException(
      s"embedded UDF: cannot read $j as ${other.sql}")
  }

  private def num(j: JValue): BigDecimal = j match {
    case JLong(l) => BigDecimal(l)
    case JInt(i) => BigDecimal(i)
    case JDouble(d) => BigDecimal(d)
    case JDecimal(d) => d
    case JString(s) => BigDecimal(s) // JS BigInt results
    case other => throw new IllegalArgumentException(
      s"embedded UDF: expected a number, got $other")
  }

  /** One request/response exchange against a pooled worker of `lang`,
    * lazily (re)defining `fn` from `body` first; a dead worker
    * respawns once. Raises with the interpreter's message on error.
    */
  private def roundTrip(lang: String, fn: String, body: String,
      op: String, rows: Seq[Seq[Any]]): JValue = {
    val req = JObject("op" -> JString(op), "fn" -> JString(fn),
      "args" -> JArray(rows.toList.map(r => JArray(r.toList.map(toJ)))))
    val line = JsonMethods.compact(JsonMethods.render(req))
    val s = slot(lang)
    val resp = s.synchronized {
      def once(w: Worker): JValue = { w.ensureDefined(fn, body); w.exchange(line) }
      try once(s.get())
      catch { case _: java.io.IOException => once(s.respawn()) }
    }
    (resp \ "error") match {
      case JString(msg) => throw new RuntimeException(
        s"embedded $lang UDF '$fn' failed: $msg")
      case _ => resp
    }
  }

  /** One batched call; results align with `rows` by position. The body
    * travels with the call so any worker on any executor can lazily
    * (re)define before evaluating.
    */
  def callBatch(lang0: String, fn: String, body: String,
      rows: Seq[Seq[Any]], retType: DataType): Seq[Any] = {
    if (rows.isEmpty) return Seq.empty
    val lang = normalize(lang0)
    (roundTrip(lang, fn, body, "call", rows) \ "results") match {
      case JArray(vs) =>
        require(vs.length == rows.length,
          s"embedded $lang UDF '$fn' returned ${vs.length} results " +
            s"for ${rows.length} rows")
        vs.map(fromJ(_, retType))
      case _ => throw new RuntimeException(
        s"embedded $lang UDF '$fn': malformed response")
    }
  }

  /** Aggregate evaluation: folds `rows` through the body's
    * `create_state`/`accumulate`/[`finish`] in ONE interpreter
    * exchange and returns the final value (reference: python.rs /
    * quickjs.rs UDAF contract via CREATE AGGREGATE). The caller
    * (EmbeddedAggCall) buffers and merges per-group rows Spark-side,
    * so partial aggregation stays distributed and the interpreter sees
    * each group exactly once.
    */
  def callAgg(lang0: String, fn: String, body: String,
      rows: Seq[Seq[Any]], retType: DataType): Any = {
    val lang = normalize(lang0)
    fromJ(roundTrip(lang, fn, body, "agg", rows) \ "result", retType)
  }

  /** Table-function evaluation: for each input arg-tuple the body's
    * generator/iterable yields output rows (reference: python.rs UDTF /
    * table_function contract). Returns, per input tuple, the yielded
    * rows decoded against `schema`.
    */
  def callTable(lang0: String, fn: String, body: String,
      rows: Seq[Seq[Any]], schema: StructType): Seq[Seq[Seq[Any]]] = {
    if (rows.isEmpty) return Seq.empty
    val lang = normalize(lang0)
    (roundTrip(lang, fn, body, "table", rows) \ "results") match {
      case JArray(perInput) =>
        require(perInput.length == rows.length,
          s"embedded $lang UDTF '$fn' returned ${perInput.length} row " +
            s"sets for ${rows.length} inputs")
        perInput.map {
          case JArray(outRows) => outRows.map {
            case JArray(cells) =>
              require(cells.length == schema.length,
                s"embedded $lang UDTF '$fn' yielded ${cells.length} " +
                  s"columns, declared ${schema.length}")
              cells.lazyZip(schema.fields).map((c, f) => fromJ(c, f.dataType))
            case other => throw new RuntimeException(
              s"embedded $lang UDTF '$fn': malformed row $other")
          }
          case other => throw new RuntimeException(
            s"embedded $lang UDTF '$fn': malformed row set $other")
        }
      case _ => throw new RuntimeException(
        s"embedded $lang UDTF '$fn': malformed response")
    }
  }

  /** Single-row call — the expression-position path (pooled worker, one
    * pipe round-trip). Prefer [[EmbeddedUdf.applyBatched]] in hot
    * relational pipelines.
    */
  def call(lang: String, fn: String, body: String, args: Seq[Any],
      retType: DataType): Any =
    callBatch(lang, fn, body, Seq(args), retType).head

  /** True when the interpreter binary for `lang` is spawnable — specs
    * gate on this so a python-less deploy skips rather than fails.
    */
  def available(lang0: String): Boolean =
    try {
      val lang = normalize(lang0)
      val p = new ProcessBuilder(
        (command(lang).head +: (lang match {
          case "python" => Seq("-c", "pass")
          case _ => Seq("-e", "")
        })): _*).start()
      p.waitFor() == 0
    } catch { case _: Exception => false }

  /** The python worker: stdlib only; body is exec'd in a fresh module
    * namespace. For scalar/table functions it must define a callable
    * named `fn`; for aggregates it defines `create_state()`,
    * `accumulate(state, *args) -> state`, and optionally
    * `finish(state) -> result` (the reference's python.rs contract).
    */
  private val PythonRunner =
    """import sys, json
      |ns = {}
      |def enc(v):
      |    if isinstance(v, float):
      |        if v != v: return 'NaN'
      |        if v == float('inf'): return 'Infinity'
      |        if v == float('-inf'): return '-Infinity'
      |    return v
      |for line in sys.stdin:
      |    if not line.strip():
      |        continue
      |    try:
      |        req = json.loads(line)
      |        op = req['op']
      |        if op == 'def':
      |            g = {}
      |            exec(req['body'], g)
      |            if req['fn'] not in g and 'accumulate' not in g:
      |                raise NameError('body defines neither ' + req['fn'] +
      |                                ' nor accumulate')
      |            ns[req['fn']] = g
      |            out = {'ok': True}
      |        elif op == 'call':
      |            f = ns[req['fn']][req['fn']]
      |            out = {'results': [enc(f(*a)) for a in req['args']]}
      |        elif op == 'agg':
      |            g = ns[req['fn']]
      |            s = g['create_state']()
      |            for a in req['args']:
      |                s = g['accumulate'](s, *a)
      |            out = {'result': enc(g['finish'](s) if 'finish' in g else s)}
      |        else:
      |            f = ns[req['fn']][req['fn']]
      |            res = []
      |            for a in req['args']:
      |                rows = []
      |                for r in f(*a):
      |                    if isinstance(r, (list, tuple)):
      |                        rows.append([enc(x) for x in r])
      |                    else:
      |                        rows.append([enc(r)])
      |                res.append(rows)
      |            out = {'results': res}
      |    except Exception as e:
      |        out = {'error': type(e).__name__ + ': ' + str(e)}
      |    sys.stdout.write(json.dumps(out, allow_nan=False) + '\n')
      |    sys.stdout.flush()
      |""".stripMargin

  /** The node worker: scalar/table bodies define `function fn(...)`;
    * aggregate bodies define `create_state`/`accumulate`/[`finish`]
    * (the reference's quickjs.rs contract). BigInt results serialize
    * as decimal strings; non-finite numbers as their name strings.
    */
  private val JsRunner =
    """const readline = require('readline');
      |const ns = {};
      |const enc = (v) => {
      |  if (v === undefined) return null;
      |  if (typeof v === 'bigint') return v.toString();
      |  if (typeof v === 'number' && !isFinite(v)) return String(v);
      |  return v;
      |};
      |const rl = readline.createInterface({input: process.stdin, terminal: false});
      |rl.on('line', (line) => {
      |  if (!line.trim()) return;
      |  let out;
      |  try {
      |    const req = JSON.parse(line);
      |    if (req.op === 'def') {
      |      const g = new Function(req.body + `
      |;const __o = {};
      |try { __o[${JSON.stringify(req.fn)}] = eval(${JSON.stringify(req.fn)}); } catch (e) {}
      |for (const n of ['create_state', 'accumulate', 'finish']) {
      |  try { __o[n] = eval(n); } catch (e) {}
      |}
      |return __o;`)();
      |      if (typeof g[req.fn] !== 'function' &&
      |          typeof g.accumulate !== 'function')
      |        throw new Error('body defines neither function ' + req.fn +
      |          ' nor accumulate');
      |      ns[req.fn] = g;
      |      out = {ok: true};
      |    } else if (req.op === 'call') {
      |      const f = ns[req.fn][req.fn];
      |      if (!f) throw new Error('undefined function ' + req.fn);
      |      out = {results: req.args.map((a) => enc(f(...a)))};
      |    } else if (req.op === 'agg') {
      |      const g = ns[req.fn];
      |      let s = g.create_state();
      |      for (const a of req.args) s = g.accumulate(s, ...a);
      |      out = {result: enc(g.finish ? g.finish(s) : s)};
      |    } else {
      |      const f = ns[req.fn][req.fn];
      |      if (!f) throw new Error('undefined function ' + req.fn);
      |      out = {results: req.args.map((a) =>
      |        Array.from(f(...a)).map((r) =>
      |          Array.isArray(r) ? r.map(enc) : [enc(r)]))};
      |    }
      |  } catch (e) { out = {error: String((e && e.message) || e)}; }
      |  process.stdout.write(JSON.stringify(out) + '\n');
      |});
      |""".stripMargin
}

/** Session-registry bindings for embedded functions — shared by
  * `Engine` (CREATE FUNCTION/AGGREGATE statements, durable recovery)
  * and by code registering an embedded function programmatically.
  */
object EmbeddedRegistration {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}

  private def bind(spark: SparkSession, name: String, cls: Class[_],
      argTypes: Seq[DataType])(
      build: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), new ExpressionInfo(cls.getName, name),
      (children: Seq[Expression]) => {
        require(children.length == argTypes.length,
          s"$name expects ${argTypes.length} argument(s), " +
            s"got ${children.length}")
        build(children.zip(argTypes).map { case (c, t) =>
          if (c.resolved && c.dataType == t) c else Cast(c, t)
        })
      })

  def scalar(spark: SparkSession, name: String, lang: String, body: String,
      argTypes: Seq[DataType], retType: DataType): Unit =
    bind(spark, name, classOf[graft.plans.EmbeddedUdfCall], argTypes)(
      graft.plans.EmbeddedUdfCall(name, lang, body, argTypes, retType, _))

  def aggregate(spark: SparkSession, name: String, lang: String, body: String,
      argTypes: Seq[DataType], retType: DataType): Unit =
    bind(spark, name, classOf[graft.plans.EmbeddedAggCall], argTypes)(
      graft.plans.EmbeddedAggCall(name, lang, body, argTypes, retType, _))

  def table(spark: SparkSession, name: String, lang: String, body: String,
      argTypes: Seq[DataType], schema: StructType): Unit =
    bind(spark, name, classOf[graft.plans.EmbeddedGenerate], argTypes)(
      graft.plans.EmbeddedGenerate(name, lang, body, argTypes, schema, _))
}

/** Relational (vectorized) application of an embedded UDF — one worker
  * exchange per `batchSize` rows per partition-task, embarrassingly
  * parallel across partitions: the 100 TB path, mirroring
  * [[ExternalUdf.applyBatched]].
  */
object EmbeddedUdf {
  def applyBatched(df: DataFrame, lang: String, fn: String, body: String,
      inCols: Seq[String], outCol: String, retType: DataType,
      batchSize: Int = 512): DataFrame = {
    val outSchema = df.schema.add(outCol, retType, nullable = true)
    val idxs = inCols.map(df.schema.fieldIndex)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { chunk =>
        val args = chunk.map(r => idxs.map(i => r.get(i)))
        val res = EmbeddedUdfRuntime.callBatch(lang, fn, body, args, retType)
        chunk.lazyZip(res).map((r, v) => Row.fromSeq(r.toSeq :+ v))
      }
    }(Encoders.row(outSchema))
  }
}
