package graft.tools

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Reference implementation of the external-UDF server side (the thing
  * a user hosts behind `CREATE FUNCTION … USING LINK`; the reference
  * ships example UDF servers the same way, e.g.
  * e2e_test/udf/test.py for its Arrow Flight protocol). Speaks the
  * newline-JSON protocol of [[graft.functions.ExternalUdfClient]]:
  * one request line {"fn":…,"args":[[…],…]} → one response line
  * {"results":[…]} | {"error":…}. Multi-connection (thread per
  * client), batch-at-a-time, restartable.
  *
  * `builtins` carries demo functions used by specs and the
  * `q_external_udf` oracle query; `main` serves them on a fixed port
  * for manual testing against a live engine.
  */
object UdfServe {

  type Fn = List[JValue] => JValue

  private def numL(j: JValue): Long = j match {
    case JLong(l) => l
    case JInt(i) => i.toLong
    case JDouble(d) => d.toLong
    case JDecimal(d) => d.toLong
    case other => throw new IllegalArgumentException(s"not a number: $other")
  }

  private def numD(j: JValue): Double = j match {
    case JLong(l) => l.toDouble
    case JInt(i) => i.toDouble
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case other => throw new IllegalArgumentException(s"not a number: $other")
  }

  val builtins: Map[String, Fn] = Map(
    "gcd" -> { args =>
      if (args.contains(JNull)) JNull
      else JLong(BigInt(numL(args(0))).gcd(BigInt(numL(args(1)))).toLong)
    },
    "rev_upper" -> {
      case JString(s) :: Nil => JString(s.reverse.toUpperCase)
      case JNull :: Nil => JNull
      case other => throw new IllegalArgumentException(s"not a string: $other")
    },
    "halve" -> {
      case JNull :: Nil => JNull
      case j :: Nil => JDouble(numD(j) / 2.0)
      case other => throw new IllegalArgumentException(s"one arg expected: $other")
    })

  final class Running(fns: Map[String, Fn], port0: Int) {
    private val socket = new ServerSocket(port0)
    def port: Int = socket.getLocalPort
    def link: String = s"127.0.0.1:$port"
    @volatile private var running = true

    private val acceptThread = new Thread(() => {
      while (running) {
        try {
          val client = socket.accept()
          val t = new Thread(() => serve(client))
          t.setDaemon(true)
          t.start()
        } catch { case _: Exception => /* closed */ }
      }
    })
    acceptThread.setDaemon(true)
    acceptThread.start()

    private def serve(client: java.net.Socket): Unit = {
      val in = new BufferedReader(new InputStreamReader(
        client.getInputStream, StandardCharsets.UTF_8))
      val out = new BufferedWriter(new OutputStreamWriter(
        client.getOutputStream, StandardCharsets.UTF_8))
      try {
        var line = in.readLine()
        while (line != null) {
          val resp =
            try {
              val req = JsonMethods.parse(line)
              val JString(fnName) = (req \ "fn"): @unchecked
              val JArray(rows) = (req \ "args"): @unchecked
              val fn = fns.getOrElse(fnName,
                throw new IllegalArgumentException(s"unknown function $fnName"))
              JObject("results" -> JArray(rows.map {
                case JArray(args) => fn(args)
                case _ => JNull
              }))
            } catch {
              case e: Exception => JObject("error" -> JString(
                Option(e.getMessage).getOrElse(e.toString)))
            }
          out.write(JsonMethods.compact(JsonMethods.render(resp)))
          out.write("\n"); out.flush()
          line = in.readLine()
        }
      } catch { case _: Exception => }
      finally client.close()
    }

    def stop(): Unit = { running = false; socket.close() }
  }

  /** Start on an ephemeral (or given) port; daemon threads throughout. */
  def start(fns: Map[String, Fn] = builtins, port: Int = 0): Running =
    new Running(fns, port)

  def main(args: Array[String]): Unit = {
    val srv = start(port = args.headOption.map(_.toInt).getOrElse(8816))
    println(s"graft UDF server listening on ${srv.link} " +
      s"(functions: ${builtins.keys.toSeq.sorted.mkString(", ")})")
    Thread.currentThread.join()
  }
}
