package graft

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}

import org.scalatest.funsuite.AnyFunSuite

import graft.explore.{GraphSession, Shell}

/** The interactive shell front-end (`graph_explore_load_graph.jsh` +
  * `GraphExplorer.java:99-186` command loop): scripted input in, captured
  * output out — every command dispatches to the already-spec-pinned
  * [[GraphSession]] surface.
  */
class ShellSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(script: String): String = {
    val v = Seq((0L, "com.a"), (1L, "com.b"), (2L, "com.c")).toDF("id", "rev_name")
    val e = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("from_id", "to_id")
    val g = new GraphSession(v, e)
    val bytes = new ByteArrayOutputStream()
    val out = new PrintStream(bytes, true, "UTF-8")
    new Shell(g, new BufferedReader(new StringReader(script)), out).runLoop()
    bytes.toString("UTF-8")
  }

  test("cn/pwn/ls/sl command loop (pywebgraph semantics)") {
    val outText = run("cn com.a\nls\ncn 2\nsl\npwn\nbogus\nexit\n")
    // cn prints the working node (GraphExplorer.cn calls pwn())
    assert(outText.contains("#0\tcom.a"))
    // ls of com.a: successors com.b, com.c as `%d: %s` listing lines
    assert(outText.contains("0: com.b") && outText.contains("1: com.c"))
    // cn 2 + sl: predecessors of com.c are com.a, com.b
    assert(outText.contains("#2\tcom.c"))
    assert(outText.contains("0: com.a") && outText.contains("1: com.b"))
    assert(outText.contains("unknown command: bogus"))
  }

  test("working-set load/save round-trip and stats") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shell")
    val f = s"$dir/set.txt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(f), "com.c\ncom.a\n")
    val f2 = s"$dir/out.txt"
    val outText = run(s"load $f\nset\nsave $f2\nstats\nquit\n")
    assert(outText.contains("loaded 2 vertices"))
    assert(outText.contains("0: com.c") && outText.contains("1: com.a"))
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(f2)) == "com.c\ncom.a\n")
    assert(outText.contains("vertices: 3\tedges: 3"))
  }

  test("outdegree/indegree print the exact count and nothing else") {
    // isolated scripts with full-output equality (prompt stripped) — a
    // stray '2' elsewhere in a combined transcript can no longer satisfy
    // the assertion (ADVICE r5)
    def answers(script: String): Seq[String] =
      run(script).linesIterator.map(_.stripPrefix("graft> ")).filter(_.nonEmpty).toSeq
    assert(answers("outdegree 0\nquit\n") == Seq("2"))
    assert(answers("indegree com.c\nquit\n") == Seq("2"))
    // by-label and by-id lookups agree
    assert(answers("outdegree com.a\nquit\n") == Seq("2"))
    assert(answers("indegree 2\nquit\n") == Seq("2"))
  }
}
