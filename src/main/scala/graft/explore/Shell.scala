package graft.explore

import java.io.BufferedReader

import org.apache.spark.sql.SparkSession

/** The interactive graph-exploration shell — the analog of the reference's
  * jshell front-end (`graph_explore_load_graph.jsh` loads a graph and hands
  * the user a `GraphExplorer` with pywebgraph-style commands `cn`/`pwn`/
  * `ls`/`sl`, `GraphExplorer.java:99-186`, plus file import/export,
  * `GraphExplorer.java:189-313`). The engine surface it fronts is entirely
  * [[GraphSession]]; this class is ONLY the command loop — parse a line,
  * dispatch, print — so it stays a UI shell, not a second query path.
  *
  * Commands (one per line; vertex = numeric id or reversed label):
  * {{{
  *   cn <vertex>         change the current working node, print it
  *   pwn                 print the current working node
  *   ls [vertex]         successors (outgoing links) as `%d: %s` lines
  *   sl [vertex]         predecessors (incoming links)
  *   outdegree|indegree [vertex]
  *   tld <label>         TLD frequency of the vertex's successors
  *   prefix <p>          vertices whose reversed label starts with p
  *   shared <id,id,...> <min> <max>   k-of-n shared successors
  *   load <file>         load a vertex set (one label per line) as the
  *                       working set; unknown labels dropped, order kept
  *   save <file>         save the working set, one line per id
  *   set                 print the working set
  *   stats               vertex/edge counts
  *   help                this text
  *   exit | quit
  * }}}
  */
class Shell(g: GraphSession, in: BufferedReader, out: java.io.PrintStream) {

  private var workingSet: Seq[Long] = Seq.empty

  private def vertexOf(tok: String): Option[Long] =
    if (tok.nonEmpty && tok.forall(_.isDigit))
      // validate numeric ids against the graph too, so `cn 999` reports
      // "not found" exactly like an unknown label instead of silently
      // setting a dangling working node
      tok.toLongOption.filter(id => g.vertexIdToLabel(id).isDefined)
    else g.vertexLabelToId(tok)

  private def printVertices(ids: Seq[Long]): Unit =
    g.formatVertices(ids).foreach(out.println)

  private def printCurrent(): Unit = g.pwn() match {
    case Some((id, label)) => out.println(s"#$id\t$label")
    case None => out.println("no working node set — use `cn <vertex>`")
  }

  /** Dispatch one command line; returns false when the loop should stop. */
  def dispatch(line: String): Boolean = {
    val toks = line.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    toks match {
      case Seq() => true
      case Seq("exit") | Seq("quit") => false
      case Seq("help") => out.println(Shell.help); true
      case Seq("cn", v) =>
        vertexOf(v) match {
          case Some(id) => g.cn(id); printCurrent()
          case None => out.println(s"vertex `$v` not found")
        }
        true
      case Seq("pwn") => printCurrent(); true
      case Seq("ls") => printVertices(g.ls()); true
      case Seq("ls", v) =>
        vertexOf(v).fold(out.println(s"vertex `$v` not found"))(id => printVertices(g.ls(id)))
        true
      case Seq("sl") => printVertices(g.sl()); true
      case Seq("sl", v) =>
        vertexOf(v).fold(out.println(s"vertex `$v` not found"))(id => printVertices(g.sl(id)))
        true
      case Seq("outdegree") =>
        g.pwn().fold(printCurrent())(c => out.println(g.outdegree(c._1)))
        true
      case Seq("outdegree", v) =>
        vertexOf(v).fold(out.println(s"vertex `$v` not found"))(id => out.println(g.outdegree(id)))
        true
      case Seq("indegree") =>
        g.pwn().fold(printCurrent())(c => out.println(g.indegree(c._1)))
        true
      case Seq("indegree", v) =>
        vertexOf(v).fold(out.println(s"vertex `$v` not found"))(id => out.println(g.indegree(id)))
        true
      case Seq("tld", label) =>
        if (g.vertexLabelToId(label).isEmpty) out.println(s"vertex `$label` not found")
        else g.successorTldCounts(label).collect()
          .foreach(r => out.println(s"${r.get(1)}\t${r.get(0)}"))
        true
      case Seq("prefix", p) =>
        g.prefix(p).collect().foreach(r => out.println(s"#${r.get(0)}\t${r.get(1)}"))
        true
      case Seq("shared", ids, min, max) =>
        val idSeq = ids.split(",").toSeq.flatMap(vertexOf)
        printVertices(g.sharedSuccessors(idSeq, min.toInt, max.toInt))
        true
      case Seq("load", file) =>
        workingSet = g.loadVerticesFromFile(file)
        out.println(s"loaded ${workingSet.size} vertices")
        true
      case Seq("save", file) =>
        g.saveVerticesToFile(workingSet, file)
        out.println(s"saved ${workingSet.size} vertices to $file")
        true
      case Seq("set") => printVertices(workingSet); true
      case Seq("stats") =>
        out.println(s"vertices: ${g.vertices.count()}\tedges: ${g.edges.count()}")
        true
      case other =>
        out.println(s"unknown command: ${other.mkString(" ")} — `help` lists commands")
        true
    }
  }

  def runLoop(): Unit = {
    var go = true
    while (go) {
      out.print("graft> ")
      out.flush()
      val line = in.readLine()
      // a bad command argument (unknown label reaching an engine call, a
      // non-numeric count, an unreadable file) must not kill the session —
      // report and re-prompt, like any shell
      go = line != null && (try dispatch(line) catch {
        case e: Exception => out.println(s"error: ${e.getMessage}"); true
      })
    }
  }
}

object Shell {
  val help: String =
    """cn <vertex> | pwn | ls [vertex] | sl [vertex] | outdegree [v] | indegree [v]
      |tld <label> | prefix <p> | shared <id,..> <min> <max>
      |load <file> | save <file> | set | stats | help | exit""".stripMargin

  /** `sbt "runMain graft.explore.Shell <verticesParquet> <edgesParquet>"` —
    * the `graph_explore_load_graph.jsh` analog: load the graph, hand the
    * user the command loop.
    */
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: Shell <vertices.parquet> <edges.parquet>")
    val spark = graft.Graft.session()
    import org.apache.spark.sql.functions.col
    val g = new GraphSession(
      spark.read.parquet(args(0))
        .select(col("id").cast("long").as("id"), col("rev_name")),
      spark.read.parquet(args(1))
        .select(col("from_id").cast("long").as("from_id"),
                col("to_id").cast("long").as("to_id"))).cache()
    new Shell(g, new BufferedReader(new java.io.InputStreamReader(System.in)),
      System.out).runLoop()
    spark.stop()
  }
}
