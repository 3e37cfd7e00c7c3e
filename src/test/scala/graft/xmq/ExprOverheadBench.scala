package graft.xmq

import graft.synth.SourceFiles
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.StringType

/** Quantifies the CodegenFallback interpreter overhead for the hottest xmq
  * expressions: evaluating through the Expression (virtual eval, InternalRow
  * getters, UTF8String round-trips) vs calling the underlying function
  * directly on pre-extracted strings. doGenCode could at best remove the
  * expression-layer share; if that share is <10% the payload is
  * algorithm-bound and codegen is not worth the bytecode (VERDICT r2 #7).
  *
  * Test/runMain graft.xmq.ExprOverheadBench [rows] [reps]
  */
object ExprOverheadBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    val reps = if (args.length > 1) args(1).toInt else 5
    val rows = SourceFiles.generate(n, seed = 42)
    val contents = rows.map(r => UTF8String.fromString(r.content)).toArray
    val langs = rows.map(r => UTF8String.fromString(r.lang)).toArray
    val irows: Array[InternalRow] =
      contents.indices.map(i => InternalRow(contents(i), langs(i)): InternalRow).toArray
    val rawContent = rows.map(_.content).toArray
    val rawLang = rows.map(_.lang).toArray

    def time(f: () => Long): Double = {
      f() // warmup
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        val sink = f()
        val s = (System.nanoTime() - t0) / 1e9
        if (sink == Long.MinValue) println("?") // keep the sink live
        if (s < best) best = s
      }
      best
    }

    def report(name: String, expr: Expression, raw: Int => Long): Unit = {
      val viaExpr = time { () =>
        var acc = 0L; var i = 0
        while (i < irows.length) {
          val v = expr.eval(irows(i))
          acc += (if (v == null) 0 else v.hashCode())
          i += 1
        }
        acc
      }
      val direct = time { () =>
        var acc = 0L; var i = 0
        while (i < rawContent.length) { acc += raw(i); i += 1 }
        acc
      }
      val overhead = (viaExpr - direct) / viaExpr * 100
      println(f"$name%-16s expr=${viaExpr}%.3fs direct=${direct}%.3fs layer=${overhead}%.1f%% of total")
    }

    val c0 = BoundReference(0, StringType, nullable = true)
    val l0 = BoundReference(1, StringType, nullable = true)

    report("roundtrip_ok", graft.expr.XmqRoundTripOk(c0, l0),
      i => if (graft.expr.XmqExprs.roundtrip(rawContent(i), rawLang(i)) == rawContent(i)) 1L else 0L)
    report("tokenize", graft.expr.XmqTokenize(c0), { i =>
      // materialize the same (type, text, line, col) token list the
      // expression returns, minus the Catalyst row/UTF8String wrapping
      val bytes = rawContent(i).getBytes("UTF-8")
      val toks = scala.collection.mutable.ArrayBuffer.empty[(String, String, Int, Int)]
      val sink = new TokenSink {
        def token(tpe: String, line: Int, col: Int, start: Int, stop: Int, suffix: Int): Unit =
          toks += ((tpe, new String(bytes, start, stop - start, "UTF-8"), line, col))
      }
      try new XmqTokenizer(bytes, sink).tokenize()
      catch { case _: Exception => } // non-xmq rows fail like the expression's null
      toks.length.toLong
    })
    report("simhash", graft.pipeline.SimHashExpr(c0),
      i => graft.pipeline.TextOps.simHash(rawContent(i)))
  }
}
