// Hosted under org.apache.spark.sql for the same reason as
// VecExpressions: the private[sql] ExpectsInputTypes contract and
// Column wrapping via the classic ExpressionUtils.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization (the WordPiece algorithm:
  * Wu et al. 2016, the tokenizer family behind BERT-class vocabularies)
  * as a native expression.
  *
  * Whitespace-split words tokenize independently: at each position the
  * LONGEST vocabulary piece matching the remaining characters is taken
  * (word-initial pieces match as-is, word-internal positions match
  * `##`-prefixed continuation pieces); a position with no matching
  * piece makes the WHOLE word `unk` — greedy, no backtracking, exactly
  * the reference algorithm (a word whose greedy path dead-ends is unk
  * even when a non-greedy split exists).
  *
  * Why native rather than composed: per-character longest-match over a
  * vocabulary is inherently imperative — the declarative spelling would
  * be an exploded per-character join against the vocab with a loop's
  * worth of window passes, shuffling the corpus per character. Here it
  * is a per-row projection (embarrassingly parallel, stream-safe,
  * pipelined inside whole-stage codegen via a reference-object call —
  * the same packaging Spark's own regexp expressions use). The vocab
  * lives once per task as shared immutable hash sets, not per row.
  *
  * The fixed-vocab design mirrors production tokenizers: training
  * (learning merges/pieces) happens on a word-frequency table that is
  * tiny next to the corpus; ENCODING is the 100-TB-scale operation,
  * and that is what this expression distributes.
  */
case class WordPieceTokens(child: Expression, vocab: Seq[String],
                           unk: String)
    extends UnaryExpression with ExpectsInputTypes {
  require(vocab.nonEmpty, "vocab must not be empty")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_tokens"

  // body → emitted piece, split by word-initial vs continuation; built
  // once per task (the expression object ships with the closure)
  @transient private lazy val startPieces: java.util.HashMap[String, UTF8String] = {
    val m = new java.util.HashMap[String, UTF8String]()
    vocab.filterNot(_.startsWith("##"))
      .foreach(p => m.put(p, UTF8String.fromString(p)))
    m
  }
  @transient private lazy val contPieces: java.util.HashMap[String, UTF8String] = {
    val m = new java.util.HashMap[String, UTF8String]()
    vocab.filter(_.startsWith("##"))
      .foreach(p => m.put(p.substring(2), UTF8String.fromString(p)))
    m
  }
  @transient private lazy val maxBody: Int =
    vocab.map(p => if (p.startsWith("##")) p.length - 2 else p.length).max
  @transient private lazy val unkU8: UTF8String = UTF8String.fromString(unk)

  private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  /** Public so generated code can call it via the reference object. */
  def tokenize(u: UTF8String): GenericArrayData = {
    val s = u.toString
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isSpace(s.charAt(i))) i += 1
      if (i < n) {
        var j = i
        while (j < n && !isSpace(s.charAt(j))) j += 1
        tokenizeWord(s, i, j, out)
        i = j
      }
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size)))
  }

  private def tokenizeWord(s: String, start: Int, end: Int,
                           out: java.util.ArrayList[UTF8String]): Unit = {
    val mark = out.size
    var p = start
    while (p < end) {
      val table = if (p == start) startPieces else contPieces
      var l = math.min(end - p, maxBody)
      var hit: UTF8String = null
      while (l >= 1 && hit == null) {
        hit = table.get(s.substring(p, p + l))
        if (hit == null) l -= 1
      }
      if (hit == null) {
        // greedy dead end or unknown characters: the whole word is unk
        while (out.size > mark) out.remove(out.size - 1)
        out.add(unkU8)
        return
      }
      out.add(hit)
      p += l
    }
  }

  override protected def nullSafeEval(a: Any): Any =
    tokenize(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // one virtual call per row through the shipped expression object —
      // the packaging Spark's own RegExpReplace uses; stays inside
      // whole-stage codegen
      val ref = ctx.addReferenceObj("wordpiece", this,
        classOf[WordPieceTokens].getName)
      s"${ev.value} = $ref.tokenize($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): WordPieceTokens =
    copy(child = newChild)
}

/** Column-API entry points for the native text expressions. */
object TextFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  def wordpiece_tokens(text: Column, vocab: Seq[String],
                       unk: String): Column =
    ExpressionUtils.column(
      WordPieceTokens(ExpressionUtils.expression(text), vocab, unk))
}
