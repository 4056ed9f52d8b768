package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE apply: `graft_bpe_encode(token, merges)` returns the
  * ARRAY<STRING> of byte-pair-encoding pieces of `token` under the merge
  * table `merges` (ARRAY<STRING> of `'a b'` pair rows, rank = array
  * position, must be foldable — it is the tokenizer, not data).
  *
  * This is the production-shape apply half of [[graft.ops.TextOps]]'s BPE
  * surface (Sennrich et al., ACL 2016). The SQL fold q82 ships
  * ([[graft.ops.TextOps.bpeMergedExpr]]) splices one `replace()` per rank
  * into the expression tree — exact, but O(ranks × len) per token and
  * unusable at real tokenizer scale (a 50k-merge GPT table would mean a
  * 50k-deep expression). This expression instead applies the standard
  * greedy algorithm every production tokenizer uses: split the token into
  * code points, then repeatedly merge the LOWEST-RANK adjacent pair
  * present (left-to-right within a rank) until no adjacent pair is in the
  * table — O(len²) scans per token, INDEPENDENT of table size, with the
  * table built once per plan and shipped as a codegen reference object.
  *
  * Equivalence contract (pinned in PropertySpec): for a VALID merge table
  * — one where each rank's two operand pieces are base characters or
  * outputs of strictly earlier ranks, which is every table a BPE trainer
  * can emit — lowest-rank-first equals the fold's rank-by-rank pass.
  * Sketch: merging rank r's pair creates only adjacencies that involve
  * rank r's output piece; any table pair containing that piece must have
  * been learned after rank r, so no merge ever re-enables a rank below
  * the current one, and the applied-rank sequence is non-decreasing —
  * exactly the fold's order. (The fold's reserved-`'~'` delimiter
  * constraint does not apply here: pieces are plain array elements, so
  * any corpus alphabet is fine.)
  *
  * Registered as SQL function `graft_bpe_encode` by
  * [[graft.GraftExtensions]].
  */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_bpe_encode merge table must be foldable (a constant " +
            "array) — it is the tokenizer definition, not per-row data")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_encode expects (STRING, ARRAY<STRING>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe_encode"

  /** pair → rank, built once from the foldable table (first occurrence of
    * a pair wins, mirroring the fold: a later duplicate rank can never
    * fire because the earlier one already merged every occurrence).
    * Transient: rebuilt lazily after executor-side deserialization. */
  @transient private lazy val table: java.util.HashMap[String, Integer] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    require(arr != null, "graft_bpe_encode merge table must not be NULL")
    val t = new java.util.HashMap[String, Integer](arr.numElements() * 2)
    var i = 0
    while (i < arr.numElements()) {
      require(!arr.isNullAt(i),
        s"graft_bpe_encode merge table contains NULL at rank $i")
      val row = arr.getUTF8String(i).toString
      val sp = row.indexOf(' ')
      require(sp > 0 && sp < row.length - 1 && row.indexOf(' ', sp + 1) < 0,
        s"merge rank $i must be 'a b' (two space-separated pieces): '$row'")
      t.putIfAbsent(row, Integer.valueOf(i))
      i += 1
    }
    t
  }

  override def nullSafeEval(t: Any, m: Any): Any =
    BpeEncode.encode(t.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) => {
      val tbl = ctx.addReferenceObj("bpeTable", table,
        "java.util.HashMap<String, Integer>")
      s"${ev.value} = graft.expressions.BpeEncode.encode($t, $tbl);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncode =
    copy(left = newLeft, right = newRight)
}

object BpeEncode {

  /** Greedy BPE apply over one token: lowest-rank adjacent pair first,
    * all its occurrences merged left-to-right, until no adjacent pair is
    * in the table. Called from both interpreted eval and generated code
    * (via the class's static forwarder). */
  def encode(token: UTF8String,
             table: java.util.HashMap[String, Integer]): ArrayData = {
    val s = token.toString
    // split by CODE POINT — the same unit the fold's regexp '(.)' marks
    val pieces = new java.util.ArrayList[String](s.length)
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      val w = Character.charCount(cp)
      pieces.add(s.substring(ci, ci + w))
      ci += w
    }
    var done = pieces.size() < 2
    while (!done) {
      // find the lowest-rank pair present among current adjacencies
      var best = Integer.MAX_VALUE
      var i = 0
      while (i < pieces.size() - 1) {
        val r = table.get(pieces.get(i) + " " + pieces.get(i + 1))
        if (r != null && r.intValue() < best) best = r.intValue()
        i += 1
      }
      if (best == Integer.MAX_VALUE) done = true
      else {
        // merge ALL its occurrences in one left-to-right pass (disjoint
        // sites; a merged site is skipped past, replace() semantics)
        i = 0
        while (i < pieces.size() - 1) {
          val r = table.get(pieces.get(i) + " " + pieces.get(i + 1))
          if (r != null && r.intValue() == best) {
            pieces.set(i, pieces.get(i) + pieces.get(i + 1))
            pieces.remove(i + 1)
          }
          i += 1
        }
        done = pieces.size() < 2
      }
    }
    val out = new Array[AnyRef](pieces.size())
    var k = 0
    while (k < pieces.size()) {
      out(k) = UTF8String.fromString(pieces.get(k))
      k += 1
    }
    new GenericArrayData(out)
  }
}
