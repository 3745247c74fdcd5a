package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FreqAgg, StringExprs, TextHashExprs, TopKAgg, VectorExprs}

/** SparkSessionExtensions entry point: registers the engine's native
  * functions so any session built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`) can call them from SQL
  * directly — the idiomatic registration path for a library
  * (SURVEY §7.3; the per-DataFrame `register()` calls remain for
  * sessions we don't construct).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes",
        "graft_shingle_hashes(text, n) - hashes of distinct word n-grams"),
      (es: Seq[Expression]) => TextHashExprs.ShingleHashes(es.head,
        es(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig",
        "graft_minhash_sig(hashes, k) - k-permutation MinHash signature"),
      (es: Seq[Expression]) => TextHashExprs.MinHashSig(es.head,
        es(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(text) - 64-bit SimHash"),
      (es: Seq[Expression]) => TextHashExprs.SimHash64(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_shingle_strings"),
      info("graft_shingle_strings",
        "graft_shingle_strings(text, n) - distinct word n-gram strings"),
      (es: Seq[Expression]) => TextHashExprs.ShingleStrings(es.head,
        es(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("graft_dot_f64"),
      info("graft_dot_f64",
        "graft_dot_f64(a, b) - sequential double-array dot product"),
      (es: Seq[Expression]) => VectorExprs.DotF64(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_shingle_window_hashes"),
      info("graft_shingle_window_hashes",
        "graft_shingle_window_hashes(text, n) - positional window hashes"),
      (es: Seq[Expression]) => TextHashExprs.ShingleWindowHashes(es.head,
        es(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("graft_masked_pos_hashes"),
      info("graft_masked_pos_hashes",
        "graft_masked_pos_hashes(s) - per-position masked blocking keys"),
      (es: Seq[Expression]) => StringExprs.MaskedPosHashes(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_hamming_dist"),
      info("graft_hamming_dist",
        "graft_hamming_dist(a, b) - byte Hamming distance (MaxValue on " +
          "length mismatch)"),
      (es: Seq[Expression]) => StringExprs.HammingDist(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_topk_by_score"),
      info("graft_topk_by_score",
        "graft_topk_by_score(score, id, k) - bounded-heap top-k aggregate"),
      (es: Seq[Expression]) => TopKAgg.TopKByScore(es.head, es(1),
        es(2).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("graft_misra_gries"),
      info("graft_misra_gries",
        "graft_misra_gries(item, k) - Misra-Gries frequent-item candidates"),
      (es: Seq[Expression]) => FreqAgg.MisraGries(es.head,
        es(1).eval().asInstanceOf[Number].intValue())))
  }
}
