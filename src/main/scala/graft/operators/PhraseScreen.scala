package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern phrase screening — the curation gate that asks "which
  * of these P phrases appear in each document" (blocklists, contamination
  * probes, policy screens) without paying a per-phrase pass.
  *
  * Scale shape: a built-in formulation is a docs × phrases substring
  * join — P·N `contains` evaluations, each rescanning the document. An
  * Aho–Corasick automaton built driver-side from the bounded phrase
  * list and shipped in the task closure matches ALL phrases in ONE
  * linear scan per document: O(|text| + hits) per doc, independent of
  * P. The corpus is touched once, nothing shuffles until the caller
  * aggregates. (The phrase list is driver-bounded by construction —
  * screening lists are curated artifacts, thousands at most, the same
  * boundedness contract as the BPE word table.)
  *
  * Reference anchor: the reference engine has no multi-pattern screen;
  * this extends its filter family (cluster.py's equality filters) the
  * way a 100 TB curation pipeline needs.
  */
object PhraseScreen extends Serializable {

  /** Aho–Corasick automaton over exact substrings. Immutable after
    * construction; safe to serialize into task closures. Matching is
    * case-sensitive and byte-exact — normalization is the caller's
    * preprocessing decision, not hidden in here. */
  final class Automaton(val phrases: IndexedSeq[String])
      extends Serializable {
    require(phrases.nonEmpty, "empty phrase list")
    require(phrases.forall(_.nonEmpty), "empty phrase")
    require(phrases.distinct.size == phrases.size, "duplicate phrases")

    // trie as growable parallel arrays: children maps, fail links, and
    // the phrase indices that END at each node (after fail-closure)
    private val children =
      scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.Map.empty[Char, Int])
    private val out =
      scala.collection.mutable.ArrayBuffer(List.empty[Int])
    phrases.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { ch => node = childOrNew(node, ch) }
      out(node) ::= pi
    }
    private def childOrNew(node: Int, ch: Char): Int =
      children(node).get(ch) match {
        case Some(n) => n
        case None =>
          children += scala.collection.mutable.Map.empty[Char, Int]
          out += Nil
          val n = children.size - 1
          children(node).update(ch, n)
          n
      }

    private val fail = new Array[Int](children.size)
    locally {
      val queue = scala.collection.mutable.Queue.empty[Int]
      children(0).valuesIterator.foreach { c => fail(c) = 0; queue += c }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        children(u).foreach { case (ch, v) =>
          var f = fail(u)
          while (f != 0 && !children(f).contains(ch)) f = fail(f)
          fail(v) = if (children(f).contains(ch) && children(f)(ch) != v)
            children(f)(ch) else 0
          out(v) = out(v) ++ out(fail(v)) // fail-closure of outputs
          queue += v
        }
      }
    }

    /** Distinct indices of phrases occurring anywhere in `text`. */
    def matches(text: String): Set[Int] = {
      if (text == null) return Set.empty
      val found = scala.collection.mutable.Set.empty[Int]
      var node = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (node != 0 && !children(node).contains(ch)) node = fail(node)
        node = children(node).getOrElse(ch, 0)
        out(node).foreach(found += _)
        i += 1
      }
      found.toSet
    }
  }

  /** Read a phrase-per-line blocklist file: trims, drops blank lines,
    * and dedupes (a repeated or whitespace-variant line must not trip
    * the Automaton's duplicate-phrases require — screening a phrase
    * once is the obvious intent). Leak-free via Using. */
  def loadPhrases(path: String): Seq[String] =
    scala.util.Using.resource(scala.io.Source.fromFile(path)) { src =>
      src.getLines().map(_.trim).filter(_.nonEmpty).toSeq.distinct
    }

  /** Screen every document against the phrase list: returns (idCol,
    * hits, n_hits) with `hits` the SORTED distinct matched phrases
    * (empty array when clean) — deterministic, content-pure, and
    * replayable in ANSI SQL as a contains-join, which is exactly how
    * the oracle checks it. */
  def screen(docs: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    val auto = new Automaton(phrases.toIndexedSeq)
    val hitsUdf = udf((text: String) =>
      auto.matches(text).toSeq.map(auto.phrases).sorted)
    docs.select(col(idCol), hitsUdf(col(textCol)).as("hits"))
      .withColumn("n_hits", size(col("hits")).cast("long"))
  }
}
