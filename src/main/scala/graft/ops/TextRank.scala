package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** TextRank keyword scoring — weighted PageRank over the corpus
  * word-adjacency graph (Mihalcea & Tarau 2004; the PageRank core is
  * Brin & Page 1998). The reference corpus pipeline scores documents;
  * this scores the VOCABULARY: which words sit at the center of the
  * corpus's co-occurrence structure — the graph-native complement to
  * frequency (t_heavy_hitters) and tf-idf (t_idf_keywords) keyword
  * extraction.
  *
  * Graph: adjacent word pairs (w_i, w_{i+1}) within a document,
  * symmetrized (undirected), self-loops dropped, edge weight = global
  * co-occurrence count. Rank iteration (damping d = 0.85):
  *
  *   r'(v) = (1 - d) + d * Σ_{u ∈ N(v)} w(u,v) / outw(u) * r(u)
  *
  * **Exactness contract: all rank arithmetic is scaled-integer.**
  * Ranks live as integers scaled by 1e12; each edge contribution is
  * the exact integer quotient `(r * w * 85) div (outw * 100)`
  * (products in DECIMAL(38,0) — they exceed 64 bits for hub words).
  * Integer sums are associative, so the result is bit-identical
  * regardless of partitioning, task order, or engine — a DuckDB
  * oracle unrolling the same iterations over HUGEINTs reproduces
  * every rank exactly, which no floating-point formulation survives
  * (Σ double is order-dependent at 1 ulp, and 5 iterations compound
  * it past any rounding tolerance).
  *
  * Scale shape (100 TB corpus): the heavy work is the ONE edge
  * aggregation — O(corpus tokens) rows shuffled once on (a, b) and
  * checkpointed hash-partitioned by source word `a`. Each of the K
  * iterations then joins the vocab-sized rank table (millions of
  * rows, NOT corpus-sized) against that pre-partitioned edge list —
  * only the rank side shuffles — and re-aggregates per destination.
  * Rank state never touches the driver; no broadcast is forced (the
  * vocabulary of a web-scale corpus is too big to broadcast — the
  * join election is left to size estimation/AQE).
  */
object TextRank {

  private val Scale = 1000000000000L            // 1e12: integer rank scale
  private val Base  = 150000000000L             // (1 - 0.85) * Scale

  private def dec(c: Column): Column = c.cast(DecimalType(38, 0))

  /** (term, score) top-`topK` by final rank, rank-desc then term-asc.
    * `textCol` is tokenized with [[TextOps.words]] (the corpus-wide
    * tokenization contract shared by every text operator).
    */
  def keywords(docs: DataFrame, textCol: String = "text",
               iterations: Int = 5, topK: Int = 20): DataFrame = {
    require(iterations >= 1 && topK >= 1, "iterations and topK must be positive")
    val w = docs.select(TextOps.words(col(textCol)).as("ws"))
      .where(size(col("ws")) >= 2)
    // adjacent pairs via one sequence/transform pass (0-based ws[i])
    val pairs = w
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] AS a, ws[i] AS b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .where(col("a") =!= col("b"))
    val und = pairs.unionByName(pairs.select(col("b").as("a"), col("a").as("b")))
    // THE corpus-sized shuffle, paid once; checkpointed partitioned by
    // the join key so every iteration's join reuses the layout and
    // shuffles only the vocab-sized rank table
    val edges = und.groupBy(col("a"), col("b")).agg(count(lit(1)).as("w"))
    val adj = edges
      .join(edges.groupBy(col("a")).agg(sum(col("w")).as("outw")), Seq("a"))
      .repartition(col("a"))
      .localCheckpoint()
    // symmetric construction ⇒ every vertex appears as both source and
    // destination ⇒ the rank domain is stable across iterations
    var ranks = adj.select(col("a").as("term")).distinct()
      .select(col("term"), dec(lit(Scale)).as("r"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      ranks = adj.join(ranks, adj("a") === ranks("term"))
        // exact integer quotient (SQL `div`); products need > 64 bits
        // for hub words, hence the DECIMAL(38,0) operands
        .select(col("b"), expr(
          "(CAST(r AS DECIMAL(38,0)) * CAST(w AS DECIMAL(38,0)) * 85) div " +
            "(CAST(outw AS DECIMAL(38,0)) * 100)").as("c"))
        .groupBy(col("b"))
        .agg((lit(Base) + sum(dec(col("c")))).as("r"))
        .select(col("b").as("term"), dec(col("r")).as("r"))
        .localCheckpoint() // constant-size plan per iteration
    }
    ranks
      .orderBy(col("r").desc, col("term"))      // exact-integer tiebreak
      .limit(topK)
      .select(col("term"),
        round(col("r").cast("double") / lit(1.0e12), 6).as("score"))
  }
}
