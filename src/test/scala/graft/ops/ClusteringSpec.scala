package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-5 item #1: distributed connected components / keep-list over
  * near-dup edge tables. Pins (a) correctness against a union-find brute
  * force on seeded random graphs, (b) the O(log diameter) round bound of
  * min-label propagation WITH pointer jumping (chains up to 1024 would need
  * ~512 rounds without the jump), (c) canonical keep semantics on the
  * chained-corpus fixture the q62 gate uses.
  */
class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("path graphs: correct components in O(log diameter) rounds") {
    for (d <- Seq(4, 16, 64, 256, 1024)) {
      val verts = spark.range(0, d + 1).select(col("id").as("doc_id"))
      val edges = spark.range(0, d).select(col("id").as("doc_a"),
        (col("id") + 1).as("doc_b"))
      val (labels, rounds) = Clustering.connectedComponentsWithRounds(
        verts, edges)
      val comps = labels.select("component").distinct().collect()
      assert(comps.length === 1 && comps.head.getLong(0) === 0L,
        s"path $d: all vertices must label to the min id 0")
      val bound = 2 * (64 - java.lang.Long.numberOfLeadingZeros(d.toLong)) + 3
      assert(rounds <= bound,
        s"path $d: $rounds rounds exceeds the O(log d) bound $bound")
    }
  }

  test("seeded random graphs match union-find brute force") {
    def find(parent: Array[Int], x: Int): Int =
      if (parent(x) == x) x else { parent(x) = find(parent, parent(x)); parent(x) }
    for (trial <- 0 until 20) {
      val n = 12 + (graft.model.Synth.mix64(trial).toInt & 31) // 12..43
      val edges = (for {
        a <- 0 until n; b <- a + 1 until n
        if java.lang.Long.remainderUnsigned(
          graft.model.Synth.mix64(trial * 100003L + a * 131L + b), 23L) == 0L
      } yield (a.toLong, b.toLong)).toSeq
      val verts = spark.range(0, n).select(col("id").as("doc_id"))
      val edf = edges.toDF("doc_a", "doc_b")
      val got = Clustering.connectedComponents(verts, edf)
        .collect().map(r => r.getLong(0).toInt -> r.getLong(1).toInt).toMap
      val p = Array.tabulate(n)(identity)
      edges.foreach { case (a, b) => p(find(p, a.toInt)) = find(p, b.toInt) }
      val want = (0 until n).map { v =>
        val root = find(p, v)
        v -> (0 until n).filter(find(p, _) == root).min
      }.toMap
      assert(got === want, s"trial $trial (n=$n, ${edges.length} edges)")
    }
  }

  test("keepList on the chained corpus: one keep per chain, singletons keep " +
    "themselves, chains cluster transitively") {
    val docs = graft.model.Synth.chainDocs(spark, 6)
    val edges = graft.SparkEntry.q62Edges(docs)
    // fixture contract: at least the per-group chain edges v0—v1, v1—v2
    // exist and no cross-group edge does
    val e = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(e.forall { case (a, b) => a / 3 == b / 3 || (a >= 18 || b >= 18) })
    for (g <- 0L until 6L)
      assert(e.contains((3 * g, 3 * g + 1)) && e.contains((3 * g + 1, 3 * g + 2)))
    val kl = Clustering.keepList(docs.select("doc_id"), edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // every chain doc labels to its group's v0; exactly v0 keeps
    kl.filter(_._1 < 18).foreach { case (id, comp, keep) =>
      assert(comp === (id / 3) * 3, s"doc $id component")
      assert(keep === (id % 3 == 0), s"doc $id keep flag")
    }
    // singleton docs (no edges) keep themselves
    kl.filter(_._1 >= 18).foreach { case (id, comp, keep) =>
      assert(comp === id && keep)
    }
  }

  test("keepListBy: best score wins the component, ties break to min id") {
    import spark.implicits._
    // two components {0,1,2} and {10,11}, plus singleton 20
    val verts = Seq(0L, 1L, 2L, 10L, 11L, 20L).toDF("doc_id")
    val edges = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("doc_a", "doc_b")
    // 1 outscores its peers; 10 and 11 TIE → min id 10 must win
    val scores = Seq((0L, 5L), (1L, 9L), (2L, 7L), (10L, 4L), (11L, 4L),
      (20L, 1L)).toDF("doc_id", "score")
    val got = Clustering.keepListBy(verts, scores, edges)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(0L) === ((0L, 5L, 1L, false)))
    assert(got(1L) === ((0L, 9L, 1L, true)))
    assert(got(2L) === ((0L, 7L, 1L, false)))
    assert(got(10L) === ((10L, 4L, 10L, true)))
    assert(got(11L) === ((10L, 4L, 10L, false)))
    assert(got(20L) === ((20L, 1L, 20L, true)))
    // partition invariance: integer argmax is order-independent
    val rep = Clustering.keepListBy(verts.repartition(5),
        scores.repartition(3), edges.repartition(2))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(rep === got.map { case (k, v) => (k, v._3) })
  }

  test("keepListBy on the chained corpus picks the LONGEST copy, not the " +
    "min id") {
    val docs = graft.model.Synth.chainDocs(spark, 4)
    val edges = graft.SparkEntry.q62Edges(docs)
    val scores = docs.select(col("doc_id"),
      length(col("text")).cast("long").as("score"))
    val got = Clustering.keepListBy(docs.select("doc_id"), scores, edges)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
    val lens = docs.select(col("doc_id"), length(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.filter(_._1 < 12).foreach { case (id, keepId, isKeep) =>
      val g = id / 3
      val best = (3 * g to 3 * g + 2).maxBy(i => (lens(i), -i))
      assert(keepId === best, s"doc $id: keep must be the longest copy")
      assert(isKeep === (id == best))
      // the whole point: the longest chain copy is NOT the min-id rep
      assert(best !== 3 * g, s"fixture must make quality-keep differ")
    }
  }
}
