package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphAlgos

/** The round-16 small-graph driver fast paths must be VALUE-IDENTICAL
  * to the distributed algorithms they shortcut — same rows, same
  * types, for every operator that gained the hybrid gate. Each test
  * runs the same edge fixture through both paths (localEdgeThreshold =
  * 0 forces distributed; the default takes the driver path at this
  * size) and compares the full sorted result sets.
  */
class LocalFastPathSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  // two triangles sharing a node, a pendant chain, an isolated edge,
  // and a parallel/reversed duplicate — exercises dedup, symmetry,
  // multi-component handling, and non-trivial coreness/triangle counts
  private lazy val edges: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (3L, 4L), (4L, 5L), (5L, 3L),
      (5L, 6L), (6L, 7L),
      (10L, 11L),
      (2L, 1L), (1L, 2L) // duplicates in both orientations
    ).toDF("id_a", "id_b")
  }
  private def asSrcDst(df: DataFrame): DataFrame =
    df.withColumnRenamed("id_a", "src").withColumnRenamed("id_b", "dst")

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("connectedComponents: driver union-find ≡ star contraction") {
    val local = GraphAlgos.connectedComponents(edges)
    val dist = GraphAlgos.connectedComponents(edges, localEdgeThreshold = 0L)
    // names + types must agree; nullability may differ (a local Seq is
    // non-nullable where the distributed join is not — same as the
    // minLabelClusters dual-path contract)
    assert(local.schema.fieldNames.toSeq == dist.schema.fieldNames.toSeq)
    assert(local.schema.map(_.dataType) == dist.schema.map(_.dataType))
    assert(rowsOf(local) == rowsOf(dist))
  }

  test("kCoreness: driver H-index rounds ≡ distributed histogram rounds") {
    val local = GraphAlgos.kCoreness(edges, "id_a", "id_b", iters = 4)
    val dist = GraphAlgos.kCoreness(edges, "id_a", "id_b", iters = 4,
      localEdgeThreshold = 0L)
    assert(local.schema.fieldNames.toSeq == dist.schema.fieldNames.toSeq)
    assert(rowsOf(local) == rowsOf(dist))
  }

  test("harmonicCentrality: driver BFS ≡ relational min-plus rounds") {
    val e = asSrcDst(edges)
    val local = GraphAlgos.harmonicCentrality(e, "src", "dst", iters = 4)
    val dist = GraphAlgos.harmonicCentrality(e, "src", "dst", iters = 4,
      localEdgeThreshold = 0L)
    assert(local.schema.fieldNames.toSeq == dist.schema.fieldNames.toSeq)
    assert(rowsOf(local) == rowsOf(dist))
  }

  test("harmonicCentrality: bounded iters caps distances identically") {
    val e = asSrcDst(edges)
    val local = GraphAlgos.harmonicCentrality(e, "src", "dst", iters = 1)
    val dist = GraphAlgos.harmonicCentrality(e, "src", "dst", iters = 1,
      localEdgeThreshold = 0L)
    assert(rowsOf(local) == rowsOf(dist))
  }

  test("triangleCounts + clusteringCoefficients: driver neighbor-pair " +
    "count ≡ distributed wedge join") {
    val e = asSrcDst(edges)
    val local = GraphAlgos.clusteringCoefficients(e, "src", "dst")
    val dist = GraphAlgos.clusteringCoefficients(e, "src", "dst",
      localEdgeThreshold = 0L)
    assert(local.schema.fieldNames.toSeq == dist.schema.fieldNames.toSeq)
    assert(rowsOf(local) == rowsOf(dist))
    assert(rowsOf(GraphAlgos.triangleCounts(e, "src", "dst")) ==
      rowsOf(GraphAlgos.triangleCounts(e, "src", "dst",
        localEdgeThreshold = 0L)))
  }

  test("hyperBall family: driver register evolution ≡ distributed " +
    "merge rounds (registers, estimates, harmonic and closeness " +
    "readouts all bit-identical)") {
    val e = asSrcDst(edges)
    val localH = GraphAlgos.harmonicHyperBall(e, "src", "dst", iters = 4)
    val distH = GraphAlgos.harmonicHyperBall(e, "src", "dst", iters = 4,
      checkpointEvery = 2, localEdgeThreshold = 0L)
    assert(localH.schema.fieldNames.toSeq == distH.schema.fieldNames.toSeq)
    assert(rowsOf(localH) == rowsOf(distH))
    val localC = GraphAlgos.hyperBallCloseness(e, "src", "dst", iters = 4)
    val distC = GraphAlgos.hyperBallCloseness(e, "src", "dst", iters = 4,
      checkpointEvery = 2, localEdgeThreshold = 0L)
    assert(rowsOf(localC) == rowsOf(distC))
    val localN = GraphAlgos.hyperBallNeighborhood(e, "src", "dst", iters = 4)
    val distN = GraphAlgos.hyperBallNeighborhood(e, "src", "dst", iters = 4,
      checkpointEvery = 2, localEdgeThreshold = 0L)
    assert(rowsOf(localN) == rowsOf(distN))
  }
}
