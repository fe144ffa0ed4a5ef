package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.IterativeClosure

/** Distributed graph/ANN scale-path operators with DuckDB oracles:
  * BFS tree depth (the cross-document transitive-closure primitive) and
  * IVF-style partitioned similarity search.
  */
object GraphQueries {

  val all: Seq[Q] = Seq(
    Q(
      // HEAD+-style depth over a deterministic per-doc token tree
      // (parent(i) = i/2, token 1 is the root): Spark = iterative BFS
      // join (IterativeClosure), oracle = recursive CTE.
      "q30_tree_depth",
      (s, dir) => {
        import s.implicits._
        val tk = TextQueries.tokens(s, dir)
          .select(concat($"doc_id", lit("_"), $"tok").as("child"),
            concat($"doc_id", lit("_"), ($"tok" / 2).cast("bigint")).as("parent"),
            $"doc_id", $"tok")
        val edges = tk.filter($"tok" > 1).select($"child", $"parent")
        val roots = tk.filter($"tok" === 1).select($"child".as("node"))
        IterativeClosure.depths(s, edges, roots)
          .select($"node", $"depth")
          .orderBy($"node")
      },
      Some(s"""WITH RECURSIVE ${TextQueries.tokensCte.stripPrefix("WITH ")},
        nodes AS (
          SELECT doc_id || '_' || tok AS child,
                 doc_id || '_' || CAST(tok // 2 AS BIGINT) AS parent, tok
          FROM tk),
        reach(node, depth) AS (
          SELECT child, 0 FROM nodes WHERE tok = 1
          UNION
          SELECT n.child, r.depth + 1 FROM reach r
          JOIN nodes n ON n.parent = r.node AND n.tok > 1)
        SELECT node, MIN(depth) AS depth FROM reach GROUP BY node ORDER BY node""")
    ),
    Q(
      // IVF-style ANN: deterministic centroids (vec_id % 50 = 0), exact
      // decimal assignment to the nearest centroid, then top-3 search
      // within the probed cell only — the partition-pruned scale path
      // next to q28's brute force.
      "q31_ann_ivf",
      (s, dir) => {
        import s.implicits._
        val ex = Tables.embeddings(s, dir)
          .select($"vec_id", posexplode($"embedding").as(Seq("pos", "xf")))
          .select($"vec_id", ($"pos" + 1).cast("int").as("i"), $"xf".cast("double").as("x"))
        val nrm = ex.groupBy($"vec_id")
          .agg(sum(($"x" * $"x").cast("decimal(38,18)")).as("nsq"))
        def sims(left: DataFrame, right: DataFrame): DataFrame =
          left.join(right, "i")
            .groupBy($"a", $"b")
            .agg(sum(($"x" * $"y").cast("decimal(38,18)")).as("dot"))
            .join(nrm.select($"vec_id".as("a"), $"nsq".as("na")), "a")
            .join(nrm.select($"vec_id".as("b"), $"nsq".as("nb")), "b")
            .withColumn("sim",
              $"dot".cast("double") / sqrt($"na".cast("double") * $"nb".cast("double")))
        val cents = ex.filter($"vec_id" % 50 === 0)
          .select($"vec_id".as("b"), $"i", $"x".as("y"))
        val others = ex.select($"vec_id".as("a"), $"i", $"x")
        // assign every vector to its nearest centroid
        val wAssign = Window.partitionBy($"a").orderBy($"sim".desc, $"b")
        val assign = sims(others, cents)
          .withColumn("rn", row_number().over(wAssign))
          .filter($"rn" === 1)
          .select($"a".as("vec_id"), $"b".as("centroid_id"))
        // probe: queries (vec_id < 10) search within their own cell
        val queries = assign.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"centroid_id")
        val cell = assign.filter($"vec_id" >= 10)
          .select($"vec_id".as("c_id"), $"centroid_id".as("cell"))
        val pairs = queries.join(cell, $"centroid_id" === $"cell")
        val qe = ex.select($"vec_id".as("a"), $"i", $"x")
        val ce = ex.select($"vec_id".as("b"), $"i", $"x".as("y"))
        val searched = sims(
            qe.join(pairs.select($"q_id").distinct(), $"a" === $"q_id").select($"a", $"i", $"x"),
            ce.join(pairs.select($"c_id").distinct(), $"b" === $"c_id").select($"b", $"i", $"y"))
          .join(pairs, $"a" === $"q_id" && $"b" === $"c_id") // only same-cell pairs
        val wTop = Window.partitionBy($"q_id").orderBy($"sim".desc, $"c_id")
        searched
          .withColumn("rnk", row_number().over(wTop))
          .filter($"rnk" <= 3)
          .select($"q_id", $"centroid_id", $"rnk", $"c_id", round($"sim", 6).as("sim"))
          .orderBy($"q_id", $"rnk")
      },
      Some("""WITH ex AS (
          SELECT vec_id, CAST(i AS INT) AS i, CAST(x AS DOUBLE) AS x FROM (
            SELECT vec_id, unnest(embedding) AS x,
                   unnest(range(1, len(embedding)+1)) AS i FROM embeddings) t),
        nrm AS (SELECT vec_id, SUM(CAST(x*x AS DECIMAL(38,18))) AS nsq FROM ex GROUP BY vec_id),
        centsim AS (
          SELECT a.vec_id AS a, b.vec_id AS b,
            CAST(SUM(CAST(a.x*b.x AS DECIMAL(38,18))) AS DOUBLE)
              / sqrt(CAST(na.nsq AS DOUBLE) * CAST(nb.nsq AS DOUBLE)) AS sim
          FROM ex a JOIN ex b ON a.i = b.i AND b.vec_id % 50 = 0
          JOIN nrm na ON na.vec_id = a.vec_id JOIN nrm nb ON nb.vec_id = b.vec_id
          GROUP BY a.vec_id, b.vec_id, na.nsq, nb.nsq),
        assign AS (
          SELECT a AS vec_id, b AS centroid_id FROM (
            SELECT a, b, ROW_NUMBER() OVER (PARTITION BY a ORDER BY sim DESC, b) AS rn
            FROM centsim) r WHERE rn = 1),
        pairs AS (
          SELECT q.vec_id AS q_id, q.centroid_id, c.vec_id AS c_id
          FROM assign q JOIN assign c ON q.centroid_id = c.centroid_id
          WHERE q.vec_id < 10 AND c.vec_id >= 10),
        searched AS (
          SELECT p.q_id, p.centroid_id, p.c_id,
            CAST(SUM(CAST(a.x*b.x AS DECIMAL(38,18))) AS DOUBLE)
              / sqrt(CAST(na.nsq AS DOUBLE) * CAST(nb.nsq AS DOUBLE)) AS sim
          FROM pairs p
          JOIN ex a ON a.vec_id = p.q_id
          JOIN ex b ON b.vec_id = p.c_id AND b.i = a.i
          JOIN nrm na ON na.vec_id = p.q_id JOIN nrm nb ON nb.vec_id = p.c_id
          GROUP BY p.q_id, p.centroid_id, p.c_id, na.nsq, nb.nsq)
        SELECT q_id, centroid_id, rnk, c_id, ROUND(sim, 6) AS sim FROM (
          SELECT q_id, centroid_id, c_id, sim,
            ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rnk
          FROM searched) r WHERE rnk <= 3 ORDER BY q_id, rnk""")
    )
  )
}
