package graft.operators

import org.apache.spark.sql.functions._

/** Vector-column analytics over `embeddings` (SURVEY §2.9 X2
  * adjacency): the aggregate/transform ops a training pipeline runs on
  * embedding columns besides similarity search — per-class centroids
  * and scalar quantization.
  *
  * Scale shape: both queries explode the vector ONCE into (row, dim,
  * value) and work in long form. Centroids shuffle on (label, dim) —
  * cardinality #labels × 64, a tiny aggregate no matter the corpus
  * size. Quantization joins the corpus against a 64-row per-dim stats
  * table — broadcast, no fact shuffle.
  */
object VectorQueries {
  import Q._

  val specs: Seq[Spec] = Seq(

    // Per-label mean embedding (the k-means "update centroids" step /
    // class prototypes). Long-form output (label, dim, value): the
    // driver gate needs scalar cells. floor4 instead of round: the two
    // engines accumulate the mean in different orders, floor of the
    // same-to-1e-15 double is stable where round-at-half is not.
    Spec("q_vector_centroids",
      (s, dir) => t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), (col("pos") + 1).cast("long").as("dim"))
        .agg((floor(avg(col("v").cast("double")) * 10000) / 10000)
          .as("centroid"))
        .orderBy(col("label"), col("dim")),
      Some("""SELECT label, CAST(i AS BIGINT) AS dim,
                    floor(avg(CAST(embedding[i] AS DOUBLE)) * 10000) / 10000
                      AS centroid
             FROM embeddings,
                  UNNEST(generate_series(1, len(embedding))) AS t(i)
             GROUP BY label, i ORDER BY label, dim""")),

    // Int8 scalar quantization: per-dimension min/max over the corpus
    // (64-row stats table, broadcast), each value mapped to
    // floor((v-min)/(max-min)*254)-127 ∈ [-127,127]. min/max are exact
    // float selections (no accumulation), so the arithmetic is
    // bit-identical across engines — exact oracle, no rounding fudge.
    // A constant dimension (d_max = d_min) would be 0/0 = NaN, which
    // the engines cast differently (Spark NULL, DuckDB error) — both
    // sides pin it to q = -127 explicitly.
    Spec("q_vector_quantize",
      (s, dir) => {
        val long = t(s, dir, "embeddings")
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
            col("v").cast("double").as("v"))
        val stats = long.groupBy(col("dim").as("s_dim"))
          .agg(min(col("v")).as("d_min"), max(col("v")).as("d_max"))
        long.filter(col("vec_id") < 20)
          .join(broadcast(stats), col("dim") === col("s_dim"))
          .select(col("vec_id"), col("dim"),
            when(col("d_max") === col("d_min"), lit(-127L))
              .otherwise((floor((col("v") - col("d_min")) /
                (col("d_max") - col("d_min")) * 254) - 127).cast("long"))
              .as("q"))
          .orderBy(col("vec_id"), col("dim"))
      },
      Some("""WITH long AS (
               SELECT vec_id, CAST(i AS BIGINT) AS dim,
                      CAST(embedding[i] AS DOUBLE) AS v
               FROM embeddings,
                    UNNEST(generate_series(1, len(embedding))) AS t(i)),
             stats AS (
               SELECT dim, min(v) AS d_min, max(v) AS d_max
               FROM long GROUP BY dim)
             SELECT vec_id, dim,
                    CASE WHEN d_max = d_min THEN CAST(-127 AS BIGINT)
                         ELSE CAST(floor((v - d_min) / (d_max - d_min) * 254)
                                   - 127 AS BIGINT) END AS q
             FROM long JOIN stats USING (dim)
             WHERE vec_id < 20 ORDER BY vec_id, dim""")),

    // Johnson–Lindenstrauss random projection 64 → 8 dims — the
    // standard pre-ANN/clustering dimensionality reduction. The native
    // expression fuses the whole matrix multiply into ONE map-only
    // per-row pass (the relational formulation below, which the oracle
    // replays, explodes n·d·k rows through a shuffle — correct but 8×
    // the data in motion at corpus scale). Elements are floored to
    // integer micros and the Rademacher signs come from md5("j|i")
    // parity, so every addend is an integer and both engines agree
    // bit-for-bit with no float-order hazard. Long-form output: the
    // driver gate needs scalar cells.
    Spec("q_vector_project",
      (s, dir) => {
        import graft.functions.VectorFunctions.jlProject
        t(s, dir, "embeddings")
          .select(col("vec_id"),
            posexplode(jlProject(col("embedding"), 8)).as(Seq("j0", "p")))
          .select(col("vec_id"), col("j0").cast("long").as("j"), col("p"))
          .orderBy(col("vec_id"), col("j"))
      },
      Some("""WITH long AS (
               SELECT vec_id, CAST(i AS BIGINT) - 1 AS dim0,
                      CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000)
                           AS BIGINT) AS q
               FROM embeddings,
                    UNNEST(generate_series(1, len(embedding))) AS t(i)),
             signs AS (
               SELECT dim0, j,
                      CASE WHEN CAST(('0x' || substr(
                             md5(CAST(j AS VARCHAR) || '|' || CAST(dim0 AS VARCHAR)),
                             1, 15)) AS BIGINT) % 2 = 0
                           THEN 1 ELSE -1 END AS s
               FROM (SELECT DISTINCT dim0 FROM long),
                    UNNEST(generate_series(0, 7)) AS tt(j))
             SELECT vec_id, j, CAST(sum(q * s) AS BIGINT) AS p
             FROM long JOIN signs USING (dim0)
             GROUP BY vec_id, j ORDER BY vec_id, j"""))
  )
}
