package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.8).
  *
  * Two paths:
  *   - [[bruteForceTopK]] — exact cosine top-k via a broadcast cross join
  *     + rank window. Quadratic in corpus size: the CORRECTNESS BASELINE,
  *     never the scale path. The queries (small) broadcast; the corpus
  *     only streams.
  *   - [[lshTopK]] — random-hyperplane LSH: each vector hashes to a
  *     bucket by the sign pattern of its dot products with `nPlanes`
  *     fixed pseudo-random hyperplanes; search touches only the query's
  *     bucket. Cost drops from |Q|×|C| to |Q|×|bucket| (expected
  *     |C|/2^nPlanes). Buckets are the only shuffle key.
  *
  * Determinism: hyperplane coefficients come from an integer LCG
  * (coef = ((1103515245·(p·dim+d) + 12345) mod 2048) − 1024) — exact
  * integer arithmetic reproducible in any engine, no RNG state. Cosines
  * are index-ordered folds, bit-identical across engines.
  */
object Similarity {

  /** Index-ordered cosine — graft's native codegen'd one-pass expression
    * (same accumulation order as an explicit fold, so the ANSI oracle
    * reproduces it bit-identically). */
  private def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosineSim(a, b)

  /** Exact top-k neighbors per query vector (correctness baseline). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Exact radius search: every corpus vector within cosine ≥ `minCosine`
    * of each query — the threshold-query counterpart of [[bruteForceTopK]]
    * (top-k asks "the closest k whatever they score"; radius asks
    * "everything above a similarity bar", the shape dedup-style audits
    * and recall studies want). Same quadratic-baseline contract: queries
    * broadcast, corpus streams, no shuffle; at corpus scale run the
    * LSH/IVF candidate generators and apply the same threshold. */
  def radiusSearch(corpus: DataFrame, queries: DataFrame,
      minCosine: Double = 0.3): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_emb"), col("c_emb")))
      .filter(col("cosine") >= minCosine)
      .select("query_id", "neighbor_id", "cosine")
  }

  /** Sign-pattern LSH bucket id from `nPlanes` LCG hyperplanes starting at
    * global plane index `planeOffset` (distinct offsets give independent
    * hash tables — the LCG coefficient stream is indexed by the GLOBAL
    * plane number, so table t's planes are disjoint from table t−1's).
    *
    * Delegates to the native codegen'd expression
    * ([[graft.functions.HyperplaneBuckets]]): ONE fused loop computes all
    * plane dots, vs one interpreted HOF fold per plane — the cost gap
    * grows with the auto-scaled plane count. The session must have graft
    * functions registered ([[graft.functions.GraftFunctions.register]];
    * [[lshTopK]] does it for callers). The expression reads the vector
    * dimension from the array itself — no dim parameter to get wrong. */
  def bucketCol(emb: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    graft.functions.GraftFunctions.hyperplaneBucket(emb, nPlanes, planeOffset)

  /** Planes needed so the EXPECTED bucket occupancy stays ~`targetBucket`
    * as the corpus grows: ⌈log₂(N / targetBucket)⌉, floored at 4. A
    * constant plane count is a scale cliff — per-query candidate cost is
    * |C|/2^planes, linear in corpus size unless the bucket space grows
    * with it (same lesson as the simhash 8-bit→15-bit band fix).
    * Capped at 30: the native expression packs the sign pattern into an
    * int bucket id (`nPlanes < 31`), and past 2^30 buckets per table the
    * right lever is more tables, not more planes. */
  def autoPlanes(corpusSize: Long, targetBucket: Int = 64): Int =
    math.min(30, math.max(4,
      math.ceil(math.log(math.max(corpusSize, 1L).toDouble / targetBucket) / math.log(2)).toInt))

  /** Deterministic IVF (inverted-file) ANN — the coarse-quantizer
    * counterpart of [[lshTopK]]: partition the corpus into `nlist` cells
    * around k-means centroids, search only the `nprobe` cells nearest to
    * each query.
    *
    *   - centroids are DETERMINISTIC: seeds = the `nlist` lowest-vec_id
    *     vectors, refined by `iters` Lloyd rounds (assignment is a
    *     codegen'd argmax over centroid-literal cosines; the per-round
    *     collect is nlist×dim means — KB-sized at any corpus scale);
    *   - the cell id is the ONLY shuffle key; per-query candidate cost is
    *     nprobe/nlist of the corpus, tunable at query time;
    *   - recall comes from probing multiple cells (a neighbor is missed
    *     only when it quantizes outside all probed cells).
    *
    * IVF vs LSH trade-off: IVF adapts its partition to the data
    * distribution (tighter candidate sets on clustered embeddings; the
    * centroid fit is a light training pass), LSH is data-oblivious (no
    * fit, stable under distribution drift). Both are O(|C|) build +
    * sub-linear probe. */
  private def cosTo(cent: Array[Double]): Column =
    cosine(col("embedding"), typedLit(cent.toSeq))

  /** Winning (cosine, cell) struct over centroid literals — struct
    * comparison is lexicographic, so `greatest` is argmax by cosine with
    * the cell index as the deterministic tie-break. */
  private def bestCentroid(cents: Array[Array[Double]]): Column =
    greatest(cents.zipWithIndex.map { case (c, i) =>
      struct(cosTo(c).as("cos"), lit(i).as("cell"))
    }: _*)

  /** Codegen'd argmax-by-cosine cell assignment over centroid literals. */
  private[graft] def cellOf(cents: Array[Array[Double]]): Column =
    bestCentroid(cents).getField("cell")

  /** The `m` nearest cells by cosine (multi-probe assignment, the IVF
    * trick reused by SemDeDup blocking): all centroid cosines evaluate in
    * one codegen'd projection, sort_array keeps the top-m cell indices.
    * Ties resolve toward the higher cell index (struct comparison), which
    * is deterministic either way. */
  private[graft] def nearestCells(cents: Array[Array[Double]], m: Int): Column =
    transform(
      slice(sort_array(array(cents.zipWithIndex.map { case (c, i) =>
        struct(cosTo(c).as("cos"), lit(i).as("cell"))
      }: _*), asc = false), 1, m),
      p => p.getField("cell"))

  /** Per-label centroid outliers — embedding QA: the k vectors farthest
    * (lowest cosine) from their OWN label's centroid are the mislabeled /
    * corrupt-embedding candidates a curation pass reviews.
    *
    * One posexplode+aggregate builds the per-(label, dim) means (shuffle
    * key grows with labels×dim, not corpus), centroids re-assemble as
    * arrays and broadcast back onto the corpus scan, and the bottom-k
    * window runs per label. Rank-based rather than threshold-based so the
    * output is meaningful on any corpus without tuning. */
  def labelOutliers(corpus: DataFrame, k: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val cents = corpus
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim").agg(avg(col("v")).as("m"))
      .groupBy("label").agg(
        transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          s => s.getField("m")).as("centroid"))
    val w = Window.partitionBy("label").orderBy(col("centroid_cosine").asc, col("vec_id"))
    corpus.join(broadcast(cents), "label")
      .withColumn("centroid_cosine", cosine(col("embedding"), col("centroid")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("label", "vec_id", "centroid_cosine", "rank")
  }

  /** Deterministic Lloyd k-means over an embedding column: seeds = the
    * `nlist` lowest-vec_id vectors, `iters` refinement rounds. Each round
    * is one distributed pass; the only driver traffic is the nlist×dim
    * centroid means (KB-sized at any corpus scale). */
  def kmeansFit(corpus: DataFrame, nlist: Int = 16, iters: Int = 2): Array[Array[Double]] = {
    // self-register the native cosine (idempotent): cellOf's assignment
    // column resolves graft_cosine_sim at analysis time, and relying on a
    // PREVIOUS query having registered it makes the call order-dependent
    // (bit us when a key rename shuffled the Verify iteration order)
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    // accept array<float|double> like every other embedding consumer
    // (CosineSimilarity/HyperplaneBuckets); the dimension comes from the
    // vectors themselves, not a parameter that could disagree with them
    var cents: Array[Array[Double]] = corpus.orderBy("vec_id").limit(nlist)
      .select("embedding").collect()
      .map(_.getSeq[Number](0).map(_.doubleValue()).toArray)
    val dim = cents.headOption.map(_.length).getOrElse(0)
    for (_ <- 0 until iters) {
      val means = corpus.withColumn("cell", cellOf(cents))
        .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("cell", "dim").agg(avg("v").as("m"))
        .collect()
        .groupBy(_.getAs[Int]("cell"))
      cents = cents.indices.map { c =>
        means.get(c) match {
          case Some(rows) =>
            val m = new Array[Double](dim)
            rows.foreach(r => m(r.getAs[Int]("dim")) = r.getAs[Double]("m"))
            m
          case None => cents(c) // empty cell keeps its seed
        }
      }.toArray
    }
    cents
  }

  /** Cluster assignment for a fitted [[kmeansFit]] model: every vector's
    * cell plus its cosine to the winning centroid — shuffle-free (the
    * centroids ride along as literals in a codegen'd projection). */
  def kmeansAssign(corpus: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    // ONE argmax struct supplies both columns — two parallel greatest()
    // trees would duplicate every centroid-cosine expression
    val best = bestCentroid(cents)
    corpus.select(
      col("vec_id"),
      best.getField("cell").as("cell"),
      best.getField("cos").as("centroid_cosine"))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 2): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)

    val cents = kmeansFit(corpus, nlist, iters)

    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"), cellOf(cents).as("cell"))
    val probed = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      explode(slice(sort_array(array(cents.zipWithIndex.map { case (ct, i) =>
        struct(cosTo(ct).as("cos"), lit(i).as("cell"))
      }: _*), asc = false), 1, nprobe)).as("probe"))
      .select(col("query_id"), col("q_emb"), col("probe.cell").as("cell"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Bucketed ANN: top-k per query among candidates that share a bucket
    * with the query in ANY of `tables` independent hash tables.
    *
    *   - plane count auto-scales with corpus size ([[autoPlanes]]) unless
    *     pinned via `nPlanes` — per-query cost stays ~`targetBucket` ×
    *     `tables` candidates at any corpus size;
    *   - recall widens with `tables` (a true neighbor is missed only if
    *     it hashes away from the query in EVERY table); candidates are
    *     deduped before scoring so a pair found by both tables is scored
    *     once.
    *
    * `nPlanes = 0` (auto) triggers one `corpus.count()` — a metadata-only
    * job on a parquet scan; pass an explicit value to avoid it. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nPlanes: Int = 0, tables: Int = 2, targetBucket: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val np = if (nPlanes > 0) nPlanes else autoPlanes(corpus.count(), targetBucket)
    val candidates = (0 until tables).map { t =>
      val bucket = bucketCol(col("embedding"), np, planeOffset = t * np)
      val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        bucket.as("bucket"))
      val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        bucket.as("bucket"))
      c.join(broadcast(q), Seq("bucket")).drop("bucket")
    }.reduce(_ unionByName _)
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    candidates
      .withColumn("cosine", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
