package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]] is the exact baseline: broadcast the (small) query
  *    set against the corpus, rank per query. One pass over the corpus, no
  *    shuffle of the big side — the right shape even at 100 TB when the
  *    query set fits in a broadcast.
  *  - [[hyperplaneLsh]] buckets vectors by sign patterns against
  *    deterministic pseudo-random hyperplanes (seeded xxhash64 ±1 entries):
  *    candidate generation becomes an equi-join on bucket id.
  *  - [[ivfTopK]] is an IVF-style coarse quantizer: centroids per partition
  *    key, query probes only its nearest centroid's partition.
  *
  * Dot products are `zip_with` + `aggregate` folds in double — sequential,
  * order-fixed, hence engine-reproducible.
  */
object Similarity {

  /** Sequential-fold dot product of two array<double> columns.
    *
    * Implemented as a compiled UDF over primitive arrays rather than
    * `aggregate(zip_with(...))`: Catalyst's higher-order functions are
    * interpreted per element (no codegen), which measured ~20× slower on
    * the 12.5M-pair brute-force ANN at sf0.1. The UDF does the identical
    * left-to-right double fold, so engine-reproducibility (and DuckDB
    * oracle parity) is unchanged. `Array[Double]` parameters (here and in
    * every kernel UDF below) bind Spark's primitive-array encoder — one
    * `toDoubleArray` copy per call instead of a boxed element view, worth
    * ~2× on the encode/ADC hot loops (r8 VERDICT #5).
    */
  private val dotUdf = org.apache.spark.sql.functions.udf {
    (a: Array[Double], b: Array[Double]) =>
      val n = math.min(a.length, b.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += a(i) * b(i); i += 1 }
      acc
  }

  def dot(a: Column, b: Column): Column = dotUdf(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  /** Cosine through the native codegen'd [[graft.functions.CosineSimilarity]]
    * expression — the per-PAIR scoring path. Unlike [[dot]] (a compiled
    * UDF, still paying a boxed Seq conversion per call), this stays inside
    * whole-stage codegen reading array elements in place: measured ~40×
    * on the sf0.1 all-pairs dedup (2M pairs). The arithmetic is the same
    * left-to-right fold (dot and both self-norms accumulate in one loop),
    * so values are bit-identical to `dot(a,b)/sqrt(dot(a,a)*dot(b,b))`
    * and the DuckDB oracle still hash-matches. */
  def nativeCosine(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(spark) // idempotent re-register
    call_function("cosine_sim", a, b)
  }

  /** Exact top-k cosine neighbors for each query vector (self excluded). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        round(nativeCosine(spark, col("qv"), col("cv")), 6).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane entries: ±1 from seeded
    * xxhash64(plane, dim). */
  private def planeEntry(plane: Int, d: Int): Column =
    when(xxhash64(lit(plane), lit(d)).bitwiseAND(1) === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Bucket id: `planes` sign bits of hyperplane dot products.
    * Kept as a Column recipe for documentation/parity; the hot path below
    * materializes the same ±1 matrix once and runs a JIT'd kernel — the
    * planes×dims `element_at` expression tree (512 nodes at 8×64) costs
    * more to evaluate per row than the arithmetic it encodes. */
  def lshBucket(vec: Column, planes: Int, dims: Int): Column =
    (0 until planes).map { p =>
      val d = (0 until dims).map(i => element_at(vec, i + 1) * planeEntry(p, i)).reduce(_ + _)
      when(d >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** The ±1 hyperplane matrix for `planes` planes, materialized once from
    * the same seeded entries as [[lshBucket]]: each entry evaluates the
    * identical Catalyst `XxHash64(lit(plane), lit(dim))` expression —
    * interpreted, on the driver, per entry — instead of constant-folding a
    * planes×dims-column projection through codegen (at 153×64 entries that
    * single giant select cost ~15 s of janino compilation before any data
    * moved). Constant-size plan metadata, not a collect of data. */
  private[operators] def planeMatrix(spark: org.apache.spark.sql.SparkSession,
      planes: Int, dims: Int): Array[Array[Double]] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    Array.tabulate(planes, dims) { (p, i) =>
      val h = XxHash64(Seq(Literal(p), Literal(i)), 42L).eval(null).asInstanceOf[Long]
      if ((h & 1L) == 0L) 1.0 else -1.0
    }
  }

  /** The same bucket as [[lshBucket]] via a broadcast ±1 matrix + kernel
    * (identical seeded entries, identical left-to-right fold). */
  private def bucketUdfFor(spark: org.apache.spark.sql.SparkSession,
      planes: Int, dims: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val mat = planeMatrix(spark, planes, dims)
    udf { (v: Array[Double]) =>
      var b = 0L
      var p = 0
      while (p < mat.length) {
        val r = mat(p)
        var dsum = 0.0
        var i = 0
        val n = math.min(r.length, v.length)
        while (i < n) { dsum += v(i) * r(i); i += 1 }
        if (dsum >= 0) b += (1L << p)
        p += 1
      }
      b
    }
  }

  /** Banded sign-bucket keys: `bands` independent buckets of `rowsPerBand`
    * hyperplanes each (global plane index = band·rowsPerBand + j, same
    * seeding as [[lshBucket]]). The band id is packed into the key's high
    * bits so different bands never equi-join. Used by
    * [[Dedup.embeddingLshPairs]] for all-pairs near-dup search. */
  private[operators] def bandKeysUdf(spark: org.apache.spark.sql.SparkSession,
      bands: Int, rowsPerBand: Int, dims: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val mat = planeMatrix(spark, bands * rowsPerBand, dims)
    udf { (v: Array[Double]) =>
      val out = new Array[Long](bands)
      var t = 0
      while (t < bands) {
        var key = 0L
        var j = 0
        while (j < rowsPerBand) {
          val r = mat(t * rowsPerBand + j)
          var dsum = 0.0
          var i = 0
          val n = math.min(r.length, v.length)
          while (i < n) { dsum += v(i) * r(i); i += 1 }
          if (dsum >= 0) key |= (1L << j)
          j += 1
        }
        out(t) = (t.toLong << 32) | key
        t += 1
      }
      out
    }
  }

  /** LSH-bucketed ANN: candidates share a bucket; rank within candidates.
    * Recall < 1 by construction (the scale path — bucket join, no cross).
    *
    * `probes` > 1 enables MULTIPROBE (Lv et al. 2007): a query also
    * probes the buckets at Hamming distance 1 from its own (one sign bit
    * flipped — the buckets a near-neighbor most likely fell into), up to
    * `probes` buckets total. Candidate volume grows ~linearly with
    * probes while recall climbs steeply; the corpus side still lands in
    * ONE bucket each, so the index is unchanged — only the (tiny,
    * broadcast) query side explodes. */
  def hyperplaneLsh(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 8,
      dims: Int = 64, idCol: String = "vec_id", vecCol: String = "embedding",
      probes: Int = 1): DataFrame = {
    val spark = corpus.sparkSession
    val bucketUdf = bucketUdfFor(spark, planes, dims)
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("bucket", bucketUdf(col("cv")))
    val q0 = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("_b0", bucketUdf(col("qv")))
    val probeCols = col("_b0") +:
      (0 until math.min(math.max(probes - 1, 0), planes))
        .map(i => col("_b0").bitwiseXOR(lit(1L << i)))
    val q = q0.withColumn("bucket", explode(array(probeCols: _*))).drop("_b0")
    val scored = c.join(broadcast(q), "bucket")
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        round(nativeCosine(spark, col("qv"), col("cv")), 6).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Best-dot cell assignment against a driver-held centroid table —
    * shared by [[kmeansAssign]]'s Lloyd loop, the final assignment, and
    * [[graft.operators.Dedup.semDedup]]'s clustering step. */
  private[graft] def assignCellUdf(cents: Array[Array[Double]]) =
    udf { (v: Array[Double]) =>
      var best = 0; var bestDot = Double.NegativeInfinity
      var c = 0
      while (c < cents.length) {
        val ct = cents(c); var d = 0.0; var i = 0
        val n = math.min(ct.length, v.length)
        while (i < n) { d += ct(i) * v(i); i += 1 }
        if (d > bestDot) { bestDot = d; best = c }
        c += 1
      }
      best
    }

  /** Deterministic distributed Lloyd (k-means): train and return the
    * (normalized) centroids — the bounded driver artifact behind
    * [[kmeansAssign]], exposed for consumers that also need per-vector
    * centroid similarity ([[graft.operators.Dedup.semDedup]]'s keep rule).
    *
    * Shape per iteration (the standard scalable k-means loop, e.g. Spark
    * MLlib's KMeans): centroids live on the driver (nlist×dims doubles —
    * tiny) and broadcast into a compiled assignment UDF, so each Lloyd
    * step is ONE map pass over the corpus plus an nlist-group aggregate.
    * Nothing corpus-sized is ever collected.
    *
    * Determinism: seeds are the `nlist` lowest-id vectors; the centroid
    * update sums per-dimension in decimal ([[graft.functions.Exact]] —
    * order-independent across partitionings); argmax ties break to the
    * lowest cell id. Same data in ⇒ same cells out, on any cluster. */
  def kmeansCentroids(corpus: DataFrame, nlist: Int = 8, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dims: Int = 64): Array[Array[Double]] = {
    val e = corpus.select(col(idCol).as("kid"),
      col(vecCol).cast("array<double>").as("kv"))
    val norm = sqrt(dot(col("kv"), col("kv")))
    // persisted: every Lloyd iteration re-reads this frame (assignment +
    // 64-dim centroid update), and without the cache each pass re-scans
    // the parquet AND re-runs the interpreted normalize HOF
    val nv = e.withColumn("nv", transform(col("kv"), x => x / norm))
      .select(col("kid"), col("nv")).persist()
    def renorm(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    var centroids: Array[Array[Double]] = nv.orderBy(col("kid")).limit(nlist)
      .collect().map(_.getSeq[Double](1).toArray).map(renorm)
    for (_ <- 0 until iters) {
      val asg = nv.withColumn("cell", assignCellUdf(centroids)(col("nv")))
      val sums = (0 until dims).map(i =>
        graft.functions.Exact.dsum(
          element_at(col("nv"), i + 1).cast(org.apache.spark.sql.types.DecimalType(24, 18))
        ).as(s"s$i")) :+ count(lit(1)).as("n")
      val upd = asg.groupBy(col("cell")).agg(sums.head, sums.tail: _*).collect()
      val next = centroids.map(_.clone())
      upd.foreach { r =>
        val cell = r.getInt(0); val n = r.getLong(dims + 1).toDouble
        next(cell) = renorm((0 until dims).map(i => r.getDouble(i + 1) / n).toArray)
      }
      centroids = next
    }
    nv.unpersist()
    centroids
  }

  /** The corpus with a `cell` column assigning each vector to its
    * nearest of `nlist` trained centroids by cosine, for [[ivfTopK]]'s
    * `cellCol` (see [[kmeansCentroids]] for the training shape). */
  def kmeansAssign(corpus: DataFrame, nlist: Int = 8, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dims: Int = 64): DataFrame =
    corpus.withColumn("cell",
      assignCellUdf(kmeansCentroids(corpus, nlist, iters, idCol, vecCol, dims))(
        col(vecCol).cast("array<double>")))

  // ---------------------------------------- product quantization (r6)

  /** PQ codebook: `m` subspaces × `ks` centroids × (dims/m) doubles.
    * Driver-held — m·ks·(dims/m) = dims·ks doubles (8 KB at 64×16),
    * the same bounded-artifact policy as [[kmeansAssign]]'s centroids. */
  type PqCodebook = Array[Array[Array[Double]]]

  /** Train a product quantizer (Jégou et al. 2011, "Product Quantization
    * for Nearest Neighbor Search") — the memory-compressed ANN arm: split
    * each (normalized) vector into `m` subvectors, run per-subspace
    * `ks`-centroid Lloyd, return the codebooks. At billion-vector scale
    * PQ is what makes the corpus fit: 64 floats become m 4-bit codes.
    *
    * One shuffle per iteration for ALL subspaces: the assignment UDF
    * emits (sub, code, subvec) triples, a single groupBy(sub, code)
    * aggregates per-dim decimal sums ([[graft.functions.Exact]] — order-
    * independent across partitionings, same determinism contract as
    * [[kmeansAssign]]). Seeds are the `ks` lowest-id vectors' subvectors;
    * ties break to the lowest code. */
  def pqTrain(corpus: DataFrame, m: Int = 8, ks: Int = 16, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dims: Int = 64): PqCodebook = {
    require(dims % m == 0, s"dims $dims must split evenly into $m subspaces")
    val dsub = dims / m
    val e = corpus.select(col(idCol).as("kid"),
      col(vecCol).cast("array<double>").as("kv"))
    val norm = sqrt(dot(col("kv"), col("kv")))
    val nv = e.withColumn("nv", transform(col("kv"), x => x / norm))
      .select(col("kid"), col("nv")).persist()
    var books: PqCodebook = {
      val seeds = nv.orderBy(col("kid")).limit(ks)
        .collect().map(_.getSeq[Double](1).toArray)
      Array.tabulate(m, ks) { (s, c) =>
        seeds(c % seeds.length).slice(s * dsub, (s + 1) * dsub)
      }
    }
    def codesUdf(bk: PqCodebook) = udf { (v: Array[Double]) =>
      val out = new Array[Int](m)
      var s = 0
      while (s < m) {
        val cents = bk(s)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          val ct = cents(c); var d = 0.0; var i = 0
          while (i < dsub) {
            val diff = v(s * dsub + i) - ct(i); d += diff * diff; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(s) = best
        s += 1
      }
      out
    }
    for (_ <- 0 until iters) {
      val asg = nv.withColumn("codes", codesUdf(books)(col("nv")))
        .select(col("nv"), posexplode(col("codes")).as(Seq("sub", "code")))
      val sums = (0 until dsub).map(i =>
        graft.functions.Exact.dsum(
          element_at(col("nv"), col("sub") * dsub + i + 1)
            .cast(org.apache.spark.sql.types.DecimalType(24, 18))).as(s"s$i")) :+
        count(lit(1)).as("n")
      val upd = asg.groupBy(col("sub"), col("code")).agg(sums.head, sums.tail: _*).collect()
      val next = books.map(_.map(_.clone()))
      upd.foreach { r =>
        val s = r.getInt(0); val c = r.getInt(1); val n = r.getLong(dsub + 2).toDouble
        next(s)(c) = (0 until dsub).map(i => r.getDouble(i + 2) / n).toArray
      }
      books = next
    }
    nv.unpersist()
    books
  }

  /** Encode the corpus against a trained codebook: each vector → `m`
    * small codes (one map pass, broadcast codebook in the UDF closure). */
  def pqEncode(corpus: DataFrame, books: PqCodebook,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = books.length
    val dsub = books(0)(0).length
    val enc = udf { (v0: Array[Double]) =>
      var nrm = 0.0; var j = 0
      while (j < v0.length) { nrm += v0(j) * v0(j); j += 1 }
      nrm = math.sqrt(nrm)
      val v = if (nrm == 0.0) v0 else v0.map(_ / nrm)
      val out = new Array[Int](m)
      var s = 0
      while (s < m) {
        val cents = books(s)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          val ct = cents(c); var d = 0.0; var i = 0
          while (i < dsub) {
            val diff = v(s * dsub + i) - ct(i); d += diff * diff; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(s) = best
        s += 1
      }
      out
    }
    corpus.withColumn("pq_codes", enc(col(vecCol).cast("array<double>")))
  }

  /** PQ-ADC top-k with exact re-rank: per query, ONE lookup-table build
    * (m·ks subspace dots), then every corpus vector scores in m table
    * adds — the asymmetric-distance scan that replaces the full-dim dot
    * at scale — and only the `rerank` best candidates pay an exact cosine
    * against their true vectors. `rerank >= |corpus|` degenerates to the
    * exact answer (the ann_pq_exhaustive gate pins this equality).
    *
    * Scale shape: queries (with their LUTs) broadcast; the corpus side is
    * one codes scan + candidate top-N window; only candidate rows join
    * back to the full vectors. */
  /** Per-query ADC lookup table: m·ks subspace dot products against the
    * normalized query. Shared by [[pqTopK]] and [[ivfPqTopK]]. */
  private def pqLutUdf(books: PqCodebook) = {
    val m = books.length; val ks = books(0).length; val dsub = books(0)(0).length
    udf { (q0: Array[Double]) =>
      var nrm = 0.0; var j = 0
      while (j < q0.length) { nrm += q0(j) * q0(j); j += 1 }
      nrm = math.sqrt(nrm)
      val q = if (nrm == 0.0) q0 else q0.map(_ / nrm)
      val lut = new Array[Double](m * ks)
      var s = 0
      while (s < m) {
        var c = 0
        while (c < ks) {
          val ct = books(s)(c); var d = 0.0; var i = 0
          while (i < dsub) { d += q(s * dsub + i) * ct(i); i += 1 }
          lut(s * ks + c) = d
          c += 1
        }
        s += 1
      }
      lut
    }
  }

  /** ADC score: m table adds per corpus row. */
  private def pqAdcUdf(books: PqCodebook) = {
    val m = books.length; val ks = books(0).length
    udf { (lut: Array[Double], codes: Array[Int]) =>
      var acc = 0.0; var s = 0
      while (s < m) { acc += lut(s * ks + codes(s)); s += 1 }
      acc
    }
  }

  def pqTopK(encoded: DataFrame, queries: DataFrame, books: PqCodebook,
      k: Int, rerank: Int = 50,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = encoded.sparkSession
    val lutUdf = pqLutUdf(books)
    val adcUdf = pqAdcUdf(books)
    val q = queries.select(col(idCol).as("qid"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("lut", lutUdf(col("qv")))
    val cand = encoded.select(col(idCol).as("cid"), col("pq_codes"))
      .crossJoin(broadcast(q.select(col("qid"), col("lut"))))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), adcUdf(col("lut"), col("pq_codes")).as("adc"))
    val wCand = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("adc").desc, col("cid").asc)
    val top = cand.withColumn("r", row_number().over(wCand)).filter(col("r") <= rerank)
      .select(col("qid"), col("cid"))
    val scored = top
      .join(encoded.select(col(idCol).as("cid"),
        col(vecCol).cast("array<double>").as("cv")), Seq("cid"))
      .join(broadcast(q.select(col("qid"), col("qv"))), Seq("qid"))
      .select(col("qid"), col("cid"),
        round(nativeCosine(spark, col("qv"), col("cv")), 6).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF-style search with a provided coarse partition (here: `label`):
    * centroid per cell, probe the query's `nprobe` nearest centroid cells
    * (nprobe=1 is classic coarse-quantizer search; raising it trades one
    * more bucket-join probe per query for recall — the standard IVF
    * recall knob). Cells are disjoint so probed candidates never repeat;
    * the candidate set stays ~nprobe/cells of the corpus and the big side
    * still only shuffles on the cell key. */
  /** Centroid per cell: element-wise mean — sums and count in ONE
    * aggregation pass (a second groupBy + join would shuffle the corpus
    * twice for the same nlist-row result). DECIMAL sums (Exact.dsum,
    * the kmeansAssign discipline): a raw double sum is partition-order
    * dependent, and a near-tie cdist could flip the probe's cell choice
    * between runs — the determinism the module header promises. Input
    * columns (cid, cell, cv); output (cell, centroid). */
  private def cellCentroids(c: DataFrame, dims: Int): DataFrame = {
    val sums = (0 until dims).map(i =>
      graft.functions.Exact.dsum(element_at(col("cv"), i + 1)
        .cast(org.apache.spark.sql.types.DecimalType(24, 18))).as(s"s$i")) :+
      count(lit(1)).as("n")
    c.groupBy(col("cell")).agg(sums.head, sums.tail: _*)
      .select(col("cell"),
        array((0 until dims).map(i => col(s"s$i") / col("n")): _*).as("centroid"))
  }

  /** Per-query probe set: the `nprobe` nearest cell centroids by cosine.
    * Output (qid, qv, cell). */
  private def probeCells(queries: DataFrame, cent: DataFrame, nprobe: Int,
      idCol: String, vecCol: String): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
    val probe = q.crossJoin(broadcast(cent))
      .withColumn("cdist", cosine(col("qv"), col("centroid")))
    val w0 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cdist").desc, col("cell").asc)
    probe.withColumn("r", row_number().over(w0)).filter(col("r") <= nprobe)
      .select(col("qid"), col("qv"), col("cell"))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      cellCol: String = "label", idCol: String = "vec_id", vecCol: String = "embedding",
      dims: Int = 64, nprobe: Int = 1): DataFrame = {
    val c = corpus.select(col(idCol).as("cid"), col(cellCol).as("cell"),
      col(vecCol).cast("array<double>").as("cv"))
    val cent = cellCentroids(c, dims)
    val best = probeCells(queries, cent, nprobe, idCol, vecCol)
    val scored = c.join(broadcast(best), "cell")
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        round(nativeCosine(corpus.sparkSession, col("qv"), col("cv")), 6).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF-PQ composite ANN (Jégou et al. 2011 §IV "IVFADC" — the FAISS
    * billion-vector default): the coarse quantizer restricts each query
    * to its `nprobe` nearest cells, the ADC code scan ranks ONLY those
    * cells' rows (m table adds per row instead of a full-dim dot), and
    * the `rerank` best ADC candidates pay an exact cosine. Composes the
    * two index artifacts this module already builds offline: a cell
    * column ([[kmeansAssign]]) and PQ codes ([[pqEncode]]) on the same
    * corpus frame.
    *
    * Why this is THE 100 TB ANN shape: the scan cost is
    * (nprobe/nlist) × corpus × m adds — both factors tunable — and the
    * corpus side shuffles on nothing (the probed queries + their KB-size
    * LUTs broadcast; candidate rows alone join back to full vectors).
    * With nprobe = nlist and rerank ≥ |corpus| it provably degenerates
    * to exact brute force (the `ann_ivfpq_exhaustive` gate pins that
    * equality through the whole composite path: quantizer, probe
    * ranking, per-cell ADC, LUT, rerank). */
  def ivfPqTopK(encoded: DataFrame, queries: DataFrame, books: PqCodebook,
      k: Int, cellCol: String = "cell", nprobe: Int = 2, rerank: Int = 50,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dims: Int = 64): DataFrame = {
    val spark = encoded.sparkSession
    val c = encoded.select(col(idCol).as("cid"), col(cellCol).as("cell"),
      col(vecCol).cast("array<double>").as("cv"), col("pq_codes"))
    val cent = cellCentroids(c.select(col("cid"), col("cell"), col("cv")), dims)
    // one LUT per QUERY, broadcast once — attaching it to the probe set
    // would evaluate the UDF and carry the m·ks doubles once per probed
    // CELL (nprobe× the broadcast bytes for identical content)
    val q = queries.select(col(idCol).as("qid"),
      col(vecCol).cast("array<double>").as("qv"))
    val qlut = q.withColumn("lut", pqLutUdf(books)(col("qv")))
    val probes = probeCells(queries, cent, nprobe, idCol, vecCol)
      .select(col("qid"), col("cell"))
    val cand = c.join(broadcast(probes), "cell")
      .join(broadcast(qlut.select(col("qid"), col("lut"))), Seq("qid"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        pqAdcUdf(books)(col("lut"), col("pq_codes")).as("adc"))
    val wCand = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("adc").desc, col("cid").asc)
    val top = cand.withColumn("r", row_number().over(wCand)).filter(col("r") <= rerank)
      .select(col("qid"), col("cid"))
    val scored = top
      .join(c.select(col("cid"), col("cv")), Seq("cid"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("cid"),
        round(nativeCosine(spark, col("qv"), col("cv")), 6).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Persist a trained PQ index — codebooks + encoded corpus — as plain
    * parquet: the offline-build / online-serve split a billion-vector
    * deployment needs. The index is built once in a batch job (the
    * expensive part: Lloyd over the corpus); any other session loads the
    * ~KB codebooks to the driver and scans the compact code table. Same
    * artifact policy as [[graft.sources.Layout]]'s rewrites, but durable
    * across sessions instead of memoized within one. */
  def savePqIndex(dir: String, books: PqCodebook, encoded: DataFrame): Unit = {
    val spark = encoded.sparkSession
    import spark.implicits._
    books.zipWithIndex.flatMap { case (sub, s) =>
      sub.zipWithIndex.map { case (cent, c) => (s, c, cent.toSeq) }
    }.toSeq.toDF("sub", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/books")
    encoded.write.mode("overwrite").parquet(s"$dir/encoded")
  }

  /** Load a [[savePqIndex]] artifact; the returned pair feeds [[pqTopK]]
    * exactly like the in-session one. */
  def loadPqIndex(spark: SparkSession, dir: String): (PqCodebook, DataFrame) = {
    val rows = spark.read.parquet(s"$dir/books").collect()
    val m = rows.map(_.getInt(0)).max + 1
    val ks = rows.map(_.getInt(1)).max + 1
    val books: PqCodebook = Array.ofDim[Array[Double]](m, ks)
    rows.foreach { r =>
      books(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    }
    (books, spark.read.parquet(s"$dir/encoded"))
  }
}
