package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.datalog.{Planner, TableSource}

/** Correctness-gate queries for the Datalog surface (SURVEY §2.2/§2.3/§2.4/
  * §2.6): each runs an EDN Datalog query through the planner against the
  * typed TableSource and must hash-match the DuckDB SQL in [[DatalogSql]].
  *
  * Aggregate choice note: sums/avgs here run over integral-valued doubles
  * (l_quantity) or exact types — order-independent in IEEE arithmetic — so
  * no decimal bridging is needed for oracle parity.
  */
object DatalogQueries {

  private def dl(q: String, args: Any*)(s: SparkSession, dir: String): DataFrame =
    Planner.q(s, TableSource.tpch(s, dir), q, args: _*)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // scan + range preds + computed binding + agg (TPC-H Q6 as Datalog,
    // the reference's minimum end-to-end slice, fixtures/tpch.clj:243-254)
    "dl_q6_shape" -> dl("""
      {:find [(count ?l) (sum ?q)]
       :keys [n sum_qty]
       :where [[?l :l_shipdate ?sd] [?l :l_discount ?d]
               [?l :l_quantity ?q] [?l :l_extendedprice ?p]
               [(>= ?sd #inst "1997-01-01")] [(< ?sd #inst "1998-01-01")]
               [(>= ?d 0.05)] [(<= ?d 0.07)] [(< ?q 24)]]}""") _,

    // multi-hop value joins across four entity vars + implicit grouping
    "dl_join_regions" -> dl("""
      {:find [?rname (count ?c)]
       :keys [r_name numcust]
       :where [[?c :c_nationkey ?nk] [?n :n_nationkey ?nk]
               [?n :n_regionkey ?rk] [?r :r_regionkey ?rk]
               [?r :r_name ?rname]]}""") _,

    // aggregates incl. count-distinct and exact median over a group key
    "dl_agg_lineitem" -> dl("""
      {:find [?rf (sum ?q) (avg ?q) (median ?q) (count-distinct ?ok) (min ?q) (max ?q)]
       :keys [l_returnflag sum_qty avg_qty median_qty n_orders min_qty max_qty]
       :where [[?l :l_returnflag ?rf] [?l :l_quantity ?q] [?l :l_orderkey ?ok]]}""") _,

    // not-join (anti): BUILDING customers with no 'P'-status orders.
    // The status literal keeps the gate NON-vacuous: the synthetic fixture
    // gives every customer at least one order, so the r3/r4 "no orders at
    // all" shape matched on emptiness only (11 rows at sf0.01, 1 at sf0.001).
    "dl_not_join" -> dl("""
      {:find [?ck]
       :keys [c_custkey]
       :where [[?c :c_custkey ?ck] [?c :c_mktsegment "BUILDING"]
               (not-join [?ck] [?o :o_custkey ?ck] [?o :o_orderstatus "P"])]}""") _,

    // or (union) + grouping
    "dl_or_types" -> dl("""
      {:find [?b (count ?p)]
       :keys [p_brand n]
       :where [[?p :p_brand ?b]
               (or [?p :p_type "PROMO"] [?p :p_type "ECONOMY"])]}""") _,

    // self-join with theta predicate: nation pairs within a region
    "dl_theta_pairs" -> dl("""
      {:find [?n1name ?n2name]
       :keys [n1 n2]
       :where [[?n1 :n_regionkey ?rk] [?n2 :n_regionkey ?rk]
               [?n1 :n_nationkey ?k1] [?n2 :n_nationkey ?k2]
               [(< ?k1 ?k2)]
               [?n1 :n_name ?n1name] [?n2 :n_name ?n2name]]}""") _,

    // rule expansion (non-recursive): region membership as a rule
    "dl_rule_region" -> dl("""
      {:find [?ck]
       :keys [c_custkey]
       :where [(in-region ?c "ASIA") [?c :c_custkey ?ck]]
       :rules [[(in-region ?c ?rn)
                [?c :c_nationkey ?nk] [?n :n_nationkey ?nk]
                [?n :n_regionkey ?rk] [?r :r_regionkey ?rk]
                [?r :r_name ?rn]]]}""") _,

    // :in collection binding
    "dl_in_coll" -> dl("""
      {:find [?seg (count ?c)]
       :keys [c_mktsegment n]
       :in [[?seg ...]]
       :where [[?c :c_mktsegment ?seg]]}""",
      Seq("BUILDING", "AUTOMOBILE")) _,

    // legacy :args arg-map relation (query.clj:150-155, r3)
    "dl_args" -> dl("""
      {:find [?seg (count ?c)]
       :keys [c_mktsegment n]
       :where [[?c :c_mktsegment ?seg]]
       :args [{:?seg "BUILDING"} {:?seg "AUTOMOBILE"}]}""") _,

    // order-by / limit (top-k)
    "dl_topk_balance" -> dl("""
      {:find [?ck ?ab]
       :keys [c_custkey c_acctbal]
       :where [[?c :c_custkey ?ck] [?c :c_acctbal ?ab]]
       :order-by [[?ab :desc] [?ck :asc]]
       :limit 5}""") _,

    // predicate return binding as a computed column
    "dl_pred_binding" -> dl("""
      {:find [?ok ?fee]
       :keys [o_orderkey fee]
       :where [[?o :o_orderkey ?ok] [?o :o_totalprice ?tp]
               [(> ?tp 400000)] [(* ?tp 0.05) ?fee]]}""") _,

    // broadened allowlist fns: split/last/count/replace/format/lower over
    // customer names (VERDICT round-1 item 3)
    "dl_fns_corpus" -> dl("""
      {:find [?ck ?num ?np ?sn ?fmt]
       :keys [c_custkey num np sn fmt]
       :where [[?c :c_custkey ?ck] [?c :c_name ?nm] [?c :c_mktsegment ?seg]
               [(< ?ck 100)]
               [(clojure.string/split ?nm "#") ?parts]
               [(last ?parts) ?num]
               [(count ?parts) ?np]
               [(clojure.string/replace ?nm "Customer" "Cust") ?sn]
               [(lower-case ?seg) ?ls]
               [(format "%s/%s" ?num ?ls) ?fmt]]}""") _,

    // registry breadth round 2: bitwise ops, numeric casts, compare,
    // string index-of, vector peek — allowlist fns beyond dl_fns_corpus
    "dl_fns_corpus2" -> dl("""
      {:find [?ck ?band ?shl ?bx ?dbl ?cmp ?idx ?pk]
       :keys [c_custkey band shl bx dbl cmp idx pk]
       :where [[?c :c_custkey ?ck] [?c :c_name ?nm]
               [(< ?ck 200)] [(bit-test ?ck 0)]
               [(bit-and ?ck 255) ?band]
               [(bit-shift-left ?ck 2) ?shl]
               [(bit-xor ?ck 5) ?bx]
               [(double ?ck) ?dbl]
               [(compare ?ck 100) ?cmp]
               [(clojure.string/index-of ?nm "#") ?idx]
               [(clojure.string/split ?nm "#") ?parts]
               [(peek ?parts) ?pk]]}""") _,

    // registry breadth round 3: re-seq, char/code-point fns, higher-order
    // fns over literal fn symbols (map/filter/every?/some/apply/max-key),
    // interleave/interpose, frequencies as sorted (item, n) struct array.
    // Array-typed columns are JSON-serialized on both sides — the driver's
    // checker hashes scalar cells only (r3 verdict: pandas can't sort
    // ndarray cells), so gates must emit flat columns.
    "dl_fns_corpus3" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.{col, to_json}
      val df = dl("""
        {:find [?ck ?rs ?chr ?cp ?mk ?il ?ip ?fr ?tot ?linc ?lodd ?ev ?sm]
         :keys [c_custkey rs chr cp mk il ip fr tot linc lodd ev sm]
         :where [[?c :c_custkey ?ck] [?c :c_name ?nm] [?c :c_mktsegment ?seg]
                 [(< ?ck 100)]
                 [(re-seq "[0-9]+" ?nm) ?rs]
                 [(mod ?ck 26) ?m26] [(+ 65 ?m26) ?c65] [(char ?c65) ?chr]
                 [(first ?nm) ?f1] [(int ?f1) ?cp]
                 [(max-key count ?nm ?seg) ?mk]
                 [(clojure.string/split ?nm "0") ?parts]
                 [(interleave ?parts ?parts) ?il]
                 [(interpose "-" ?parts) ?ip]
                 [(frequencies ?il) ?fr]
                 [(map count ?parts) ?lens]
                 [(apply + ?lens) ?tot]
                 [(map inc ?lens) ?linc]
                 [(filter odd? ?lens) ?lodd]
                 [(every? pos? ?lens) ?ev]
                 [(some even? ?lens) ?sm]]}""")(s, dir)
      Seq("rs", "il", "ip", "fr", "linc", "lodd")
        .foldLeft(df)((d, c) => d.withColumn(c, to_json(col(c))))
    }),

    // registry breadth round 4: map values (zipmap/assoc/merge/keys/vals/
    // get/select-keys/get-in as Spark MapType, JSON-serialized for the
    // oracle), seq-tail fns (next/take-nth/partition-all/dedupe/ffirst),
    // bit-set/clear/flip, sorted-set + subseq, qualified-keyword?
    "dl_fns_corpus4" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.{col, to_json}
      dl("""
        {:find [?ck ?zm ?asx ?mg ?ks ?vs ?gv ?sk ?gi ?nx ?tn ?pa ?ff ?dd ?bs ?bc ?bf ?sq]
         :keys [c_custkey zm asx mg ks vs gv sk gi nx tn pa ff dd bs bc bf sq]
         :order-by [[?ck :asc]]
         :limit 200
         :where [[?c :c_custkey ?ck] [?c :c_name ?nm] [?c :c_mktsegment ?seg]
                 [(< ?ck 100)]
                 [(vector "name" "seg") ?mks]
                 [(vector ?nm ?seg) ?mvs]
                 [(zipmap ?mks ?mvs) ?zm]
                 [(assoc ?zm "seg" "X") ?asx]
                 [(hash-map "extra" "Y") ?m2]
                 [(merge ?zm ?m2) ?mg]
                 [(keys ?zm) ?ks] [(vals ?zm) ?vs]
                 [(get ?zm "name") ?gv]
                 [(select-keys ?zm ["seg"]) ?sk]
                 [(get-in ?zm ["seg"]) ?gi]
                 [(clojure.string/split ?nm "0") ?parts]
                 [(next ?parts) ?nx]
                 [(take-nth 2 ?parts) ?tn]
                 [(partition-all 2 ?parts) ?pa]
                 [(ffirst ?pa) ?ff]
                 [(map count ?parts) ?lens]
                 [(dedupe ?lens) ?dd]
                 [(bit-set ?ck 10) ?bs]
                 [(bit-clear ?ck 0) ?bc]
                 [(bit-flip ?ck 1) ?bf]
                 [(sorted-set 3 1 2 3) ?ss]
                 [(subseq ?ss >= 2) ?sq]]}""")(s, dir)
        .withColumn("zm", to_json(col("zm")))
        .withColumn("asx", to_json(col("asx")))
        .withColumn("mg", to_json(col("mg")))
        .withColumn("sk", to_json(col("sk")))
        // array columns JSON-flattened for the driver's scalar-only checker
        .withColumn("ks", to_json(col("ks")))
        .withColumn("vs", to_json(col("vs")))
        .withColumn("nx", to_json(col("nx")))
        .withColumn("tn", to_json(col("tn")))
        .withColumn("pa", to_json(col("pa")))
        .withColumn("dd", to_json(col("dd")))
        .withColumn("sq", to_json(col("sq")))
    }),

    // registry tail round 5 (VERDICT #6): group-carrying re-find /
    // re-matches (Clojure's [full g1 … gn] vectors), re-matcher +
    // re-groups (first-match matcher model), and strict-bounds subs
    "dl_fns_corpus5" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.{col, to_json}
      dl("""
        {:find [?ck ?gf ?gm ?rg ?rf1 ?nf ?pre ?sfx]
         :keys [c_custkey gf gm rg rf1 nf pre sfx]
         :order-by [[?ck :asc]]
         :limit 200
         :where [[?c :c_custkey ?ck] [?c :c_name ?nm]
                 [(< ?ck 100)]
                 [(re-find "#([0-9]+)" ?nm) ?gf]
                 [(re-matches "([A-Za-z]+)#([0-9]+)" ?nm) ?gm]
                 [(re-matcher "([0-9][0-9])" ?nm) ?m]
                 [(re-groups ?m) ?rg]
                 [(re-find ?m) ?rf1]
                 [(re-find "(9[0-9])" ?nm) ?nf]
                 [(subs ?nm 0 8) ?pre]
                 [(subs ?nm 9) ?sfx]]}""")(s, dir)
        .withColumn("gf", to_json(col("gf")))
        .withColumn("gm", to_json(col("gm")))
        .withColumn("rg", to_json(col("rg")))
        .withColumn("rf1", to_json(col("rf1")))
        .withColumn("nf", to_json(col("nf")))
    }),

    // registry tail round 6 (VERDICT r5 #2): matcher STEPPING — Clojure's
    // successive (re-find m) advancing a re-matcher is imperative
    // driver-side state in the reference too, so ports rewrite "the k-th
    // find" as (nth (re-seq pat s) k): re-seq with a capture-group
    // pattern now yields Clojure's all-matches GROUP VECTORS
    // ([full g1 g2] per match), and nth indexes the steps
    "dl_fns_corpus6" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.{col, to_json}
      dl("""
        {:find [?ck ?sq ?m0 ?m1 ?m1g2 ?cnt ?lastm]
         :keys [c_custkey sq m0 m1 m1g2 n_matches last_m]
         :order-by [[?ck :asc]]
         :limit 200
         :where [[?c :c_custkey ?ck] [?c :c_name ?nm]
                 [(< ?ck 100)]
                 [(re-seq "([0-9])([0-9])" ?nm) ?sq]
                 [(nth ?sq 0) ?m0]
                 [(nth ?sq 1) ?m1]
                 [(nth ?m1 2) ?m1g2]
                 [(count ?sq) ?cnt]
                 [(last ?sq) ?lastm]]}""")(s, dir)
        .withColumn("sq", to_json(col("sq")))
        .withColumn("m0", to_json(col("m0")))
        .withColumn("m1", to_json(col("m1")))
        .withColumn("last_m", to_json(col("last_m")))
    }),

    // registry breadth round 6b: transients (value semantics of the
    // persistent ops), Java-array read fns (aget/alength/into-array/
    // to-array-2d) and class-object fns (instance?/cast over the static
    // column type) — the last allowlist families with columnar meaning
    "dl_fns_corpus7" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.{col, to_json}
      dl("""
        {:find [?ck ?tm ?cjv ?al ?ag ?m00 ?istr ?inum ?castn]
         :keys [c_custkey tm cjv al ag m00 is_str is_num cast_n]
         :order-by [[?ck :asc]]
         :limit 200
         :where [[?c :c_custkey ?ck] [?c :c_name ?nm] [?c :c_mktsegment ?seg]
                 [(< ?ck 100)]
                 [(hash-map "name" ?nm) ?m0]
                 [(transient ?m0) ?t0]
                 [(assoc! ?t0 "seg" ?seg) ?t1]
                 [(dissoc! ?t1 "name") ?t2]
                 [(persistent! ?t2) ?tm]
                 [(vector ?nm ?seg) ?v0]
                 [(transient ?v0) ?tv0]
                 [(conj! ?tv0 "Z") ?tv1]
                 [(pop! ?tv1) ?tv2]
                 [(persistent! ?tv2) ?cjv]
                 [(re-seq "[0-9]" ?nm) ?digits]
                 [(into-array ?digits) ?arr]
                 [(alength ?arr) ?al]
                 [(aget ?arr 0) ?ag]
                 [(re-seq "([0-9])([0-9])" ?nm) ?sq]
                 [(to-array-2d ?sq) ?a2]
                 [(aget ?a2 0 0) ?m00]
                 [(instance? String ?nm) ?istr]
                 [(instance? Number ?nm) ?inum]
                 [(cast Number ?ck) ?castn]]}""")(s, dir)
        .withColumn("tm", to_json(col("tm")))
        .withColumn("cjv", to_json(col("cjv")))
    }),

    // top-down computational recursion (racket fib, query_test.clj:3181,
    // r4): groundless recursive rules evaluate per binding on the driver;
    // joined against a data clause so the gate exercises the correlated
    // (deferred) path too
    "dl_rule_fib" -> dl("""
      {:find [?rk ?f]
       :keys [r_regionkey fib]
       :where [[?r :r_regionkey ?rk] [(+ ?rk 10) ?n] (fib ?n ?f)]
       :rules [[(fib n f) [(<= n 1)] [(identity n) f]]
               [(fib n f) [(> n 1)]
                [(- n 1) n1] [(- n 2) n2]
                (fib n1 f1) (fib n2 f2)
                [(+ f1 f2) f]]]}""") _,

    // rel-as-value subquery bindings (query_test.clj:1303 test-sub-queries;
    // bind-binding query.clj:933-952): the nested relation binds WHOLE as
    // one sorted array-of-rows value (scalar form), and tuple positions
    // destructure its rows. Array column JSON-flattened for the checker.
    "dl_subquery_rel" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.{col, to_json}
      dl("""
        {:find [?rname ?cnt ?rel ?f1]
         :keys [r_name n_nations nations first_row]
         :where [[?r :r_name ?rname] [?r :r_regionkey ?rk]
                 [(q {:find [?nn] :in [?rk2]
                      :where [[?n :n_regionkey ?rk2] [?n :n_name ?nn]]} ?rk)
                  ?rel]
                 [(count ?rel) ?cnt]
                 [(q {:find [?nn2] :in [?rk3]
                      :where [[?n2 :n_regionkey ?rk3] [?n2 :n_name ?nn2]]} ?rk)
                  [?fr ?_]]
                 [(first ?fr) ?f1]]}""")(s, dir)
        .withColumn("nations", to_json(col("nations")))
    }),

    // ordered + limited subquery: top-2 customer balances per nation via a
    // relation-bound nested query (VERDICT round-1 item 4)
    "dl_subquery_topn" -> dl("""
      {:find [?nname ?top]
       :keys [n_name top_bal]
       :where [[?n :n_nationkey ?nk] [?n :n_name ?nname]
               [(q {:find [?ab] :in [?nk2] :order-by [[?ab :desc]] :limit 2
                    :where [[?c :c_nationkey ?nk2] [?c :c_acctbal ?ab]]} ?nk)
                [[?top]]]]}""") _)
}

object DatalogSql {
  val all: Map[String, String] = Map(
    "dl_q6_shape" -> """
      SELECT COUNT(*) AS n, SUM(l_quantity) AS sum_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",

    "dl_join_regions" -> """
      SELECT r_name, COUNT(*) AS numcust
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name""",

    "dl_agg_lineitem" -> """
      SELECT l_returnflag, SUM(l_quantity) AS sum_qty, AVG(l_quantity) AS avg_qty,
             MEDIAN(l_quantity) AS median_qty, COUNT(DISTINCT l_orderkey) AS n_orders,
             MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
      FROM lineitem
      GROUP BY l_returnflag""",

    "dl_not_join" -> """
      SELECT DISTINCT c_custkey
      FROM customer
      WHERE c_mktsegment = 'BUILDING'
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""",

    "dl_or_types" -> """
      SELECT p_brand, COUNT(*) AS n
      FROM part
      WHERE p_type = 'PROMO' OR p_type = 'ECONOMY'
      GROUP BY p_brand""",

    "dl_theta_pairs" -> """
      SELECT DISTINCT n1.n_name AS n1, n2.n_name AS n2
      FROM nation n1
      JOIN nation n2 ON n1.n_regionkey = n2.n_regionkey
        AND n1.n_nationkey < n2.n_nationkey""",

    "dl_rule_region" -> """
      SELECT DISTINCT c_custkey
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'""",

    "dl_in_coll" -> """
      SELECT c_mktsegment, COUNT(*) AS n
      FROM customer
      WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      GROUP BY c_mktsegment""",

    "dl_args" -> """
      SELECT c_mktsegment, COUNT(*) AS n
      FROM customer
      WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      GROUP BY c_mktsegment""",

    "dl_topk_balance" -> """
      SELECT c_custkey, c_acctbal
      FROM customer
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 5""",

    "dl_pred_binding" -> """
      SELECT DISTINCT o_orderkey, o_totalprice * 0.05 AS fee
      FROM orders
      WHERE o_totalprice > 400000""",

    "dl_fns_corpus" -> """
      SELECT DISTINCT c_custkey,
             string_split(c_name, '#')[-1] AS num,
             len(string_split(c_name, '#')) AS np,
             replace(c_name, 'Customer', 'Cust') AS sn,
             string_split(c_name, '#')[-1] || '/' || lower(c_mktsegment) AS fmt
      FROM customer
      WHERE c_custkey < 100""",

    "dl_fns_corpus2" -> """
      SELECT DISTINCT c_custkey,
        c_custkey & 255 AS band,
        c_custkey << 2 AS shl,
        xor(c_custkey, 5) AS bx,
        CAST(c_custkey AS DOUBLE) AS dbl,
        CASE WHEN c_custkey = 100 THEN 0 WHEN c_custkey < 100 THEN -1 ELSE 1 END AS cmp,
        strpos(c_name, '#') - 1 AS idx,
        string_split(c_name, '#')[-1] AS pk
      FROM customer WHERE c_custkey < 200 AND (c_custkey & 1) = 1""",

    "dl_rule_fib" -> """
      WITH RECURSIVE fib(n, a, b) AS (
        SELECT 0, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
        UNION ALL
        SELECT n + 1, b, a + b FROM fib WHERE n < 15)
      SELECT r_regionkey, a AS fib
      FROM region JOIN fib ON n = r_regionkey + 10""",

    "dl_subquery_rel" -> """
      WITH per_region AS (
        SELECT r_name, count(*) AS n, list_sort(list(n_name)) AS names
        FROM region JOIN nation ON r_regionkey = n_regionkey
        GROUP BY r_name, r_regionkey)
      SELECT r_name,
        CAST(n AS BIGINT) AS n_nations,
        to_json(list_transform(names, x -> [x])) AS nations,
        names[1] AS first_row
      FROM per_region""",

    "dl_subquery_topn" -> """
      WITH ranked AS (
        SELECT n_name, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC) AS rn
        FROM customer JOIN nation ON c_nationkey = n_nationkey)
      SELECT DISTINCT n_name, c_acctbal AS top_bal FROM ranked WHERE rn <= 2""",

    "dl_fns_corpus4" -> """
      WITH base AS (
        SELECT c_custkey, c_name, c_mktsegment,
               string_split(c_name, '0') AS parts
        FROM customer WHERE c_custkey < 100),
      mid AS (
        SELECT *, list_transform(parts, x -> CAST(len(x) AS BIGINT)) AS lens
        FROM base)
      SELECT c_custkey,
        to_json(MAP(['name','seg'], [c_name, c_mktsegment])) AS zm,
        to_json(MAP(['name','seg'], [c_name, 'X'])) AS asx,
        to_json(MAP(['name','seg','extra'], [c_name, c_mktsegment, 'Y'])) AS mg,
        to_json(['name','seg']) AS ks,
        to_json([c_name, c_mktsegment]) AS vs,
        c_name AS gv,
        to_json(MAP(['seg'], [c_mktsegment])) AS sk,
        c_mktsegment AS gi,
        to_json(CASE WHEN len(parts) > 1 THEN parts[2:] END) AS nx,
        to_json(list_filter(parts, (x, i) -> (i - 1) % 2 = 0)) AS tn,
        to_json(list_transform(range(CAST(ceil(len(parts) / 2.0) AS BIGINT)),
          g -> parts[(g*2+1):(g*2+2)])) AS pa,
        parts[1] AS ff,
        to_json(list_filter(lens, (x, i) -> i = 1 OR x <> lens[i-1])) AS dd,
        (c_custkey | 1024) AS bs,
        (c_custkey & ~1) AS bc,
        xor(c_custkey, 2) AS bf,
        to_json([CAST(2 AS BIGINT), 3]) AS sq
      FROM mid ORDER BY c_custkey LIMIT 200""",

    "dl_fns_corpus7" -> """
      WITH base AS (
        SELECT c_custkey, c_name, c_mktsegment,
          regexp_extract_all(c_name, '[0-9]', 0) AS digits,
          regexp_extract_all(c_name, '([0-9])([0-9])', 0) AS g0
        FROM customer WHERE c_custkey < 100)
      SELECT c_custkey,
        to_json(MAP(['seg'], [c_mktsegment])) AS tm,
        to_json([c_name, c_mktsegment]) AS cjv,
        CAST(len(digits) AS BIGINT) AS al,
        digits[1] AS ag,
        g0[1] AS m00,
        true AS is_str,
        false AS is_num,
        c_custkey AS cast_n
      FROM base ORDER BY c_custkey LIMIT 200""",

    "dl_fns_corpus5" -> """
      SELECT c_custkey,
        to_json([regexp_extract(c_name, '#([0-9]+)', 0),
                 regexp_extract(c_name, '#([0-9]+)', 1)]) AS gf,
        CASE WHEN regexp_full_match(c_name, '([A-Za-z]+)#([0-9]+)')
             THEN to_json([c_name,
                           regexp_extract(c_name, '([A-Za-z]+)#([0-9]+)', 1),
                           regexp_extract(c_name, '([A-Za-z]+)#([0-9]+)', 2)])
        END AS gm,
        to_json([regexp_extract(c_name, '([0-9][0-9])', 0),
                 regexp_extract(c_name, '([0-9][0-9])', 1)]) AS rg,
        to_json([regexp_extract(c_name, '([0-9][0-9])', 0),
                 regexp_extract(c_name, '([0-9][0-9])', 1)]) AS rf1,
        CASE WHEN regexp_matches(c_name, '(9[0-9])')
             THEN to_json([regexp_extract(c_name, '(9[0-9])', 0),
                           regexp_extract(c_name, '(9[0-9])', 1)])
        END AS nf,
        substring(c_name, 1, 8) AS pre,
        substring(c_name, 10) AS sfx
      FROM customer WHERE c_custkey < 100
      ORDER BY c_custkey LIMIT 200""",

    "dl_fns_corpus6" -> """
      WITH base AS (
        SELECT c_custkey, c_name,
          regexp_extract_all(c_name, '([0-9])([0-9])', 0) AS g0,
          regexp_extract_all(c_name, '([0-9])([0-9])', 1) AS g1,
          regexp_extract_all(c_name, '([0-9])([0-9])', 2) AS g2
        FROM customer WHERE c_custkey < 100),
      mid AS (
        SELECT *, list_transform(g0, (x, i) -> [x, g1[i], g2[i]]) AS sq
        FROM base)
      SELECT c_custkey,
        to_json(sq) AS sq,
        to_json(sq[1]) AS m0,
        to_json(sq[2]) AS m1,
        sq[2][3] AS m1g2,
        CAST(len(sq) AS BIGINT) AS n_matches,
        to_json(sq[len(sq)]) AS last_m
      FROM mid ORDER BY c_custkey LIMIT 200""",

    "dl_fns_corpus3" -> """
      WITH base AS (
        SELECT c_custkey, c_name, c_mktsegment,
               string_split(c_name, '0') AS parts
        FROM customer WHERE c_custkey < 100),
      mid AS (
        SELECT *,
               flatten(list_transform(parts, x -> [x, x])) AS il,
               list_transform(parts, x -> CAST(len(x) AS BIGINT)) AS lens
        FROM base)
      SELECT DISTINCT c_custkey,
        to_json(regexp_extract_all(c_name, '[0-9]+')) AS rs,
        chr(CAST(65 + (c_custkey % 26) AS INTEGER)) AS chr,
        CAST(ascii(substr(c_name, 1, 1)) AS BIGINT) AS cp,
        CASE WHEN len(c_mktsegment) >= len(c_name) THEN c_mktsegment ELSE c_name END AS mk,
        to_json(il) AS il,
        to_json(flatten(list_transform(parts, x -> ['-', x]))[2:]) AS ip,
        to_json(list_transform(list_sort(list_distinct(il)),
          x -> {'item': x, 'n': CAST(len(list_filter(il, y -> y = x)) AS BIGINT)})) AS fr,
        CAST(list_aggregate(lens, 'sum') AS BIGINT) AS tot,
        to_json(list_transform(lens, x -> x + 1)) AS linc,
        to_json(list_filter(lens, x -> x % 2 <> 0)) AS lodd,
        len(list_filter(lens, x -> NOT (x > 0))) = 0 AS ev,
        CASE WHEN len(list_filter(lens, x -> x % 2 = 0)) > 0 THEN true ELSE NULL END AS sm
      FROM mid""")
}
