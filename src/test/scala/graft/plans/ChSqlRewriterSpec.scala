package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Text-level pins for [[ChSqlRewriter]] — the pass/flip table lives in
  * `MigrantSqlSpec` (every formerly-GAP statement asserted raw-FAIL +
  * rewritten-PASS against real testdata); here the REWRITE TEXT itself
  * is pinned so a pass regression names the broken pass, plus the
  * named-error contracts and the Spark-SQL-is-a-fixed-point property.
  */
class ChSqlRewriterSpec extends AnyFunSuite {

  private def rw(sql: String): String = ChSqlRewriter.rewrite(sql)

  test("SETTINGS suffix is dropped (multi-setting list)") {
    assert(rw("SELECT count(*) FROM events SETTINGS max_threads = 4") ==
      "SELECT count ( * ) FROM events")
    assert(rw("SELECT 1 SETTINGS a = 1, b = 'x'") == "SELECT 1")
    // signed values are one setting, not a stray trailing token
    assert(rw("SELECT 1 SETTINGS log_level = -1, x = +2") == "SELECT 1")
  }

  test("trailing FORMAT suffix is dropped; FORMAT as a column survives") {
    assert(rw("SELECT count(*) FROM t FORMAT JSON") ==
      "SELECT count ( * ) FROM t")
    assert(rw("SELECT count(*) FROM t SETTINGS a = 1 FORMAT TabSeparated")
      == "SELECT count ( * ) FROM t")
    assert(rw("SELECT format FROM t") == "SELECT format FROM t")
  }

  test("LIMIT offset, n becomes LIMIT n OFFSET offset; LIMIT n BY is " +
    "left for the window rewrite") {
    assert(rw("SELECT x FROM t ORDER BY x LIMIT 5, 10") ==
      "SELECT x FROM t ORDER BY x LIMIT 10 OFFSET 5")
    assert(rw("SELECT k, v FROM t ORDER BY v LIMIT 2 BY k")
      .contains("__graft_limit_by <= 2"))
  }

  test("GLOBAL JOIN / GLOBAL IN / GLOBAL NOT IN drop the GLOBAL") {
    assert(rw("SELECT 1 FROM a GLOBAL JOIN b ON a.x = b.x")
      .contains("a JOIN b"))
    assert(rw("SELECT 1 WHERE x GLOBAL IN (SELECT 1)").contains("x IN ("))
    assert(rw("SELECT 1 WHERE x GLOBAL NOT IN (SELECT 1)")
      .contains("x NOT IN ("))
    // a column actually NAMED global survives
    assert(rw("SELECT global FROM t").contains("global FROM t"))
  }

  test("ALL JOIN drops the ALL (CH documents it as the standard join); " +
    "UNION ALL is untouched") {
    assert(rw("SELECT 1 FROM a ALL INNER JOIN b ON a.x = b.x")
      .contains("a INNER JOIN b"))
    assert(rw("SELECT 1 FROM a ALL LEFT JOIN b ON a.x = b.x")
      .contains("a LEFT JOIN b"))
    assert(rw("SELECT 1 UNION ALL SELECT 2") ==
      "SELECT 1 UNION ALL SELECT 2")
  }

  test("PREWHERE alone becomes WHERE; PREWHERE + WHERE merge with AND") {
    assert(rw("SELECT 1 FROM t PREWHERE a = 1") ==
      "SELECT 1 FROM t WHERE a = 1")
    assert(rw("SELECT 1 FROM t PREWHERE a = 1 WHERE b = 2 GROUP BY c") ==
      "SELECT 1 FROM t WHERE ( a = 1 ) AND ( b = 2 ) GROUP BY c")
  }

  test("count() becomes count(*); count(x) untouched") {
    assert(rw("SELECT count() FROM t") == "SELECT count ( * ) FROM t")
    assert(rw("SELECT count(x) FROM t") == "SELECT count ( x ) FROM t")
  }

  test("any()/anyHeavy() become any_value(); ANY LEFT JOIN lowers " +
    "(r17 verdict item 2)") {
    assert(rw("SELECT any(v) FROM t") == "SELECT any_value ( v ) FROM t")
    assert(rw("SELECT anyHeavy(v) FROM t") ==
      "SELECT any_value ( v ) FROM t")
    assert(!rw("SELECT 1 FROM a LEFT ANY JOIN b ON a.x = b.x")
      .contains("ANY"))
  }

  test("ANY LEFT JOIN lowers to a deterministic right-side pre-aggregate " +
    "+ plain LEFT JOIN; both keyword orders; USING kept; ANY INNER / " +
    "ANY RIGHT / bare ANY JOIN stay loud") {
    val out = rw("SELECT e.x, o.y FROM e ANY LEFT JOIN orders o " +
      "ON e.u = o.k")
    assert(out == "SELECT e . x , o . y FROM e LEFT JOIN ( SELECT " +
      "__graft_any . * FROM ( SELECT min ( struct ( * ) ) AS " +
      "__graft_any FROM orders GROUP BY k ) ) AS o ON e . u = o . k")
    // LEFT ANY order, bare right table (its own name is the alias)
    assert(rw("SELECT 1 FROM e LEFT ANY JOIN r ON e.u = r.k")
      .contains("GROUP BY k ) ) AS r ON e . u = r . k"))
    // multi-key + an expression on the LEFT side of a conjunct
    val multi = rw("SELECT 1 FROM e ANY LEFT JOIN r " +
      "ON e.a = r.k1 AND (e.b % 5) = r.k2")
    assert(multi.contains("GROUP BY k1 , k2"))
    // USING keys drive the GROUP BY and the USING clause survives
    val using = rw("SELECT 1 FROM e ANY LEFT JOIN r USING (k1, k2)")
    assert(using.contains("GROUP BY k1 , k2 ) ) AS r USING ( k1 , k2 )"))
    // subquery right side keeps its alias
    assert(rw("SELECT 1 FROM e ANY LEFT JOIN (SELECT k FROM t) s " +
      "ON e.u = s.k").contains("FROM ( SELECT k FROM t ) GROUP BY k"))
    // ANY INNER (and CH's bare ANY JOIN spelling of it) lowers to the
    // same pre-aggregate with an INNER join — Spark would silently
    // parse the bare form as a relation ALIASED 'any' + an ALL-matches
    // join, so claiming CH's reading is the safe direction for CH text
    val inner = rw("SELECT 1 FROM a ANY INNER JOIN b ON a.x = b.x")
    assert(inner.contains("FROM a JOIN ( SELECT __graft_any") &&
      !inner.contains("LEFT"))
    assert(rw("SELECT 1 FROM a ANY JOIN b ON a.x = b.x") == inner)
    assert(rw("SELECT 1 FROM a INNER ANY JOIN b ON a.x = b.x") == inner)
    // first-match over RIGHT multiplicity is NOT lowered: stays loud
    assert(rw("SELECT 1 FROM a ANY RIGHT JOIN b ON a.x = b.x")
      .contains("ANY RIGHT JOIN"))
    assert(rw("SELECT 1 FROM a RIGHT ANY JOIN b ON a.x = b.x")
      .contains("RIGHT ANY JOIN"))
    // a non-equi ANY LEFT condition is a named error
    val e = intercept[ChSqlRewriter.RewriteException](
      rw("SELECT 1 FROM e ANY LEFT JOIN r ON e.u > r.k"))
    assert(e.getMessage.contains("equi"))
  }

  test("ASOF JOIN lowers to the q28 union + running-window construction " +
    "(struct sides named by the aliases)") {
    val out = rw("SELECT a.x, b.y FROM l a ASOF JOIN r b " +
      "ON a.k = b.k AND a.ts >= b.ts")
    assert(out.startsWith("SELECT a . x , b . y FROM ( SELECT " +
      "__graft_l AS a , __graft_r AS b FROM ("))
    assert(out.contains("last ( __graft_r , true ) OVER ( PARTITION BY " +
      "__graft_k0 ORDER BY __graft_ts , __graft_side ROWS BETWEEN " +
      "UNBOUNDED PRECEDING AND CURRENT ROW )"))
    assert(out.contains("a . k AS __graft_k0 , a . ts AS __graft_ts , " +
      "1 AS __graft_side , struct ( * ) AS __graft_l , NULL AS " +
      "__graft_r FROM l AS a UNION ALL SELECT b . k , b . ts , 0 , " +
      "NULL , struct ( * ) FROM r AS b"))
    // default strictness is INNER: unmatched left rows are dropped
    assert(out.contains("WHERE __graft_side = 1 AND __graft_r IS NOT NULL"))
    // LEFT keeps them (both keyword orders)
    val left = rw("SELECT a.x FROM l a LEFT ASOF JOIN r b " +
      "ON a.k = b.k AND a.ts >= b.ts")
    assert(left.contains("WHERE __graft_side = 1 )") &&
      !left.contains("IS NOT NULL"))
    assert(rw("SELECT a.x FROM l a ASOF LEFT JOIN r b " +
      "ON a.k = b.k AND a.ts >= b.ts") == left)
    // strict > : left rows sort BEFORE right at equal ts
    assert(rw("SELECT a.x FROM l a ASOF JOIN r b " +
      "ON a.k = b.k AND a.ts > b.ts")
      .contains("ORDER BY __graft_ts , __graft_side DESC"))
    // forward <= : time descending, right rows first at ties
    assert(rw("SELECT a.x FROM l a ASOF JOIN r b " +
      "ON a.k = b.k AND a.ts <= b.ts")
      .contains("ORDER BY __graft_ts DESC , __graft_side ROWS"))
    // a flipped spelling (b.ts <= a.ts) normalizes to the same backward
    assert(rw("SELECT a.x FROM l a ASOF JOIN r b " +
      "ON a.k = b.k AND b.ts <= a.ts")
      .contains("ORDER BY __graft_ts , __graft_side ROWS"))
    // bare SELECT * expands over both side structs (CH's flattened read)
    assert(rw("SELECT * FROM l a ASOF JOIN r b " +
      "ON a.k = b.k AND a.ts >= b.ts")
      .startsWith("SELECT a . * , b . * FROM ("))
    // ASOF USING lowers with CH's last-column->= contract (r18): the
    // shared names qualify through BOTH aliases in the union branches
    val using = rw("SELECT a.x FROM l a ASOF JOIN r b USING (k, ts)")
    assert(using.contains("a . k AS __graft_k0 , a . ts AS __graft_ts"))
    assert(using.contains("UNION ALL SELECT b . k , b . ts , 0"))
    assert(using.contains("ORDER BY __graft_ts , __graft_side ROWS"))
    // multi-key USING: all but the last are equi keys
    assert(rw("SELECT a.x FROM l a ASOF JOIN r b USING (k1, k2, ts)")
      .contains("PARTITION BY __graft_k0 , __graft_k1"))
    // a single-column USING cannot carry both key and ts: named error
    assert(intercept[ChSqlRewriter.RewriteException](
      rw("SELECT 1 FROM l a ASOF JOIN r b USING (ts)"))
      .getMessage.contains("LAST column"))
    // bare * over the USING form / at subquery depth: NAMED errors
    // (r18 ADVICE low fix — previously a silent two-struct schema).
    // USING: CH dedupes the shared columns, unreproducible here
    assert(intercept[ChSqlRewriter.RewriteException](
      rw("SELECT * FROM l a ASOF JOIN r b USING (k, ts)"))
      .getMessage.contains("dedupes"))
    // subquery-level star: silent struct pair before, loud now
    assert(intercept[ChSqlRewriter.RewriteException](
      rw("SELECT n FROM (SELECT * FROM l a ASOF JOIN r b " +
        "ON a.k = b.k AND a.ts >= b.ts)"))
      .getMessage.contains("subquery"))
    // qualified stars and column lists stay fine in both forms
    assert(rw("SELECT a.*, b.x FROM l a ASOF JOIN r b USING (k, ts)")
      .startsWith("SELECT a . * , b . x FROM ("))
    // named errors: no inequality, no equi key, chained joins
    assert(intercept[ChSqlRewriter.RewriteException](
      rw("SELECT 1 FROM l a ASOF JOIN r b ON a.k = b.k"))
      .getMessage.contains("inequality"))
    assert(intercept[ChSqlRewriter.RewriteException](
      rw("SELECT 1 FROM l a ASOF JOIN r b ON a.ts >= b.ts"))
      .getMessage.contains("equality key"))
    assert(intercept[ChSqlRewriter.RewriteException](
      rw("SELECT 1 FROM l a ASOF JOIN r b ON a.k = b.k AND " +
        "a.ts >= b.ts JOIN c ON c.k = a.k"))
      .getMessage.contains("chained"))
  }

  test("quoted-unit dateDiff renames to graft_date_diff; unquoted " +
    "(Spark's elapsed-unit form, the pinned TRAP) untouched") {
    assert(rw("SELECT dateDiff('day', a, b)") ==
      "SELECT graft_date_diff ( 'day' , a , b )")
    assert(rw("SELECT dateDiff(DAY, a, b)") ==
      "SELECT dateDiff ( DAY , a , b )")
  }

  test("parametric aggregates flatten onto the registered names") {
    assert(rw("SELECT quantileExact(0.9)(v) FROM t") ==
      "SELECT quantileExact ( v , 0.9 ) FROM t")
    assert(rw("SELECT topK(5)(x) FROM t") ==
      "SELECT graft_topk ( x , 5 ) FROM t")
    assert(rw("SELECT quantileExactWeighted(0.5)(v, w) FROM t") ==
      "SELECT graft_quantile_exact_weighted ( v , w , 0.5 ) FROM t")
    assert(rw("SELECT largestTriangleThreeBuckets(100)(x, y) FROM t") ==
      "SELECT largestTriangleThreeBuckets ( 100 , x , y ) FROM t")
    assert(rw("SELECT uniqUpTo(8)(x) FROM t") ==
      "SELECT graft_uniq_upto ( x , 8 ) FROM t")
    assert(rw("SELECT histogram(10)(v) FROM t") ==
      "SELECT graft_histogram ( v , 10 ) FROM t")
    // meanZTest: the trailing confidence parameter is dropped
    assert(rw("SELECT meanZTest(1.0, 2.0, 0.95)(x, y) FROM t") ==
      "SELECT meanZTest ( x , y , 1.0 , 2.0 ) FROM t")
    // windowFunnel: seconds -> micros (folded: the aggregate takes a
    // literal), ts doubles as the tiebreak id
    assert(rw("SELECT windowFunnel(3600)(ts, a = 1, b = 2) FROM t") ==
      "SELECT graft_window_funnel ( 3600000000 , ts , ts , " +
        "a = 1 , b = 2 ) FROM t")
    assert(rw("SELECT sequenceMatch('(?1).*(?2)')(ts, a = 1, b = 2) FROM t")
      == "SELECT graft_sequence_match ( '(?1).*(?2)' , ts , ts , " +
        "a = 1 , b = 2 ) FROM t")
    // a plain (already-flattened) call is a fixed point
    assert(rw("SELECT quantileExact(v, 0.9) FROM t") ==
      "SELECT quantileExact ( v , 0.9 ) FROM t")
  }

  test("bracketed array literals become array(); subscripts survive") {
    assert(rw("SELECT [1, 2, 3] AS a") ==
      "SELECT array ( 1 , 2 , 3 ) AS a")
    assert(rw("SELECT ['a', 'b'][1]") ==
      "SELECT array ( 'a' , 'b' ) [ 1 ]")
    assert(rw("SELECT arr[2] FROM t") == "SELECT arr [ 2 ] FROM t")
    assert(rw("SELECT [[1], [2]]") ==
      "SELECT array ( array ( 1 ) , array ( 2 ) )")
    assert(rw("SELECT f(x)[1]") == "SELECT f ( x ) [ 1 ]")
  }

  test("SAMPLE fraction -> TABLESAMPLE PERCENT; integer -> ROWS; " +
    "OFFSET is a named error") {
    assert(rw("SELECT count(*) FROM events SAMPLE 0.1") ==
      "SELECT count ( * ) FROM events TABLESAMPLE ( 10 PERCENT )")
    assert(rw("SELECT 1 FROM t SAMPLE 1000") ==
      "SELECT 1 FROM t TABLESAMPLE ( 1000 ROWS )")
    val e = intercept[ChSqlRewriter.RewriteException](
      rw("SELECT 1 FROM t SAMPLE 0.1 OFFSET 0.5"))
    assert(e.getMessage.contains("OFFSET"))
  }

  test("[LEFT] ARRAY JOIN becomes LATERAL VIEW [OUTER] explode") {
    assert(rw("SELECT t, x FROM e LEFT ARRAY JOIN splitByChar('_', t) AS x") ==
      "SELECT t , x FROM e LATERAL VIEW OUTER explode ( " +
        "splitByChar ( '_' , t ) ) __graft_aj AS x")
    assert(rw("SELECT x FROM e ARRAY JOIN arr WHERE x > 1") ==
      "SELECT x FROM e LATERAL VIEW explode ( arr ) __graft_aj AS arr " +
        "WHERE x > 1")
    val e = intercept[ChSqlRewriter.RewriteException](
      rw("SELECT 1 FROM e ARRAY JOIN a AS x, b AS y"))
    assert(e.getMessage.contains("multi-array"))
  }

  test("GROUP BY ... WITH TOTALS becomes GROUPING SETS ((keys), ())") {
    assert(rw("SELECT k, count() AS n FROM t GROUP BY k WITH TOTALS") ==
      "SELECT k , count ( * ) AS n FROM t GROUP BY GROUPING SETS " +
        "( ( k ) , ( ) )")
    assert(rw("SELECT a, b, count() AS n FROM t GROUP BY a, b WITH TOTALS" +
      " ORDER BY a") ==
      "SELECT a , b , count ( * ) AS n FROM t GROUP BY GROUPING SETS " +
        "( ( a , b ) , ( ) ) ORDER BY a")
  }

  test("LIMIT n BY becomes the row_number window rewrite") {
    assert(rw("SELECT k, u, count(*) AS n FROM t GROUP BY k, u " +
      "ORDER BY n DESC LIMIT 3 BY k") ==
      "SELECT k , u , n FROM ( SELECT * , row_number ( ) OVER ( " +
        "PARTITION BY k ORDER BY n DESC ) AS __graft_limit_by FROM ( " +
        "SELECT k , u , count ( * ) AS n FROM t GROUP BY k , u ) ) " +
        "WHERE __graft_limit_by <= 3 ORDER BY n DESC")
    // trailing LIMIT m is preserved outside the window filter
    assert(rw("SELECT k, v FROM t ORDER BY v LIMIT 2 BY k LIMIT 10")
      .endsWith("ORDER BY v LIMIT 10"))
    // no ORDER BY: deterministic fallback partitions AND orders by keys
    assert(rw("SELECT k, v AS w FROM t LIMIT 1 BY k").contains(
      "PARTITION BY k ORDER BY k"))
    // an underivable output name is a NAMED error
    val e = intercept[ChSqlRewriter.RewriteException](
      rw("SELECT k, max(v) FROM t GROUP BY k LIMIT 1 BY k"))
    assert(e.getMessage.contains("output name"))
  }

  test("WITH FILL needs an explicit STEP (named error), then becomes " +
    "the sequence-axis LEFT JOIN") {
    val e = intercept[ChSqlRewriter.RewriteException](
      rw("SELECT d, n FROM t ORDER BY d WITH FILL"))
    assert(e.getMessage.contains("STEP"))
    val out = rw("SELECT toStartOfDay(ts) AS d, count() AS n FROM e " +
      "GROUP BY d ORDER BY d WITH FILL STEP INTERVAL 1 DAY")
    assert(out.startsWith("WITH __graft_src AS ("))
    assert(out.contains("sequence ( ( SELECT min ( d ) FROM __graft_src " +
      ") , ( SELECT max ( d ) FROM __graft_src ) , INTERVAL 1 DAY )"))
    // FULL OUTER: source rows off the fill grid are KEPT (CH's rule)
    assert(out.contains("FULL OUTER JOIN __graft_src USING ( d )"))
    // FROM/TO bounds: FROM inclusive, TO exclusive (the axis filter)
    val bounded = rw("SELECT d, n FROM t ORDER BY d WITH FILL " +
      "FROM 10 TO 20 STEP 2 LIMIT 5")
    assert(bounded.contains("sequence ( ( 10 ) , ( 20 ) , 2 )"))
    assert(bounded.contains("WHERE d < ( 20 )"))
    assert(bounded.endsWith("ORDER BY d LIMIT 5"))
  }

  test("select-list arrayJoin feeding GROUP BY explodes in a subquery") {
    assert(rw("SELECT arrayJoin(splitByChar('_', t)) AS tok, count() AS n " +
      "FROM e WHERE v > 1 GROUP BY tok ORDER BY n DESC") ==
      "SELECT tok , count ( * ) AS n FROM ( SELECT * , arrayJoin ( " +
        "splitByChar ( '_' , t ) ) AS tok FROM e WHERE v > 1 ) " +
        "GROUP BY tok ORDER BY n DESC")
    // no GROUP BY on the alias: untouched (plain generator select works)
    assert(rw("SELECT arrayJoin(x) AS t FROM e") ==
      "SELECT arrayJoin ( x ) AS t FROM e")
    // alias referenced in WHERE: named error (CH evaluates aliases there)
    val e = intercept[ChSqlRewriter.RewriteException](
      rw("SELECT arrayJoin(x) AS t, count() FROM e WHERE t > 1 GROUP BY t"))
    assert(e.getMessage.contains("alias"))
    // CH's multi-arrayJoin cartesian form: named error
    val e2 = intercept[ChSqlRewriter.RewriteException](
      rw("SELECT arrayJoin(x) AS a, arrayJoin(y) AS b, count() FROM e " +
        "GROUP BY a, b"))
    assert(e2.getMessage.contains("multiple"))
  }

  test("r18 interaction pins: multi-key ASOF, subquery-depth ASOF, " +
    "ANY LEFT followed by a chained join, bounded WITH FILL + " +
    "INTERPOLATE") {
    // two equi keys partition the window on both
    assert(rw("SELECT a.x FROM l a ASOF JOIN r b ON a.k1 = b.k1 AND " +
      "a.k2 = b.k2 AND a.ts >= b.ts")
      .contains("PARTITION BY __graft_k0 , __graft_k1"))
    // an ASOF inside a subquery lowers at its own depth
    val sub = rw("SELECT n FROM (SELECT a.x AS n FROM l a ASOF JOIN " +
      "r b ON a.k = b.k AND a.ts >= b.ts) WHERE n > 1")
    assert(sub.startsWith("SELECT n FROM ( SELECT a . x AS n FROM ( " +
      "SELECT __graft_l AS a"))
    assert(sub.endsWith("WHERE n > 1"))
    // ANY LEFT's ON stays in place, a following chained join survives
    val chained = rw("SELECT 1 FROM e ANY LEFT JOIN r ON e.u = r.k " +
      "JOIN s ON s.u = e.u")
    assert(chained.contains("AS r ON e . u = r . k JOIN s ON s . u = e . u"))
    // FROM/TO bounds compose with INTERPOLATE (axis filter + carry)
    val bounded = rw("SELECT d, n FROM t ORDER BY d WITH FILL " +
      "FROM 10 TO 20 STEP 2 INTERPOLATE (n)")
    assert(bounded.contains("WHERE d < ( 20 )"))
    assert(bounded.contains("__graft_pc"))
    // INTERPOLATE after LIMIT is CH-invalid clause order: named error
    val e = intercept[ChSqlRewriter.RewriteException](
      rw("SELECT d, n FROM t ORDER BY d WITH FILL STEP 1 LIMIT 5 " +
        "INTERPOLATE (n)"))
    assert(e.getMessage.contains("precede"))
  }

  test("plain Spark SQL is a fixed point (modulo whitespace)") {
    val stmts = Seq(
      "SELECT a, sum(b) AS s FROM t WHERE c > 1 GROUP BY a ORDER BY s " +
        "DESC LIMIT 10",
      "SELECT * FROM a JOIN b ON a.x = b.x",
      "WITH q AS (SELECT 1 AS x) SELECT x FROM q",
      "SELECT CASE WHEN a THEN 'x' ELSE 'y' END FROM t",
      "SELECT transform(arr, x -> x + 1) FROM t")
    stmts.foreach { s =>
      val norm = ChSqlRewriter.render(ChSqlRewriter.tokenize(s))
      assert(rw(s) == norm, s"not a fixed point: $s")
    }
  }

  test("comments are stripped; strings with quotes/escapes survive") {
    assert(rw("SELECT 1 -- trailing\n, 2 /* block */ , 'it''s'") ==
      "SELECT 1 , 2 , 'it''s'")
  }

  test("rewrite is idempotent: the output is its own fixed point") {
    // the output is valid Spark SQL, and valid Spark SQL must pass
    // through untouched - so a second rewrite must change nothing
    // (catches passes that fire on their own output)
    val stmts = Seq(
      "SELECT count() FROM events SETTINGS max_threads = 4",
      "SELECT quantileExact(0.9)(value) FROM events",
      "SELECT [1, 2, 3] AS a",
      "SELECT event_type, user_id, count(*) AS n FROM events " +
        "GROUP BY event_type, user_id ORDER BY n DESC LIMIT 3 BY event_type",
      "SELECT event_type, count() AS n FROM events " +
        "GROUP BY event_type WITH TOTALS",
      "SELECT t, x FROM e LEFT ARRAY JOIN splitByChar('_', t) AS x",
      "SELECT toStartOfDay(ts) AS d, count() AS n FROM e GROUP BY d " +
        "ORDER BY d WITH FILL STEP INTERVAL 1 DAY",
      "SELECT arrayJoin(splitByChar('_', t)) AS tok, count(*) AS n " +
        "FROM e GROUP BY tok",
      "SELECT count(*) FROM events SAMPLE 0.1",
      "SELECT x FROM t ORDER BY x LIMIT 5, 10",
      "SELECT a.x, b.y FROM l a ASOF JOIN r b " +
        "ON a.k = b.k AND a.ts >= b.ts",
      "SELECT e.x, o.y FROM e ANY LEFT JOIN orders o ON e.u = o.k",
      "SELECT d, n FROM t ORDER BY d WITH FILL STEP 1 INTERPOLATE (n)",
      "SELECT d, n FROM t ORDER BY d WITH FILL STEP 1 " +
        "INTERPOLATE (n AS linear)")
    stmts.foreach { s =>
      val once = rw(s)
      assert(rw(once) == once, s"not idempotent on: $s\nfirst: $once")
    }
  }

  test("interior semicolons are a named error (one statement at a time)") {
    val e = intercept[ChSqlRewriter.RewriteException](
      rw("SELECT 1; SELECT 2"))
    assert(e.getMessage.contains("one statement"))
  }

  test("trailing semicolons are dropped") {
    assert(rw("SELECT 1;") == "SELECT 1")
    assert(rw("SELECT count(*) FROM t SETTINGS a = 1;") ==
      "SELECT count ( * ) FROM t")
  }

  test("WITH FILL INTERPOLATE (c) / (c AS c) lowers to the " +
    "carry-previous-value window; (c AS linear) to the bracket " +
    "construction; other expressions stay named errors") {
    // carry previous value (CH's identity INTERPOLATE): struct-wrapped
    // running last over the joined grid, FILL rows only
    val locf = rw("SELECT d, n FROM t ORDER BY d WITH FILL STEP 1 " +
      "INTERPOLATE (n)")
    assert(locf.contains("SELECT * , 1 AS __graft_obs FROM ( " +
      "SELECT d , n FROM t )"))
    assert(locf.contains("last ( CASE WHEN __graft_obs IS NOT NULL " +
      "THEN struct ( n ) END , true ) OVER ( ORDER BY d ROWS BETWEEN " +
      "UNBOUNDED PRECEDING AND CURRENT ROW ) AS __graft_pc"))
    // the projection preserves the query's column order (d, n)
    assert(locf.contains(") SELECT d , CASE WHEN __graft_obs IS NOT " +
      "NULL THEN n ELSE __graft_pc . n END AS n FROM ("))
    assert(rw("SELECT d, n FROM t ORDER BY d WITH FILL STEP 1 " +
      "INTERPOLATE (n AS n)") == locf)
    // linear (the graft extension - CH's iterated INTERPOLATE cannot
    // see the NEXT observation): both brackets + the q88 formula. Since
    // r19 each bracket bundles value AND position in ONE struct window
    // (the r18 ADVICE medium fix): a NULL-valued observation must not
    // advance the position bracket without the value bracket, or fill
    // rows interpolate across mismatched observations
    val lin = rw("SELECT d, n FROM t ORDER BY d WITH FILL STEP 1 " +
      "INTERPOLATE (n AS linear)")
    assert(lin.contains("CASE WHEN __graft_obs IS NOT NULL AND n IS " +
      "NOT NULL THEN named_struct ( 'v' , CAST ( n AS DOUBLE ) , 'h' , " +
      "CAST ( d AS DOUBLE ) ) END"))
    assert(lin.contains("AS __graft_p") && lin.contains("AS __graft_n"))
    assert(lin.contains("OVER ( ORDER BY d DESC ROWS BETWEEN"))
    assert(lin.contains("__graft_p . v + ( __graft_n . v - " +
      "__graft_p . v ) * ( ( CAST ( d AS DOUBLE ) - __graft_p . h ) / " +
      "( __graft_n . h - __graft_p . h ) ) ELSE coalesce ( " +
      "__graft_p . v , __graft_n . v ) END"))
    // iterated expressions: named error (a recursion, not a window)
    val e = intercept[ChSqlRewriter.RewriteException](
      rw("SELECT d, n FROM t ORDER BY d WITH FILL STEP 1 " +
        "INTERPOLATE (n AS n + 1)"))
    assert(e.getMessage.contains("iterated"))
    // multi-column lists and the bare keyword: named errors
    assert(intercept[ChSqlRewriter.RewriteException](
      rw("SELECT d, n, m FROM t ORDER BY d WITH FILL STEP 1 " +
        "INTERPOLATE (n, m)")).getMessage.contains("one column"))
    assert(intercept[ChSqlRewriter.RewriteException](
      rw("SELECT d, n FROM t ORDER BY d WITH FILL STEP 1 INTERPOLATE"))
      .getMessage.contains("column list"))
    // the fill column must be an output column
    assert(intercept[ChSqlRewriter.RewriteException](
      rw("SELECT d, n FROM t ORDER BY d WITH FILL STEP 1 " +
        "INTERPOLATE (zz)")).getMessage.contains("output column"))
  }
}
