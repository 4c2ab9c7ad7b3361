#!/usr/bin/env python3
"""At-scale oracle check (VERDICT r12 #4): compare a Verify dump made
against a scaled corpus with DuckDB re-derivations over the SAME scaled
parquet, for every scale-path query (CATALOG.md: stress = yes) whose
oracle is a full recompute. Queries whose DuckDB side exceeds the time
or memory budget are recorded intractable-with-reason, not silently
dropped.

Usage: oracle_at_scale.py <sfDir> <verifyOut> <resultJson> [onlyQuery...]
       oracle_at_scale.py --list

--list prints the scale-path full-oracle query names (one line,
space-separated) and exits — the single source tools/scale_campaign.sh
derives its verify set from (ADVICE r14: the script used to duplicate
this catalog parse, and a column change would have silently
desynchronized the bench query set from the oracle set).

When explicit [onlyQuery...] names are given, a requested query whose
catalog oracle is "full recompute (shared)" is accepted even WITHOUT
its own stress mark (the stress mark lives on its non-indexed twin,
which shares the oracle SQL byte-identically — VERDICT r14 #1: the
checker used to skip q_bm25_indexed / q_ann_*_indexed this way and the
standing-index families had no at-scale correctness row).
"""
import json, glob, os, re, sys, time


def catalog_rows():
    """name -> oracle-class cell for every full-oracle catalog row,
    plus the stress-marked subset (the default, no-args check set)."""
    full, stressed = {}, {}
    for line in open('CATALOG.md'):
        m = re.match(r'\| `(q_\w+)` \|.*', line)
        if not m:
            continue
        cells = [c.strip() for c in line.split('|')]
        name, oracle, stress = cells[1].strip('`'), cells[4], cells[5]
        if oracle.startswith('full recompute'):
            full[name] = oracle
            if stress == 'yes':
                stressed[name] = oracle
    return full, stressed


if len(sys.argv) == 2 and sys.argv[1] == '--list':
    _, stressed = catalog_rows()
    print(' '.join(sorted(stressed)))
    sys.exit(0)

import duckdb

sf, vout, out = sys.argv[1], sys.argv[2], sys.argv[3]
only = set(sys.argv[4:])

full_rows, stressed_rows = catalog_rows()
if only:
    unknown = only - set(full_rows)
    if unknown:
        sys.exit(f"requested queries without a full-recompute catalog "
                 f"oracle: {sorted(unknown)}")
    rows = {k: full_rows[k] for k in only}
else:
    rows = stressed_rows

con = duckdb.connect()
con.sql("SET memory_limit='48GB'")
con.sql("SET threads=32")
con.sql(f"SET temp_directory='{os.environ.get('TMPDIR', '/tmp')}/duckdb_oracle_spill'")


def staged_kcore(k=80, rounds=10):
    """q_kcore's oracle, round-by-round (VERDICT r13 #2): the single-query
    10-round peel unroll keeps every round's induced edge list alive at
    once and OOMs DuckDB at x32 (44.7 GB after 662 s, ORACLE_SF32_r13).
    Staged, each round materializes ONLY the surviving vertex set s_i
    (<= |parts| rows, tiny) and re-feeds it; the induced-subgraph join is
    inlined per round so exactly one round's working set is alive at a
    time. The per-round SQL is the same text as SparkEntry.kCoreIterSql's
    l_i/s_i pair with s_{i-1} swapped for the materialized table, so the
    staged result is the unrolled result by construction. Returns the
    expected q_kcore frame as a DuckDB relation over temp tables."""
    con.sql("""CREATE OR REPLACE TEMP TABLE kc_und AS
      WITH edges AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
        JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2)
      SELECT least(src, dst) AS a, greatest(src, dst) AS b
      FROM edges WHERE src <> dst GROUP BY 1, 2""")
    con.sql("""CREATE OR REPLACE TEMP TABLE kc_s0 AS
      SELECT DISTINCT id FROM (
        SELECT a AS id FROM kc_und UNION ALL SELECT b FROM kc_und)""")
    con.sql("CREATE OR REPLACE TEMP TABLE kc_s AS SELECT id FROM kc_s0")
    for i in range(1, rounds + 1):
        con.sql(f"""CREATE OR REPLACE TEMP TABLE kc_s_next AS
          SELECT id FROM (
            SELECT a AS id FROM kc_und e
              JOIN kc_s sa ON e.a = sa.id JOIN kc_s sb ON e.b = sb.id
            UNION ALL
            SELECT b FROM kc_und e
              JOIN kc_s sa ON e.a = sa.id JOIN kc_s sb ON e.b = sb.id)
          GROUP BY 1 HAVING count(*) >= {k}""")
        con.sql("DROP TABLE kc_s")
        con.sql("ALTER TABLE kc_s_next RENAME TO kc_s")
        print(f'  kcore round {i}: '
              f'{con.sql("SELECT count(*) FROM kc_s").fetchone()[0]} in core',
              flush=True)
    return con.sql("""
      WITH lf AS (SELECT e.a, e.b FROM kc_und e
                  JOIN kc_s sa ON e.a = sa.id JOIN kc_s sb ON e.b = sb.id),
      cd AS (SELECT id, count(*) AS core_degree FROM (
               SELECT a AS id FROM lf UNION ALL SELECT b FROM lf)
             GROUP BY 1)
      SELECT v.id, (s.id IS NOT NULL) AS in_core,
        coalesce(cd.core_degree, 0) AS core_degree
      FROM kc_s0 v LEFT JOIN kc_s s USING (id) LEFT JOIN cd USING (id)
      ORDER BY v.id""")
def staged_pagerank_parts(rounds=10):
    """q_pagerank_parts' oracle, round-by-round (VERDICT r15 #4): the
    ×100 oracle set had no fixpoint row — the 10-round unrolled CTE is
    tractable at ×32 (1035 s, ORACLE_SF32_r14) but its materialized
    chain keeps every round alive at once, the same growth class that
    OOMed the kcore unroll. Staged like staged_kcore: edges/verts/outdeg
    once as temp tables, then one vertex-sized rank table re-created per
    round with the SAME per-round SQL text as the CTE's r_i step, so the
    staged result is the unrolled result by construction. A wall-clock
    budget (ORACLE_PR_BUDGET_SEC, default 5400) turns a blown estimate
    into a NAMED intractable row instead of an unbounded run."""
    budget = float(os.environ.get('ORACLE_PR_BUDGET_SEC', '5400'))
    t0 = time.time()
    con.sql("""CREATE OR REPLACE TEMP TABLE pr_edges AS
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2""")
    con.sql("""CREATE OR REPLACE TEMP TABLE pr_verts AS
      SELECT DISTINCT src AS id FROM pr_edges
      UNION SELECT DISTINCT dst FROM pr_edges""")
    con.sql("""CREATE OR REPLACE TEMP TABLE pr_outdeg AS
      SELECT src AS id, count(*) AS outdeg FROM pr_edges GROUP BY 1""")
    con.sql("CREATE OR REPLACE TEMP TABLE pr_rank AS "
            "SELECT id, 1.0 AS rank FROM pr_verts")
    for i in range(1, rounds + 1):
        if time.time() - t0 > budget:
            raise RuntimeError(
                f'pagerank oracle budget {budget}s exhausted at round {i} '
                f'of {rounds} ({time.time() - t0:.0f}s elapsed)')
        con.sql("""CREATE OR REPLACE TEMP TABLE pr_next AS
          SELECT v.id, 0.15 + 0.85 * coalesce(c.contrib, 0.0) AS rank
          FROM pr_verts v
          LEFT JOIN (
            SELECT e.dst AS id, sum(r.rank / d.outdeg) AS contrib
            FROM pr_edges e JOIN pr_rank r ON e.src = r.id
            JOIN pr_outdeg d ON e.src = d.id GROUP BY 1
          ) c ON v.id = c.id""")
        con.sql("DROP TABLE pr_rank")
        con.sql("ALTER TABLE pr_next RENAME TO pr_rank")
        print(f'  pagerank round {i}: {time.time() - t0:.0f}s elapsed',
              flush=True)
    return con.sql("""
      WITH norm AS (SELECT count(*)::DOUBLE / sum(rank) AS s FROM pr_rank),
      top AS (SELECT id, round(rank * (SELECT s FROM norm), 6)
                AS influence_score
              FROM pr_rank ORDER BY influence_score DESC, id LIMIT 100)
      SELECT row_number() OVER (ORDER BY influence_score DESC, id) AS rank,
        t.id, p.p_brand, p.p_name, influence_score
      FROM top t LEFT JOIN part p ON t.id = p.p_partkey
      ORDER BY rank""")


for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    p = f'{sf}/{t}.parquet'
    if os.path.isdir(p):  # Spark-written table: a directory of part files
        p = f'{p}/*.parquet'
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
oracle = json.load(open(f'{vout}/oracle_sql.json'))

res = {}
for name in sorted(rows):
    if name not in oracle:
        res[name] = {'status': 'no-oracle-entry'}
        continue
    pq = glob.glob(f'{vout}/{name}/*.parquet')
    if not pq:
        res[name] = {'status': 'no-spark-output'}
        print('MISS', name, flush=True)
        continue
    t0 = time.time()
    try:
        # read the WHOLE part-file glob (ADVICE r13): a multi-part Spark
        # dump at larger SF compared via pq[0] alone would flag a spurious
        # hash-mismatch on a partial read
        got = con.sql(f"SELECT * FROM '{vout}/{name}/*.parquet'").df()
        # q_kcore's unrolled CTE oracle OOMs DuckDB past ~x10 — evaluate
        # it round-by-round instead (same per-round SQL, bounded working
        # set); every other query runs its oracle_sql.json text verbatim
        if name == 'q_kcore':
            exp = staged_kcore().df()
        elif name == 'q_pagerank_parts':
            exp = staged_pagerank_parts().df()
        else:
            exp = con.sql(oracle[name]).df()
        got, exp = got[sorted(got.columns)], exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            res[name] = {'status': 'schema-mismatch',
                         'spark': list(got.columns), 'oracle': list(exp.columns)}
        else:
            gs = got.astype(str).apply('|'.join, axis=1).sort_values() \
                .reset_index(drop=True)
            es = exp.astype(str).apply('|'.join, axis=1).sort_values() \
                .reset_index(drop=True)
            ok = bool(gs.equals(es))
            res[name] = {'status': 'green' if ok else 'hash-mismatch',
                         'rows': int(len(got)), 'oracle_rows': int(len(exp)),
                         'oracle_sec': round(time.time() - t0, 1)}
    except Exception as e:
        res[name] = {'status': 'intractable',
                     'reason': f'{type(e).__name__}: {str(e)[:160]}',
                     'oracle_sec': round(time.time() - t0, 1)}
    print(res[name]['status'].upper().ljust(15), name,
          res[name].get('rows', ''), flush=True)

greens = sum(1 for r in res.values() if r['status'] == 'green')
summary = {'sf_dir': sf, 'n_checked': len(res), 'n_green': greens,
           'n_red': sum(1 for r in res.values()
                        if r['status'] in ('hash-mismatch', 'schema-mismatch',
                                           'no-spark-output')),
           'n_intractable': sum(1 for r in res.values()
                                if r['status'] == 'intractable'),
           'queries': res}
json.dump(summary, open(out, 'w'), indent=1)
print(f"\n{greens}/{len(res)} green -> {out}")
