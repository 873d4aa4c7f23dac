#!/usr/bin/env python3
"""Generate the sf1 gate's oracle OVERRIDES (consumed by check.py via
CHECK_ORACLE_OVERRIDE): same semantics as the catalog's oracle SQL,
rewritten into plans DuckDB can actually execute at 10x bench scale.

Both rewrites are DERIVED from the live oracle_sql.json each run (no
hand-copied SQL to drift) and fail loudly if the source oracle's shape
changed:

- d20_prefix_filter_join — SHARD-COMPOSED: the ScaleProbe-generated
  scale corpus is `factor` disjoint tagged copies of the base (every
  word per-copy prefixed, doc_ids shifted by a fixed stride), so every
  qualifying pair is within one copy BY CONSTRUCTION (cross-copy token
  overlap is zero). Adding the copy id `doc_id // stride` as an
  equi-join key turns DuckDB's O(n^2) all-pairs into `factor` x the
  base-sized problem — the union of per-copy oracles, in one query.
  The stride comes from the BASE corpus (max doc_id + 1), exactly how
  ScaleProbe.genCorpus computed the shift.

- sim4_pq_topk — WINDOW->ARGMIN: the two nearest-sub-centroid CTEs
  use row_number() OVER (PARTITION BY vec_id, ss ORDER BY l2, c_id)
  over the (sub-vectors x centroids) expansion; at sf1 that is a
  ~1e9-row sort DuckDB wedges on. min(struct_pack(d := l2, c := c_id))
  is the same argmin with the same (l2, c_id) lexicographic tie-break
  (struct comparison is field-order lexicographic), computed as a
  hash aggregate — no sort, no materialized window. This mirrors the
  Spark side, which uses min_by(c_id, struct(d, c_id)) for the same
  reason.

usage: tools/sf1_oracles.py <verify_out_dir> <base_sf_dir> <out.json>
  verify_out_dir: graft.Verify output (oracle_sql.json lives there)
  base_sf_dir:    the 1x corpus the scale corpus was generated FROM
                  (stride source), e.g. /root/testdata/sf0.1
"""
import duckdb
import json
import re
import sys

verify_out, base_dir, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
oracle = json.load(open(f"{verify_out}/oracle_sql.json"))
overrides = {}

# ---- d20: within-copy equi-join key --------------------------------
d20 = oracle["d20_prefix_filter_join"]
stride = duckdb.sql(
    "SELECT max(doc_id) + 1 FROM "
    f"read_parquet('{base_dir}/documents.parquet')").fetchone()[0]
tk_old = "SELECT doc_id, list_distinct"
tk_new = f"SELECT doc_id, doc_id // {stride} AS cp, list_distinct"
join_old = "ON a.doc_id < b.doc_id"
join_new = "ON a.cp = b.cp AND a.doc_id < b.doc_id"
if tk_old not in d20 or join_old not in d20:
    sys.exit("d20 oracle shape changed — update tools/sf1_oracles.py")
overrides["d20_prefix_filter_join"] = (
    d20.replace(tk_old, tk_new, 1).replace(join_old, join_new, 1))

# ---- sim4: windowed nearest-centroid -> hash-aggregate argmin ------
sim4 = oracle["sim4_pq_topk"]
pat = re.compile(
    r"(\w+) AS \(\s*"
    r"SELECT vec_id, ss, c_id FROM \(\s*"
    r"SELECT s\.vec_id, s\.ss, c\.c_id,\s*"
    r"row_number\(\) OVER \(PARTITION BY s\.vec_id, s\.ss\s*"
    r"ORDER BY (.*?), c\.c_id\) AS rn\s*"
    r"FROM sub s JOIN (\w+) c USING \(ss\)\)\s*"
    r"WHERE rn = 1\)", re.DOTALL)


def argmin(m):
    name, l2, cents = m.group(1), m.group(2), m.group(3)
    return (
        f"{name} AS (\n          SELECT s.vec_id, s.ss,\n"
        f"            (min(struct_pack(d := {l2}, c := c.c_id))).c AS c_id\n"
        f"          FROM sub s JOIN {cents} c USING (ss)\n"
        f"          GROUP BY s.vec_id, s.ss)")


rewritten, n = pat.subn(argmin, sim4)
if n != 2:
    sys.exit(f"sim4 oracle shape changed (matched {n} windows, "
             "expected 2) — update tools/sf1_oracles.py")
overrides["sim4_pq_topk"] = rewritten

json.dump(overrides, open(out_path, "w"), indent=1)
print(f"wrote {out_path}: {sorted(overrides)} (doc stride {stride})")
