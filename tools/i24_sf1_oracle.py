"""Independent i24 oracle for large SFs (ADVICE r15): the registry's
DuckDB SQL oracle assigns with the FLAT centroidAssignCte, but the
Spark side dispatches to TWO-LEVEL routing at k >= 64 — i.e. from sf1
up under the scaledK rule — so above the driver-gate SFs the SQL oracle
would falsely fail. This numpy oracle mirrors the dispatcher exactly
(via tools/ivf_common.py, the same shared routing mirror i29's large-SF
oracle uses) and re-derives PipelineOps' i24 semantics end to end:
assign every vector, enumerate within-cluster pairs (i < j), rank by
(round3 cosine desc, i asc, j asc), emit the top 20 as
(cid, i, j, sim).

Boundary audits: every routing decision's margin (ivf_common) plus the
3dp rounding margin of ALL candidate sims and the rank-20 cut gap, so a
summation-order difference cannot flip the rounding, the ranking, or
the cut.

Usage: python3 tools/i24_sf1_oracle.py <sfDataDir> <verifyOutDir>
reads <sfDataDir>/embeddings.parquet[/*.parquet] and compares against
<verifyOutDir>/i24_embed_near_dup/*.parquet. Exits 0 on MATCH, 1 else.
"""
import glob
import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ivf_common import (TIE_RISK, load_embeddings, round_half_up, route,
                        scaled_k, seq_dot)

if len(sys.argv) != 3:
    print(__doc__)
    sys.exit(2)
data_dir, out_dir = sys.argv[1], sys.argv[2]

vec_id, emb = load_embeddings(data_dir)
n, dim = emb.shape
print('vectors', n, 'dim', dim)
k = scaled_k(n)
print('codebook k', k)
cid, _, _ = route(emb, vec_id, k)

# Within-cluster candidate pairs, ranked by (round3 sim desc, i, j).
# Per-cluster we only need each cluster's top 20 — the global top 20 is
# a merge of per-cluster top 20s — so memory stays one cluster's D at a
# time (bucket depth ~250 under scaledK).
rows = []
round_margin = 1.0
for c in np.unique(cid):
    idx = np.where(cid == c)[0]
    if len(idx) < 2:
        continue
    D = emb[idx] @ emb[idx].T
    iu, ju = np.triu_indices(len(idx), k=1)
    s = D[iu, ju]
    fr = np.abs(((s * 1e3) % 1.0) - 0.5)
    round_margin = min(round_margin, float(fr.min()))
    # Knife-edge refinement (the r16 ivf_common rule): a sim within
    # TIE_RISK quanta of a 3dp boundary is re-derived in the engine's
    # fold order before rounding.
    rr = np.where(fr < TIE_RISK)[0]
    if rr.size:
        s = s.copy()
        s[rr] = seq_dot(emb[idx[iu[rr]]], emb[idx[ju[rr]]])
    sr = round_half_up(s, 3)
    ii = vec_id[idx[iu]]; jj = vec_id[idx[ju]]
    # vec_id ascends with idx (sorted load), so idx[iu] < idx[ju] => i < j
    order = np.lexsort((jj, ii, -sr))[:20]
    for t in order:
        rows.append((int(c), int(ii[t]), int(jj[t]), float(sr[t])))
print('min sim 3dp-rounding margin (ulp@1e-3):', round_margin)
rows.sort(key=lambda r: (-r[3], r[1], r[2]))
if len(rows) > 20:
    cut_gap = rows[19][3] - rows[20][3]
    print('rank-20 cut: sim20 =', rows[19][3], 'sim21 =', rows[20][3],
          'gap =', round(cut_gap, 6),
          '(ties broken totally by (i, j) even at gap 0)')
want = rows[:20]

sp = pq.read_table(glob.glob(
    os.path.join(out_dir, 'i24_embed_near_dup', '*.parquet')))
got = list(zip(np.asarray(sp['cid']).tolist(), np.asarray(sp['i']).tolist(),
               np.asarray(sp['j']).tolist(),
               [round(float(x), 3) for x in np.asarray(sp['sim'])]))
print('numpy top-20:', want[:3], '...')
print('spark top-20:', got[:3], '...')
ok = got == want
if not ok:
    for a, b in zip(got, want):
        if a != b:
            print('first diff: spark', a, 'numpy', b)
            break
print('MATCH' if ok else 'MISMATCH')
sys.exit(0 if ok else 1)
