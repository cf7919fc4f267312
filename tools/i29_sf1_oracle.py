"""Independent i29 oracle for large SFs: exact semantics of
PipelineOps.semDedup (assign to stub codebook by round6(dot) argmax with
min-cid tiebreak — TWO-LEVEL routed when k >= 64, mirroring the
assignToCentroids dispatcher via tools/ivf_common.py, the ONE shared
routing mirror; within-cluster edges round3(dot) >= 0.4; connected
components; drop non-min members), implemented with numpy + union-find
instead of the DuckDB recursive CTE (which disk-explodes on the 10x
clone's cliques — >79 GB at sf1). This is the PERMANENT oracle for the
CC family at SFs where the recursive CTE is infeasible (VERDICT r12 #4);
the driver's sf0.01 gate still uses the SQL oracle.
Rounding-boundary margins are audited at EVERY decision layer (flat
argmax, stage-1 routing, stage-2 group dots, the 0.4 edge threshold) so
summation-order differences cannot flip any decision.

Usage: python3 tools/i29_sf1_oracle.py <sfDataDir> <verifyOutDir>
  e.g. python3 tools/i29_sf1_oracle.py data/sf1 /tmp/verify_sf1
reads <sfDataDir>/embeddings.parquet[/*.parquet] and compares against
<verifyOutDir>/i29_semdedup/*.parquet. Exits 0 on MATCH, 1 otherwise.
"""
import glob
import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ivf_common import TIE_RISK, load_embeddings, route, scaled_k, seq_dot

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

# within-cluster edges: round3(dot) >= 0.4  <=>  dot >= 0.3995 (HALF_UP)
parent = np.arange(n)
def find(i):
    while parent[i] != i:
        parent[i] = parent[parent[i]]
        i = parent[i]
    return i
min_margin = 1.0
edge_count = 0
refined = 0
for c in np.unique(cid):
    idx = np.where(cid == c)[0]
    D = emb[idx] @ emb[idx].T
    iu, ju = np.triu_indices(len(idx), k=1)
    s = D[iu, ju]
    min_margin = min(min_margin, np.abs(s - 0.3995).min())
    # Knife-edge refinement (the r16 ivf_common rule): a pair within
    # TIE_RISK quanta of the threshold is re-derived in the ENGINE's
    # left-to-right fold order, so the >= decision is bit-faithful
    # regardless of BLAS reordering.
    rr = np.where(np.abs(s - 0.3995) < TIE_RISK * 1e-3)[0]
    if rr.size:
        s = s.copy()
        s[rr] = seq_dot(emb[idx[iu[rr]]], emb[idx[ju[rr]]])
        refined += int(rr.size)
    hit = s >= 0.3995
    edge_count += int(hit.sum())
    for a, b in zip(idx[iu[hit]], idx[ju[hit]]):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id keeps the min-label invariant recoverable
            if ra < rb: parent[rb] = ra
            else: parent[ra] = rb
print('edges:', edge_count, 'min edge-threshold margin:', min_margin,
      'refined:', refined)
roots = np.array([find(i) for i in range(n)])
# component label = min vec_id in component (vec_id sorted asc => index root IS min index)
comp_min = np.zeros(n, dtype=np.int64)
for i in range(n):
    comp_min[i] = vec_id[roots[i]]
surv_mask = comp_min == vec_id
got_set = set(zip(vec_id[surv_mask].tolist(), cid[surv_mask].tolist()))
print('numpy survivors:', len(got_set))

sp = pq.read_table(glob.glob(os.path.join(out_dir, 'i29_semdedup', '*.parquet')))
sdf = set(zip(np.asarray(sp['vec_id']).tolist(), np.asarray(sp['cid']).tolist()))
print('spark survivors:', len(sdf))
missing = sdf - got_set; extra = got_set - sdf
print('missing from numpy:', list(missing)[:5], 'extra in numpy:', list(extra)[:5])
ok = not missing and not extra
print('MATCH' if ok else 'MISMATCH')
sys.exit(0 if ok else 1)
