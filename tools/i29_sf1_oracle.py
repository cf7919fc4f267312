"""Independent i29 oracle for large SFs: exact semantics of
PipelineOps.semDedup (assign to stub codebook by round6(dot) argmax with
min-cid tiebreak — TWO-LEVEL routed when k >= 64, mirroring the
assignToCentroids dispatcher; within-cluster edges round3(dot) >= 0.4;
connected components; drop non-min members), implemented with numpy + union-find
instead of the DuckDB recursive CTE (which disk-explodes on the 10x
clone's cliques — >79 GB at sf1). This is the PERMANENT oracle for the
CC family at SFs where the recursive CTE is infeasible (VERDICT r12 #4);
the driver's sf0.01 gate still uses the SQL oracle.
Rounding-boundary margins are audited so summation-order differences
cannot flip any decision.

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

if len(sys.argv) != 3:
    print(__doc__)
    sys.exit(2)
data_dir, out_dir = sys.argv[1], sys.argv[2]

emb_path = os.path.join(data_dir, 'embeddings.parquet')
emb_files = sorted(glob.glob(os.path.join(emb_path, '*.parquet'))) \
    if os.path.isdir(emb_path) else [emb_path]
t = pq.read_table(emb_files)
vec_id = np.asarray(t['vec_id'])
emb = np.stack([np.asarray(x, dtype=np.float64) for x in t['embedding'].to_pylist()])
order = np.argsort(vec_id)
vec_id, emb = vec_id[order], emb[order]
n, dim = emb.shape
print('vectors', n, 'dim', dim)

# stub codebook sized by the scaledK rule (PipelineOps.scaledK):
# k = max(8, N // 250) — the fixture 8 at every gate SF, bucket depth
# pinned ~250 as the corpus scales.
k = max(8, n // 250)
print('codebook k', k)
cmask = vec_id < k
cents = emb[cmask]; cids = vec_id[cmask]


def round6_argmax(mat, ids):
    """(round6 dot, min-id tiebreak) argmax per row + boundary audit —
    the exact assignToCentroidsFlat contract."""
    rd = np.round(mat, 6)
    fr = np.abs(((mat * 1e6) % 1.0) - 0.5)
    print('min assign-boundary margin (ulp@1e-6):', fr.min())
    best = rd.max(axis=1)
    win = ids[np.argmax(rd == best[:, None], axis=1)]
    if rd.shape[1] > 1:
        top2 = np.sort(rd, axis=1)[:, -2]
        print('rounded argmax ties:', int((top2 == best).sum()))
    return win


# Routing mirrors PipelineOps.assignToCentroids' dispatcher: FLAT below
# hierRouteMin = 64, TWO-LEVEL at/above it (stage 1: nearest of the
# g = ceil(sqrt(k)) lowest-cid supers; stage 2: argmax within that
# super's member group, members pre-assigned by the same flat rule).
HIER_ROUTE_MIN = 64
if k < HIER_ROUTE_MIN:
    cid = round6_argmax(emb @ cents.T, cids)          # n x k dots
else:
    g = int(np.ceil(np.sqrt(k)))
    print('two-level routing: g =', g)
    smask = cids < g
    sups = cents[smask]; sids = cids[smask]
    # codebook grouping: each centroid -> nearest super (flat rule),
    # EXCEPT a super is pinned to its own group (a routed-to group must
    # never be member-empty — mirrors assignToCentroidsTwoLevel).
    cgrp = round6_argmax(cents @ sups.T, sids)        # k x g dots
    cgrp = np.where(cids < g, cids, cgrp)
    # stage 1: TOP-2 supers per row — sort by (round6 d desc, sid asc);
    # stable argsort of -rd breaks ties by ascending column index, and
    # columns are sid-ascending, so the tie-break matches the engine's
    # (-d, gid) struct sort exactly.
    rds = emb @ sups.T                                # n x g dots
    fr2 = np.abs(((rds * 1e6) % 1.0) - 0.5)
    print('min stage1-boundary margin (ulp@1e-6):', fr2.min())
    srt = np.argsort(-np.round(rds, 6), axis=1, kind='stable')
    g1 = sids[srt[:, 0]]
    g2 = sids[srt[:, 1]] if g > 1 else g1
    # stage 2: argmax within the UNION of the two routed groups,
    # vectorized per distinct (g1, g2) pair (<= g^2 pairs).
    cid = np.zeros(n, dtype=np.int64)
    for a, b in set(zip(g1.tolist(), g2.tolist())):
        rows = np.where((g1 == a) & (g2 == b))[0]
        midx = np.where((cgrp == a) | (cgrp == b))[0]
        gd = np.round(emb[rows] @ cents[midx].T, 6)
        cid[rows] = cids[midx][np.argmax(gd == gd.max(axis=1)[:, None], axis=1)]

# within-cluster edges: round3(dot) >= 0.4  <=>  dot >= 0.3995 (HALF_UP)
parent = np.arange(n)
def find(i):
    while parent[i] != i:
        parent[i] = parent[parent[i]]
        i = parent[i]
    return i
min_margin = 1.0
edge_count = 0
for c in np.unique(cid):
    idx = np.where(cid == c)[0]
    D = emb[idx] @ emb[idx].T
    iu, ju = np.triu_indices(len(idx), k=1)
    s = D[iu, ju]
    min_margin = min(min_margin, np.abs(s - 0.3995).min())
    hit = s >= 0.3995
    edge_count += int(hit.sum())
    for a, b in zip(idx[iu[hit]], idx[ju[hit]]):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id keeps the min-label invariant recoverable
            if ra < rb: parent[rb] = ra
            else: parent[ra] = rb
print('edges:', edge_count, 'min edge-threshold margin:', min_margin)
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
