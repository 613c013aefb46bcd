"""Microbench: rebin cost decomposition on TPU.

Times (a) the multi-operand payload sort, (b) a (key, iota)-only sort,
(c) the slot gather alone, (d) key-sort + composed gather, and (e) a
one-hot-matmul counting-sort ranking (no comparison sort at all:
rank = exclusive per-tile running count, slot = tile*p_max + rank, then one
scatter/gather) to pick the cheapest rebin structure.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CAP = int(sys.argv[1]) if len(sys.argv) > 1 else 2_097_152
N_ATTR = int(sys.argv[2]) if len(sys.argv) > 2 else 14
N_TILES = int(sys.argv[3]) if len(sys.argv) > 3 else 512
P_MAX = CAP // N_TILES

rng = np.random.default_rng(0)
tid = jnp.asarray(rng.integers(0, N_TILES, CAP), jnp.int32)
payload = jnp.asarray(rng.standard_normal((N_ATTR, CAP)), jnp.float32)
slot_s = jnp.tile(jnp.arange(P_MAX, dtype=jnp.int32), N_TILES)
slot_t = jnp.repeat(jnp.arange(N_TILES, dtype=jnp.int32), P_MAX,
                    total_repeat_length=N_TILES * P_MAX)


@jax.jit
def multi(tid, payload):
    sorted_all = jax.lax.sort(
        [tid] + [payload[i] for i in range(N_ATTR)], num_keys=1)
    return sorted_all[0], jnp.stack(sorted_all[1:], axis=0)


@jax.jit
def keysort(tid):
    iota = jnp.arange(CAP, dtype=jnp.int32)
    return jax.lax.sort([tid, iota], num_keys=1)


@jax.jit
def gather_only(payload, src):
    return payload[:, src]


@jax.jit
def keyidx_full(tid, payload):
    key_sorted, perm = jax.lax.sort(
        [tid, jnp.arange(CAP, dtype=jnp.int32)], num_keys=1)
    offsets = jnp.searchsorted(key_sorted, jnp.arange(N_TILES, dtype=jnp.int32))
    counts = jnp.searchsorted(
        key_sorted, jnp.arange(1, N_TILES + 1, dtype=jnp.int32)) - offsets
    src = jnp.clip(offsets[slot_t] + slot_s, 0, CAP - 1)
    valid = slot_s < counts[slot_t]
    g = payload[:, perm[src]]
    return jnp.where(valid[None], g, 0.0)


@jax.jit
def counting(tid, payload):
    # rank of particle i within its tile = # of j < i with tid[j] == tid[i]:
    # segmented running count via one-hot (CAP, N_TILES) cumsum is O(CAP *
    # N_TILES) — too big.  Instead: chunked hierarchical counting.
    # chunk the capacity into C chunks of L; per-chunk histograms (one-hot
    # matmul, L x N_TILES each), exclusive-scan over chunks, then within a
    # chunk an (L, L) lower-triangular same-tile mask matmul gives local rank.
    C = 256
    L = CAP // C
    t2 = tid.reshape(C, L)
    oh = jax.nn.one_hot(t2, N_TILES, dtype=jnp.float32)      # (C, L, T)
    hist = oh.sum(axis=1)                                     # (C, T)
    base = jnp.concatenate(
        [jnp.zeros((1, N_TILES), jnp.float32), jnp.cumsum(hist, 0)[:-1]], 0)
    # local rank: cumsum of one-hot along L, exclusive, then pick own column
    run = jnp.cumsum(oh, axis=1) - oh                         # (C, L, T)
    loc = jnp.take_along_axis(run, t2[..., None], axis=2)[..., 0]
    glob = jnp.take_along_axis(base, t2, axis=1)              # via (C, T)
    rank = (loc + glob).astype(jnp.int32).reshape(-1)
    slot = jnp.where(rank < P_MAX, tid * P_MAX + rank, CAP)
    # scatter payload into slots
    out = jnp.zeros((N_ATTR, CAP + 1), jnp.float32)
    out = out.at[:, slot].set(payload, mode="drop")
    return out[:, :CAP]


def _pull(out):
    # the axon tunnel's block_until_ready returns early; a scalar D2H pull
    # provably forces completion (see bench.py)
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.reshape(-1)[0])


def timeit(f, *a, n=10):
    out = f(*a)
    _pull(out)
    t0 = time.perf_counter()
    _pull(out)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    _pull(out)
    return max(time.perf_counter() - t0 - rtt, 1e-9) / n


src_rand = jnp.asarray(rng.integers(0, CAP, CAP), jnp.int32)
res = {
    "multi_sort": timeit(multi, tid, payload),
    "key_sort": timeit(keysort, tid),
    "gather14_rand": timeit(gather_only, payload, src_rand),
    "keyidx_full": timeit(keyidx_full, tid, payload),
    "counting": timeit(counting, tid, payload),
}
print(f"cap={CAP} attrs={N_ATTR} tiles={N_TILES}")
for k, v in res.items():
    print(f"  {k:16s} {v*1e3:8.2f} ms")
