"""Measured IVF recall vs exact search on realistic, NON-separable features.

The ivf-mode guarantee ("recall is a superset of faiss nprobe=1 whenever the
chunk's distinct probed lists <= probes") is structural; this script puts a
NUMBER on recall@k for the production geometry, on data that does not
cluster cleanly:

- table rows: heavy-tailed mixture — cluster directions ~ N(0, I), points =
  center + Student-t(df=4) noise at a scale that overlaps neighboring
  clusters, plus a diffuse background component (10%).
- queries: a *chunk* of temporally-correlated frames (a small random walk
  seeded at a table row) — consecutive 10 ms ContentVec frames are highly
  similar, which is exactly why chunk-union probing works; plus a fully
  random-query column as the adversarial case.

Usage (TPU; CPU works for the smaller sizes):
    python scripts/ivf_recall.py --sizes 100000 300000 --dim 768
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from obs_rvc_tpu.retrieval.build import default_nlist, train_ivf
from obs_rvc_tpu.retrieval.faiss_reader import IvfFlatIndex
from obs_rvc_tpu.retrieval.index import RetrievalIndex, ivf_search


def make_table(n: int, dim: int, rng: np.random.Generator,
               nclust: int = 1024, spread: float = 0.7) -> np.ndarray:
    centers = rng.standard_normal((nclust, dim)).astype(np.float32)
    which = rng.integers(0, nclust, n)
    pts = centers[which] + spread * rng.standard_t(4, (n, dim)).astype(np.float32)
    bg = rng.integers(0, n, n // 10)
    pts[bg] = 1.5 * rng.standard_t(4, (len(bg), dim)).astype(np.float32)
    return pts


def make_queries(table: np.ndarray, rng: np.random.Generator,
                 n_chunks: int, frames: int, walk: float = 0.1):
    """Chunks of correlated frames (random walks seeded at table rows)."""
    chunks = []
    for _ in range(n_chunks):
        start = table[rng.integers(0, len(table))].copy()
        steps = walk * rng.standard_normal((frames, table.shape[1])).astype(np.float32)
        chunks.append(start[None, :] + np.cumsum(steps, axis=0))
    return np.stack(chunks)  # [n_chunks, frames, dim]


def exact_topk_rows(table: np.ndarray, norms: np.ndarray, q: np.ndarray, k: int) -> np.ndarray:
    """Ground truth on HOST numpy (blockwise matmul + argpartition).

    This ran as a jitted matmul + lax.top_k first — and the remote compile
    service reproducibly DIED compiling top_k over a 300k-column operand
    (`remote_compile: Broken pipe`, twice at the same line; the 2nd/3rd …
    kth partial sorts of a huge minor axis are a pathological Mosaic/XLA
    sort). Truth-side work has no reason to gamble on that service: numpy
    does 489×300k×768 in ~4 s/chunk and argpartition is O(N)."""
    table = np.asarray(table)
    norms = np.asarray(norms)
    nq = len(q)
    best_s = np.full((nq, 0), -np.inf, np.float32)
    best_i = np.zeros((nq, 0), np.int64)
    bs = 262144
    for s in range(0, table.shape[0], bs):
        blk = table[s : s + bs]
        sc = 2.0 * q @ blk.T - norms[None, s : s + bs]
        # final block can be narrower than k (n % bs < k) — clamp the
        # partition index; the fold below still keeps the global top-k
        kk = min(k, sc.shape[1])
        top = np.argpartition(sc, -kk, axis=1)[:, -kk:]
        best_s = np.concatenate([best_s, np.take_along_axis(sc, top, 1)], axis=1)
        best_i = np.concatenate([best_i, top + s], axis=1)
        if best_s.shape[1] > 4 * k:  # fold the running candidates
            keep = np.argpartition(best_s, -k, axis=1)[:, -k:]
            best_s = np.take_along_axis(best_s, keep, 1)
            best_i = np.take_along_axis(best_i, keep, 1)
    keep = np.argpartition(best_s, -k, axis=1)[:, -k:]
    return np.take_along_axis(best_i, keep, 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[100_000, 300_000, 1_000_000])
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--chunks", type=int, default=8, help="query chunks per size")
    ap.add_argument("--frames", type=int, default=489, help="frames per chunk (B=1 default geometry)")
    ap.add_argument("--kmeans-iters", type=int, default=6)
    ap.add_argument("--train-cap", type=int, default=200_000,
                    help="k-means training subsample (faiss-style)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--probes", type=int, nargs="+", default=[64, 120, 256])
    ap.add_argument("--lcap", type=int, nargs="+", default=[0],
                    help="cap(s) for per-list slab length (0 = untruncated "
                    "max list length). Heavy-tailed data grows 9k-row lists "
                    "at 1M — capping trades the tail of each probed list for "
                    "a probes×lcap×dim gather budget (the serving knob). "
                    "Multiple values sweep against ONE device-resident table "
                    "(lcap is only a static slice length; the layout is "
                    "shared), reporting a (recall, ms/chunk) pair per point")
    ap.add_argument("--labels", nargs="+", default=["correlated", "random"],
                    choices=["correlated", "random"])
    ap.add_argument("--balance", action="store_true",
                    help="split lists longer than lcap into balanced "
                    "sublists (retrieval/build.balance_lists) instead of "
                    "truncating — each finite lcap gets its own re-clustered "
                    "layout (and its own table transfer)")
    ap.add_argument("--prep-cache", default="",
                    help="directory for table/centroid/assignment .npz "
                    "checkpoints — a retry after a remote-compile-service "
                    "death (its known failure mode) skips the ~30 min of "
                    "prep and re-pays only the searches")
    args = ap.parse_args()

    for n in args.sizes:
        rng = np.random.default_rng(args.seed)
        cache = None
        if args.prep_cache:
            import pathlib

            # every flag that shapes the cached prep is in the key (ADVICE
            # r4: the old key silently reused stale centroids/queries when
            # --train-cap/--kmeans-iters/--chunks/--frames changed)
            cache = (pathlib.Path(args.prep_cache)
                     / f"ivfprep_n{n}_d{args.dim}_s{args.seed}"
                       f"_tc{args.train_cap}_ki{args.kmeans_iters}"
                       f"_c{args.chunks}_f{args.frames}.npz")
            legacy = cache.parent / f"ivfprep_n{n}_d{args.dim}_s{args.seed}.npz"
            if (not cache.exists() and legacy.exists()
                    and (args.train_cap, args.kmeans_iters, args.chunks,
                         args.frames) == (200_000, 6, 8, 489)):
                # the round-4 caches predate the keyed name and were built
                # with exactly these defaults — keep them valid
                cache = legacy
        if cache is not None and cache.exists():
            z = np.load(cache)
            table, cent, assign = z["table"], z["cent"], z["assign"]
            qchunks, rand_q = z["qchunks"], z["rand_q"]
            nlist, t_train = int(z["nlist"]), float(z["t_train"])
            print(f"prep cache hit: {cache}", file=sys.stderr, flush=True)
        else:
            table = make_table(n, args.dim, rng)
            nlist = default_nlist(n)
            sub = table[rng.choice(n, min(n, args.train_cap), replace=False)]
            t0 = time.time()
            cent, _ = train_ivf(sub, nlist=nlist, iters=args.kmeans_iters, seed=args.seed)
            # assign the full table against the trained centroids
            cj = jnp.asarray(cent)
            assign = np.zeros(n, np.int32)
            bs = 65536

            @jax.jit
            def assign_block(xb):
                d = jnp.sum(cj * cj, axis=1)[None, :] - 2.0 * xb @ cj.T
                return jnp.argmin(d, axis=1)

            for s in range(0, n, bs):
                assign[s : s + bs] = np.asarray(assign_block(jnp.asarray(table[s : s + bs])))
            t_train = time.time() - t0
            qchunks = make_queries(table, rng, args.chunks, args.frames)
            rand_q = make_table(args.frames, args.dim, rng)[None]
            if cache is not None:
                cache.parent.mkdir(parents=True, exist_ok=True)
                np.savez(cache, table=table, cent=cent, assign=assign,
                         qchunks=qchunks, rand_q=rand_q,
                         nlist=nlist, t_train=t_train)
                print(f"prep cached: {cache}", file=sys.stderr, flush=True)

        idx = RetrievalIndex(mode="ivf", k=args.k)
        # base layout, built ONCE with the untruncated slab (max padding):
        # smaller lcaps reuse the same list-major layout — lcap is only the
        # STATIC slice length of each probed slab (retrieval/index.py
        # ivf_search), and the padding rows cover any lcap ≤ max list length
        params = idx.make_ivf_params(IvfFlatIndex(table, cent, assign), lcap=None)
        max_lcap = idx.lcap
        base_rowmap = idx.row_order
        # ground truth runs on the ORIGINAL table (layout-independent row
        # ids; host numpy views — exact_topk_rows never touches the device);
        # searched reordered rows map back through the layout's row_order
        vt = table
        vn = np.sum(table.astype(np.float32) * table, axis=1).astype(np.float32)
        # device-resident table: ONE host→device transfer per layout. Round 4
        # re-sent the full table per chunk per probe setting (the dominant
        # term in its 912 s search_wall_s) — a serving index is resident.
        dev = {name: jax.device_put(jnp.asarray(val)) for name, val in params.items()}

        def map_rows(rows, rowmap):
            """Reordered row ids → original ids (padding rows → -1)."""
            rows = np.asarray(rows)
            return np.where(rows < n, rowmap[np.minimum(rows, n - 1)], -1)

        # faiss nprobe=1 recall on the same queries (per-query own-top-1
        # list only) over the BASE layout — the baseline our chunk-union
        # guarantee is against
        def nprobe1_recall(chunks, truths):
            hits = tot = 0
            for ch, truth in zip(chunks, truths):
                cdist = (np.sum(cent * cent, 1)[None, :]
                         - 2.0 * ch @ cent.T)
                own = np.argmin(cdist, axis=1)
                offs, lens = params["offsets"], params["lengths"]
                for qi in range(len(ch)):
                    lo = int(offs[own[qi]]); hi = lo + int(lens[own[qi]])
                    members = set(base_rowmap[lo:hi].tolist())
                    hits += len(members & set(truth[qi].tolist()))
                    tot += args.k
            return hits / tot

        def search_fn(lcap, probes):
            import functools

            return jax.jit(functools.partial(
                ivf_search, k=args.k, probes=probes, lcap=lcap, nprobe=1))

        def slope_ms_per_chunk(dev, lcap, probes, q0):
            """Amortized device ms per chunk search: dependency-chained
            fori_loop with a traced count, forced-transfer sync (the only
            reliable sync on the axon relay — docs/DEVELOPMENT.md 3b), slope
            between two counts so dispatch/RTT cancel.

            The table MUST enter the jit as arguments, not a closure — a
            captured 3.1 GB device table lowers as an HLO *constant*
            (observed: "3.25GB of constants captured" + the remote compile
            choking on it)."""
            def run(vectors, norms, lengths, offsets, centroids, cnorms,
                    q, niter):
                def body(i, carry):
                    qc, acc = carry
                    _, neg, _ = ivf_search(
                        vectors, norms, lengths, offsets, centroids, cnorms,
                        qc, k=args.k, probes=probes, lcap=lcap, nprobe=1)
                    acc = acc + jnp.sum(neg).astype(jnp.float32)
                    qc = qc * (1.0 + jnp.tanh(acc) * 1e-7)
                    return qc, acc

                _, acc = jax.lax.fori_loop(0, niter, body, (q, jnp.float32(0.0)))
                return acc

            fn = jax.jit(run)
            qd = jax.device_put(jnp.asarray(q0))
            n1, n2 = 4, 20

            def best(niter, reps=3):
                ts = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    val = fn(dev["vectors"], dev["norms"], dev["lengths"],
                             dev["offsets"], dev["centroids"], dev["cnorms"],
                             qd, niter)
                    float(np.asarray(val))  # transfer = sync
                    ts.append(time.perf_counter() - t0)
                return min(ts) * 1000.0

            best(n1)  # compile
            return (best(n2) - best(n1)) / (n2 - n1)

        for label, chunks in (("correlated", qchunks), ("random", rand_q)):
            if label not in args.labels:
                continue
            # exact ground truth ONCE per chunk — cached next to the prep
            # (truth depends on table+queries only, not the probe geometry)
            tcache = None
            if cache is not None:
                # "o" = original-table row-id space (layout-independent)
                tcache = cache.parent / (
                    f"ivftruth_o_n{n}_d{args.dim}_s{args.seed}_c{args.chunks}"
                    f"_f{args.frames}_k{args.k}_{label}.npz")
            if tcache is not None and tcache.exists():
                truths = list(np.load(tcache)["truths"])
            else:
                truths = [exact_topk_rows(vt, vn, ch, args.k) for ch in chunks]
                if tcache is not None:
                    np.savez(tcache, truths=np.stack(truths))
            base = nprobe1_recall(chunks, truths)
            for lcap_arg in args.lcap:
                balanced = bool(args.balance and lcap_arg
                                and lcap_arg < max_lcap)
                if balanced:
                    # re-clustered layout: every list ≤ lcap, own transfer
                    t_b = time.time()
                    idx_b = RetrievalIndex(mode="ivf", k=args.k)
                    params_b = idx_b.make_ivf_params(
                        IvfFlatIndex(table, cent, assign), lcap=lcap_arg,
                        balance=True)
                    t_balance = time.time() - t_b
                    print(f"balanced lcap={lcap_arg}: nlist "
                          f"{nlist}->{len(params_b['centroids'])} "
                          f"in {t_balance:.1f}s", file=sys.stderr, flush=True)
                    dev_l = {name: jax.device_put(jnp.asarray(val))
                             for name, val in params_b.items()}
                    rowmap, nlist_l, lcap = idx_b.row_order, len(params_b["centroids"]), idx_b.lcap
                else:
                    dev_l, rowmap, nlist_l = dev, base_rowmap, nlist
                    lcap = min(lcap_arg, max_lcap) if lcap_arg else max_lcap
                for probes in args.probes:
                    if probes > nlist_l:
                        continue
                    hits = tot = 0
                    t_s = time.time()
                    try:
                        fn = search_fn(lcap, probes)
                        for ch, truth in zip(chunks, truths):
                            q = jnp.asarray(ch)
                            _, _, rows = jax.block_until_ready(fn(
                                dev_l["vectors"], dev_l["norms"], dev_l["lengths"],
                                dev_l["offsets"], dev_l["centroids"], dev_l["cnorms"], q,
                            ))
                            rows = map_rows(rows, rowmap)
                            for r, t in zip(rows, truth):
                                hits += len(set(r.tolist()) & set(t.tolist()))
                                tot += args.k
                        if probes * lcap <= (1 << 18):
                            ms = slope_ms_per_chunk(dev_l, lcap, probes, chunks[0])
                            ms_kind = "slope"
                        else:
                            # untruncated skew slabs gather GBs per search —
                            # a chained timing loop would run for hours; the
                            # recall pass's wall time is the honest number
                            ms = (time.time() - t_s) / max(len(chunks), 1) * 1000.0
                            ms_kind = "wall"
                    except Exception as e:
                        # e.g. probes×lcap×dim OOMs HBM on skewed lists —
                        # record the boundary instead of killing the sweep
                        print(json.dumps({
                            "n": n, "dim": args.dim, "nlist": nlist_l,
                            "lcap": lcap, "balanced": balanced,
                            "queries": label, "probes": probes,
                            "error": type(e).__name__, "detail": str(e)[:160],
                        }), flush=True)
                        continue
                    print(json.dumps({
                        "n": n, "dim": args.dim, "nlist": nlist_l,
                        "lcap": lcap, "balanced": balanced,
                        "queries": label, "probes": probes, "k": args.k,
                        "recall": round(hits / tot, 4),
                        "faiss_nprobe1_recall": round(base, 4),
                        "ms_per_chunk": round(ms, 3),
                        "ms_kind": ms_kind,
                        "kmeans_s": round(t_train, 1),
                        "search_wall_s": round(time.time() - t_s, 2),
                    }), flush=True)
                if balanced:
                    del dev_l  # free the layout's HBM before the next one


if __name__ == "__main__":
    main()
