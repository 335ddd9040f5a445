"""Round-4: ablate the decoder-scale value-gradient scatter.

pose_attn_anatomy measured `_grad_value_rows` at 145 ms for ONE pose
cross-attention call (BH=24, N=22323, D=32, 1.73M tap indices) — ~90%
of the layer's fwd+grad.  The current form issues 16 sequential
vmapped ``out.at[idx].add(upd)`` ops (4 levels x 4 corners).  Variants:

  scatter16   the shipped form (baseline)
  scatter1    ONE merged scatter: all levels/corners concatenated
  flat1       merged + vmap removed (global row index over BH*N)
  sorted1     merged + host-free argsort by row index, scattered with
              indices_are_sorted=True
  seg1        merged + sort + segment-boundary unique-reduce, scattered
              with indices_are_sorted + unique_indices
  dense1      separable-bilinear dense form: the 2x2 footprint factors
              into row x col weights, so grad_value[y,x,d] =
              sum_q wy[q,y] wx[q,x] upd[q,d] — two structured one-hots
              built by iota-compare feeding ONE matmul per level
              (contraction over taps).  No scatter unit at all; the MXU
              does the accumulation.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SHAPES = ((100, 168), (50, 84), (25, 42), (13, 21))
N = sum(h * w for h, w in SHAPES)
B, T, Q, H, L, K, C = 1, 3, 300, 8, 4, 15, 256
BT, D = B * T, C // H
BH = BT * H


def timeit(raw, *args, iters=5, tag=""):
    """Times a scalar-sum wrapper (fetching the (BH,N,D) output every
    iteration would measure the axon tunnel, ~2 s for 68 MB); the full
    array is fetched ONCE for the cross-case correctness check."""
    f = jax.jit(lambda *a: raw(*a).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    drained = float(f(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        drained = float(f(*args))
    per = (time.perf_counter() - t0) / iters
    print(f"{tag:12s} {per * 1e3:8.2f} ms  (compile {compile_s:.0f}s, "
          f"sum {drained:.4f})", flush=True)
    out = np.asarray(jax.jit(raw)(*args))
    return per, out


def tap_indices_updates(locs, wts, gout):
    """(BH, M) merged row indices + (BH, M, D) updates, M = QK*L*4."""
    g_bh = gout.reshape(BT, Q, H, D).transpose(0, 2, 1, 3).reshape(
        BH, Q, 1, D).astype(jnp.float32)
    idx_all, upd_all = [], []
    start = 0
    for lvl, (hh, ww) in enumerate(SHAPES):
        loc = locs[:, :, :, lvl]
        attn = wts[:, :, :, lvl].astype(jnp.float32)
        x = loc[..., 0] * ww - 0.5
        y = loc[..., 1] * hh - 0.5
        ys = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, hh - 2)
        xs = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, ww - 2)
        wy = (jnp.maximum(1.0 - jnp.abs(y - ys), 0.0),
              jnp.maximum(1.0 - jnp.abs(y - (ys + 1)), 0.0))
        wx = (jnp.maximum(1.0 - jnp.abs(x - xs), 0.0),
              jnp.maximum(1.0 - jnp.abs(x - (xs + 1)), 0.0))
        for r in range(2):
            for c in range(2):
                idx = (start + (ys + r) * ww + (xs + c)).transpose(
                    0, 2, 1, 3).reshape(BH, Q * K)
                wgt = (wy[r] * wx[c] * attn).transpose(
                    0, 2, 1, 3).reshape(BH, Q, K, 1)
                upd = (wgt * g_bh).reshape(BH, Q * K, D)
                idx_all.append(idx)
                upd_all.append(upd)
        start += hh * ww
    return jnp.concatenate(idx_all, 1), jnp.concatenate(upd_all, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cases",
                    default="scatter16,scatter1,flat1,sorted1,seg1")
    args = ap.parse_args()
    cases = args.cases.split(",")

    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(BT, N, H, D), jnp.bfloat16)
    locs = jnp.asarray(jax.nn.sigmoid(jnp.asarray(
        rng.randn(BT, Q, H, L, K, 2))), jnp.float32)
    wts = jnp.asarray(rng.rand(BT, Q, H, L, K), jnp.float32)
    gout = jnp.asarray(rng.randn(BT, Q, C), jnp.bfloat16)

    outs = {}
    for case in cases:
        if case == "scatter16":
            from pavenet_tpu.ops.ms_deform_attn import _grad_value_rows
            raw16 = lambda v, l, w, g: _grad_value_rows(
                v, SHAPES, l, w, g).astype(jnp.float32).transpose(
                    0, 2, 1, 3).reshape(BH, N, D)
            _, outs[case] = timeit(raw16, value, locs, wts, gout,
                                   iters=args.iters, tag=case)
        elif case == "scatter1":
            def one(l, w, g):
                idx, upd = tap_indices_updates(l, w, g)
                out = jnp.zeros((BH, N, D), jnp.float32)
                return jax.vmap(lambda o, i, u: o.at[i].add(u))(
                    out, idx, upd)
            _, outs[case] = timeit(one, locs, wts, gout,
                                   iters=args.iters, tag=case)
        elif case == "flat1":
            def flat(l, w, g):
                idx, upd = tap_indices_updates(l, w, g)
                gidx = (idx + jnp.arange(BH, dtype=jnp.int32)[:, None]
                        * N).reshape(-1)
                out = jnp.zeros((BH * N, D), jnp.float32)
                return out.at[gidx].add(upd.reshape(-1, D)).reshape(
                    BH, N, D)
            _, outs[case] = timeit(flat, locs, wts, gout,
                                   iters=args.iters, tag=case)
        elif case == "sorted1":
            def srt(l, w, g):
                idx, upd = tap_indices_updates(l, w, g)
                gidx = (idx + jnp.arange(BH, dtype=jnp.int32)[:, None]
                        * N).reshape(-1)
                order = jnp.argsort(gidx)
                gidx = gidx[order]
                upd = upd.reshape(-1, D)[order]
                out = jnp.zeros((BH * N, D), jnp.float32)
                return out.at[gidx].add(
                    upd, indices_are_sorted=True).reshape(BH, N, D)
            _, outs[case] = timeit(srt, locs, wts, gout,
                                   iters=args.iters, tag=case)
        elif case == "seg1":
            def seg(l, w, g):
                idx, upd = tap_indices_updates(l, w, g)
                gidx = (idx + jnp.arange(BH, dtype=jnp.int32)[:, None]
                        * N).reshape(-1)
                order = jnp.argsort(gidx)
                gidx = gidx[order]
                upd = upd.reshape(-1, D)[order]
                # collapse equal-index runs: prefix-sum within runs via
                # segment boundaries, keep run tails, scatter unique
                M = gidx.shape[0]
                seg_ids = jnp.cumsum(
                    jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                     (gidx[1:] != gidx[:-1]).astype(
                                         jnp.int32)]))
                sums = jax.ops.segment_sum(upd, seg_ids, num_segments=M)
                # empty trailing segments: segment_max identity is
                # INT_MIN -> dropped by mode="drop" (their sums are 0)
                uniq = jax.ops.segment_max(
                    gidx, seg_ids, num_segments=M)
                out = jnp.zeros((BH * N, D), jnp.float32)
                return out.at[uniq].add(
                    sums, indices_are_sorted=True,
                    mode="drop").reshape(BH, N, D)
            _, outs[case] = timeit(seg, locs, wts, gout,
                                   iters=args.iters, tag=case)

        elif case == "dense1":
            def dense(l, w, g):
                g_bh = g.reshape(BT, Q, H, D).transpose(
                    0, 2, 1, 3).reshape(BH, Q, 1, D).astype(jnp.bfloat16)
                pieces = []
                for lvl, (hh, ww) in enumerate(SHAPES):
                    loc = l[:, :, :, lvl]
                    attn = w[:, :, :, lvl]
                    x = loc[..., 0] * ww - 0.5
                    y = loc[..., 1] * hh - 0.5
                    ys = jnp.clip(jnp.floor(y).astype(jnp.int32),
                                  0, hh - 2)
                    xs = jnp.clip(jnp.floor(x).astype(jnp.int32),
                                  0, ww - 2)
                    wy0 = jnp.maximum(1.0 - jnp.abs(y - ys), 0.0)
                    wy1 = jnp.maximum(1.0 - jnp.abs(y - (ys + 1)), 0.0)
                    wx0 = jnp.maximum(1.0 - jnp.abs(x - xs), 0.0)
                    wx1 = jnp.maximum(1.0 - jnp.abs(x - (xs + 1)), 0.0)
                    tr = lambda a: a.transpose(0, 2, 1, 3).reshape(
                        BH, Q * K)
                    ys_, xs_ = tr(ys), tr(xs)
                    yy = jnp.arange(hh, dtype=jnp.int32)
                    xx = jnp.arange(ww, dtype=jnp.int32)
                    wy_d = (tr(wy0)[..., None]
                            * (yy == ys_[..., None])
                            + tr(wy1)[..., None]
                            * (yy == ys_[..., None] + 1)).astype(
                                jnp.bfloat16)            # (BH, QK, hh)
                    wx_d = ((tr(wx0) * tr(attn))[..., None]
                            * (xx == xs_[..., None])
                            + (tr(wx1) * tr(attn))[..., None]
                            * (xx == xs_[..., None] + 1)).astype(
                                jnp.bfloat16)            # (BH, QK, ww)
                    upd = jnp.broadcast_to(
                        g_bh, (BH, Q, K, D)).reshape(BH, Q * K, D)
                    m1 = wx_d[..., :, None] * upd[..., None, :]
                    out_l = jnp.einsum(
                        "bqy,bqm->bym", wy_d,
                        m1.reshape(BH, Q * K, ww * D),
                        preferred_element_type=jnp.float32)
                    pieces.append(out_l.reshape(BH, hh * ww, D))
                return jnp.concatenate(pieces, 1)
            _, outs[case] = timeit(dense, locs, wts, gout,
                                   iters=args.iters, tag=case)

    keys = list(outs)
    for k in keys[1:]:
        err = float(jnp.max(jnp.abs(outs[k] - outs[keys[0]])))
        print(f"max|{k} - {keys[0]}| = {err:.3e}")


if __name__ == "__main__":
    main()
