"""Tensor-parallel (tp=2) fused GPT decode step — shard_map + in-kernel RDMA.

`ops/pallas/decode_step.py` fuses the entire 24-layer decode step into one
Pallas program, but it is a single-device program: under a tp>1 mesh the
pipeline used to drop to the XLA/GSPMD decode at 2-4x the per-token cost
(VERDICT r3 item 6). This module is the tp=2 variant: each chip runs the
SAME fused-program structure on its Megatron shard —

- attention: the chip's 10 of 20 heads. qkv weights are stored
  ``(L, D, 3, D)`` and sharded on the LAST axis, so a contiguous tp shard is
  exactly (q_t | k_t | v_t) — head-aligned by construction, and each
  per-component block is the same (1280, 640) tile the single-chip kernel
  streams. The KV cache shards on its feature axis: (L, B, S, 640) per chip.
- attn out-projection: row-parallel (640, 1280) — exactly ONE block of the
  existing (640, 1280) down-proj pool.
- MLP: column-parallel c_fc (1280, 2560) = 4 pool blocks; row-parallel
  down-proj (2560, 1280) = 4 pool blocks.
- the two row-parallel partials are ALL-REDUCED INSIDE the kernel with
  `pltpu.make_async_remote_copy` over ICI (2 exchanges of a (B, 1280) f32
  tile per layer), added in a fixed lo+hi order so both chips carry
  bit-identical residual streams. Per-output-channel int8 scales apply
  AFTER the reduce (matching the single-chip scale-after-full-dot order).

Why this wins on hardware: decode is HBM-bound on weight reads; tp=2 halves
the per-chip weight traffic (~242 MB/token instead of ~483 MB), while each
all-reduce moves only B*1280*4 bytes over ICI — at B<=8 that is < 41 KB per
exchange against ~10 MB of weight DMA per layer.

Weight-block slot parity: per layer the (1280, 640) pool streams 7 blocks
(3 qkv + 4 fc) and the (640, 1280) pool 5 (1 attn-proj + 4 down-proj) —
both odd, so the double-buffer slot of block j in layer l is (l + j) % 2
(dynamic, keyed off the grid index) instead of the even-count j % 2 the
single-chip kernel uses.

Scope: tp=2, int8 weights, bf16 cache, sampling decode (beam ancestry and
int8-KV stay on their proven paths; under tp they fall back to XLA).
Cross-chip correctness is proven on the 8-device CPU mesh via
`pltpu.InterpretParams` emulation of the remote DMAs
(tests/test_decode_tp.py, `__graft_entry__` dryrun) — the no-multichip
environment rule (CLAUDE.md): interpret-equality now, device numbers when
hardware exists.

Reference analogue: the accel engine's single-GPU CUDA-graph decode
(`/root/reference/indextts/accel/accel_engine.py:221-376`) has no
multi-device story at all; this is new capability (SURVEY §2.11).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from indextts_tpu.models.gpt.gpt2 import GPT2Dims

_BN = 640   # weight block width (shared with the single-chip kernel)
_BS = 64    # kv stream block


def _kernel_tp(pos_ref, tpi_ref, x_ref, ln1w_ref, ln1b_ref, ln2w_ref,
               ln2b_ref, sqkv_ref, bqkv_ref, sproj_ref, bproj_ref, sfc_ref,
               bfc_ref, sp2_ref, bp2_ref, starts_ref, e1_ref, e1t_ref,
               wqkv_ref, wproj_ref, wfc_ref, wp2_ref, ck_ref, cv_ref,
               *rest,
               L: int, B: int, D: int, Dl: int, Fl: int, Hl: int,
               S: int, K: int = 1):
    """One tp shard of the fused decode step. D = full model dim; Dl = D/TP
    attention slice; Fl = MLP hidden / TP; Hl = heads / TP. tpi_ref holds
    [my tp index, my linear mesh index, peer linear mesh index]. K > 1 adds
    an `anc_ref` input ((S//_BS, B*_BS, 1) bf16 in-group beam-ancestry map,
    `engine/beam.py::_anc_flat` layout): cache K/V rows are selected by
    ancestry exactly as in the single-chip kernel — the selection acts on
    batch rows only, so it composes with the head-sliced Dl axis unchanged."""
    if K > 1:
        anc_ref, rest = rest[0], rest[1:]
    (xo_ref, kn_ref, vn_ref,
     xc_ref, qkv_ref, wbuf, pbuf, kbuf, vbuf, asnd, arcv,
     wsem, psem, ksem, vsem, rsnd, rrcv) = rest
    l = pl.program_id(0)
    Dh = Dl // Hl
    nq = 3                   # qkv blocks: one (D, 640) tile per component
    nf = Fl // _BN           # c_fc blocks in the (D, 640) pool
    nw = nq + nf
    npj = 1                  # attn proj: one (640, D) tile in the p pool
    np2 = Fl // _BN          # down-proj blocks in the (640, D) pool
    npp = npj + np2
    ns = S // _BS
    scale = 1.0 / math.sqrt(Dh)
    pos = pos_ref[0]
    my_tp = tpi_ref[0]
    peer = tpi_ref[2]

    def wslot(j):
        # odd blocks/layer: the double-buffer slot rotates with the layer
        return (l + j) % 2

    # ---- DMA helpers ------------------------------------------------------
    def w_src(li, j):
        if j < nq:
            return wqkv_ref.at[li, :, j, :]
        return wfc_ref.at[li, :, pl.ds((j - nq) * _BN, _BN)]

    def w_start(li, j, slot):
        pltpu.make_async_copy(w_src(li, j), wbuf.at[slot],
                              wsem.at[slot]).start()

    def w_next(j):
        slot = wslot(j)
        if j + 2 < nw:
            w_start(l, j + 2, slot)
        else:
            @pl.when(l + 1 < L)
            def _():
                w_start(l + 1, j + 2 - nw, slot)

    def p_src(li, j):
        if j < npj:
            return wproj_ref.at[li]
        return wp2_ref.at[li, pl.ds((j - npj) * _BN, _BN), :]

    def p_start(li, j, slot):
        pltpu.make_async_copy(p_src(li, j), pbuf.at[slot],
                              psem.at[slot]).start()

    def p_next(j):
        slot = wslot(j)
        if j + 2 < npp:
            p_start(l, j + 2, slot)
        else:
            @pl.when(l + 1 < L)
            def _():
                p_start(l + 1, j + 2 - npp, slot)

    def kv_used(i):
        return i * _BS <= pos

    def kv_start(li, i, slot):
        @pl.when(kv_used(i))
        def _():
            off = pl.multiple_of(i * _BS, 8)
            pltpu.make_async_copy(ck_ref.at[li, :, pl.ds(off, _BS), :],
                                  kbuf.at[slot], ksem.at[slot]).start()
            pltpu.make_async_copy(cv_ref.at[li, :, pl.ds(off, _BS), :],
                                  vbuf.at[slot], vsem.at[slot]).start()

    nlive = jnp.minimum((pos // _BS + 2) & ~1, ns)

    def kv_start_next(i, slot):
        roll = i + 2 >= nlive
        nxt_l = jnp.where(roll, l + 1, l)
        nxt_i = jnp.where(roll, i + 2 - nlive, i + 2)

        @pl.when(jnp.logical_and(nxt_l < L, kv_used(nxt_i)))
        def _():
            off = pl.multiple_of(nxt_i * _BS, 8)
            pltpu.make_async_copy(ck_ref.at[nxt_l, :, pl.ds(off, _BS), :],
                                  kbuf.at[slot], ksem.at[slot]).start()
            pltpu.make_async_copy(cv_ref.at[nxt_l, :, pl.ds(off, _BS), :],
                                  vbuf.at[slot], vsem.at[slot]).start()

    # ---- prime pipelines + cross-chip barrier (first grid step) -----------
    @pl.when(l == 0)
    def _():
        w_start(0, 0, 0)
        w_start(0, 1, 1)
        p_start(0, 0, 0)
        p_start(0, 1, 1)
        kv_start(0, 0, 0)
        kv_start(0, 1, 1)
        xc_ref[...] = x_ref[...]
        # both shards must be inside the kernel before the first remote
        # write lands in the peer's arcv scratch
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, inc=1, device_id=peer,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(barrier, 1)

    x = xc_ref[...]                                       # (B, D) bf16

    def layer_norm(xin, w, b):
        xf = xin.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        return (y * w + b).astype(xin.dtype)

    def consume_w(j, xin):
        slot = wslot(j)
        pltpu.make_async_copy(w_src(l, j), wbuf.at[slot],
                              wsem.at[slot]).wait()
        acc = jnp.dot(xin, wbuf[slot].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        w_next(j)
        return acc

    def all_reduce(partial, rslot):
        """Sum the (B, D) f32 row-parallel partial across the tp pair.
        Fixed lo+hi order keeps both chips' f32 sums bit-identical."""
        asnd[rslot] = partial
        rdma = pltpu.make_async_remote_copy(
            src_ref=asnd.at[rslot], dst_ref=arcv.at[rslot],
            send_sem=rsnd.at[rslot], recv_sem=rrcv.at[rslot],
            device_id=peer, device_id_type=pltpu.DeviceIdType.LOGICAL)
        rdma.start()
        rdma.wait()
        mine = asnd[rslot]
        theirs = arcv[rslot]
        is_lo = (my_tp == 0)
        lo = jnp.where(is_lo, mine, theirs)
        hi = jnp.where(is_lo, theirs, mine)
        return lo + hi

    # ---- qkv projection (local heads) --------------------------------------
    h1 = layer_norm(x, ln1w_ref[0, 0], ln1b_ref[0, 0])
    for j in range(nq):
        acc = consume_w(j, h1)
        acc = acc * sqkv_ref[0, 0, pl.ds(j * Dl, Dl)] \
            + bqkv_ref[0, 0, pl.ds(j * Dl, Dl)]
        qkv_ref[:, pl.ds(j * Dl, Dl)] = acc.astype(jnp.bfloat16)

    qkv = qkv_ref[...]                                    # (B, 3*Dl) bf16
    q = qkv[:, :Dl].astype(jnp.float32) * scale
    k_cur = qkv[:, Dl:2 * Dl]
    v_cur = qkv[:, 2 * Dl:]
    kn_ref[0] = k_cur
    vn_ref[0] = v_cur

    # ---- attention over the local head slice (same math as the single-chip
    # kernel: flattened elementwise + head-selector matmuls) -----------------
    neg = jnp.float32(-1e9)
    m0 = jnp.full((B, 128), neg, jnp.float32)
    l0 = jnp.zeros((B, 128), jnp.float32)
    o0 = jnp.zeros((B, Dl), jnp.float32)

    e1 = e1_ref[...]                                      # (Dl, 128) bf16
    e1t = e1t_ref[...]                                    # (128, Dl) f32

    qbf = q.astype(jnp.bfloat16)
    qexp = jnp.concatenate(
        [jnp.broadcast_to(qbf[b:b + 1, :], (_BS, Dl)) for b in range(B)], 0)
    starts = starts_ref[...]                              # (B, 1) int32
    sexp = jnp.concatenate(
        [jnp.broadcast_to(starts[b:b + 1, :], (_BS, 1)) for b in range(B)], 0)
    jrow = jax.lax.broadcasted_iota(jnp.int32, (B * _BS, 1), 0) % _BS

    def attn_block(i, carry):
        m_all, l_all, o_all, slot = carry
        kc = pltpu.make_async_copy(ck_ref.at[l, :, pl.ds(i * _BS, _BS), :],
                                   kbuf.at[slot], ksem.at[slot])
        vc = pltpu.make_async_copy(cv_ref.at[l, :, pl.ds(i * _BS, _BS), :],
                                   vbuf.at[slot], vsem.at[slot])

        @pl.when(kv_used(i))
        def _():
            kc.wait()
            vc.wait()

        if K == 1:
            kb2 = kbuf[slot].reshape(B * _BS, Dl)
            vb2 = vbuf[slot].reshape(B * _BS, Dl)
        else:
            # beam-ancestry K/V selection (single-chip kernel mechanism,
            # ops/pallas/decode_step.py): the cache is UNORDERED; anc[r, g]
            # names the in-group physical row whose entry at position g
            # belongs to slot r's hypothesis. where-chain over K statically
            # row-permuted views; bf16 compare is rejected by Mosaic, so
            # the map is read back in f32.
            kb3, vb3 = kbuf[slot], vbuf[slot]             # (B, _BS, Dl)

            def perm(buf, j):
                return jnp.concatenate(
                    [buf[(r // K) * K + j] for r in range(B)], 0)

            av = anc_ref[i].astype(jnp.float32)           # (B*_BS, 1)
            kb2 = perm(kb3, K - 1)
            vb2 = perm(vb3, K - 1)
            for j in range(K - 2, -1, -1):
                mj = av == jnp.float32(j)
                kb2 = jnp.where(mj, perm(kb3, j), kb2)
                vb2 = jnp.where(mj, perm(vb3, j), vb2)
        g = i * _BS + jrow
        valid = jnp.logical_and(g >= sexp, g < pos)
        valid = jnp.logical_and(valid, kv_used(i))
        kv_start_next(i, slot)

        prod = kb2 * qexp
        s128 = jnp.dot(prod, e1, preferred_element_type=jnp.float32)
        s128 = jnp.where(valid, s128, neg)
        s3 = s128.reshape(B, _BS, 128)
        mb = jnp.maximum(m_all, jnp.max(s3, axis=1))
        p3 = jnp.where(valid.reshape(B, _BS, 1),
                       jnp.exp(s3 - mb[:, None, :]), 0.0)
        corr = jnp.exp(m_all - mb)
        lb = l_all * corr + jnp.sum(p3, axis=1)
        pexp = jnp.dot(p3.reshape(B * _BS, 128).astype(jnp.bfloat16),
                       e1t.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        contrib = jnp.sum((pexp.astype(jnp.bfloat16) * vb2)
                          .astype(jnp.float32).reshape(B, _BS, Dl), axis=1)
        contrib = jnp.where(kv_used(i), contrib, 0.0)
        corr_lane = jnp.dot(corr, e1t, preferred_element_type=jnp.float32)
        o_new = o_all * corr_lane + contrib
        return mb, lb, o_new, 1 - slot

    m_all, l_all, o_all, _ = jax.lax.fori_loop(
        0, nlive, attn_block, (m0, l0, o0, 0))

    cur_valid = starts <= pos
    vcf = v_cur.astype(jnp.float32)
    s_c = jnp.dot((qbf * k_cur).astype(jnp.bfloat16), e1,
                  preferred_element_type=jnp.float32)
    s_c = jnp.where(cur_valid, s_c, neg)
    mb = jnp.maximum(m_all, s_c)
    p_c = jnp.where(cur_valid, jnp.exp(s_c - mb), 0.0)
    corr = jnp.exp(m_all - mb)
    l_f = l_all * corr + p_c
    corr_lane = jnp.dot(corr, e1t, preferred_element_type=jnp.float32)
    p_lane = jnp.dot(p_c, e1t, preferred_element_type=jnp.float32)
    o_f = o_all * corr_lane + p_lane.astype(jnp.bfloat16).astype(jnp.float32) \
        * vcf
    l_lane = jnp.dot(l_f, e1t, preferred_element_type=jnp.float32)
    att_b = (o_f / jnp.maximum(l_lane, 1e-30)).astype(jnp.bfloat16)

    # ---- attn out projection: row-parallel partial -> all-reduce -----------
    slot = wslot(0)
    pltpu.make_async_copy(p_src(l, 0), pbuf.at[slot], psem.at[slot]).wait()
    partial = jnp.dot(att_b, pbuf[slot].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    p_next(0)
    proj = all_reduce(partial, 0)
    proj = proj * sproj_ref[0, 0] + bproj_ref[0, 0]
    x = x + proj.astype(jnp.bfloat16)

    # ---- MLP: column-parallel up, row-parallel down -------------------------
    h2 = layer_norm(x, ln2w_ref[0, 0], ln2b_ref[0, 0])
    hs = []
    for j in range(nf):
        acc = consume_w(nq + j, h2)
        acc = acc * sfc_ref[0, 0, pl.ds(j * _BN, _BN)] \
            + bfc_ref[0, 0, pl.ds(j * _BN, _BN)]
        hf = acc.astype(jnp.bfloat16).astype(jnp.float32)
        hf = 0.5 * hf * (1.0 + jnp.tanh(
            0.7978845608028654 * (hf + 0.044715 * hf * hf * hf)))
        hs.append(hf.astype(jnp.bfloat16))

    acc2 = jnp.zeros((B, D), jnp.float32)
    for j in range(np2):
        slot = wslot(npj + j)
        pltpu.make_async_copy(p_src(l, npj + j), pbuf.at[slot],
                              psem.at[slot]).wait()
        acc2 = acc2 + jnp.dot(hs[j], pbuf[slot].astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
        p_next(npj + j)
    acc2 = all_reduce(acc2, 1)
    acc2 = acc2 * sp2_ref[0, 0] + bp2_ref[0, 0]
    x = x + acc2.astype(jnp.bfloat16)

    xc_ref[...] = x
    xo_ref[...] = x


def fused_decode_step_tp_shard(h: Dict, x: jnp.ndarray, dims: GPT2Dims,
                               pos: jnp.ndarray, kv_cache: Dict,
                               kv_valid: jnp.ndarray, tp_info: jnp.ndarray,
                               tp: int = 2, anc: jnp.ndarray = None,
                               group: int = 1,
                               interpret=False) -> Tuple[jnp.ndarray, Dict]:
    """Per-shard body (call INSIDE shard_map). `h` is the LOCAL shard of the
    gpt "h" stack in tp layout: c_attn q (L, D, 3, D/tp) / scale+bias
    (L, 3, D/tp); c_proj q (L, D/tp, D) with FULL scale/bias; c_fc q
    (L, D, 4D/tp) with local scale/bias; mlp c_proj q (L, 4D/tp, D) with
    full scale/bias. kv_cache k/v are (L, B, S, D/tp). tp_info is
    [my_tp_index, my_linear_device_id, peer_linear_device_id] int32.
    group > 1 enables beam-ancestry K/V selection: `anc` is the
    (S//64, B*64, 1) flat in-group ancestry map (`engine/beam.py::
    _anc_flat` with bs=64; B is the beam-flattened batch) — replicated
    across tp since it indexes batch rows, which both shards share.
    Returns (pre-ln_f hidden (B, D) — identical on both shards — and the
    updated local cache)."""
    L, D, H = dims.layers, dims.dim, dims.heads
    B = x.shape[0]
    Dl, Hl = D // tp, H // tp
    F = h["mlp"]["c_fc"]["q"].shape[-1] * tp
    Fl = F // tp
    S = kv_cache["k"].shape[2]
    assert tp == 2, "fused tp decode supports tp=2 (doc: decode_step_tp)"
    assert Dl % _BN == 0 and Fl % _BN == 0, (Dl, Fl)
    assert S % (2 * _BS) == 0 and S // _BS >= 2, S
    assert "q" in h["attn"]["c_attn"], "tp decode kernel requires int8"
    assert h["attn"]["c_attn"]["q"].shape == (L, D, 3, Dl)

    ck, cv = kv_cache["k"], kv_cache["v"]
    starts = (pos + 1
              - jnp.sum(kv_valid.astype(jnp.int32), axis=1, keepdims=True))
    starts = starts.astype(jnp.int32)

    def vrow(a):
        return pl.BlockSpec((1, 1, a.shape[-1]), lambda l, *_: (l, 0, 0),
                            memory_space=pltpu.VMEM)

    def row3(a, n):
        return a.astype(jnp.float32).reshape(L, 1, n)

    ln1w = row3(h["ln_1"]["weight"], D)
    ln1b = row3(h["ln_1"]["bias"], D)
    ln2w = row3(h["ln_2"]["weight"], D)
    ln2b = row3(h["ln_2"]["bias"], D)
    sqkv = row3(h["attn"]["c_attn"]["scale"], 3 * Dl)
    bqkv = row3(h["attn"]["c_attn"]["bias"], 3 * Dl)
    sproj = row3(h["attn"]["c_proj"]["scale"], D)
    bproj = row3(h["attn"]["c_proj"]["bias"], D)
    sfc = row3(h["mlp"]["c_fc"]["scale"], Fl)
    bfc = row3(h["mlp"]["c_fc"]["bias"], Fl)
    sp2 = row3(h["mlp"]["c_proj"]["scale"], D)
    bp2 = row3(h["mlp"]["c_proj"]["bias"], D)

    head_of = jnp.arange(Dl) // (Dl // Hl)
    e1 = (head_of[:, None] == jnp.arange(128)[None, :])
    e1b = e1.astype(jnp.bfloat16)
    e1t = e1.T.astype(jnp.float32)

    if group > 1:
        assert anc is not None and anc.shape == (S // _BS, B * _BS, 1), (
            anc if anc is None else anc.shape, (S // _BS, B * _BS, 1))
        assert B % group == 0, (B, group)
    kernel = functools.partial(_kernel_tp, L=L, B=B, D=D, Dl=Dl, Fl=Fl,
                               Hl=Hl, S=S, K=group)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    full = lambda shape: pl.BlockSpec(shape, lambda l, *_: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    anc_specs = [full((S // _BS, B * _BS, 1))] if group > 1 else []
    anc_args = [anc.astype(jnp.bfloat16)] if group > 1 else []
    x_out, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(L,),
            in_specs=[
                full((B, D)),
                vrow(ln1w), vrow(ln1b), vrow(ln2w), vrow(ln2b),
                vrow(sqkv), vrow(bqkv), vrow(sproj), vrow(bproj),
                vrow(sfc), vrow(bfc), vrow(sp2), vrow(bp2),
                full((B, 1)),
                full((Dl, 128)),
                full((128, Dl)),
                any_spec, any_spec, any_spec, any_spec,
                any_spec, any_spec,
            ] + anc_specs,
            out_specs=[
                full((B, D)),
                pl.BlockSpec((1, B, Dl), lambda l, *_: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, Dl), lambda l, *_: (l, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((B, D), jnp.bfloat16),       # x carry
                pltpu.VMEM((B, 3 * Dl), jnp.bfloat16),  # qkv
                pltpu.VMEM((2, D, _BN), jnp.int8),      # (D, 640) pool
                pltpu.VMEM((2, _BN, D), jnp.int8),      # (640, D) pool
                pltpu.VMEM((2, B, _BS, Dl), jnp.bfloat16),
                pltpu.VMEM((2, B, _BS, Dl), jnp.bfloat16),
                pltpu.VMEM((2, B, D), jnp.float32),     # all-reduce send
                pltpu.VMEM((2, B, D), jnp.float32),     # all-reduce recv
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),          # rdma send
                pltpu.SemaphoreType.DMA((2,)),          # rdma recv
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, Dl), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, Dl), jnp.bfloat16),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(collective_id=1),
    )(jnp.reshape(pos, (1,)).astype(jnp.int32),
      tp_info.astype(jnp.int32), x.astype(jnp.bfloat16),
      ln1w, ln1b, ln2w, ln2b, sqkv, bqkv, sproj, bproj, sfc, bfc, sp2, bp2,
      starts, e1b, e1t,
      h["attn"]["c_attn"]["q"], h["attn"]["c_proj"]["q"],
      h["mlp"]["c_fc"]["q"], h["mlp"]["c_proj"]["q"], ck, cv, *anc_args)

    new_cache = dict(kv_cache)
    new_cache["k"] = jax.lax.dynamic_update_slice(
        kv_cache["k"], k_new[:, :, None, :].astype(kv_cache["k"].dtype),
        (0, 0, pos, 0))
    new_cache["v"] = jax.lax.dynamic_update_slice(
        kv_cache["v"], v_new[:, :, None, :].astype(kv_cache["v"].dtype),
        (0, 0, pos, 0))
    return x_out, new_cache


# ---------------------------------------------------------------------------
# layout + shard_map glue
# ---------------------------------------------------------------------------

def gpt_tp_layout(gpt: Dict) -> Dict:
    """Canonical int8 GPT tree -> the tp-kernel storage layout: the packed
    qkv leaves split per component, q (L, D, 3D) -> (L, D, 3, D) and
    scale/bias (L, 3D) -> (L, 3, D) (pure reshapes — the byte stream is
    unchanged). A contiguous last-axis tp shard of this layout is exactly
    (q_t | k_t | v_t), head-aligned; the XLA paths consume it through
    `nn.dense`'s trailing-dim flatten."""
    gpt = dict(gpt)
    h = dict(gpt["h"])
    attn = dict(h["attn"])
    ca = dict(attn["c_attn"])
    L, D, TD = ca["q"].shape
    assert TD == 3 * D, (L, D, TD)
    ca["q"] = ca["q"].reshape(L, D, 3, D)
    ca["scale"] = ca["scale"].reshape(L, 3, D)
    ca["bias"] = ca["bias"].reshape(L, 3, D)
    attn["c_attn"] = ca
    h["attn"] = attn
    gpt["h"] = h
    return gpt


def h_partition_specs(h: Dict):
    """PartitionSpec tree for the tp-layout "h" stack (shard_map in_specs)."""
    from jax.sharding import PartitionSpec as P

    def spec(path, leaf):
        name = ".".join(str(getattr(k, "key", k)) for k in path)
        nd = leaf.ndim

        def last():  # shard the trailing (output/feature) axis
            return P(*([None] * (nd - 1)), "tp")

        if "c_attn" in name or "c_fc" in name:
            return last()  # column-parallel: weights, scales, biases alike
        if "c_proj" in name and name.endswith("q"):
            return P(None, "tp", None)  # row-parallel contraction axis
        return P()  # proj scale/bias (full out-dim) + layer norms

    return jax.tree_util.tree_map_with_path(spec, h)


def tp_decode_step(mesh, gpt: Dict, x: jnp.ndarray, dims: GPT2Dims,
                   pos: jnp.ndarray, kv_cache: Dict, kv_valid: jnp.ndarray,
                   anc: jnp.ndarray = None, group: int = 1,
                   interpret=False) -> Tuple[jnp.ndarray, Dict]:
    """shard_map entry: full (replicated-batch-view) args in, tp=2 fused
    kernel per shard, replicated hidden out. The decode batch shards over
    the mesh's dp axis; the cache and all Megatron weight shards over tp.
    group > 1 / anc: beam-ancestry selection (engine/beam.py) — the flat
    anc map shards over dp with the batch rows and replicates over tp."""
    from jax.sharding import PartitionSpec as P

    axes = mesh.axis_names
    assert axes[-1] == "tp", axes  # peer linear id below assumes tp minor
    tp = mesh.shape["tp"]
    assert tp == 2, "tp decode kernel supports tp=2"
    h = gpt["h"]
    sizes = [mesh.shape[a] for a in axes]

    def body(h_loc, x_loc, pos_v, kvv_loc, k_loc, v_loc, *anc_loc):
        my = jax.lax.axis_index("tp")
        lin = jnp.int32(0)
        for a, n in zip(axes, sizes):
            lin = lin * n + jax.lax.axis_index(a)
        peer_lin = lin + jnp.where(my == 0, 1, -1)
        tp_info = jnp.stack([my, lin, peer_lin]).astype(jnp.int32)
        hid, ncache = fused_decode_step_tp_shard(
            h_loc, x_loc, dims, pos_v, {"k": k_loc, "v": v_loc}, kvv_loc,
            tp_info, tp=tp, anc=anc_loc[0] if anc_loc else None,
            group=group, interpret=interpret)
        return hid, ncache["k"], ncache["v"]

    bax = "dp" if "dp" in axes else None
    cache_spec = P(None, bax, None, "tp")
    anc_in = ()
    anc_spec = ()
    if group > 1:
        assert anc is not None
        anc_in = (anc,)
        anc_spec = (P(None, bax, None),)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(h_partition_specs(h), P(bax, None), P(),
                  P(bax, None), cache_spec, cache_spec) + anc_spec,
        out_specs=(P(bax, None), cache_spec, cache_spec),
        check_vma=False)
    hid, k_new, v_new = fn(h, x, pos, kv_valid, kv_cache["k"],
                           kv_cache["v"], *anc_in)
    out_cache = dict(kv_cache)
    out_cache["k"] = k_new
    out_cache["v"] = v_new
    return hid, out_cache
