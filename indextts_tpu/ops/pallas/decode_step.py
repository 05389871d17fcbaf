"""Fused multi-layer GPT decode step — manual-DMA Pallas TPU kernel.

The AR decode loop is HBM-bound: every token reads all 24 layers' int8
weights (~483 MB) plus the KV cache (~250-500 MB at serving batch/span).
XLA's `lax.scan` decode (`models/gpt/gpt2.py::gpt2_decode_step`) sustains
~2.05 ms/token at (B=4, span 512) — ~2.2x off the HBM roofline — because
each layer boundary re-materializes activations, the dequant/matmul/update
chain fragments into separate fusions, and the cache dynamic-update round
trips through HBM.

This kernel runs the ENTIRE stacked-layer step as ONE Pallas program
(grid = layers, activations resident in VMEM):

- weight streaming: the four dense kernels are cut into (1280, 640) /
  (640, 1280) int8 blocks and double-buffered HBM->VMEM with explicit
  `make_async_copy`, prefetching across layer boundaries so HBM never goes
  idle (the cross-layer overlap a per-matmul `pallas_call` cannot express —
  measured 1.57 ms per-matmul vs 1.23 XLA in round 1; see
  `ops/pallas/int8_matmul.py`).
- attention: online-softmax (flash) over the layer's KV cache streamed in
  (B, 64, D) blocks with the same double buffering; blocks entirely past
  `pos` are skipped (DMA never issued). The current token's k/v fold in as
  a final virtual block, and are emitted as (L, B, D) outputs for the
  caller's O(1) cache update (writing 1 dynamic row from inside the kernel
  would hit Mosaic's 8-aligned sublane DMA restriction).
- numerics: matches the XLA path's rounding chain — int8 weights cast to
  bf16 into the MXU (f32 accumulate), per-channel scale + bias in f32,
  activations rounded to bf16 at every dense boundary, LayerNorm/softmax in
  f32 (`nn.dense` / `nn.layer_norm` / `nn.mha` semantics).

Reference analogue: the accel engine's CUDA-graph decode + paged flash-attn
(`/root/reference/indextts/accel/accel_engine.py:221-376`,
`accel/attention.py:107-154`) — here the graph capture is the single fused
kernel and the page table is a dense span bucket.

Constraints: D=1280-class dims (D, 3D, 4D multiples of 640), B <= 24 (pad
rows; kv_valid all-False marks dead rows; B <= 12 streams 64-slot kv blocks,
13-24 use 32-slot blocks to halve the VMEM high-water mark), span S a
multiple of 128, bf16 cache — or the flat int8 cache ("kvs" key): int8 k/v
rows plus ONE packed bf16 scale row per position (k-scales lanes [0, H),
v-scales [128, 128+H)) whose layout matches the kernel's per-head
(B*BS, 128) score/prob tensors, so dequant folds into two existing
elementwise multiplies (s128 *= ks; p3 *= vs before the PV expansion) with
zero extra matmuls and 1.67x less cache DMA. The current token attends
UNquantized (the XLA int8kv path round-trips it). Beam ancestry composes:
values are cast int8->bf16 (exact) before the where-chain selection and
the packed scale rows ride the same selection. Verified against
`gpt2_decode_step` in tests/test_decode_kernel.py (interpret mode on CPU +
device parity).
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


# weight N/K block width: divides 1280/3840/5120; (1280, 640) int8 = 819 KB
# keeps the double-buffered pools (2 pools x 2 slots) under 3.3 MB of VMEM.
_BN = 640
# KV stream block: (8, 64, 1280) bf16 = 1.3 MB per slot; the attention math
# works on the flattened (B*_BS, D) block — bigger blocks amortize the
# per-block selector matmuls and loop overhead (the f32 temporaries are the
# VMEM high-water mark; 64 fits, 128 does not)
_BS = 64


def _nwb(D: int, F: int) -> Tuple[int, int, int]:
    """(#qkv blocks, #proj blocks, #fc blocks) in the (D, _BN) pool."""
    return 3 * D // _BN, D // _BN, F // _BN


def _kernel(pos_ref, x_ref, ln1w_ref, ln1b_ref, ln2w_ref, ln2b_ref,
            sqkv_ref, bqkv_ref, sproj_ref, bproj_ref, sfc_ref, bfc_ref,
            sp2_ref, bp2_ref, starts_ref, e1_ref, e1t_ref,
            wqkv_ref, wproj_ref, wfc_ref, wp2_ref, ck_ref, cv_ref,
            *rest, L: int, B: int, D: int, F: int, H: int, S: int,
            K: int = 1, BS: int = _BS, KVQ: bool = False,
            W4: bool = False, W4F: str = "shift"):
    # rest = [ckvs_ref (KVQ only)], [anc_ref (K>1 only)], outputs x3,
    # scratch x6 (+sbuf), sems x4 (+ssem)
    if KVQ:
        ckvs_ref = rest[0]
        rest = rest[1:]
    if K > 1:
        anc_ref = rest[0]
        rest = rest[1:]
    (xo_ref, kn_ref, vn_ref, xc_ref, qkv_ref, wbuf, pbuf, kbuf, vbuf,
     wsem, psem, ksem, vsem) = rest[:13]
    if KVQ:
        sbuf, ssem = rest[13], rest[14]
    l = pl.program_id(0)
    Dh = D // H
    nq, npj, nf = _nwb(D, F)
    nw = nq + npj + nf          # (D, _BN) pool blocks per layer
    np2 = F // _BN              # (_BN, D) pool blocks per layer
    ns = S // BS               # kv blocks per layer
    scale = 1.0 / math.sqrt(Dh)
    pos = pos_ref[0]

    # ---- DMA helpers ------------------------------------------------------
    def w_src(li, j):
        """(1280, _BN)-pool block j of layer li (static j)."""
        if j < nq:
            return wqkv_ref.at[li, :, pl.ds(j * _BN, _BN)]
        if j < nq + npj:
            return wproj_ref.at[li, :, pl.ds((j - nq) * _BN, _BN)]
        return wfc_ref.at[li, :, pl.ds((j - nq - npj) * _BN, _BN)]

    def w_start(li, j, slot):
        pltpu.make_async_copy(w_src(li, j), wbuf.at[slot],
                              wsem.at[slot]).start()

    def w_next(j):
        """After consuming pool block j of layer l, refill its slot with
        block j+2 (crossing into layer l+1 for the last two)."""
        slot = j % 2
        if j + 2 < nw:
            w_start(l, j + 2, slot)
        else:
            @pl.when(l + 1 < L)
            def _():
                w_start(l + 1, j + 2 - nw, slot)

    def unpack4(p):
        """Nibble-unpack a packed int4 weight block (R, N) -> (2R, N) bf16.

        Packing (`nn.quantize_dense_int4`): original rows in groups of 2h
        (h = 320 when R % 320 == 0, else R); within a group, lo nibbles are
        its first h rows, hi nibbles its last h. All slices are static and
        320-row (8-aligned sublane) so the concat lowers. Two formulations
        (probed on device, see tools/probe_mosaic_int4.py): int8 arithmetic
        shifts, or f32 floor-divide for targets that reject int8 shifts."""
        R = p.shape[0]
        h = 320 if R % 320 == 0 else R
        parts = []
        for s0 in range(0, R, h):
            blk = p[s0:s0 + h]
            if W4F == "f32":
                pf = blk.astype(jnp.float32)
                hi = jnp.floor(pf * 0.0625)
                lo = pf - 16.0 * hi
                lo = lo - 16.0 * (lo >= 8.0).astype(jnp.float32)
                parts += [lo.astype(jnp.bfloat16), hi.astype(jnp.bfloat16)]
            else:
                hi = jax.lax.shift_right_arithmetic(blk, jnp.int8(4))
                lo = jax.lax.shift_right_arithmetic(
                    jax.lax.shift_left(blk, jnp.int8(4)), jnp.int8(4))
                parts += [lo.astype(jnp.bfloat16), hi.astype(jnp.bfloat16)]
        return jnp.concatenate(parts, 0) if len(parts) > 1 else parts[0]

    # p2 pool rows per DMA block (packed int4 streams half the rows)
    p2r = _BN // 2 if W4 else _BN

    def p_start(li, j, slot):
        pltpu.make_async_copy(wp2_ref.at[li, pl.ds(j * p2r, p2r), :],
                              pbuf.at[slot], psem.at[slot]).start()

    def p_next(j):
        slot = j % 2
        if j + 2 < np2:
            p_start(l, j + 2, slot)
        else:
            @pl.when(l + 1 < L)
            def _():
                p_start(l + 1, j + 2 - np2, slot)

    def kv_used(i):
        # block i holds slots [i*BS, (i+1)*BS); slots <= pos are live
        return i * BS <= pos

    def kv_start(li, i, slot):
        @pl.when(kv_used(i))
        def _():
            pltpu.make_async_copy(ck_ref.at[li, :, pl.ds(pl.multiple_of(i * BS, 8), BS), :],
                                  kbuf.at[slot], ksem.at[slot]).start()
            pltpu.make_async_copy(cv_ref.at[li, :, pl.ds(pl.multiple_of(i * BS, 8), BS), :],
                                  vbuf.at[slot], vsem.at[slot]).start()
            if KVQ:
                pltpu.make_async_copy(
                    ckvs_ref.at[li, :, pl.ds(pl.multiple_of(i * BS, 8), BS), :],
                    sbuf.at[slot], ssem.at[slot]).start()

    # attention only iterates the LIVE blocks (slots <= pos), rounded up to
    # an even count so the two DMA slots keep their parity across layers
    nlive = jnp.minimum((pos // BS + 2) & ~1, ns)

    def kv_start_next(i, slot):
        """From attention block i of layer l, refill `slot` with block i+2 —
        rolling into layer l+1's blocks 0/1 past the live end (nlive is
        even, so the slot parity lines up with the next layer's loop
        start). i is dynamic (fori_loop); dead blocks are never DMA'd."""
        roll = i + 2 >= nlive
        nxt_l = jnp.where(roll, l + 1, l)
        nxt_i = jnp.where(roll, i + 2 - nlive, i + 2)

        @pl.when(jnp.logical_and(nxt_l < L, kv_used(nxt_i)))
        def _():
            off = pl.multiple_of(nxt_i * BS, 8)
            pltpu.make_async_copy(
                ck_ref.at[nxt_l, :, pl.ds(off, BS), :],
                kbuf.at[slot], ksem.at[slot]).start()
            pltpu.make_async_copy(
                cv_ref.at[nxt_l, :, pl.ds(off, BS), :],
                vbuf.at[slot], vsem.at[slot]).start()
            if KVQ:
                pltpu.make_async_copy(
                    ckvs_ref.at[nxt_l, :, pl.ds(off, BS), :],
                    sbuf.at[slot], ssem.at[slot]).start()

    # ---- prime the pipelines (first grid step only) -----------------------
    @pl.when(l == 0)
    def _():
        w_start(0, 0, 0)
        w_start(0, 1, 1)
        p_start(0, 0, 0)
        p_start(0, 1, 1)
        kv_start(0, 0, 0)
        kv_start(0, 1, 1)
        xc_ref[...] = x_ref[...]

    x = xc_ref[...]                                       # (B, D) bf16

    def layer_norm(xin, w, b):
        xf = xin.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        return (y * w + b).astype(xin.dtype)

    def consume_w(j, xin):
        """wait pool block j, return xin @ wblk (f32, no scale/bias)."""
        slot = j % 2
        pltpu.make_async_copy(w_src(l, j), wbuf.at[slot],
                              wsem.at[slot]).wait()
        wv = unpack4(wbuf[slot]) if W4 else wbuf[slot].astype(jnp.bfloat16)
        acc = jnp.dot(xin, wv, preferred_element_type=jnp.float32)
        w_next(j)
        return acc

    # ---- qkv projection ---------------------------------------------------
    h1 = layer_norm(x, ln1w_ref[0, 0], ln1b_ref[0, 0])
    for j in range(nq):
        acc = consume_w(j, h1)
        acc = acc * sqkv_ref[0, 0, pl.ds(j * _BN, _BN)] \
            + bqkv_ref[0, 0, pl.ds(j * _BN, _BN)]
        qkv_ref[:, pl.ds(j * _BN, _BN)] = acc.astype(jnp.bfloat16)

    qkv = qkv_ref[...]                                    # (B, 3D) bf16
    q = qkv[:, :D].astype(jnp.float32) * scale
    k_cur = qkv[:, D:2 * D]
    v_cur = qkv[:, 2 * D:]
    kn_ref[0] = k_cur
    vn_ref[0] = v_cur

    # ---- attention: online softmax over kv blocks + current token ---------
    # Formulation chosen for what Mosaic actually lowers (probed on device):
    # leading-dim reshapes, 2D matmuls, and elementwise — NO batched
    # dot_general, NO lane-segment reductions. Scores for all (b, h) at once:
    #     prod = k_block_flat * q_expanded          (B*BS, D) elementwise
    #     s    = prod @ E1                          (B*BS, 128) MXU
    # where E1[d, h] = [d // Dh == h] sums each head's 64 lanes; E1's
    # transpose re-expands per-head scalars (probs, softmax corrections)
    # back to the lane layout. Running (m, l) live as (B, 128) with one
    # column per head (junk columns h >= H never reach the output because
    # E1T's corresponding rows are zero).
    neg = jnp.float32(-1e9)
    m0 = jnp.full((B, 128), neg, jnp.float32)
    l0 = jnp.zeros((B, 128), jnp.float32)
    o0 = jnp.zeros((B, D), jnp.float32)

    e1 = e1_ref[...]                                      # (D, 128) bf16
    e1t = e1t_ref[...]                                    # (128, D) f32

    # loop-invariant per-layer expansions: q rows / starts per flat row
    qbf = q.astype(jnp.bfloat16)
    qexp = jnp.concatenate(
        [jnp.broadcast_to(qbf[b:b + 1, :], (BS, D)) for b in range(B)], 0)
    starts = starts_ref[...]                              # (B, 1) int32
    sexp = jnp.concatenate(
        [jnp.broadcast_to(starts[b:b + 1, :], (BS, 1)) for b in range(B)], 0)
    jrow = jax.lax.broadcasted_iota(jnp.int32, (B * BS, 1), 0) % BS

    def attn_block(i, carry):
        m_all, l_all, o_all, slot = carry
        kc = pltpu.make_async_copy(
            ck_ref.at[l, :, pl.ds(i * BS, BS), :], kbuf.at[slot],
            ksem.at[slot])
        vc = pltpu.make_async_copy(
            cv_ref.at[l, :, pl.ds(i * BS, BS), :], vbuf.at[slot],
            vsem.at[slot])

        @pl.when(kv_used(i))
        def _():
            kc.wait()
            vc.wait()
            if KVQ:
                pltpu.make_async_copy(
                    ckvs_ref.at[l, :, pl.ds(i * BS, BS), :], sbuf.at[slot],
                    ssem.at[slot]).wait()

        sb2 = None
        if K == 1:
            kb2 = kbuf[slot].reshape(B * BS, D)          # bf16 (int8 if KVQ)
            vb2 = vbuf[slot].reshape(B * BS, D)
            if KVQ:
                # int8 -> bf16 is exact; the per-(position, head) scales
                # fold into the score/prob tensors below instead of
                # expanding to lanes (which would cost a matmul per block)
                kb2 = kb2.astype(jnp.bfloat16)
                vb2 = vb2.astype(jnp.bfloat16)
                sb2 = sbuf[slot].reshape(B * BS, 256)
        else:
            # Beam-ancestry K/V selection: the cache is UNORDERED (physical
            # row r always holds what beam slot r computed), and
            # anc[r, g] in [0, K) names the in-group physical row whose
            # entry at position g belongs to slot r's hypothesis. Selecting
            # the raw bf16 values BEFORE any arithmetic keeps the math
            # bit-identical to a physically gathered cache, at zero HBM
            # gather cost (the per-step reorder the HF path pays in
            # `transformers_generation_utils.py:3325` via index_select).
            kb3, vb3 = kbuf[slot], vbuf[slot]             # (B, BS, D)
            if KVQ:
                # cast first (exact), select after; the packed scale rows
                # ride the SAME ancestry selection so the folded dequant
                # below sees each hypothesis's own scales
                kb3 = kb3.astype(jnp.bfloat16)
                vb3 = vb3.astype(jnp.bfloat16)
                sb3 = sbuf[slot]                           # (B, BS, 256)

            def perm(buf, j):
                """Rows remapped to in-group offset j, flat (B*BS, D)."""
                return jnp.concatenate(
                    [buf[(r // K) * K + j] for r in range(B)], 0)

            # anc is fully VMEM-resident ((ns, B*BS, 1)); a dynamic
            # leading-dim read lowers (same mechanism as kbuf[slot]) where a
            # per-block DMA from the compiler-placed input did not. The
            # compare runs in f32 — Mosaic rejects bf16 equality on this
            # target ("Target does not support this comparison").
            av = anc_ref[i].astype(jnp.float32)           # (B*BS, 1)
            kb2 = perm(kb3, K - 1)
            vb2 = perm(vb3, K - 1)
            if KVQ:
                sb2 = perm(sb3, K - 1)
            for j in range(K - 2, -1, -1):
                mj = av == jnp.float32(j)
                kb2 = jnp.where(mj, perm(kb3, j), kb2)
                vb2 = jnp.where(mj, perm(vb3, j), vb2)
                if KVQ:
                    sb2 = jnp.where(mj, perm(sb3, j), sb2)
        # validity is the contiguous range [start_b, pos): decode masks are
        # always left-pad + generated-so-far. Slot `pos` itself enters via
        # the explicit current-token term below.
        g = i * BS + jrow                                # (B*BS, 1)
        valid = jnp.logical_and(g >= sexp, g < pos)
        valid = jnp.logical_and(valid, kv_used(i))
        kv_start_next(i, slot)

        prod = kb2 * qexp                                 # bf16
        s128 = jnp.dot(prod, e1, preferred_element_type=jnp.float32)
        if KVQ:
            # true score = ks[row, h] * (q . kq): the packed k-scales'
            # (B*BS, 128) column layout matches s128's head columns
            s128 = s128 * sb2[:, :128].astype(jnp.float32)
        s128 = jnp.where(valid, s128, neg)                # (B*BS, 128)
        s3 = s128.reshape(B, BS, 128)
        mb = jnp.maximum(m_all, jnp.max(s3, axis=1))      # (B, 128)
        # explicit zero for masked slots: with an all-masked running max
        # (-1e9), exp(s - mb) would be exp(0) = 1, not 0
        p3 = jnp.where(valid.reshape(B, BS, 1),
                       jnp.exp(s3 - mb[:, None, :]), 0.0)
        corr = jnp.exp(m_all - mb)                        # (B, 128)
        lb = l_all * corr + jnp.sum(p3, axis=1)
        if KVQ:
            # fold v-scales into the probs headed for the PV product (the
            # softmax denominator above keeps the UNSCALED mass)
            p3 = p3 * sb2[:, 128:].astype(jnp.float32).reshape(B, BS, 128)
        pexp = jnp.dot(p3.reshape(B * BS, 128).astype(jnp.bfloat16),
                       e1t.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        contrib = jnp.sum((pexp.astype(jnp.bfloat16) * vb2)
                          .astype(jnp.float32).reshape(B, BS, D), axis=1)
        # a skipped block's buffer is uninitialized (possibly NaN); p == 0
        # does not save the products (0 * NaN = NaN), so gate the result
        contrib = jnp.where(kv_used(i), contrib, 0.0)
        corr_lane = jnp.dot(corr, e1t,
                            preferred_element_type=jnp.float32)  # (B, D)
        o_new = o_all * corr_lane + contrib
        return mb, lb, o_new, 1 - slot

    m_all, l_all, o_all, _ = jax.lax.fori_loop(
        0, nlive, attn_block, (m0, l0, o0, 0))

    # current token as a final 1-wide block; live rows have start <= pos
    cur_valid = starts <= pos                              # (B, 1)
    kcf = k_cur.astype(jnp.float32)
    vcf = v_cur.astype(jnp.float32)
    s_c = jnp.dot((qbf * k_cur).astype(jnp.bfloat16), e1,
                  preferred_element_type=jnp.float32)      # (B, 128)
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

    # ---- attn out projection + residual -----------------------------------
    proj = None
    for j in range(npj):
        acc = consume_w(nq + j, att_b)
        acc = acc * sproj_ref[0, 0, pl.ds(j * _BN, _BN)] \
            + bproj_ref[0, 0, pl.ds(j * _BN, _BN)]
        part = acc.astype(jnp.bfloat16)
        proj = part if proj is None else jnp.concatenate([proj, part], -1)
    x = x + proj

    # ---- MLP ---------------------------------------------------------------
    h2 = layer_norm(x, ln2w_ref[0, 0], ln2b_ref[0, 0])
    hs = []
    for j in range(nf):
        acc = consume_w(nq + npj + j, h2)
        acc = acc * sfc_ref[0, 0, pl.ds(j * _BN, _BN)] \
            + bfc_ref[0, 0, pl.ds(j * _BN, _BN)]
        hf = acc.astype(jnp.bfloat16).astype(jnp.float32)
        hf = 0.5 * hf * (1.0 + jnp.tanh(
            0.7978845608028654 * (hf + 0.044715 * hf * hf * hf)))
        hs.append(hf.astype(jnp.bfloat16))

    acc2 = jnp.zeros((B, D), jnp.float32)
    for j in range(np2):
        slot = j % 2
        pltpu.make_async_copy(wp2_ref.at[l, pl.ds(j * p2r, p2r), :],
                              pbuf.at[slot], psem.at[slot]).wait()
        wv = unpack4(pbuf[slot]) if W4 else pbuf[slot].astype(jnp.bfloat16)
        acc2 = acc2 + jnp.dot(hs[j], wv, preferred_element_type=jnp.float32)
        p_next(j)
    acc2 = acc2 * sp2_ref[0, 0] + bp2_ref[0, 0]
    x = x + acc2.astype(jnp.bfloat16)

    xc_ref[...] = x
    xo_ref[...] = x


@functools.partial(jax.jit,
                   static_argnames=("dims", "interpret", "group", "w4f"))
def fused_decode_step(params: Dict, x: jnp.ndarray, dims: GPT2Dims,
                      pos: jnp.ndarray, kv_cache: Dict,
                      kv_valid: jnp.ndarray,
                      interpret: bool = False,
                      anc: jnp.ndarray = None,
                      group: int = 1,
                      w4f: str = None) -> Tuple[jnp.ndarray, Dict]:
    """Drop-in for `gpt2_decode_step` on int8-quantized params + bf16 cache.

    x: (B, D) current-token embeddings; pos: scalar write index; kv_cache:
    {"k","v"} (L, B, S, D) bf16 — the FLAT layout (`init_kv_cache(flat=
    True)`): a 5D (L, B, S, H, Dh) cache would need a reshape here, and on
    TPU that repacks the tile-padded (H, Dh) minor dims — the whole cache,
    every step. kv_valid: (B, S) bool. Returns (hidden after ln_f, updated
    cache).

    Beam mode (group=K > 1): B is the flattened rows*K beam batch, the cache
    is UNORDERED (row r holds what slot r computed each step), and
    anc (S//bs, B*bs, 1) bf16 (bs = the kernel's kv stream block: 64 up to
    B=12, 32 for 13..24) holds the in-group ancestry index of each
    (row, position) in the kernel's flat block layout
    (`engine/beam.py::_anc_flat`). The kernel selects K/V values by ancestry
    instead of the engine gathering the whole cache per step. At B in 13..24
    the lane-padded anc map pushes past the default ~16 MB Mosaic scope, so
    the call raises vmem_limit_bytes (the 8-segment x K=3 serving shape then
    decodes as ONE kernel-path call instead of two weight-restreaming
    chunks).
    """
    from indextts_tpu import nn

    import os

    L, D, H = dims.layers, dims.dim, dims.heads
    B = x.shape[0]
    h = params["h"]
    w4 = "q4" in h["attn"]["c_attn"]
    wkey = "q4" if w4 else "q"
    F = h["mlp"]["c_fc"][wkey].shape[-1]
    S = kv_cache["k"].shape[2]
    # KV stream block: 64 slots up to B=12; 32 above (halves the kv-slot and
    # f32-temporary VMEM high-water mark so B<=24 fits the 16 MB scope —
    # VERDICT r2 item 5; beam mode keeps 64, its B*K gate is <= 12)
    bs = _BS if B <= 12 else _BS // 2
    assert D % _BN == 0 and (3 * D) % _BN == 0 and F % _BN == 0, (D, F)
    assert S % (2 * bs) == 0 and S // bs >= 2, S  # even #blocks: slot
    # parity must line up across layers for the cross-layer kv prefetch
    assert wkey in h["attn"]["c_attn"], \
        "fused_decode_step requires int8/int4 params"
    assert "ks" not in kv_cache, "fused_decode_step needs a FLAT cache (5D \
int8 caches belong to the XLA path; flat int8 uses the 'kvs' key)"
    assert kv_cache["k"].ndim == 4, "fused_decode_step requires a flat cache"
    kvq = "kvs" in kv_cache

    ck = kv_cache["k"]
    cv = kv_cache["v"]
    # decode validity is contiguous [start, pos]: recover the start from the
    # mask's popcount (dead rows -> start = pos + 1, nothing attendable)
    starts = (pos + 1
              - jnp.sum(kv_valid.astype(jnp.int32), axis=1, keepdims=True))
    starts = starts.astype(jnp.int32)

    def vrow(a):  # (L, 1, N) f32 rows, one VMEM block per layer (the (1, N)
        # trailing block dims equal the array dims, which Mosaic requires)
        return pl.BlockSpec((1, 1, a.shape[-1]), lambda l, *_: (l, 0, 0),
                            memory_space=pltpu.VMEM)

    def row3(a, n):
        return a.astype(jnp.float32).reshape(L, 1, n)

    ln1w = row3(h["ln_1"]["weight"], D)
    ln1b = row3(h["ln_1"]["bias"], D)
    ln2w = row3(h["ln_2"]["weight"], D)
    ln2b = row3(h["ln_2"]["bias"], D)
    sqkv = row3(h["attn"]["c_attn"]["scale"], 3 * D)
    bqkv = row3(h["attn"]["c_attn"]["bias"], 3 * D)
    sproj = row3(h["attn"]["c_proj"]["scale"], D)
    bproj = row3(h["attn"]["c_proj"]["bias"], D)
    sfc = row3(h["mlp"]["c_fc"]["scale"], F)
    bfc = row3(h["mlp"]["c_fc"]["bias"], F)
    sp2 = row3(h["mlp"]["c_proj"]["scale"], D)
    bp2 = row3(h["mlp"]["c_proj"]["bias"], D)

    # head selector: E1[d, h] = [d // Dh == h] sums each head's lanes on the
    # MXU; its transpose re-expands per-head scalars to the lane layout
    head_of = jnp.arange(D) // (D // H)
    e1 = (head_of[:, None] == jnp.arange(128)[None, :])
    e1b = e1.astype(jnp.bfloat16)
    e1t = e1.T.astype(jnp.float32)

    if group > 1:
        assert anc is not None and anc.shape == (S // bs, B * bs, 1), (
            anc if anc is None else anc.shape, (S // bs, B * bs, 1))
        assert B % group == 0, (B, group)

    kernel = functools.partial(
        _kernel, L=L, B=B, D=D, F=F, H=H, S=S, K=group, BS=bs, KVQ=kvq,
        W4=w4, W4F=w4f or os.environ.get("INDEXTTS_INT4_UNPACK", "shift"))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    full = lambda shape: pl.BlockSpec(shape, lambda l, *_: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    anc_specs = [full((S // bs, B * bs, 1))] if group > 1 else []
    anc_args = [anc.astype(jnp.bfloat16)] if group > 1 else []
    anc_scratch = []
    # VMEM budget: the proven B<=12 / sampling configs compile under the
    # default ~16 MB Mosaic scope; beam ancestry at B in 13..24 adds the
    # lane-padded anc map (S*B*256 bytes) on top of the 32-slot scratch and
    # needs the scope raised (v5e VMEM is far larger; attn.py ships with a
    # 100 MB limit on production traffic)
    compiler_params = None
    if group > 1 and B > 12:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20)
    x_out, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L,),
            in_specs=[
                full((B, D)),                         # x
                vrow(ln1w), vrow(ln1b), vrow(ln2w), vrow(ln2b),
                vrow(sqkv), vrow(bqkv), vrow(sproj), vrow(bproj),
                vrow(sfc), vrow(bfc), vrow(sp2), vrow(bp2),
                full((B, 1)),                         # per-row valid start
                full((D, 128)),                       # E1 (bf16)
                full((128, D)),                       # E1^T (f32)
                any_spec, any_spec, any_spec, any_spec,   # weights
                any_spec, any_spec,                   # cache k, v
            ] + ([any_spec] if kvq else []) + anc_specs,  # packed kv scales
            out_specs=[
                full((B, D)),
                pl.BlockSpec((1, B, D), lambda l, *_: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, D), lambda l, *_: (l, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((B, D), jnp.bfloat16),         # x carry
                pltpu.VMEM((B, 3 * D), jnp.bfloat16),     # qkv
                pltpu.VMEM((2, D // 2 if w4 else D, _BN), jnp.int8),  # w pool
                pltpu.VMEM((2, _BN // 2 if w4 else _BN, D), jnp.int8),  # p pool
                pltpu.VMEM((2, B, bs, D),
                           jnp.int8 if kvq else jnp.bfloat16),  # k blocks
                pltpu.VMEM((2, B, bs, D),
                           jnp.int8 if kvq else jnp.bfloat16),  # v blocks
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ] + ([pltpu.VMEM((2, B, bs, 256), jnp.bfloat16),
                  pltpu.SemaphoreType.DMA((2,))] if kvq else [])
              + anc_scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, D), jnp.bfloat16),
        ],
        interpret=interpret,
        **({"compiler_params": compiler_params} if compiler_params else {}),
    )(jnp.reshape(pos, (1,)).astype(jnp.int32), x.astype(jnp.bfloat16),
      ln1w, ln1b, ln2w, ln2b, sqkv, bqkv, sproj, bproj, sfc, bfc, sp2, bp2,
      starts, e1b, e1t,
      h["attn"]["c_attn"][wkey], h["attn"]["c_proj"][wkey],
      h["mlp"]["c_fc"][wkey], h["mlp"]["c_proj"][wkey], ck, cv,
      *([kv_cache["kvs"]] if kvq else []), *anc_args)

    new_cache = dict(kv_cache)
    if kvq:
        from indextts_tpu.models.gpt.gpt2 import kv_quantize_flat

        kq, vq, kvs = kv_quantize_flat(k_new, v_new, H)
        new_cache["k"] = jax.lax.dynamic_update_slice(
            kv_cache["k"], kq[:, :, None, :], (0, 0, pos, 0))
        new_cache["v"] = jax.lax.dynamic_update_slice(
            kv_cache["v"], vq[:, :, None, :], (0, 0, pos, 0))
        new_cache["kvs"] = jax.lax.dynamic_update_slice(
            kv_cache["kvs"], kvs[:, :, None, :], (0, 0, pos, 0))
    else:
        new_cache["k"] = jax.lax.dynamic_update_slice(
            kv_cache["k"], k_new[:, :, None, :].astype(kv_cache["k"].dtype),
            (0, 0, pos, 0))
        new_cache["v"] = jax.lax.dynamic_update_slice(
            kv_cache["v"], v_new[:, :, None, :].astype(kv_cache["v"].dtype),
            (0, 0, pos, 0))
    x_f = nn.layer_norm(params["ln_f"], x_out)
    return x_f, new_cache
