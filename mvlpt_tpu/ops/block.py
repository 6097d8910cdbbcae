"""Fused transformer residual-block Pallas kernels.

Profiling the ViT-B/16 UPT step on the real chip (see BASELINE.md perf
notes) showed the matmuls already run at ~MXU peak (~7.5 ms of a
25.9 ms step) while the other ~18 ms is latency-bound VPU/HBM soup:
fp32 LayerNorm stat reductions (~5.5 ms), elementwise (B,S,W) fusions
(residuals, normalize-applies, epilogues, ~5.9 ms), pure layout copies
for the attention head split (~2.9 ms), and fp32 softmax round-trips
(~2.4 ms). XLA cannot fuse across those op boundaries; these kernels
can — each half-block (LN1→QKV→MHA→out-proj→+residual, and
LN2→MLP→+residual) becomes ONE Pallas program per image with all
intermediates VMEM-resident.

Replaces the hot path of the reference's ResidualAttentionBlock
(/root/reference/clip/model.py:167-188) rather than translating it.

Mosaic shape discipline: lane-dimension splits (e.g. reshaping the
(S, 3W) QKV output into heads) do not lower, so the attention kernel
works TRANSPOSED: one full-width projection (3W, W) @ (S, W)^T ->
(3W, S) puts the heads on the SUBLANE axis (64-row slabs Mosaic slices
freely), per-head score/context dots run on (D, S) slabs, the softmax
and its VJP batch across all heads in a single fp32 VPU pass between
two statically-unrolled MXU loops, and the out-projection/dxh are
single full-width dots over VMEM scratch accumulators.

Backward (custom VJP): hand-derived kernels with the same fusion
boundaries. Residuals saved: per-head q/k/v + compute-dtype
probabilities + the MLP pre-activation (the same footprint XLA's
autodiff keeps) plus tiny per-row mu/rstd. The frozen backbone means
NO weight gradients are needed — bwd computes dx only; the zero weight
cotangents returned to JAX are constants that XLA folds away.

Numerics contract is unchanged from core/layers.py: LN stats and
softmax in fp32, matmuls accumulate fp32 on the MXU, activations in
the compute dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu importable only on TPU-enabled jaxlibs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


class _FusedMarker:
    """Sentinel passed as ``attn_fn`` to select the fused-block path
    (checked by core.layers.residual_block via the fused_block attr).

    ``auto_selected`` records whether the marker came from the 'auto'
    config resolution: shape heuristics (e.g. the shallow-text-grid
    fallback in core/text.py) may only override auto selections — an
    explicitly forced TPU.USE_PALLAS='block' must stay in effect.
    """

    fused_block = True

    def __init__(self, auto_selected: bool = False, mesh=None,
                 inference: bool = False):
        self.auto_selected = auto_selected
        # When set, core.layers.residual_block routes through
        # fused_residual_block_sharded (shard_map over the mesh's
        # "data" axis) — pallas_call needs explicit partitioning under
        # a multi-device mesh.
        self.mesh = mesh
        # No-grad kernel variants (attn_block_infer / mlp_block_infer):
        # same math, no backward-residual HBM writes. Selected by eval
        # builders (make_cached_text_eval, make_eval_step, zs infer);
        # differentiating through an inference marker fails loudly
        # (plain pallas_call, no custom VJP).
        self.inference = inference

    def as_inference(self):
        return _FusedMarker(auto_selected=self.auto_selected,
                            mesh=self.mesh, inference=True)

    def __repr__(self):  # pragma: no cover
        return "<fused-block kernels%s%s%s>" % (
            " (auto)" if self.auto_selected else "",
            " (sharded)" if self.mesh is not None else "",
            " (inference)" if self.inference else "")


FUSED = _FusedMarker(auto_selected=False)
FUSED_AUTO = _FusedMarker(auto_selected=True)

_EPS = 1e-5


def _pick_g(b: int, cap: int = 1) -> int:
    """Images per grid program (measured on v5e: g=1 beats g=4 —
    20.6 vs 21.2 ms/step — the per-program overhead is already hidden
    by Mosaic pipelining and larger g only grows VMEM pressure)."""
    for g in range(min(b, cap), 0, -1):
        if b % g == 0:
            return g
    return 1


from mvlpt_tpu.ops._runtime import interpret as _interpret  # noqa: E402


def _ln2d(x32, scale32, bias32, eps):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xh = (x32 - mu) * rstd * scale32 + bias32
    return xh, mu, rstd


def _ln2d_in_cot(x32, mu, rstd, lns32, dxh32):
    """LayerNorm input cotangent (scale/bias frozen), fp32. The single
    definition shared by the in-kernel backwards and the out-of-kernel
    TP tail (_ln_bwd) — plain jnp ops, so it traces in both contexts."""
    xn = (x32 - mu) * rstd
    dxh_s = dxh32 * lns32
    m1 = jnp.mean(dxh_s, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh_s * xn, axis=-1, keepdims=True)
    return rstd * (dxh_s - m1 - xn * m2)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _row3(g, s, w):
    return pl.BlockSpec((g, s, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _full(*shape):
    n = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * n, memory_space=pltpu.VMEM)


# --------------------------------------------------------------- attn block

def _attn_fwd_kernel(x_ref, lns_ref, lnb_ref, w3_ref, bqkv_ref,
                     wout_ref, *rest,
                     n_heads, head_dim, eps, g_imgs, has_mask,
                     part=False, infer=False):
    """``n_heads`` is the LOCAL head count of this kernel's weight
    shard: the full count single-device, H/tp under tensor parallelism
    (attn_block_tp), where w3/bqkv/wout carry only this device's head
    slabs. ``part=True`` emits the fp32 partial out-projection product
    (no out-proj bias — and no bias ref at all — and no residual): the
    caller psums over the model axis and finishes the block outside.
    ``infer=True``: no-grad variant — same math, but the backward
    residuals (qkv^T, probabilities, LN mu/rstd — ~2 MB/image/layer of
    HBM writes at ViT-B/16 shapes) are never emitted; the only output
    is y."""
    if not part:
        bout_ref = rest[0]
        rest = rest[1:]
    if has_mask:
        mask_ref = rest[0]
        rest = rest[1:]
    if infer:
        y_ref, ot_scr, sc_scr = rest
        qkvt_ref = p_ref = mu_ref = rstd_ref = None
    else:
        y_ref, qkvt_ref, p_ref, mu_ref, rstd_ref, ot_scr, sc_scr = rest
    lns32 = lns_ref[...].astype(jnp.float32)
    lnb32 = lnb_ref[...].astype(jnp.float32)
    bqkv32 = bqkv_ref[...].astype(jnp.float32)
    bout32 = None if part else bout_ref[...].astype(jnp.float32)
    for gi in range(g_imgs):
        x = x_ref[gi]                                  # (S, W)
        h_n = n_heads
        d = head_dim
        wl = h_n * d            # local head-width (== W single-device)
        dtype = x.dtype
        scale = d ** -0.5

        xh32, mu, rstd = _ln2d(x.astype(jnp.float32), lns32, lnb32, eps)
        if not infer:
            mu_ref[gi] = mu
            rstd_ref[gi] = rstd
        xh = xh32.astype(dtype)

        # ONE full-width projection, transposed: (3Wl, W) @ (S, W)^T ->
        # (3Wl, S). Heads then live on the SUBLANE axis (64-row slabs),
        # which Mosaic slices freely — lane-axis head splits don't lower.
        qkvt = (_dot(w3_ref[...], xh, ((1,), (1,))) + bqkv32).astype(dtype)
        if not infer:
            qkvt_ref[gi] = qkvt

        # MXU loop 1: all score matrices (back-to-back MXU work);
        # the softmax scale rides on q (D rows, not S*S logits)
        for h in range(h_n):
            qt = (qkvt[h * d:(h + 1) * d].astype(jnp.float32)
                  * scale).astype(dtype)               # (D, S)
            kt = qkvt[wl + h * d:wl + (h + 1) * d]
            sc_scr[h] = _dot(qt, kt, ((0,), (0,)))      # (S, S) f32
        # One batched fp32 softmax over every head (long VPU run)
        logits = sc_scr[...]
        if has_mask:
            logits = logits + mask_ref[...][None]
        p_all = jax.nn.softmax(logits, axis=-1).astype(dtype)
        if not infer:
            p_ref[gi] = p_all
        # MXU loop 2: o^T = v^T @ p^T per head
        for h in range(h_n):
            vt = qkvt[2 * wl + h * d:2 * wl + (h + 1) * d]
            ot_scr[h * d:(h + 1) * d, :] = _dot(
                vt, p_all[h], ((1,), (1,))).astype(dtype)
        # out-proj in ONE dot
        y = _dot(ot_scr[...], wout_ref[...], ((0,), (0,)))
        if part:
            y_ref[gi] = y                              # fp32 partial
        else:
            y_ref[gi] = x + (y + bout32).astype(dtype)


def _attn_bwd_kernel(*refs, n_heads, head_dim, eps, g_imgs, part=False):
    """``part=True`` is the tensor-parallel variant: the refs carry only
    this device's head shard (no x/mu/rstd/lns — LayerNorm backward
    needs the psummed full dxh, so it runs OUTSIDE, after the model-axis
    reduction) and the output is the fp32 partial dxh."""
    if part:
        (qkvt_ref, p_ref, w3_ref, wout_ref, g_ref,
         dx_ref, dqkvt_scr, dp_scr) = refs
    else:
        (x_ref, mu_ref, rstd_ref, qkvt_ref, p_ref, lns_ref, w3_ref,
         wout_ref, g_ref, dx_ref, dqkvt_scr, dp_scr) = refs
        lns32 = lns_ref[...].astype(jnp.float32)
    for gi in range(g_imgs):
        gy = g_ref[gi]                                 # (S, W) cotangent
        h_n = n_heads
        d = head_dim
        wl = h_n * d
        dtype = gy.dtype
        scale = d ** -0.5

        qkvt = qkvt_ref[gi]                            # (3Wl, S)
        # do^T = Wout @ gy^T : one full dot
        do_t = _dot(wout_ref[...], gy, ((1,), (1,))).astype(dtype)

        # MXU loop 1: dv^T and dp for every head
        for h in range(h_n):
            vt = qkvt[2 * wl + h * d:2 * wl + (h + 1) * d]
            p = p_ref[gi, h]                           # (S, S)
            doh = do_t[h * d:(h + 1) * d]              # (D, S)
            # dv = p^T @ do -> dv^T = do^T @ p
            dqkvt_scr[2 * wl + h * d:2 * wl + (h + 1) * d, :] = _dot(
                doh, p, ((1,), (0,))).astype(dtype)
            # dp[q, k] = sum_d do[q,d] v[k,d]
            dp_scr[h] = _dot(doh, vt, ((0,), (0,)))    # (S, S) f32
        # One batched softmax-VJP over every head (long VPU run)
        p32 = p_ref[gi].astype(jnp.float32)
        dp = dp_scr[...]
        ds_all = (p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
                  * scale).astype(dtype)
        # MXU loop 2: dq^T / dk^T per head
        for h in range(h_n):
            qt = qkvt[h * d:(h + 1) * d]
            kt = qkvt[wl + h * d:wl + (h + 1) * d]
            ds = ds_all[h]
            dqkvt_scr[h * d:(h + 1) * d, :] = _dot(
                kt, ds, ((1,), (1,))).astype(dtype)
            dqkvt_scr[wl + h * d:wl + (h + 1) * d, :] = _dot(
                qt, ds, ((1,), (0,))).astype(dtype)

        # dxh = dqkv @ Wqkv^T -> (S, W), one full dot
        dxh = _dot(dqkvt_scr[...], w3_ref[...], ((0,), (0,)))

        if part:
            dx_ref[gi] = dxh                           # fp32 partial
            continue
        # LayerNorm backward (scale/bias frozen — input cotangent only)
        dx = _ln2d_in_cot(x_ref[gi].astype(jnp.float32), mu_ref[gi],
                          rstd_ref[gi], lns32, dxh)
        dx_ref[gi] = gy + dx.astype(dtype)


def _head_major(attn_p, n_heads):
    """(W, 3W) qkv weight -> (3W, W) with rows grouped q|k|v and, within
    each, contiguous per-head 64-row slabs (matches the kernel's
    transposed sublane slicing); bias -> (3W, 1).

    ``qkv_wT``, when present (prepare_blocks), is the transpose already
    materialized once outside the enclosing scan — using it here keeps
    the per-step program free of the transpose."""
    w3 = attn_p.get("qkv_wT")
    if w3 is None:
        w3 = attn_p["qkv_w"].T  # (3W, W): rows already ordered (3, H, D)
    b3 = attn_p["qkv_b"][:, None]  # (3W, 1)
    return w3, b3


def prepare_blocks(blocks, fused: bool = True, tp: int = 1):
    """Stacked (L, ...) transformer block params -> list of L per-layer
    trees, with the fused kernels' transposed qkv layout materialized.

    Purpose: windowed multi-step programs run the whole tower inside a
    ``lax.scan`` over K batches; leaving the weights stacked makes every
    scan iteration re-slice (and re-transpose) all L layers — ~0.56
    ms/step of loop-invariant work XLA measurably does not hoist on
    v5e. Pre-slicing outside the scan pays that cost once per dispatch.
    core.layers.transformer consumes the list form with a Python loop
    (identical math to the unrolled scan).

    ``tp > 1`` (tensor-parallel mesh) additionally materializes the
    per-shard qkv row permutation the TP kernels consume
    (_qkv_tp_layout) — without it every scan iteration would rebuild
    the permuted (3W, W) array per layer, fwd and bwd."""
    leaves = jax.tree_util.tree_leaves(blocks)
    n_layers = leaves[0].shape[0]
    out = []
    for i in range(n_layers):
        layer = jax.tree_util.tree_map(lambda p: p[i], blocks)
        if fused and "attn" in layer:
            attn = dict(layer["attn"])
            attn["qkv_wT"] = attn["qkv_w"].T
            w = attn["qkv_w"].shape[0]
            if tp > 1 and w % tp == 0:
                attn["qkv_wT_tp"] = (
                    attn["qkv_wT"].reshape(3, tp, w // tp, w)
                    .transpose(1, 0, 2, 3).reshape(3 * w, w))
                attn["qkv_b_tp"] = (
                    attn["qkv_b"].reshape(3, tp, w // tp, 1)
                    .transpose(1, 0, 2, 3).reshape(3 * w, 1))
            layer = dict(layer, attn=attn)
        out.append(layer)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def attn_block(x, ln_p, attn_p, mask, n_heads, eps=_EPS):
    """y = x + OutProj(MHA(LN(x))) as one fused kernel per image.

    x: (B, S, W); mask: additive fp32 (S, S) (zeros when unmasked).
    """
    return _attn_fwd(x, ln_p, attn_p, mask, n_heads, eps)[0]


def _attn_fwd(x, ln_p, attn_p, mask, n_heads, eps):
    b, s, w = x.shape
    g = _pick_g(b)
    w3, b3 = _head_major(attn_p, n_heads)
    has_mask = mask is not None
    row2 = pl.BlockSpec((g, s, 1), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [_row3(g, s, w), _full(w), _full(w),
                _full(3 * w, w), _full(3 * w, 1), _full(w, w), _full(w)]
    args = [x, ln_p["scale"], ln_p["bias"], w3, b3, attn_p["out_w"],
            attn_p["out_b"]]
    if has_mask:
        in_specs.append(_full(s, s))
        args.append(mask.astype(jnp.float32))
    y, qkvt, probs, mu, rstd = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, n_heads=n_heads,
                          head_dim=w // n_heads, eps=eps,
                          g_imgs=g, has_mask=has_mask),
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=(_row3(g, s, w),
                   pl.BlockSpec((g, 3 * w, s), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((g, n_heads, s, s),
                                lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   row2, row2),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, w), x.dtype),             # y
            jax.ShapeDtypeStruct((b, 3 * w, s), x.dtype),         # qkv^T
            jax.ShapeDtypeStruct((b, n_heads, s, s), x.dtype),    # probs
            jax.ShapeDtypeStruct((b, s, 1), jnp.float32),         # mu
            jax.ShapeDtypeStruct((b, s, 1), jnp.float32),         # rstd
        ),
        scratch_shapes=([pltpu.VMEM((w, s), x.dtype),
                         pltpu.VMEM((n_heads, s, s), jnp.float32)]
                        if _HAS_PLTPU else []),
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20) if _HAS_PLTPU else None),
        interpret=_interpret(),
    )(*args)
    return y, (x, ln_p, attn_p, qkvt, probs, mu, rstd)


def _attn_bwd(n_heads, eps, res, gy):
    x, ln_p, attn_p, qkvt, probs, mu, rstd = res
    b, s, w = x.shape
    g = _pick_g(b)
    w3, _ = _head_major(attn_p, n_heads)
    row2 = pl.BlockSpec((g, s, 1), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, n_heads=n_heads,
                          head_dim=w // n_heads, eps=eps, g_imgs=g),
        grid=(b // g,),
        in_specs=[_row3(g, s, w), row2, row2,
                  pl.BlockSpec((g, 3 * w, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((g, n_heads, s, s), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  _full(w), _full(3 * w, w), _full(w, w), _row3(g, s, w)],
        out_specs=_row3(g, s, w),
        out_shape=jax.ShapeDtypeStruct((b, s, w), x.dtype),
        scratch_shapes=([pltpu.VMEM((3 * w, s), x.dtype),
                         pltpu.VMEM((n_heads, s, s), jnp.float32)]
                        if _HAS_PLTPU else []),
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20) if _HAS_PLTPU else None),
        interpret=_interpret(),
    )(x, mu, rstd, qkvt, probs, ln_p["scale"], w3, attn_p["out_w"],
      gy.astype(x.dtype))
    # Backbone is frozen: weight cotangents are constant zeros, folded
    # away by XLA when (as in the train step) nothing consumes them.
    zl = jax.tree_util.tree_map(jnp.zeros_like, ln_p)
    za = jax.tree_util.tree_map(jnp.zeros_like, attn_p)
    return dx, zl, za, None


attn_block.defvjp(_attn_fwd, _attn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def attn_block_infer(x, ln_p, attn_p, mask, n_heads, eps=_EPS):
    """No-grad ``attn_block``: identical kernel math, but the backward
    residuals (qkv^T, probabilities, mu/rstd) are never written to HBM
    — only y is emitted. Not differentiable: the attached VJP raises
    ``NotImplementedError`` with a pointer to the training kernel, so
    a mis-routed grad fails with a diagnosis instead of an opaque AD
    error from inside pallas_call (eval builders select this variant
    via the marker's ``inference`` flag)."""
    b, s, w = x.shape
    g = _pick_g(b)
    w3, b3 = _head_major(attn_p, n_heads)
    has_mask = mask is not None
    in_specs = [_row3(g, s, w), _full(w), _full(w),
                _full(3 * w, w), _full(3 * w, 1), _full(w, w), _full(w)]
    args = [x, ln_p["scale"], ln_p["bias"], w3, b3, attn_p["out_w"],
            attn_p["out_b"]]
    if has_mask:
        in_specs.append(_full(s, s))
        args.append(mask.astype(jnp.float32))
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel, n_heads=n_heads,
                          head_dim=w // n_heads, eps=eps,
                          g_imgs=g, has_mask=has_mask, infer=True),
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=_row3(g, s, w),
        out_shape=jax.ShapeDtypeStruct((b, s, w), x.dtype),
        scratch_shapes=([pltpu.VMEM((w, s), x.dtype),
                         pltpu.VMEM((n_heads, s, s), jnp.float32)]
                        if _HAS_PLTPU else []),
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20) if _HAS_PLTPU else None),
        interpret=_interpret(),
    )(*args)


def _no_grad_fwd_attn(x, ln_p, attn_p, mask, n_heads, eps):
    return attn_block_infer(x, ln_p, attn_p, mask, n_heads, eps), None


def _no_grad_bwd(kind):
    def bwd(*_args):
        raise NotImplementedError(
            f"{kind} is a no-grad eval kernel (no backward residuals are "
            "saved); differentiate the training kernel instead — use the "
            "fused marker with inference=False (train paths never select "
            "inference markers; this means an eval-built fn was "
            "differentiated).")
    return bwd


attn_block_infer.defvjp(_no_grad_fwd_attn, _no_grad_bwd("attn_block_infer"))


# ---------------------------------------------------------------- mlp block

def _mlp_fwd_kernel(x_ref, lns_ref, lnb_ref, wfc_ref, bfc_ref,
                    wproj_ref, *rest, eps, g_imgs, part=False, infer=False):
    """``part=True``: wfc/bfc/wproj carry only this device's hidden-unit
    shard (4W/tp columns / rows); the fp32 partial down-projection is
    emitted without bias (no bproj ref at all) or residual, for a
    model-axis psum outside. ``infer=True``: no-grad variant — the
    backward residuals (pre-activation hpre, ~1.3 MB/image/layer at
    ViT-B/16 shapes, LN mu/rstd) are never emitted; only y is."""
    if not part:
        bproj_ref = rest[0]
        rest = rest[1:]
    if infer:
        (y_ref,) = rest
        hpre_ref = mu_ref = rstd_ref = None
    else:
        y_ref, hpre_ref, mu_ref, rstd_ref = rest
    lns32 = lns_ref[...].astype(jnp.float32)
    lnb32 = lnb_ref[...].astype(jnp.float32)
    bfc32 = bfc_ref[...].astype(jnp.float32)
    bproj32 = None if part else bproj_ref[...].astype(jnp.float32)
    for gi in range(g_imgs):
        x = x_ref[gi]                                  # (S, W)
        dtype = x.dtype
        xh32, mu, rstd = _ln2d(x.astype(jnp.float32), lns32, lnb32, eps)
        if not infer:
            mu_ref[gi] = mu
            rstd_ref[gi] = rstd
        hpre32 = _dot(xh32.astype(dtype), wfc_ref[...], ((1,), (0,)))
        hpre32 = hpre32 + bfc32
        hpre = hpre32.astype(dtype)
        if not infer:
            hpre_ref[gi] = hpre
        # GELU on the compute-dtype-rounded pre-activation: matches the
        # XLA path (core/layers.mlp rounds the matmul before quick_gelu)
        # and the backward kernel, which recomputes gelu' from the saved
        # rounded hpre — gelu(fp32) here would make fwd and bwd evaluate
        # the activation at different points.
        h32r = hpre.astype(jnp.float32)
        a = (h32r * jax.nn.sigmoid(1.702 * h32r)).astype(dtype)
        y = _dot(a, wproj_ref[...], ((1,), (0,)))
        if part:
            y_ref[gi] = y                              # fp32 partial
        else:
            y_ref[gi] = x + (y + bproj32).astype(dtype)


def _mlp_bwd_kernel(*refs, eps, g_imgs, part=False):
    """``part=True`` is the tensor-parallel variant: refs carry only the
    hidden-shard residuals/weights (no x/mu/rstd/lns — LN backward runs
    outside, on the psummed dxh) and the output is the fp32 partial dxh."""
    if part:
        hpre_ref, wfc_ref, wproj_ref, g_ref, dx_ref = refs
    else:
        (x_ref, mu_ref, rstd_ref, hpre_ref, lns_ref, wfc_ref, wproj_ref,
         g_ref, dx_ref) = refs
        lns32 = lns_ref[...].astype(jnp.float32)
    for gi in range(g_imgs):
        gy = g_ref[gi]
        dtype = gy.dtype
        h32 = hpre_ref[gi].astype(jnp.float32)
        da = _dot(gy, wproj_ref[...], ((1,), (1,)))    # (S, 4Wl) f32
        sig = jax.nn.sigmoid(1.702 * h32)
        dh = (da * (sig + 1.702 * h32 * sig * (1.0 - sig))).astype(dtype)
        dxh = _dot(dh, wfc_ref[...], ((1,), (1,)))     # (S, W) f32
        if part:
            dx_ref[gi] = dxh                           # fp32 partial
            continue
        dx = _ln2d_in_cot(x_ref[gi].astype(jnp.float32), mu_ref[gi],
                          rstd_ref[gi], lns32, dxh)
        dx_ref[gi] = gy + dx.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def mlp_block(x, ln_p, mlp_p, eps=_EPS):
    """y = x + Proj(QuickGELU(FC(LN(x)))) as one fused kernel."""
    return _mlp_fwd(x, ln_p, mlp_p, eps)[0]


def _mlp_fwd(x, ln_p, mlp_p, eps):
    b, s, w = x.shape
    w4 = mlp_p["fc_w"].shape[1]
    g = _pick_g(b)
    row2 = pl.BlockSpec((g, s, 1), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    y, hpre, mu, rstd = pl.pallas_call(
        functools.partial(_mlp_fwd_kernel, eps=eps, g_imgs=g),
        grid=(b // g,),
        in_specs=[_row3(g, s, w), _full(w), _full(w),
                  _full(w, w4), _full(w4), _full(w4, w), _full(w)],
        out_specs=(_row3(g, s, w), _row3(g, s, w4), row2, row2),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, w), x.dtype),
            jax.ShapeDtypeStruct((b, s, w4), x.dtype),
            jax.ShapeDtypeStruct((b, s, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, s, 1), jnp.float32),
        ),
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20) if _HAS_PLTPU else None),
        interpret=_interpret(),
    )(x, ln_p["scale"], ln_p["bias"], mlp_p["fc_w"], mlp_p["fc_b"],
      mlp_p["proj_w"], mlp_p["proj_b"])
    return y, (x, ln_p, mlp_p, hpre, mu, rstd)


def _mlp_bwd(eps, res, gy):
    x, ln_p, mlp_p, hpre, mu, rstd = res
    b, s, w = x.shape
    w4 = mlp_p["fc_w"].shape[1]
    g = _pick_g(b)
    row2 = pl.BlockSpec((g, s, 1), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, eps=eps, g_imgs=g),
        grid=(b // g,),
        in_specs=[_row3(g, s, w), row2, row2, _row3(g, s, w4),
                  _full(w), _full(w, w4), _full(w4, w), _row3(g, s, w)],
        out_specs=_row3(g, s, w),
        out_shape=jax.ShapeDtypeStruct((b, s, w), x.dtype),
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20) if _HAS_PLTPU else None),
        interpret=_interpret(),
    )(x, mu, rstd, hpre, ln_p["scale"], mlp_p["fc_w"], mlp_p["proj_w"],
      gy.astype(x.dtype))
    zl = jax.tree_util.tree_map(jnp.zeros_like, ln_p)
    zm = jax.tree_util.tree_map(jnp.zeros_like, mlp_p)
    return dx, zl, zm


mlp_block.defvjp(_mlp_fwd, _mlp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def mlp_block_infer(x, ln_p, mlp_p, eps=_EPS):
    """No-grad ``mlp_block``: identical kernel math without the
    backward-residual HBM writes (hpre, mu/rstd); only y is emitted.
    Differentiating it raises ``NotImplementedError`` (see
    attn_block_infer)."""
    b, s, w = x.shape
    w4 = mlp_p["fc_w"].shape[1]
    g = _pick_g(b)
    return pl.pallas_call(
        functools.partial(_mlp_fwd_kernel, eps=eps, g_imgs=g, infer=True),
        grid=(b // g,),
        in_specs=[_row3(g, s, w), _full(w), _full(w),
                  _full(w, w4), _full(w4), _full(w4, w), _full(w)],
        out_specs=_row3(g, s, w),
        out_shape=jax.ShapeDtypeStruct((b, s, w), x.dtype),
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20) if _HAS_PLTPU else None),
        interpret=_interpret(),
    )(x, ln_p["scale"], ln_p["bias"], mlp_p["fc_w"], mlp_p["fc_b"],
      mlp_p["proj_w"], mlp_p["proj_b"])


def _no_grad_fwd_mlp(x, ln_p, mlp_p, eps):
    return mlp_block_infer(x, ln_p, mlp_p, eps), None


mlp_block_infer.defvjp(_no_grad_fwd_mlp, _no_grad_bwd("mlp_block_infer"))


def _mlp_rows_group(b: int, s: int) -> int:
    """Images merged per MLP kernel program at short sequence lengths.

    The MLP half-block is purely row-wise (LN, FC, GELU, proj,
    residual), so (b, s, w) -> (b/gr, gr*s, w) is EXACT math — it only
    grows the matmul M (streaming) dimension from s to gr*s and cuts
    the grid-program count by gr. Measured on v5e at ViT-B/32 (s=54):
    8.59 -> 8.40 ms/step (MFU 0.461 -> 0.471) — a real but small win
    (M is the MXU's streaming axis, so short M costs pipeline
    drain/fixed overhead per program, not tile fill; BASELINE.md
    round 4). s >= 128 (ViT-B/16's 208): gr=1, unchanged.

    Stop rule: the PREVIOUS group must still be short (gr * s < 128)
    before doubling, so the merged M may land anywhere in [128, 256)
    (s=54 -> gr=4 -> M=216). That is intentional and differs from
    _attn_rows_group's ``cand * s <= 128``: the attention merge pays
    quadratic softmax/score waste per extra row so it must bound the
    RESULT, while the MLP merge is linear in M — overshooting 128 only
    helps amortization (M=216 is the measured 8.40 ms config)."""
    gr = 1
    for cand in (2, 4, 8):
        if b % cand or gr * s >= 128:
            break
        gr = cand
    return gr


def _attn_rows_group(b: int, s: int) -> int:
    """Images merged per attention kernel program at short sequence
    lengths, via a block-diagonal additive mask.

    EXACT math: the mask adds -1e9 to every cross-image logit, and fp32
    ``exp(-1e9 - max)`` is exactly 0.0, so each softmax row renormalizes
    over its own image only; the saved probabilities carry those exact
    zeros, which makes the backward kernel block-exact automatically
    (dv/dq/dk cross-image contributions multiply by p == 0).

    Unlike the MLP merge this is not free — the per-head score/context
    matmuls and the softmax do gr x the work ((gr*s)^2 vs gr * s^2
    logits) — but at s < 128 every per-head contraction runs with lane
    dimension s (under half a 128-lane MXU tile); ``gr*s <= 128``
    bounds the waste at one output tile while doubling the fill.
    Measured on v5e at ViT-B/32 (s=54, gr=2): see BASELINE.md round 4.
    s >= 128 (ViT-B/16's 208): gr=1, unchanged."""
    if s >= 128:
        return 1
    gr = 1
    for cand in (2, 4):
        if b % cand or cand * s > 128:
            break
        gr = cand
    return gr


def _block_diag_mask(gr: int, s: int):
    idx = np.arange(gr * s) // s
    return jnp.asarray(
        np.where(idx[:, None] == idx[None, :], 0.0, -1e9), jnp.float32)


def fused_residual_block(x, p, n_heads, mask=None, inference=False):
    """Drop-in residual_block using the fused half-block kernels.

    ``inference=True`` (selected by eval builders through the marker's
    ``inference`` flag) swaps in the no-grad kernel variants: same math
    and grouping, but none of the backward residuals (qkv^T, probs,
    hpre, mu/rstd — ~3.3 MB/image/layer at ViT-B/16 shapes) are ever
    written to HBM. Measured on v5e (batch-100 eval, flagship,
    interleaved A/B ×3): 3783 → 3817 img/s (26.43 → 26.20 ms/batch) —
    a small ~1% win (the residual writes mostly hide under compute at
    these shapes), consistent across rounds; see BASELINE.md round-4
    eval entry.

    Negative result, kept for the record (round 3): fusing BOTH halves
    into one whole-layer program (saving the inter-half (B,S,W) HBM
    round trip, ~30 MB/layer) measured SLOWER on v5e — 18.6 vs 18.5
    ms/step on the flagship — the doubled per-program VMEM footprint
    (both halves' weights + residuals resident) costs Mosaic more
    pipelining overlap than the saved traffic buys."""
    attn_f = attn_block_infer if inference else attn_block
    mlp_f = mlp_block_infer if inference else mlp_block
    b, s, w = x.shape
    ga = _attn_rows_group(b, s) if mask is None else 1
    if ga > 1:
        xg = x.reshape(b // ga, ga * s, w)
        x = attn_f(xg, p["ln_1"], p["attn"], _block_diag_mask(ga, s),
                   n_heads).reshape(b, s, w)
    else:
        x = attn_f(x, p["ln_1"], p["attn"], mask, n_heads)
    gr = _mlp_rows_group(b, s)
    if gr > 1:
        y = mlp_f(x.reshape(b // gr, gr * s, w), p["ln_2"], p["mlp"])
        return y.reshape(b, s, w)
    return mlp_f(x, p["ln_2"], p["mlp"])


def fused_residual_block_sharded(x, p, n_heads, mask, mesh,
                                 inference=False):
    """The fused block under a multi-device mesh.

    ``pallas_call`` is opaque to GSPMD, so the kernels must declare
    their own partitioning. Two regimes:

    * **Data-parallel** (model axis == 1): the grid is one program per
      image (batch axis), i.e. embarrassingly data-parallel —
      ``shard_map`` over the mesh's "data" axis with replicated weights
      runs the SAME per-shard kernel on each device's local batch rows,
      and autodiff maps the hand-derived VJP kernels the same way. Rows
      that do not divide the data axis (e.g. a replicated text tower
      whose row-blocks aren't a multiple of dp) are zero-padded up to
      it and sliced back after: the batch axis stays mapped, which
      keeps the AD transpose exact. (A replicated P() fallback would be
      wrong under differentiation: check_rep=False shard_map transposes
      an unmapped input with an unconditional psum, so every device's
      full-batch dx would be summed — x's cotangent scaled by the mesh
      size.)
    * **Tensor-parallel** (model axis > 1): Megatron-sharded kernels
      (attn_block_tp / mlp_block_tp) — each device's kernel runs its
      H/tp heads (resp. 4W/tp hidden units) and emits an fp32 partial,
      psummed over "model" with bias+residual applied after. Head
      counts or hidden widths that don't divide tp fall back to the
      XLA block (GSPMD shards it from the declared weight specs).
      ``inference`` is a no-op here: the TP kernels keep their
      (identical-value) training variants — no-grad TP variants await
      a multi-chip measurement, like the TP kernels themselves."""
    from mvlpt_tpu.parallel.mesh import shard_map
    from jax.sharding import PartitionSpec as P

    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_data = axes.get("data", 1)
    tp = axes.get("model", 1)
    n_rows = x.shape[0]
    pad = (-n_rows) % n_data
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], axis=0)
    xspec = P("data") if n_data > 1 else P()

    if tp > 1:
        w4 = p["mlp"]["fc_w"].shape[-1]
        if n_heads % tp or w4 % tp:
            from mvlpt_tpu.core.layers import residual_block as _xla_block

            out = _xla_block(x, p, n_heads, mask)
        else:
            out = attn_block_tp(x, p["ln_1"], p["attn"], mask,
                                n_heads, mesh)
            out = mlp_block_tp(out, p["ln_2"], p["mlp"], mesh)
        return out[:n_rows] if pad else out

    if mask is None:
        fn = shard_map(
            lambda x_l, p_l: fused_residual_block(
                x_l, p_l, n_heads, None, inference=inference),
            mesh=mesh, in_specs=(xspec, P()), out_specs=xspec,
            check_rep=False)
        out = fn(x, p)
    else:
        fn = shard_map(
            lambda x_l, p_l, m: fused_residual_block(
                x_l, p_l, n_heads, m, inference=inference),
            mesh=mesh, in_specs=(xspec, P(), P()), out_specs=xspec,
            check_rep=False)
        out = fn(x, p, mask)
    return out[:n_rows] if pad else out


# ------------------------------------------------- tensor-parallel blocks
#
# Megatron sharding for the fused kernels (the reference has no TP at
# all — its only parallelism is single-process nn.DataParallel,
# mvlpt.py:877). Per half-block: every model-axis device runs the SAME
# fused kernel on its shard of the weights — H/tp complete heads
# (attention) or 4W/tp hidden units (MLP) — emitting an fp32 partial
# output (kernels' part=True), which a single lax.psum over "model"
# reduces before bias + residual are applied. The custom-VJP boundary
# sits OUTSIDE the shard_map: fwd and bwd are each a primal shard_map
# program (kernel + psum), so no AD ever differentiates through
# shard_map and the transpose semantics stay hand-controlled. LayerNorm
# backward needs the FULL (psummed) dxh, so it runs after the
# reduction, outside the kernel, in plain XLA.


def _tp_size(mesh) -> int:
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)


def _dspec(mesh):
    from jax.sharding import PartitionSpec as P

    n_data = dict(zip(mesh.axis_names, mesh.devices.shape)).get("data", 1)
    return P("data") if n_data > 1 else P()


def _ln_bwd(x, mu, rstd, ln_scale, dxh32, gy):
    """LayerNorm input-cotangent (scale/bias frozen) + residual, batched
    over (B, S, W) in fp32 — the out-of-kernel tail of the TP backward.
    Same math as the in-kernel backwards (_ln2d_in_cot)."""
    dx = _ln2d_in_cot(x.astype(jnp.float32), mu, rstd,
                      ln_scale.astype(jnp.float32), dxh32)
    return gy + dx.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def attn_block_tp(x, ln_p, attn_p, mask, n_heads, mesh):
    """y = x + OutProj(MHA(LN(x))) with heads Megatron-sharded over the
    mesh's "model" axis; batch rows sharded over "data"."""
    return _attn_tp_fwd(x, ln_p, attn_p, mask, n_heads, mesh)[0]


def _qkv_tp_layout(attn_p, n_heads, tp):
    """(3W, W) head-major qkv rows, permuted so the leading axis shards
    into per-device [q_k; k_k; v_k] blocks under P("model", None) — a
    contiguous shard of the plain (3, H, D) order would cross the q|k|v
    section boundaries. prepare_blocks materializes this once per
    dispatch (qkv_wT_tp); the inline fallback keeps direct calls
    working (the permutation then sits outside the shard_map, still
    hoistable relative to per-call slicing)."""
    w3tp = attn_p.get("qkv_wT_tp")
    if w3tp is not None:
        return w3tp, attn_p["qkv_b_tp"]
    w3, b3 = _head_major(attn_p, n_heads)
    w = w3.shape[1]
    w3tp = (w3.reshape(3, tp, w // tp, w)
            .transpose(1, 0, 2, 3).reshape(3 * w, w))
    b3tp = (b3.reshape(3, tp, w // tp, 1)
            .transpose(1, 0, 2, 3).reshape(3 * w, 1))
    return w3tp, b3tp


def _attn_tp_fwd(x, ln_p, attn_p, mask, n_heads, mesh):
    from mvlpt_tpu.parallel.mesh import shard_map
    from jax.sharding import PartitionSpec as P

    b, s, w = x.shape
    tp = _tp_size(mesh)
    d = w // n_heads
    h_loc = n_heads // tp
    wl = h_loc * d
    has_mask = mask is not None
    ds = _dspec(mesh)
    dname = ds[0] if len(ds) else None
    w3tp, b3tp = _qkv_tp_layout(attn_p, n_heads, tp)

    def local(x_l, lns, lnb, w3_l, b3_l, wout_l, out_b, *maybe_mask):
        b_l = x_l.shape[0]
        g = _pick_g(b_l)
        row2 = pl.BlockSpec((g, s, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        in_specs = [_row3(g, s, w), _full(w), _full(w),
                    _full(3 * wl, w), _full(3 * wl, 1), _full(wl, w)]
        args = [x_l, lns, lnb, w3_l, b3_l, wout_l]
        if has_mask:
            in_specs.append(_full(s, s))
            args.append(maybe_mask[0].astype(jnp.float32))
        ypart, qkvt, probs, mu, rstd = pl.pallas_call(
            functools.partial(_attn_fwd_kernel, n_heads=h_loc, head_dim=d,
                              eps=_EPS, g_imgs=g, has_mask=has_mask,
                              part=True),
            grid=(b_l // g,),
            in_specs=in_specs,
            out_specs=(_row3(g, s, w),
                       pl.BlockSpec((g, 3 * wl, s), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((g, h_loc, s, s),
                                    lambda i: (i, 0, 0, 0),
                                    memory_space=pltpu.VMEM),
                       row2, row2),
            out_shape=(
                jax.ShapeDtypeStruct((b_l, s, w), jnp.float32),  # partial
                jax.ShapeDtypeStruct((b_l, 3 * wl, s), x_l.dtype),
                jax.ShapeDtypeStruct((b_l, h_loc, s, s), x_l.dtype),
                jax.ShapeDtypeStruct((b_l, s, 1), jnp.float32),
                jax.ShapeDtypeStruct((b_l, s, 1), jnp.float32),
            ),
            scratch_shapes=([pltpu.VMEM((wl, s), x_l.dtype),
                             pltpu.VMEM((h_loc, s, s), jnp.float32)]
                            if _HAS_PLTPU else []),
            compiler_params=(pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20) if _HAS_PLTPU else None),
            interpret=_interpret(),
        )(*args)
        y32 = jax.lax.psum(ypart, "model") + out_b.astype(jnp.float32)
        y = x_l + y32.astype(x_l.dtype)
        return y, qkvt, probs, mu, rstd

    in_specs = [ds, P(), P(), P("model", None), P("model", None),
                P("model", None), P()]
    args = [x, ln_p["scale"], ln_p["bias"], w3tp, b3tp,
            attn_p["out_w"], attn_p["out_b"]]
    if has_mask:
        in_specs.append(P())
        args.append(mask)
    y, qkvt, probs, mu, rstd = shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=(ds, P(dname, "model", None),
                   P(dname, "model", None, None), ds, ds),
        check_rep=False)(*args)
    return y, (x, ln_p, attn_p, qkvt, probs, mu, rstd)


def _attn_tp_bwd(n_heads, mesh, res, gy):
    from mvlpt_tpu.parallel.mesh import shard_map
    from jax.sharding import PartitionSpec as P

    x, ln_p, attn_p, qkvt, probs, mu, rstd = res
    b, s, w = x.shape
    tp = _tp_size(mesh)
    d = w // n_heads
    h_loc = n_heads // tp
    wl = h_loc * d
    ds = _dspec(mesh)
    dname = ds[0] if len(ds) else None
    w3tp, _ = _qkv_tp_layout(attn_p, n_heads, tp)
    gy_c = gy.astype(x.dtype)

    def local(qkvt_l, p_l, w3_l, wout_l, gy_l):
        b_l = gy_l.shape[0]
        g = _pick_g(b_l)
        dxh_part = pl.pallas_call(
            functools.partial(_attn_bwd_kernel, n_heads=h_loc, head_dim=d,
                              eps=_EPS, g_imgs=g, part=True),
            grid=(b_l // g,),
            in_specs=[pl.BlockSpec((g, 3 * wl, s), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((g, h_loc, s, s), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      _full(3 * wl, w), _full(wl, w), _row3(g, s, w)],
            out_specs=_row3(g, s, w),
            out_shape=jax.ShapeDtypeStruct((b_l, s, w), jnp.float32),
            scratch_shapes=([pltpu.VMEM((3 * wl, s), gy_l.dtype),
                             pltpu.VMEM((h_loc, s, s), jnp.float32)]
                            if _HAS_PLTPU else []),
            compiler_params=(pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20) if _HAS_PLTPU else None),
            interpret=_interpret(),
        )(qkvt_l, p_l, w3_l, wout_l, gy_l)
        return jax.lax.psum(dxh_part, "model")

    dxh = shard_map(
        local, mesh=mesh,
        in_specs=(P(dname, "model", None), P(dname, "model", None, None),
                  P("model", None), P("model", None), ds),
        out_specs=ds, check_rep=False,
    )(qkvt, probs, w3tp, attn_p["out_w"], gy_c)
    dx = _ln_bwd(x, mu, rstd, ln_p["scale"], dxh, gy_c)
    zl = jax.tree_util.tree_map(jnp.zeros_like, ln_p)
    za = jax.tree_util.tree_map(jnp.zeros_like, attn_p)
    return dx, zl, za, None


attn_block_tp.defvjp(_attn_tp_fwd, _attn_tp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def mlp_block_tp(x, ln_p, mlp_p, mesh):
    """y = x + Proj(QuickGELU(FC(LN(x)))) with the 4W hidden dimension
    Megatron-sharded over the mesh's "model" axis."""
    return _mlp_tp_fwd(x, ln_p, mlp_p, mesh)[0]


def _mlp_tp_fwd(x, ln_p, mlp_p, mesh):
    from mvlpt_tpu.parallel.mesh import shard_map
    from jax.sharding import PartitionSpec as P

    b, s, w = x.shape
    w4 = mlp_p["fc_w"].shape[1]
    tp = _tp_size(mesh)
    w4l = w4 // tp
    ds = _dspec(mesh)
    dname = ds[0] if len(ds) else None

    def local(x_l, lns, lnb, wfc_l, bfc_l, wproj_l, proj_b):
        b_l = x_l.shape[0]
        g = _pick_g(b_l)
        row2 = pl.BlockSpec((g, s, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        ypart, hpre, mu, rstd = pl.pallas_call(
            functools.partial(_mlp_fwd_kernel, eps=_EPS, g_imgs=g,
                              part=True),
            grid=(b_l // g,),
            in_specs=[_row3(g, s, w), _full(w), _full(w),
                      _full(w, w4l), _full(w4l), _full(w4l, w)],
            out_specs=(_row3(g, s, w), _row3(g, s, w4l), row2, row2),
            out_shape=(
                jax.ShapeDtypeStruct((b_l, s, w), jnp.float32),  # partial
                jax.ShapeDtypeStruct((b_l, s, w4l), x_l.dtype),
                jax.ShapeDtypeStruct((b_l, s, 1), jnp.float32),
                jax.ShapeDtypeStruct((b_l, s, 1), jnp.float32),
            ),
            compiler_params=(pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20) if _HAS_PLTPU else None),
            interpret=_interpret(),
        )(x_l, lns, lnb, wfc_l, bfc_l, wproj_l)  # bias after the psum
        y32 = jax.lax.psum(ypart, "model") + proj_b.astype(jnp.float32)
        y = x_l + y32.astype(x_l.dtype)
        return y, hpre, mu, rstd

    y, hpre, mu, rstd = shard_map(
        local, mesh=mesh,
        in_specs=(ds, P(), P(), P(None, "model"), P("model"),
                  P("model", None), P()),
        out_specs=(ds, P(dname, None, "model"), ds, ds),
        check_rep=False,
    )(x, ln_p["scale"], ln_p["bias"], mlp_p["fc_w"], mlp_p["fc_b"],
      mlp_p["proj_w"], mlp_p["proj_b"])
    return y, (x, ln_p, mlp_p, hpre, mu, rstd)


def _mlp_tp_bwd(mesh, res, gy):
    from mvlpt_tpu.parallel.mesh import shard_map
    from jax.sharding import PartitionSpec as P

    x, ln_p, mlp_p, hpre, mu, rstd = res
    b, s, w = x.shape
    w4 = mlp_p["fc_w"].shape[1]
    tp = _tp_size(mesh)
    w4l = w4 // tp
    ds = _dspec(mesh)
    dname = ds[0] if len(ds) else None
    gy_c = gy.astype(x.dtype)

    def local(hpre_l, wfc_l, wproj_l, gy_l):
        b_l = gy_l.shape[0]
        g = _pick_g(b_l)
        dxh_part = pl.pallas_call(
            functools.partial(_mlp_bwd_kernel, eps=_EPS, g_imgs=g,
                              part=True),
            grid=(b_l // g,),
            in_specs=[_row3(g, s, w4l), _full(w, w4l), _full(w4l, w),
                      _row3(g, s, w)],
            out_specs=_row3(g, s, w),
            out_shape=jax.ShapeDtypeStruct((b_l, s, w), jnp.float32),
            compiler_params=(pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20) if _HAS_PLTPU else None),
            interpret=_interpret(),
        )(hpre_l, wfc_l, wproj_l, gy_l)
        return jax.lax.psum(dxh_part, "model")

    dxh = shard_map(
        local, mesh=mesh,
        in_specs=(P(dname, None, "model"), P(None, "model"),
                  P("model", None), ds),
        out_specs=ds, check_rep=False,
    )(hpre, mlp_p["fc_w"], mlp_p["proj_w"], gy_c)
    dx = _ln_bwd(x, mu, rstd, ln_p["scale"], dxh, gy_c)
    zl = jax.tree_util.tree_map(jnp.zeros_like, ln_p)
    zm = jax.tree_util.tree_map(jnp.zeros_like, mlp_p)
    return dx, zl, zm


mlp_block_tp.defvjp(_mlp_tp_fwd, _mlp_tp_bwd)


from mvlpt_tpu.ops._runtime import available  # noqa: E402,F401
