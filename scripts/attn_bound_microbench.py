"""Attention-efficiency bound microbenchmark, amortized (BASELINE task).

Each op runs inside a jitted lax.scan of ITERS iterations with a scalar
feedback term (input += eps * tiny-slice-of-output) so (a) XLA cannot
hoist the loop-invariant compute and (b) the ~1.5-2 ms per-dispatch
tunnel latency amortizes to noise.  Flagship geometry: B=32, S=208,
W=768, H=12, d=64.  The control experiment: the per-head contractions
(scores: K=d=64; pv: N=d=64) at d=64 vs d=128 with identical FLOPs —
if head_dim 64 ran the 128-deep MXU at half depth, d=128 should be ~2x
faster.
"""
import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np

B, S, W, H, D = 32, 208, 768, 12, 64
PEAK = 197e12
ITERS = 200

rng = np.random.RandomState(0)


def bench(name, fn, x0, flops=None, extra=None):
    """Time a scan of ITERS applications of fn with scalar feedback."""
    eps = jnp.asarray(1e-6, x0.dtype)

    def body(x, _):
        y = fn(x)
        fb = y[(0,) * (y.ndim - 1) + (slice(0, 1),)].astype(x.dtype)
        return x + eps * jnp.reshape(fb, (1,) * x.ndim), None

    @jax.jit
    def run(x):
        x, _ = jax.lax.scan(body, x, None, length=ITERS)
        return x

    o = run(x0)
    float(jax.device_get(jnp.sum(o.astype(jnp.float32)[..., :1, :1])))
    t0 = time.perf_counter()
    o = run(x0)
    float(jax.device_get(jnp.sum(o.astype(jnp.float32)[..., :1, :1])))
    dt = (time.perf_counter() - t0) / ITERS
    rec = {"op": name, "us": round(dt * 1e6, 1)}
    if flops:
        rec["tflops"] = round(flops / dt / 1e12, 1)
        rec["mxu_frac"] = round(flops / dt / PEAK, 3)
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return dt


x = jnp.asarray(rng.randn(B, S, W), jnp.bfloat16)
w3 = jnp.asarray(rng.randn(W, 3 * W), jnp.bfloat16)
wo = jnp.asarray(rng.randn(W, W), jnp.bfloat16)
q = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
k = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
v = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
p = jnp.asarray(rng.rand(B, H, S, S), jnp.bfloat16)
q2 = jnp.asarray(rng.randn(B, H // 2, S, 2 * D), jnp.bfloat16)
k2 = jnp.asarray(rng.randn(B, H // 2, S, 2 * D), jnp.bfloat16)
v2 = jnp.asarray(rng.randn(B, H // 2, S, 2 * D), jnp.bfloat16)
p2 = jnp.asarray(rng.rand(B, H // 2, S, S), jnp.bfloat16)
p32 = p.astype(jnp.float32)
x32 = x.astype(jnp.float32)

F_SC = 2 * B * H * S * S * D

bench("qkv_proj (BS,W)@(W,3W)", lambda a: (a.reshape(-1, W) @ w3).reshape(B, S, 3 * W),
      x, flops=2 * B * S * W * 3 * W)
bench("out_proj (BS,W)@(W,W)", lambda a: (a.reshape(-1, W) @ wo).reshape(B, S, W),
      x, flops=2 * B * S * W * W)
bench("scores d=64 bhsd,bhtd", lambda a: jnp.einsum("bhsd,bhtd->bhst", a, k),
      q, flops=F_SC)
bench("scores d=128 (same FLOPs, H/2)",
      lambda a: jnp.einsum("bhsd,bhtd->bhst", a, k2), q2, flops=F_SC)
bench("pv d=64 bhst,bhtd->bhsd", lambda a: jnp.einsum("bhst,bhtd->bhsd", a, v),
      p, flops=F_SC)
bench("pv d=128 (same FLOPs, H/2)",
      lambda a: jnp.einsum("bhst,bhtd->bhsd", a, v2), p2, flops=F_SC)
bench("softmax fp32 (B,H,S,S)", lambda a: jax.nn.softmax(a, axis=-1), p32)
bench("layernorm fp32 (B,S,W)",
      lambda a: (a - a.mean(-1, keepdims=True))
      * jax.lax.rsqrt(a.var(-1, keepdims=True) + 1e-5), x32)

# the fused attention half-block, fwd and fwd+bwd, for end-to-end rates
from mvlpt_tpu.ops.block import attn_block

ln_p = {"scale": jnp.ones((W,), jnp.bfloat16), "bias": jnp.zeros((W,), jnp.bfloat16)}
attn_p = {"qkv_w": w3, "qkv_b": jnp.zeros((3 * W,), jnp.bfloat16),
          "out_w": wo, "out_b": jnp.zeros((W,), jnp.bfloat16)}
F_ATTN = 2 * B * S * W * 3 * W + 2 * F_SC + 2 * B * S * W * W
bench("fused attn half-block fwd",
      lambda a: attn_block(a, ln_p, attn_p, None, H), x, flops=F_ATTN)


def attn_loss(a):
    return jnp.sum(attn_block(a, ln_p, attn_p, None, H).astype(jnp.float32))


g = jax.grad(attn_loss)
bench("fused attn half-block grad-x (fwd+bwd)", g, x, flops=3 * F_ATTN,
      extra={"note": "flops=3x fwd (bwd ~2x fwd, weights frozen->x-grad only)"})

# MLP half-block control at the same geometry
from mvlpt_tpu.ops.block import mlp_block

mlp_p = {"fc_w": jnp.asarray(rng.randn(W, 4 * W), jnp.bfloat16),
         "fc_b": jnp.zeros((4 * W,), jnp.bfloat16),
         "proj_w": jnp.asarray(rng.randn(4 * W, W), jnp.bfloat16),
         "proj_b": jnp.zeros((W,), jnp.bfloat16)}
F_MLP = 2 * B * S * W * 4 * W * 2
bench("fused mlp half-block fwd",
      lambda a: mlp_block(a, ln_p, mlp_p), x, flops=F_MLP)
