"""Mesh-vs-single-device loss-trajectory assertion (pod runbook).

Runs K train steps of the same model / seed / GLOBAL batch twice —
once on one device, once under a ("data","model") mesh — and asserts
the per-step loss trajectories coincide. Sharding must never change
the math (XLA collectives reduce in the same fp32 the single-device
program uses), so any drift beyond dtype noise means a sharding bug:
this is the execute-and-compare checkpoint each pod-runbook phase ends
with (scripts/pod_runbook.md).

Usage:
    # CI rehearsal (8 virtual CPU devices, tiny towers):
    python scripts/pod_loss_check.py --mesh 4,2
    # first pod run (real chips, ViT-B/16 flagship, bf16):
    python scripts/pod_loss_check.py --mesh 8,1 --backbone b16 --tol 5e-3
    python scripts/pod_loss_check.py --mesh 4,2 --backbone b16 --tol 5e-3
    # optional: the fused-kernel path instead of XLA blocks
    python scripts/pod_loss_check.py --mesh 4,2 --kernels
"""

import argparse
import pathlib
import sys

import numpy as np

# __graft_entry__ lives at the repo root (this script shares its tiny
# rehearsal towers and the b16 flagship so the runbook phases validate
# the SAME shapes dryrun_multichip does)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def _run(model, backbone, prompt_params, consts, batches, mesh=None,
         kernels=False):
    import dataclasses

    import jax

    from mvlpt_tpu.config import get_cfg_default
    from mvlpt_tpu.parallel import (
        backbone_partition_specs, batch_specs, global_batch_arrays,
        put_tree_on_mesh)
    from mvlpt_tpu.train.optim import build_optimizer
    from mvlpt_tpu.train.train_step import init_train_state, make_train_step

    cfg = get_cfg_default()
    tx, _ = build_optimizer(cfg.OPTIM, steps_per_epoch=len(batches))
    if mesh is not None and kernels:
        from mvlpt_tpu.ops.block import _FusedMarker

        model = dataclasses.replace(model, attn_fn=_FusedMarker(mesh=mesh))
    step = make_train_step(model, tx, donate=False)
    state = init_train_state(prompt_params, tx)
    losses = []
    if mesh is None:
        for i, b in enumerate(batches):
            state, m = step(state, backbone, consts, b,
                            jax.random.PRNGKey(100 + i))
            losses.append(float(m["loss"]))
        return losses
    with mesh:
        backbone_s = put_tree_on_mesh(
            backbone, backbone_partition_specs(backbone), mesh)
        for i, b in enumerate(batches):
            b_s = global_batch_arrays(
                b, batch_specs(b), mesh, global_batch=len(b["label"]))
            state, m = step(state, backbone_s, consts, b_s,
                            jax.random.PRNGKey(100 + i))
            losses.append(float(m["loss"]))
    return losses


def _run_eval(model, backbone, prompt_params, consts, batch, mesh=None,
              kernels=False, replicated=False):
    """Eval-path logits: cached-text fast path + no-grad kernels — the
    program trainer.test() dispatches (rows sharded over 'data'
    single-host, or fully replicated multi-host). Mirrors the dryrun's
    eval phase on real chips."""
    import dataclasses

    import jax

    from mvlpt_tpu.parallel import (
        backbone_partition_specs, batch_specs, global_batch_arrays,
        put_tree_on_mesh, replicated_specs)
    from mvlpt_tpu.train.train_step import make_cached_text_eval

    if mesh is not None and kernels:
        from mvlpt_tpu.ops.block import _FusedMarker

        model = dataclasses.replace(model, attn_fn=_FusedMarker(mesh=mesh))
    text_fn, eval_fn = make_cached_text_eval(model)
    if mesh is None:
        tf = text_fn(backbone, prompt_params, consts)
        return np.asarray(eval_fn(backbone, prompt_params, tf, batch))
    with mesh:
        backbone_s = put_tree_on_mesh(
            backbone, backbone_partition_specs(backbone), mesh)
        tf = text_fn(backbone_s, prompt_params, consts)
        if replicated:
            batch_s = put_tree_on_mesh(
                {k: np.asarray(v) for k, v in batch.items()},
                replicated_specs(batch), mesh)
        else:
            batch_s = global_batch_arrays(
                batch, batch_specs(batch), mesh,
                global_batch=len(batch["label"]))
        return np.asarray(eval_fn(backbone_s, prompt_params, tf, batch_s))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mesh", default="8,1",
                   help="data,model axis sizes (e.g. 8,1 / 4,2 / 2,4)")
    p.add_argument("--backbone", default="tiny", choices=["tiny", "b16"],
                   help="tiny = CI rehearsal towers; b16 = real flagship")
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--batch", type=int, default=-1,
                   help="GLOBAL batch (default 2/dp-shard tiny, 32 b16)")
    p.add_argument("--tol", type=float, default=1e-5,
                   help="max |loss_mesh - loss_single| (use ~5e-3 for "
                        "bf16 b16 towers; fp32 tiny measures <1e-6)")
    p.add_argument("--kernels", action="store_true",
                   help="run the mesh leg through the fused Pallas "
                        "kernels (shard_map / Megatron-TP paths)")
    p.add_argument("--eval", action="store_true", dest="eval_leg",
                   help="additionally compare the eval fast path "
                        "(cached-text + no-grad kernels) mesh vs "
                        "single device, sharded AND replicated rows")
    args = p.parse_args()
    n_data, n_model = (int(x) for x in args.mesh.split(","))

    import jax

    if len(jax.devices()) < n_data * n_model:
        raise SystemExit(
            f"need {n_data * n_model} devices, have {len(jax.devices())}; "
            f"for a CI rehearsal run with "
            f"XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{n_data * n_model} and JAX_PLATFORMS=cpu (tests/conftest.py "
            f"does this)")

    import jax.numpy as jnp

    from mvlpt_tpu.parallel import create_mesh

    if args.backbone == "tiny":
        from __graft_entry__ import _tiny_flagship

        n_cls = 8
        model, backbone, pp, consts, tiny_cfg = _tiny_flagship(
            n_cls, jnp.float32)
        res = tiny_cfg.image_resolution
        batch_n = args.batch if args.batch > 0 else n_data * 2
    else:
        from __graft_entry__ import _flagship

        n_cls = 100
        batch_n = args.batch if args.batch > 0 else 32
        model, backbone, pp, consts, _, clip_cfg = _flagship(
            n_cls=n_cls, batch=batch_n)
        res = clip_cfg.image_resolution

    rng = np.random.RandomState(0)
    batches = [{
        "image": jnp.asarray(rng.randn(batch_n, res, res, 3), jnp.float32),
        "label": jnp.asarray(rng.randint(0, n_cls, batch_n)),
    } for _ in range(args.steps)]

    single = _run(model, backbone, pp, consts, batches)
    mesh = create_mesh(n_data=n_data, n_model=n_model)
    meshed = _run(model, backbone, pp, consts, batches, mesh=mesh,
                  kernels=args.kernels)
    diff = float(np.max(np.abs(np.asarray(single) - np.asarray(meshed))))
    print(f"single: {[round(x, 6) for x in single]}")
    print(f"mesh  : {[round(x, 6) for x in meshed]} "
          f"(dp={n_data}, tp={n_model}, kernels={args.kernels})")
    print(f"max |delta| = {diff:.2e} (tol {args.tol:g})")
    if diff > args.tol:
        raise SystemExit(f"LOSS CHECK FAILED: {diff:.2e} > {args.tol:g}")
    print("POD LOSS CHECK OK")

    if args.eval_leg:
        ref = _run_eval(model, backbone, pp, consts, batches[0])
        for name, repl in (("sharded", False), ("replicated", True)):
            got = _run_eval(model, backbone, pp, consts, batches[0],
                            mesh=mesh, kernels=args.kernels,
                            replicated=repl)
            d = float(np.max(np.abs(got - ref)))
            print(f"eval logits ({name}): max |delta| = {d:.2e}")
            if d > args.tol:
                raise SystemExit(
                    f"EVAL CHECK FAILED ({name}): {d:.2e} > {args.tol:g}")
        print("POD EVAL CHECK OK")


if __name__ == "__main__":
    main()
