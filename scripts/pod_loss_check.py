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

import numpy as np


def _tiny_flagship(n_cls, compute_dtype):
    import jax
    import jax.numpy as jnp

    from mvlpt_tpu.core.clip import CLIPConfig, init_clip_params
    from mvlpt_tpu.models.custom_clip import MVLPTModel
    from mvlpt_tpu.prompts import (
        PromptSpec, build_prompt_consts, init_prompt_params)

    clip_cfg = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, transformer_width=64, transformer_heads=2,
        transformer_layers=2, vision_heads_override=2)
    backbone = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
    classnames = [f"c{i}" for i in range(n_cls)]
    spec = PromptSpec(
        n_cls=n_cls, coop_n_ctx=2, vpt_n_ctx=2, vpt_deep=True,
        class_token_position="middle", project_method="transformer",
        project_dim=16, context_length=8,
        vision_layers=2, vision_width=64, text_width=64, embed_dim=32,
        vision_patch_size=8)
    prompt_params = init_prompt_params(jax.random.PRNGKey(1), spec)
    consts = build_prompt_consts(classnames, spec, backbone, compute_dtype)
    model = MVLPTModel(clip_cfg=clip_cfg, spec=spec,
                       compute_dtype=compute_dtype)
    res = clip_cfg.image_resolution
    return model, backbone, prompt_params, consts, res


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
    args = p.parse_args()
    n_data, n_model = (int(x) for x in args.mesh.split(","))

    import jax

    if args.backbone == "tiny" and len(jax.devices()) < n_data * n_model:
        raise SystemExit(
            f"need {n_data * n_model} devices; for a CI rehearsal run "
            f"with XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{n_data * n_model} and JAX_PLATFORMS=cpu (tests/conftest.py "
            f"does this)")

    import jax.numpy as jnp

    from mvlpt_tpu.parallel import create_mesh

    if args.backbone == "tiny":
        n_cls = 8
        model, backbone, pp, consts, res = _tiny_flagship(n_cls, jnp.float32)
        batch_n = args.batch if args.batch > 0 else n_data * 2
    else:
        import sys
        sys.path.insert(0, ".")
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


if __name__ == "__main__":
    main()
