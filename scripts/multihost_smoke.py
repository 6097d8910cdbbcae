"""Multi-host smoke test — run ONE copy per host on a multi-host TPU
slice (or multi-process CPU ring):

    # host i of N:
    JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=N \
        JAX_PROCESS_ID=i python scripts/multihost_smoke.py

Validates the full multi-host contract end-to-end (what the sandboxed
CI cannot — see tests/test_multihost.py): distributed init, global
("data","model") mesh over all hosts' devices, per-host batch rows
assembled with jax.make_array_from_process_local_data, one jitted SPMD
train step, and a cross-host metrics allgather.
"""

import numpy as np


def main():
    import os

    rehearsal = bool(os.environ.get("MVLPT_TPU_SMOKE_SINGLE"))
    if rehearsal:
        # CI rehearsal: exercise this script's EXACT sequence single-
        # process (no jax.distributed, virtual CPU devices) so the
        # script cannot rot between real multi-process runs. The real
        # thing also runs in CI now: tests/test_multihost_smoke.py
        # launches two coordinator-connected processes over loopback.
        # On a real pod, run one copy per host WITHOUT this env var.
        os.environ.setdefault(
            "XLA_FLAGS",
            "--xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from mvlpt_tpu.parallel import (
        allgather_tree, batch_specs, create_mesh, global_batch_arrays,
        local_batch_slice, maybe_initialize_distributed, put_tree_on_mesh,
        backbone_partition_specs)

    if not maybe_initialize_distributed() and not rehearsal:
        jax.distributed.initialize()
    n_proc = jax.process_count()
    pid = jax.process_index()
    print(f"[{pid}] {n_proc} processes, {len(jax.devices())} global / "
          f"{len(jax.local_devices())} local devices", flush=True)

    import jax.numpy as jnp

    from mvlpt_tpu.config import get_cfg_default
    from mvlpt_tpu.core.clip import CLIPConfig, init_clip_params
    from mvlpt_tpu.models.custom_clip import MVLPTModel
    from mvlpt_tpu.prompts import (
        PromptSpec, build_prompt_consts, init_prompt_params)
    from mvlpt_tpu.train.optim import build_optimizer
    from mvlpt_tpu.train.train_step import init_train_state, make_train_step

    clip_cfg = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, transformer_width=64, transformer_heads=2,
        transformer_layers=2, vision_heads_override=2)
    backbone = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
    spec = PromptSpec(
        n_cls=8, coop_n_ctx=2, vpt_n_ctx=2, vpt_deep=True,
        class_token_position="middle", project_method="transformer",
        project_dim=16, context_length=8, vision_layers=2, vision_width=64,
        text_width=64, embed_dim=32, vision_patch_size=8)
    prompt_params = init_prompt_params(jax.random.PRNGKey(1), spec)
    consts = build_prompt_consts(
        [f"c{i}" for i in range(8)], spec, backbone, jnp.float32)
    model = MVLPTModel(clip_cfg=clip_cfg, spec=spec, compute_dtype=jnp.float32)
    cfg = get_cfg_default()
    tx, _ = build_optimizer(cfg.OPTIM, steps_per_epoch=1)
    state = init_train_state(prompt_params, tx)
    step = make_train_step(model, tx, donate=False)

    mesh = create_mesh(n_data=len(jax.devices()), n_model=1)
    global_batch = len(jax.devices()) * 2
    start, size = local_batch_slice(global_batch)
    rng = np.random.RandomState(0)  # identical on all hosts
    gimages = rng.randn(global_batch, 32, 32, 3).astype(np.float32)
    glabels = rng.randint(0, 8, global_batch)
    local = {"image": gimages[start:start + size],
             "label": glabels[start:start + size]}

    with mesh:
        bb = put_tree_on_mesh(backbone, backbone_partition_specs(backbone),
                              mesh)
        batch = global_batch_arrays(local, batch_specs(local), mesh,
                                    global_batch)
        state, metrics = step(state, bb, consts, batch, jax.random.PRNGKey(0))
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    gathered = allgather_tree(np.array([loss], np.float32))
    assert np.allclose(gathered, loss), gathered  # same loss on every host
    print(f"[{pid}] OK loss={loss:.4f} (allgather agrees across "
          f"{n_proc} hosts)", flush=True)

    # Phase 2: tensor parallelism across host boundaries. dp x tp=2
    # shards the Megatron-layout backbone specs over devices owned by
    # different processes, so the in-program collectives (MLP/attention
    # psums) actually cross the process fabric.
    n_dev = len(jax.devices())
    if n_dev >= 4 and n_dev % 2 == 0:
        state2 = init_train_state(prompt_params, tx)
        mesh2 = create_mesh(n_data=n_dev // 2, n_model=2)
        with mesh2:
            bb2 = put_tree_on_mesh(
                backbone, backbone_partition_specs(backbone), mesh2)
            batch2 = global_batch_arrays(local, batch_specs(local), mesh2,
                                         global_batch)
            _, metrics2 = step(state2, bb2, consts, batch2,
                               jax.random.PRNGKey(0))
        loss2 = float(metrics2["loss"])
        assert np.isfinite(loss2), loss2
        assert abs(loss2 - loss) < 1e-4, (loss, loss2)  # same math, tp=2
        g2 = allgather_tree(np.array([loss2], np.float32))
        assert np.allclose(g2, loss2), g2
        print(f"[{pid}] OK tp=2 loss={loss2:.4f} "
              f"(dp={n_dev // 2} x tp=2 across {n_proc} hosts)", flush=True)


if __name__ == "__main__":
    main()
