"""MVLPT-TPU: a TPU-native multitask vision-language prompt-tuning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the MVLPT
research codebase (Multitask Vision-Language Prompt Tuning): frozen CLIP
towers adapted to downstream image classification via learnable prompt
parameters (CoOp text context, VPT visual prompt tokens, UPT unified
prompts), with multitask joint source training and few-shot target
transfer over the 11 CoOp datasets and the 20-task ELEVATER benchmark.

Design principles (TPU-first):
  * Pure-functional models: parameters are pytrees, forward passes are
    jittable functions. The frozen CLIP backbone lives in bf16 HBM and is
    never differentiated; only prompt parameters receive gradients.
  * Stacked-layer transformers driven by ``lax.scan`` for fast compiles
    and clean rematerialisation; patch embedding as reshape+matmul.
  * fp32 LayerNorm islands and fp32 softmax inside bf16 compute, matching
    CLIP's fp16-with-fp32-LayerNorm numerics contract.
  * SPMD over a 2-D ("data", "model") ``jax.sharding.Mesh``; gradients
    reduce over ICI inside one jitted train step.
  * Optional Pallas kernels for the hot attention/LayerNorm ops with an
    XLA fallback.
"""

__version__ = "0.1.0"
