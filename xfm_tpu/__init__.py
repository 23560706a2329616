"""xfm_tpu — a TPU-native (JAX/Flax/Pallas/pjit) foundation-model framework.

Re-implements the full capability surface of X-FM ("Toward Building General
Foundation Models for Language, Vision, and Vision-Language Understanding
Tasks", arXiv 2301.05065; reference implementation zhangxinsong-nlp/XFM):
a three-encoder multimodal transformer (vision / language / fusion) pretrained
with MLM + ITC + ITM + MIM (+ bbox losses) and fine-tuned on GLUE, ImageNet,
retrieval, VQA, NLVR2, grounding and captioning — redesigned TPU-first:

- SPMD over `jax.sharding.Mesh` (data / fsdp / tensor axes) instead of DDP/NCCL
- one jitted train step per task instead of python-side epoch plumbing
- Pallas flash-attention (with fused relative-position bias + masks) on the
  hot path; XLA everywhere else
- bf16 compute / fp32 master params instead of apex O1 loss scaling
- optax optimizers, Orbax checkpoints + a torch `.th` checkpoint importer
"""

__version__ = "0.1.0"
