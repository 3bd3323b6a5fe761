"""fewshot_vit_tpu — a TPU-native (JAX/XLA/Pallas/pjit) few-shot Vision-Transformer framework.

Re-designed from scratch with the capabilities of DongSky/few-shot-vit
("SUN: Self-Promoted Supervision for Few-Shot Transformer", ECCV 2022):

  * a three-phase pipeline — teacher supervised pretraining, SUN meta-training
    (per-patch token labels from a frozen teacher), and meta-tuning via
    Meta-Baseline cosine prototypes (SUN-M) or DeepEMD optimal transport (SUN-D);
  * an encoder zoo (Visformer, NesT, Swin, LeViT, LV-ViT, DeiT, ResNet-12/18/50,
    ConvNet-4) at 80x80 resolution;
  * episodic N-way K-shot pipelines with fixed-shape device batches;
  * a vmapped episodic evaluator reporting accuracy with 95% confidence intervals.

Unlike the reference (PyTorch + nn.DataParallel), everything here is functional
JAX: encoders are flax modules returning ``(dense_map_NHWC, pooled)``, train and
eval steps are single jit-compiled programs, parallelism is expressed as sharding
over a ``jax.sharding.Mesh``, and hot kernels are Pallas.
"""

__version__ = "0.1.0"
