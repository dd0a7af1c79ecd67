"""TPU-native Inference-Efficient Vision Models.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
`jaideepmurkute/Inference-Efficient-Vision-Models` reference (mounted read-only
at /root/reference): a four-stage model-compression pipeline for vision
classifiers —

  1. teacher training       (ResNet50 baseline, 5-fold CV)
  2. knowledge distillation (ResNet50 → ResNet18, (1-α)·CE + α·KL·T² loss)
  3. structured pruning     (channel-magnitude ranking + physical re-packing
                             + fine-tuning)
  4. post-training quantization (static INT8 w/ calibration, dynamic INT8,
                             fp16/bf16 casting)

— rebuilt TPU-first:

  * models are pure-function ``init/apply`` pytrees in NHWC layout with an
    explicit width descriptor, so pruned architectures are constructible from
    metadata instead of pickled modules,
  * training steps are single jitted functions sharded over a
    ``jax.sharding.Mesh`` (data parallel over ICI, optional tensor-parallel
    classifier head),
  * the static-INT8 inference path runs on true int8 MXU kernels (Pallas
    int8 matmul with fused per-channel requantization epilogue),
  * observers/calibration are jittable reductions, and
  * checkpoints are msgpack pytrees keyed with the reference's on-disk
    contract (``output/<exp>/fold_<k>/model_best.ckpt`` etc.).

Subpackages
-----------
core/      configs, PRNG discipline, logging, artifact store
data/      NEU-DET scan, stratified K-fold, device-feeding pipelines, synthetic data
models/    ResNet18/50 (+ widths descriptor) as pure init/apply
train/     jitted CE / KD train + eval steps, AdamW
compress/  prune/ (dependency-graph structured pruning), quant/ (PTQ)
ops/       Pallas TPU kernels (int8 matmul/conv, space-to-depth, quant primitives)
parallel/  mesh + sharding helpers (dp / tp), multi-host init
metrics/   accuracy, throughput, latency, FLOPs, model size
cli/       the four stage entry points (reference CLI contract)
serving    pipelined Predictor + quantized-artifact loading
"""

__version__ = "0.1.0"
